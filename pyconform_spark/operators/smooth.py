"""Sequential smoothers that don't window-ize.

Holt linear (double exponential) smoothing is a COUPLED two-state
recurrence — level and trend feed each other — so unlike the single
EWMA (which defs.py compiles to a closed-form dyadic window sum) it
has no frame-aggregate form.  The Spark host is a per-series
``applyInPandas`` (Arrow-batched, numpy/python-float recurrence, one
shuffle on the series keys); the cross-engine proof is a recursive-CTE
DuckDB oracle stepping the SAME float expressions in the SAME order —
the int_tabulated spline precedent (oracles.py) applied to streaming
smoothing.

Semantics (PromQL ``holt_winters``-style, trend-seeded at zero):

* row 1:  s = v,  b = 0
* row i:  s_i = sf·v_i + (1−sf)·(s_{i−1} + b_{i−1})
          b_i = tf·(s_i − s_{i−1}) + (1−tf)·b_{i−1}

``sf``/``tf`` default to exact dyadics (0.5, 0.25) so the multiplies
are exact; the adds are IEEE-identical in any engine because the
operation ORDER is pinned (scalar python floats, not vectorized
rearrangements).

Scale: state is two floats per series; each series lives in one task
after the keys shuffle; a hot series is chunkable with
skew.chunked_window-style tail carrying if ever needed (the recurrence
carries (s, b) across chunk borders).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def holt_linear(
    df: DataFrame,
    keys: list[str],
    order: list[str],
    value: str = "value",
    sf: float = 0.5,
    tf: float = 0.25,
) -> DataFrame:
    """Per-series Holt linear smoothing; returns the input rows plus
    ``holt_level`` (the smoothed value) and ``holt_trend``."""
    out_schema = T.StructType(
        list(df.schema)
        + [
            T.StructField("holt_level", T.DoubleType(), True),
            T.StructField("holt_trend", T.DoubleType(), True),
        ]
    )

    def _smooth(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="mergesort").reset_index(drop=True)
        v = pdf[value].astype(float).tolist()
        levels, trends = [], []
        s_prev = b_prev = None
        for i, vi in enumerate(v):
            if i == 0:
                s, b = float(vi), 0.0
            else:
                s = sf * vi + (1.0 - sf) * (s_prev + b_prev)
                b = tf * (s - s_prev) + (1.0 - tf) * b_prev
            levels.append(s)
            trends.append(b)
            s_prev, b_prev = s, b
        pdf["holt_level"] = levels
        pdf["holt_trend"] = trends
        return pdf

    return df.groupBy(*keys).applyInPandas(_smooth, schema=out_schema)


def holt_winters_seasonal(
    df: DataFrame,
    keys: list[str],
    order: list[str],
    value: str = "value",
    period: int = 4,
    lf: float = 0.5,
    sf: float = 0.25,
) -> DataFrame:
    """Per-series additive Holt-Winters WITHOUT trend (level +
    seasonal): the seasonal-aware smoother sitting between
    ``holt_linear`` (trend, no season) and a full triple smoother.

    Recurrence, 1-indexed with phase j = (i−1) mod p, seeded
    L₀ = v₁ and S[j] = 0:

        fitted_i = L_{i−1} + S[j]            (one-step forecast)
        L_i      = lf·(v_i − S[j]) + (1−lf)·L_{i−1}
        S[j]     = sf·(v_i − L_i) + (1−sf)·S[j]

    lf/sf default to exact dyadics so every multiply is exact and the
    add order is pinned — the DuckDB twin is a recursive CTE carrying
    the p seasonal states as a LIST(DOUBLE) and stepping the SAME
    float expressions in the SAME order.  Scale: p+1 floats of state
    per series; one shuffle on the keys."""
    import pandas as pd  # noqa: F811
    from pyspark.sql import types as T  # noqa: F811

    out_schema = T.StructType(
        list(df.schema)
        + [
            T.StructField("hw_fitted", T.DoubleType(), True),
            T.StructField("hw_level", T.DoubleType(), True),
            T.StructField("hw_season", T.DoubleType(), True),
        ]
    )

    def _smooth(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="mergesort").reset_index(drop=True)
        v = pdf[value].astype(float).tolist()
        fitted, levels, seasons = [], [], []
        sea = [0.0] * period
        lvl = None
        for i, vi in enumerate(v):
            j = i % period
            if i == 0:
                lvl = float(vi)
            f = lvl + sea[j]
            lnew = lf * (vi - sea[j]) + (1.0 - lf) * lvl
            snew = sf * (vi - lnew) + (1.0 - sf) * sea[j]
            fitted.append(f)
            levels.append(lnew)
            seasons.append(snew)
            lvl, sea[j] = lnew, snew
        pdf["hw_fitted"] = fitted
        pdf["hw_level"] = levels
        pdf["hw_season"] = seasons
        return pdf

    return df.groupBy(*keys).applyInPandas(_smooth, schema=out_schema)


def isotonic_fit(daily: DataFrame) -> DataFrame:
    """Per-series isotonic (monotone non-decreasing) L2 regression by
    the Pool-Adjacent-Violators Algorithm — the O(n) stack algorithm,
    run per series as a grouped Arrow UDF with EXACT integer
    num/den pool arithmetic (no float accumulates inside the pools).

    Input: (series, d, y) with integer y; output adds ``fit`` — the
    fitted monotone value as one correctly-rounded double division of
    the pool's exact (sum, count).

    Correctness is gated by an INDEPENDENT formulation: the oracle
    evaluates the classic minimax identity

        fit(i) = max_{a<=i} min_{b>=i} mean(y[a..b])

    in SQL (O(n^3) per series — fine for the bounded 30-day frame the
    registered query feeds it; the ENGINE path stays O(n) per series).
    Because IEEE division is correctly rounded and max/min are
    monotone under rounding, the two formulations agree bit-for-bit
    on the emitted doubles.

    Scale shape: one combiner-friendly agg builds the daily frame;
    each series is one Arrow group — 10^6 series parallelize
    embarrassingly; state per group is the O(n) pool stack."""

    def _pava(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("d").reset_index(drop=True)
        # pool stack of [sum, count] over exact Python ints
        pools: list[list[int]] = []
        for y in pdf["y"].astype("int64").tolist():
            pools.append([int(y), 1])
            # merge while the tail violates monotonicity:
            # mean(prev) > mean(last)  <=>  s_p * c_l > s_l * c_p
            while (
                len(pools) > 1
                and pools[-2][0] * pools[-1][1]
                > pools[-1][0] * pools[-2][1]
            ):
                s, c = pools.pop()
                pools[-1][0] += s
                pools[-1][1] += c
        fit: list[float] = []
        for s, c in pools:
            fit.extend([s / c] * c)
        out = pdf.copy()
        out["fit"] = pd.Series(fit, dtype="float64")
        return out

    schema = (
        "series string, d timestamp_ntz, y long, fit double"
    )
    return daily.groupBy("series").applyInPandas(_pava, schema)


def isotonic_minimax_sql(inner: str) -> str:
    """DuckDB twin via the minimax identity; ``inner`` must yield
    (series, d, y)."""
    return f"""
WITH daily AS MATERIALIZED ({inner}),
idx AS MATERIALIZED (
  SELECT series, d, y,
         row_number() OVER (PARTITION BY series ORDER BY d) AS i
  FROM daily),
pre AS MATERIALIZED (
  SELECT series, i, d, y,
         sum(y) OVER (PARTITION BY series ORDER BY i) AS s
  FROM idx),
-- mean(a..b) = (S[b] - S[a-1]) / (b - a + 1); S[0] = 0
seg AS MATERIALIZED (
  SELECT a.series, a.i AS a, b.i AS b,
         (b.s - a.s + a.y)::DOUBLE / (b.i - a.i + 1) AS m
  FROM pre a JOIN pre b ON b.series = a.series AND b.i >= a.i),
mn AS MATERIALIZED (
  -- min over b >= i of segment means starting at a
  SELECT s.series, s.a, p.i, min(s.m) AS mn
  FROM seg s JOIN idx p ON p.series = s.series
   AND p.i >= s.a AND s.b >= p.i
  GROUP BY 1, 2, 3)
SELECT x.series, x.d, x.y::BIGINT AS y,
       max(mn.mn) AS fit
FROM idx x JOIN mn ON mn.series = x.series AND mn.i = x.i
  AND mn.a <= x.i
GROUP BY x.series, x.d, x.y
"""


def croston(
    df: DataFrame,
    keys: list[str],
    order: str = "h",
    demand: str = "demand",
    alpha: float = 0.5,
) -> DataFrame:
    """Croston's method (1972) for INTERMITTENT demand: two parallel
    SES recurrences — smoothed demand size z and smoothed inter-demand
    interval p — updated only at non-zero periods; the per-period
    forecast is z/p.  The classic estimator for sparse series where
    plain SES collapses toward zero between demands.

    State per series is (z, p, q periods-since-demand, seen); like the
    Holt smoothers above, the recurrences are coupled through the
    demand indicator so no frame-aggregate form exists — the host is
    applyInPandas and the cross-engine proof is a recursive-CTE oracle
    stepping the SAME dyadic float expressions (alpha = 0.5) in the
    SAME order.  Rows before the first demand carry NULL state."""
    out_schema = T.StructType(
        list(df.schema)
        + [
            T.StructField("croston_z", T.DoubleType(), True),
            T.StructField("croston_p", T.DoubleType(), True),
            T.StructField("croston_forecast", T.DoubleType(), True),
        ]
    )

    def _run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="mergesort").reset_index(
            drop=True
        )
        z = p = None
        q = 0
        seen = False
        zs, ps, fs = [], [], []
        for d in pdf[demand].tolist():
            d = float(d)
            q += 1
            if d > 0:
                if seen:
                    z = alpha * d + (1.0 - alpha) * z
                    p = alpha * float(q) + (1.0 - alpha) * p
                else:
                    z = d
                    p = float(q)
                    seen = True
                q = 0
            zs.append(z)
            ps.append(p)
            fs.append(z / p if seen else None)
        pdf["croston_z"] = zs
        pdf["croston_p"] = ps
        pdf["croston_forecast"] = fs
        return pdf

    return df.groupBy(*keys).applyInPandas(_run, schema=out_schema)


def kalman_local_level(
    df: DataFrame,
    keys: list[str],
    order: str = "h",
    value: str = "y",
    q: float = 0.25,
    r: float = 1.0,
) -> DataFrame:
    """Kalman filter for the LOCAL LEVEL model (random-walk level
    observed with noise — Durbin & Koopman ch. 2, the state-space
    generalization of SES whose gain ADAPTS instead of being a fixed
    alpha): per step, with process variance ``q`` and observation
    variance ``r``,

        P_pred = P + q
        K      = P_pred / (P_pred + r)
        l      = l + K * (y - l)
        P      = (1 - K) * P_pred

    initialized l = y_0, P = r at the first observation.  Early rows
    get a high gain (uncertain level, follow the data), and K decays
    toward the steady-state gain — the principled warm-up SES lacks.

    Like the Holt/Croston recurrences above, the gain couples state to
    every prior observation, so no window-aggregate form exists — the
    host is applyInPandas over Python IEEE doubles with a PINNED
    operation order, and the cross-engine proof is a recursive-CTE
    oracle stepping the SAME float expressions.  ``q`` and ``r``
    must stay dyadic so the literals parse identically in both
    engines."""
    out_schema = T.StructType(
        list(df.schema)
        + [
            T.StructField("kalman_level", T.DoubleType(), True),
            T.StructField("kalman_gain", T.DoubleType(), True),
            T.StructField("kalman_var", T.DoubleType(), True),
        ]
    )

    def _run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="mergesort").reset_index(
            drop=True
        )
        l = P = K = None
        ls, ks, ps = [], [], []
        for y in pdf[value].tolist():
            y = float(y)
            if l is None:
                l = y
                P = r
                K = None
            else:
                Ppred = P + q
                K = Ppred / (Ppred + r)
                l = l + K * (y - l)
                P = (1.0 - K) * Ppred
            ls.append(l)
            ks.append(K)
            ps.append(P)
        pdf["kalman_level"] = ls
        pdf["kalman_gain"] = ks
        pdf["kalman_var"] = ps
        return pdf

    return df.groupBy(*keys).applyInPandas(_run, schema=out_schema)


def croston_sparse(
    df: DataFrame,
    keys: list[str],
    order: str = "h",
    demand: str = "demand",
    alpha: float = 0.5,
) -> DataFrame:
    """Croston's recurrence on DEMAND POINTS ONLY — the scale form of
    :func:`croston`.  The dense-axis twin steps through every zero
    period, but state only CHANGES at demand points: an inter-demand
    interval is just the lag diff of consecutive demand hours, so the
    dense min..max explode (~1/fill-rate row inflation, unbounded for
    sparse long-lived series) is unnecessary — the reference's gap
    lesson (``mapdates.py:167-216``: detect gaps, don't materialize
    them).

    Input must hold only rows with ``demand > 0``.  The first demand
    of a series uses interval 1 (the dense twin's axis starts AT the
    first demand hour, so its q there is 1); every later demand uses
    ``h_i - h_{i-1}``.  State per series is two floats — identical to
    the dense twin's state AT its demand rows (pinned by
    test_croston_sparse_equals_dense_at_demand_points); operation
    order and dyadic alpha are shared with the recursive-CTE oracle.

    Host: keyed ``repartition`` + ``mapInPandas`` concat-then-sort —
    many thousands of tiny series make per-group applyInPandas pay
    ~1ms of dispatch per series, and AQE coalesces the byte-small
    shuffle onto a couple of cores (the mp_scaling lesson); ONE Arrow
    pass per partition with a series-boundary reset loop does the
    whole partition in a single call at full parallelism."""
    import numpy as np

    out_schema = T.StructType(
        list(df.schema)
        + [
            T.StructField("croston_z", T.DoubleType(), True),
            T.StructField("croston_p", T.DoubleType(), True),
            T.StructField("croston_forecast", T.DoubleType(), True),
        ]
    )
    spark = df.sparkSession
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))

    def _run(it):
        parts = list(it)
        if not parts:
            return
        pdf = (
            parts[0]
            if len(parts) == 1
            else pd.concat(parts, ignore_index=True)
        )
        if len(pdf) == 0:
            return
        pdf = pdf.sort_values(
            list(keys) + [order], kind="mergesort"
        ).reset_index(drop=True)
        n = len(pdf)
        # series boundary: any key differs from the previous row
        # (null-safe: two nulls compare equal)
        new = np.zeros(n, dtype=bool)
        new[0] = True
        for k in keys:
            cur, prv = pdf[k], pdf[k].shift()
            new |= ((cur != prv) & ~(cur.isna() & prv.isna())).to_numpy()
        h = pdf[order].to_numpy()
        d = pdf[demand].to_numpy().astype(np.float64)
        zs = np.empty(n, dtype=np.float64)
        ps = np.empty(n, dtype=np.float64)
        z = p = 0.0
        prev_h = 0
        for i in range(n):
            if new[i]:
                z = d[i]
                p = 1.0
            else:
                z = alpha * d[i] + (1.0 - alpha) * z
                p = alpha * float(h[i] - prev_h) + (1.0 - alpha) * p
            prev_h = h[i]
            zs[i] = z
            ps[i] = p
        pdf["croston_z"] = zs
        pdf["croston_p"] = ps
        pdf["croston_forecast"] = zs / ps
        yield pdf

    return df.repartition(n_parts, *keys).mapInPandas(
        _run, schema=out_schema
    )
