"""Gap detection, dense-grid upsampling, and gap fill (locf / linear).

Reference analogs:

* gap detection — ``mapdates.py:112-216`` flags missing steps between
  and within NetCDF files by comparing successive time values against
  the inferred cadence; here that is one ``F.lag`` window per series.
* dense-grid upsample — ``yeartomonth_data`` replicates annual values
  to monthly points (``modules/commonfunctions.py:402-482``); here a
  per-series ``sequence()`` + ``explode`` materializes every bucket
  between first and last observation.
* linear interpolation — the spline/interp numerics of
  ``idl.py:120-153`` / ``np.interp`` in ``ageofair``
  (``commonfunctions.py:390``); here it is CLOSED-FORM in pure Spark:
  for a missing bucket, the previous and next observed points are
  window lookups (``last/first ... ignorenulls``) and the fill is one
  arithmetic expression — no Python in the hot path at all.  An
  ``applyInPandas`` + ``np.interp`` twin exists for golden parity.

Scale notes: the dense grid costs one groupBy (series extents) and one
shuffle-join back on (series, bucket); both are key-partitioned on the
series keys so skew salting (operators.skew) applies.  Window fills
reuse ONE sort per series — all window expressions share the same
(partitionBy, orderBy) so Catalyst plans a single Exchange + Sort.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from pyconform_spark.tables import SERIES_KEYS, TIERS


def detect_gaps(
    df: DataFrame,
    keys: list[str] | None = None,
    ts_col: str = "ts",
    threshold_seconds: int = 3600,
) -> DataFrame:
    """Per-series gaps: successive-timestamp deltas above threshold.

    Returns (keys..., gap_start, gap_end, gap_seconds).
    """
    keys = keys or SERIES_KEYS
    w = Window.partitionBy(*keys).orderBy(ts_col)
    prev = F.lag(F.col(ts_col)).over(w)
    delta = F.col(ts_col).cast("timestamp").cast("long") - prev.cast(
        "timestamp"
    ).cast("long")
    return (
        df.select(*keys, F.col(ts_col))
        .withColumn("gap_start", prev)
        .withColumn("gap_seconds", delta)
        .where(F.col("gap_seconds") > threshold_seconds)
        .select(
            *keys,
            F.col("gap_start").cast("timestamp_ntz").alias("gap_start"),
            F.col(ts_col).cast("timestamp_ntz").alias("gap_end"),
            F.col("gap_seconds").cast("long").alias("gap_seconds"),
        )
    )


def dense_grid(tier_df: DataFrame, tier: str, keys: list[str] | None = None) -> DataFrame:
    """Left-join the tier table onto every bucket between each series'
    first and last observation.  Missing buckets appear with NULL
    measures and ``gap_filled = true``."""
    keys = keys or SERIES_KEYS
    secs = TIERS[tier].seconds
    extents = tier_df.groupBy(*keys).agg(
        F.min("bucket_start").alias("b_min"), F.max("bucket_start").alias("b_max")
    )
    grid = extents.select(
        *keys,
        F.explode(
            F.sequence(
                F.col("b_min").cast("timestamp"),
                F.col("b_max").cast("timestamp"),
                F.expr(f"INTERVAL {secs} SECOND"),
            )
        ).alias("bucket_start"),
    ).withColumn("bucket_start", F.col("bucket_start").cast("timestamp_ntz"))
    joined = grid.join(tier_df, [*keys, "bucket_start"], "left")
    return joined.withColumn("gap_filled", F.col("turn_count").isNull())


def fill_locf(
    dense: DataFrame,
    value_cols: list[str],
    keys: list[str] | None = None,
    zero_fill: list[str] | None = None,
) -> DataFrame:
    """Last-observation-carried-forward over the dense grid.

    ``zero_fill`` columns (e.g. turn_count in a rate series — a bucket
    with no turns genuinely has rate 0) are filled with 0 instead of
    the previous observation.
    """
    keys = keys or SERIES_KEYS
    w = (
        Window.partitionBy(*keys)
        .orderBy("bucket_start")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = dense
    for c in value_cols:
        out = out.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))
    for c in zero_fill or []:
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(0)))
    return out


def fill_linear(
    dense: DataFrame,
    value_cols: list[str],
    keys: list[str] | None = None,
) -> DataFrame:
    """Linear interpolation between the surrounding observed points,
    entirely in Catalyst expressions (np.interp semantics: clamp to the
    nearest observed value beyond the series edges).

    For every missing bucket t with previous observed (t0, v0) and next
    observed (t1, v1):  v = v0 + (v1 - v0) * (t - t0) / (t1 - t0).
    """
    keys = keys or SERIES_KEYS
    wb = (
        Window.partitionBy(*keys)
        .orderBy("bucket_start")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy(*keys)
        .orderBy("bucket_start")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    t = F.col("bucket_start").cast("timestamp").cast("long")
    obs_t = F.when(~F.col("gap_filled"), t)

    out = dense
    t0 = F.last(obs_t, ignorenulls=True).over(wb)
    t1 = F.first(obs_t, ignorenulls=True).over(wf)
    out = out.withColumn("_t0", t0).withColumn("_t1", t1)
    for c in value_cols:
        v0 = F.last(F.col(c), ignorenulls=True).over(wb)
        v1 = F.first(F.col(c), ignorenulls=True).over(wf)
        # association mirrors np.interp: slope = (v1-v0)/(t1-t0);
        # v = slope*(t-t0) + v0  — keeps SQL and numpy fills bit-identical
        slope = (v1 - v0) / (F.col("_t1") - F.col("_t0"))
        interp = slope * (t - F.col("_t0")) + v0
        filled = (
            F.when(~F.col("gap_filled"), F.col(c))
            .when(F.col("_t0").isNull(), v1)   # before first obs → backfill
            .when(F.col("_t1").isNull(), v0)   # after last obs → locf
            .when(F.col("_t1") == F.col("_t0"), v0)
            .otherwise(interp)
        )
        out = out.withColumn(c, filled.cast("double"))
    return out.drop("_t0", "_t1")


def fill_linear_pandas(
    dense: DataFrame,
    value_cols: list[str],
    keys: list[str] | None = None,
) -> DataFrame:
    """Arrow-vectorized twin of :func:`fill_linear` using np.interp per
    series group (``applyInPandas``).  Used as the golden-parity check
    (reference style: pin numpy operation order, ``idl.py:7-13``), and
    as the extension point for spline/irregular-grid fills that do not
    window-ize.
    """
    keys = keys or SERIES_KEYS
    schema = dense.schema

    def _fill(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("bucket_start", kind="mergesort")
        # epoch SECONDS (exact in float64) — the same int domain the
        # closed-form Spark/SQL fill uses, so slopes round identically
        t = (
            pdf["bucket_start"]
            .astype("datetime64[s]")
            .astype("int64")
            .to_numpy(dtype=np.float64)
        )
        obs = ~pdf["gap_filled"].to_numpy()
        if obs.any():
            to = t[obs]
            # neighbor lookup (np.interp's job) done explicitly so the
            # arithmetic is EXACTLY slope*(t-t0)+v0 with
            # slope=(v1-v0)/(t1-t0) — bit-identical to the closed-form
            # Spark/SQL fill (np.interp's compiled path differs by ulps)
            hi = np.clip(np.searchsorted(to, t, side="left"), 0, len(to) - 1)
            lo = np.clip(hi - 1, 0, len(to) - 1)
            exact = to[hi] == t
            lo = np.where(exact, hi, lo)
            for c in value_cols:
                v = pdf[c].to_numpy(dtype=np.float64)
                vo = v[obs]
                t0, t1 = to[lo], to[hi]
                v0, v1 = vo[lo], vo[hi]
                with np.errstate(invalid="ignore", divide="ignore"):
                    slope = (v1 - v0) / (t1 - t0)
                    interp = slope * (t - t0) + v0
                filled = np.where(t0 == t1, v0, interp)
                filled = np.where(t <= to[0], vo[0], filled)   # backfill edge
                filled = np.where(t >= to[-1], vo[-1], filled)  # locf edge
                pdf[c] = np.where(obs, v, filled)
        return pdf

    return dense.groupBy(*keys).applyInPandas(_fill, schema=schema)


# ----------------------------------------------------------- cubic spline
def spline_second_derivs(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Natural-cubic-spline second derivatives — the reference's
    ``spl_init`` (``/root/reference/source/pyconform/modules/idl.py:73-117``):
    a forward elimination + back substitution recurrence that is
    inherently sequential, hence lives inside a grouped Arrow UDF and
    not a window function (SURVEY §2.5)."""
    n = len(x)
    y2 = np.zeros(n)
    u = np.zeros(n)
    for i in range(1, n - 1):
        sig = (x[i] - x[i - 1]) / (x[i + 1] - x[i - 1])
        p = sig * y2[i - 1] + 2.0
        y2[i] = (sig - 1.0) / p
        du = (y[i + 1] - y[i]) / (x[i + 1] - x[i]) - (y[i] - y[i - 1]) / (
            x[i] - x[i - 1]
        )
        u[i] = (6.0 * du / (x[i + 1] - x[i - 1]) - sig * u[i - 1]) / p
    for k in range(n - 2, -1, -1):
        y2[k] = y2[k] * y2[k + 1] + u[k]
    return y2


def spline_eval(
    x: np.ndarray, y: np.ndarray, y2: np.ndarray, xq: np.ndarray
) -> np.ndarray:
    """``spl_interp`` (idl.py:120-153): evaluate the cubic between the
    bracketing knots (vectorized over query points)."""
    idx = np.clip(np.searchsorted(x, xq) - 1, 0, len(x) - 2)
    h = x[idx + 1] - x[idx]
    a = (x[idx + 1] - xq) / h
    b = (xq - x[idx]) / h
    # cubes as explicit multiplies (a*a*a, not a**3): numpy's pow and
    # SQL pow() are not ulp-identical, three multiplies are — keeps the
    # DuckDB recursive-CTE oracle bit-exact
    return (
        a * y[idx]
        + b * y[idx + 1]
        + ((a * a * a - a) * y2[idx] + (b * b * b - b) * y2[idx + 1])
        * (h * h)
        / 6.0
    )


def fill_spline(
    dense: DataFrame,
    value_cols: list[str],
    keys: list[str] | None = None,
) -> DataFrame:
    """Cubic-spline gap fill over the dense grid (the smooth upgrade of
    fill_linear for slowly-varying series); outside the observed range
    values clamp to the edge observations like np.interp."""
    keys = keys or SERIES_KEYS
    schema = dense.schema

    def _fill(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("bucket_start", kind="mergesort")
        t = (
            pdf["bucket_start"]
            .astype("datetime64[s]")
            .astype("int64")
            .to_numpy(dtype=np.float64)
        )
        obs = ~pdf["gap_filled"].to_numpy()
        if obs.sum() >= 2:
            to = t[obs]
            for c in value_cols:
                v = pdf[c].to_numpy(dtype=np.float64)
                vo = v[obs]
                if len(to) >= 3:
                    y2 = spline_second_derivs(to, vo)
                    filled = spline_eval(to, vo, y2, t)
                else:
                    slope = (vo[1] - vo[0]) / (to[1] - to[0])
                    filled = slope * (t - to[0]) + vo[0]
                filled = np.where(t <= to[0], vo[0], filled)
                filled = np.where(t >= to[-1], vo[-1], filled)
                pdf[c] = np.where(obs, v, filled)
        return pdf

    return dense.groupBy(*keys).applyInPandas(_fill, schema=schema)


# ---------------------------------------------------- tabulated integral
def int_tabulated_np(x: np.ndarray, y: np.ndarray) -> float:
    """The reference's ``int_tabulated`` (idl.py:156-176) composed from
    the spline pieces above: pad the segment count to a multiple of 4,
    spline-resample onto a uniform grid, then apply the composite
    5-point Newton-Cotes rule 2h/45 * (7, 32, 12, 32, 14, ..., 7).
    Pure numpy; the Spark entry point is :func:`integrate_series`."""
    nx = len(x)
    if nx < 2:
        return 0.0
    nseg = nx - 1
    while nseg % 4 != 0:
        nseg += 1
    nint = nseg // 4
    xmin, xmax = float(np.min(x)), float(np.max(x))
    h = (xmax - xmin) / float(nseg)
    x_unif = np.linspace(xmin, xmax, nseg + 1)
    y2 = spline_second_derivs(x, y)
    z_unif = spline_eval(x, y, y2, x_unif)
    coef = np.array([7] + [32, 12, 32, 14] * (nint - 1) + [32, 12, 32, 7],
                    dtype="d")
    # SEQUENTIAL left-to-right accumulation (cumsum), not np.sum's
    # pairwise tree: makes the total order-pinned so a SQL ordered
    # aggregate reproduces it bit-for-bit
    return float(np.cumsum(z_unif * (2.0 * h * coef / 45.0))[-1])


def integrate_series(
    df: DataFrame,
    x_col: str,
    y_col: str,
    keys: list[str] | None = None,
) -> DataFrame:
    """Per-series tabulated integral (int_tabulated over each series'
    (x, y) samples) as a grouped Arrow UDF — the spline recurrence is
    inherently sequential per series, so it rides applyInPandas like
    the other §2.5 numerics; everything around it stays JVM-side.

    Output: one row per series — (*keys, integral double, n_points
    long).  Series with < 2 points integrate to 0.0 (reference
    behavior for degenerate input)."""
    keys = keys or SERIES_KEYS
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.select(*keys).schema]
        + ["integral double", "n_points long"]
    )

    def _integrate(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(x_col, kind="mergesort")
        x = pdf[x_col].to_numpy(dtype=np.float64)
        y = pdf[y_col].to_numpy(dtype=np.float64)
        keep = ~(np.isnan(x) | np.isnan(y))
        x, y = x[keep], y[keep]
        # collapse duplicate abscissae (keep first) — spl_init divides
        # by successive differences
        if len(x) > 1:
            uniq = np.concatenate([[True], np.diff(x) > 0])
            x, y = x[uniq], y[uniq]
        head = pdf.iloc[:1][list(keys)].reset_index(drop=True)
        head["integral"] = int_tabulated_np(x, y)
        head["n_points"] = int(len(x))
        return head

    return df.groupBy(*keys).applyInPandas(_integrate, schema=out_schema)
