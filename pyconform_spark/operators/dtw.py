"""Banded Dynamic Time Warping between per-series integer profiles.

DTW is the one alignment primitive the catalog's correlation suite
(Pearson/Spearman/lagged cross-correlation) cannot express: it scores
two series as the cheapest monotone warping path, tolerating local
time shifts.  The classic O(L^2) recurrence

    D(i,j) = |x_i - y_j| + min(D(i-1,j), D(i,j-1), D(i-1,j-1))

is inherently sequential in both indexes — no window frame or
self-join expresses it — so this is a textbook case for the grouped
Arrow UDF escape hatch (``applyInPandas``): each (series_a, series_b)
pair is ONE group carrying two length-L integer profiles, and the DP
runs vectorized-per-diagonal in numpy int64 inside the executor.  A
Sakoe-Chiba band (|i-j| <= r) bounds the state and forbids degenerate
all-to-one warpings.

Everything is integer-exact: profiles are event counts, the cost is
|a-b|, the DP adds BIGINTs — so the DuckDB twin (the same recurrence
unrolled as one chained CTE per anti-diagonal, predecessors joined
from the two previous diagonals) matches bit-for-bit; engines never
disagree on a float sum.

Scale shape: profiles reduce the raw table with one combiner-friendly
hash agg (group count), the pair frame is |series|^2 rows of
2L integers each — tiny — and pairs parallelize embarrassingly across
executors; the raw table is scanned exactly once.  At 10^6 series,
band the PAIRS (LSH/SAX prefilter, cf. ``motif_sax_pairs``) before
scoring; the scorer itself is unchanged.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

L = 24  # hour-of-day profile length
BAND = 6  # Sakoe-Chiba radius
_INF = np.int64(1) << 60


def hourly_profiles(events: DataFrame, key: str = "event_type") -> DataFrame:
    """One row per series: (key, profile array<long>[24]) of event
    counts by hour-of-day, dense (absent hours are 0)."""
    counts = events.groupBy(
        F.col(key).alias("series"), F.hour("ts").alias("h")
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    m = F.map_from_entries(F.collect_list(F.struct("h", "cnt")))
    return (
        counts.groupBy("series")
        .agg(m.alias("m"))
        .select(
            "series",
            F.transform(
                F.sequence(F.lit(0), F.lit(L - 1)),
                lambda h: F.coalesce(
                    F.element_at("m", h), F.lit(0).cast("long")
                ),
            ).alias("profile"),
        )
    )


def _dtw_band(x: np.ndarray, y: np.ndarray, r: int) -> int:
    """Banded DTW distance, pure int64; INF-padded dense DP table."""
    n = len(x)
    d = np.full((n + 1, n + 1), _INF, dtype=np.int64)
    d[0, 0] = 0
    for i in range(1, n + 1):
        lo = max(1, i - r)
        hi = min(n, i + r)
        for j in range(lo, hi + 1):
            c = abs(int(x[i - 1]) - int(y[j - 1]))
            best = min(d[i - 1, j], d[i, j - 1], d[i - 1, j - 1])
            d[i, j] = c + best if best < _INF else _INF
    return int(d[n, n])


def dtw_pairs(profiles: DataFrame, r: int = BAND) -> DataFrame:
    """All (a < b) series pairs scored by banded DTW; returns
    (series_a, series_b, dtw_dist)."""
    # the profile frame feeds BOTH sides of the pair join; a lazy
    # persist keeps the raw scan + profile aggregation to one run
    profiles = profiles.persist()
    a = profiles.select(
        F.col("series").alias("series_a"), F.col("profile").alias("pa")
    )
    b = profiles.select(
        F.col("series").alias("series_b"), F.col("profile").alias("pb")
    )
    pairs = a.join(
        F.broadcast(b), F.col("series_a") < F.col("series_b")
    )

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for row in pdf.itertuples(index=False):
            out.append(
                (
                    row.series_a,
                    row.series_b,
                    _dtw_band(
                        np.asarray(row.pa, dtype=np.int64),
                        np.asarray(row.pb, dtype=np.int64),
                        r,
                    ),
                )
            )
        return pd.DataFrame(
            out, columns=["series_a", "series_b", "dtw_dist"]
        )

    return pairs.groupBy("series_a", "series_b").applyInPandas(
        score, "series_a string, series_b string, dtw_dist long"
    )


def dtw_pairs_sql(length: int = L, r: int = BAND) -> str:
    """DuckDB twin: the same banded recurrence unrolled anti-diagonal
    by anti-diagonal as chained CTEs (diagonal s joins s-1 and s-2);
    cells outside the band never exist, so forbidden predecessors
    simply contribute nothing to the min.  Every CTE is MATERIALIZED:
    inlined, each diagonal would expand BOTH its predecessors and the
    plan would blow up 2^(2L) before execution."""
    steps = []
    for s in range(2, 2 * length + 1):
        steps.append(
            f"""d{s} AS MATERIALIZED (
  SELECT pair_id, i, j, cost + min(pd) AS d FROM (
    SELECT c.pair_id, c.i, c.j, c.cost, p.d AS pd
    FROM cells c JOIN d{s - 1} p ON p.pair_id = c.pair_id
      AND ((p.i = c.i - 1 AND p.j = c.j) OR (p.i = c.i AND p.j = c.j - 1))
    WHERE c.i + c.j = {s}
    UNION ALL
    SELECT c.pair_id, c.i, c.j, c.cost, p.d AS pd
    FROM cells c JOIN d{s - 2} p ON p.pair_id = c.pair_id
      AND p.i = c.i - 1 AND p.j = c.j - 1
    WHERE c.i + c.j = {s}
  ) GROUP BY pair_id, i, j, cost)"""
        )
    chain = ",\n".join(steps)
    return f"""
WITH counts AS MATERIALIZED (
  SELECT event_type AS series, extract(hour FROM ts)::INT AS h,
         count(*)::BIGINT AS cnt
  FROM events GROUP BY 1, 2),
grid AS (SELECT unnest(generate_series(0, {length - 1})) AS h),
prof AS MATERIALIZED (
  SELECT s.series, list(coalesce(c.cnt, 0) ORDER BY g.h) AS profile
  FROM (SELECT DISTINCT series FROM counts) s
  CROSS JOIN grid g
  LEFT JOIN counts c ON c.series = s.series AND c.h = g.h
  GROUP BY s.series),
pairs AS MATERIALIZED (
  SELECT a.series AS series_a, b.series AS series_b,
         a.profile AS pa, b.profile AS pb
  FROM prof a JOIN prof b ON a.series < b.series),
cells AS MATERIALIZED (
  SELECT series_a || '|' || series_b AS pair_id, gi.i, gj.j,
         abs(pa[gi.i] - pb[gj.j])::BIGINT AS cost
  FROM pairs
  CROSS JOIN (SELECT unnest(generate_series(1, {length})) AS i) gi
  CROSS JOIN (SELECT unnest(generate_series(1, {length})) AS j) gj
  WHERE abs(gi.i - gj.j) <= {r}),
d0 AS MATERIALIZED (
  SELECT DISTINCT pair_id, 0 AS i, 0 AS j, 0::BIGINT AS d FROM cells),
d1 AS MATERIALIZED (
  -- the cell grid starts at (1,1), so diagonal 1 is empty by
  -- construction; it exists only so the generated s=2 step can
  -- reference both predecessor diagonals uniformly
  SELECT pair_id, i, j, cost::BIGINT AS d FROM cells WHERE i + j = 1),
{chain}
SELECT split_part(pair_id, '|', 1) AS series_a,
       split_part(pair_id, '|', 2) AS series_b,
       d::BIGINT AS dtw_dist
FROM d{2 * length} WHERE i = {length} AND j = {length}
"""
