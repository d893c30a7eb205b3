"""Misra-Gries heavy hitters: sketch candidates, verify exactly.

The fourth mergeable sketch in the family (CMS estimates frequencies,
HLL cardinalities, the histogram sketch quantiles; Misra-Gries finds
the FREQUENT KEYS) — and the one whose two-pass composition makes the
output EXACT, not approximate:

1. **Sketch pass** — every partition reduces its rows to a k-entry
   Misra-Gries summary (Misra & Gries 1982; merged batch-at-a-time
   with the Agarwal et al. 2013 "subtract the (k+1)-th largest"
   mergeable-summary rule).  The guarantee: for every key,
   ``true_count - N/(k+1) <= sum_of_summaries <= true_count``, for ANY
   partitioning and ANY arrival order.
2. **Verify pass** — keys whose summed summary count could still reach
   the threshold (``>= T - N/(k+1)``) are a guaranteed SUPERSET of the
   true heavy hitters; one broadcast semi-join + exact count over just
   those candidates gives the exact answer.

Same shape as the LSH dedup stack (candidates from a sketch, exactness
from a verify walk): at 100 TB the first pass moves k rows per
partition (not |keys|), the second aggregates only candidate keys.

All batch arithmetic is vectorized pandas/numpy — per-UNIQUE-key work,
never per-row Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


def _mg_merge(acc: pd.Series, batch: pd.Series, k: int) -> pd.Series:
    """Merge a batch's value counts into a Misra-Gries summary of at
    most k entries.  When the union exceeds k keys, subtract the
    (k+1)-th largest count from every entry and drop the non-positive
    ones — the mergeable-summaries decrement (error added <= the
    subtracted value, total <= n_seen/(k+1))."""
    acc = acc.add(batch, fill_value=0) if len(acc) else batch.astype("float64")
    if len(acc) > k:
        d = np.sort(acc.values)[-(k + 1)]
        acc = acc - d
        acc = acc[acc > 0]
    return acc


def mg_summaries(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries summaries via mapInPandas.

    Output: one row per surviving key per partition
    ``(key, mg_count)`` plus ONE sentinel row per partition
    ``(NULL, n_partition_rows)`` so the caller can recover the global
    row count N (needed for the candidate threshold) without a second
    scan."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = pd.Series(dtype="float64")
        total = 0
        for pdf in batches:
            total += len(pdf)
            acc = _mg_merge(acc, pdf[key_col].value_counts(), k)
        keys = list(acc.index.to_numpy(dtype="int64"))
        counts = list(acc.values.astype("int64"))
        yield pd.DataFrame(
            {
                key_col: pd.array(keys + [None], dtype="Int64"),
                "mg_count": pd.array(counts + [0], dtype="Int64"),
                "part_rows": pd.array(
                    [0] * len(keys) + [total], dtype="Int64"
                ),
            }
        )

    return df.select(key_col).mapInPandas(
        gen, schema=f"{key_col} long, mg_count long, part_rows long"
    )


def heavy_hitters_exact(
    df: DataFrame, key_col: str, threshold: int, k: int
) -> DataFrame:
    """Exact keys with count >= threshold, found via the MG-candidate +
    verify composition.  Requires k > N/threshold for the superset
    guarantee to prune at all (any k is CORRECT — smaller k just means
    more candidates to verify)."""
    from pyspark.sql import Window

    # ONE aggregation serves both the per-key merge and the global row
    # count: sentinel rows (NULL key) land in their own group, and the
    # scalar N comes from an unpartitioned window over the merged
    # summary — a frame bounded by k x n_partitions (sketch design),
    # never by the data, so the single-partition window is safe.  A
    # second consumer of the summaries would re-run the sketch pass
    # (MapInPandas subtrees are not reused across plan branches).
    merged = mg_summaries(df, key_col, k).groupBy(key_col).agg(
        F.sum("mg_count").alias("mg_count"),
        F.sum("part_rows").alias("part_rows"),
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    n_total = F.sum("part_rows").over(w_all)
    # a true-count >= T key's summed summary is >= T - N/(k+1)
    cand = (
        merged.withColumn("n_total", n_total)
        .where(
            F.col(key_col).isNotNull()
            & (
                F.col("mg_count")
                >= F.lit(float(threshold))
                - F.col("n_total") / F.lit(float(k + 1))
            )
        )
        .select(key_col)
    )
    return (
        df.join(F.broadcast(cand), key_col)
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .where(F.col("n_rows") >= threshold)
    )
