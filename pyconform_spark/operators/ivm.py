"""Incremental view maintenance (IVM) for distributive aggregate
views: maintain ``SELECT keys, SUM/COUNT(...) FROM facts [JOIN dims]
GROUP BY keys`` under fact deltas without recomputing the full view.

The algebra behind every continuous aggregate in this engine
(pipeline.run's tier cascade, refresh_late's additive merge) made
explicit and reusable: a DELTA is a relation of (keys, measure
deltas) — positive for inserts, NEGATIVE for deletes/retractions —
and applying it is

    view' = SELECT keys, SUM(measure) FROM (view UNION ALL delta)
            GROUP BY keys   [drop groups whose count reaches 0]

which is associative and commutative, so deltas apply in any order,
batch by batch, and the result is bit-equal to recomputing from the
full fact table (pytest- and oracle-gated).

Scale shape: ``agg_delta`` is one map-side-combined hash aggregate
over the delta ONLY (never rescans the base facts); ``apply`` is one
hash aggregate over |view| + |delta| rows — at 100 TB the view is
orders of magnitude smaller than the facts, so maintenance cost is
O(delta + view), independent of history size.  Counts ride along so
fully-retracted groups delete exactly (SUM alone cannot distinguish
"sums to zero" from "no rows").

Measures must be exact types (longs / decimals) — float addition is
not associative, so a float view would drift from the recompute.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def agg_delta(
    facts_delta: DataFrame,
    keys: list[str],
    sum_cols: dict[str, str],
    sign: int = 1,
) -> DataFrame:
    """Reduce a batch of fact-level changes to a grouped delta.

    ``sum_cols`` maps output measure name -> input expression column.
    ``sign=-1`` builds a retraction delta (deletes).  The output
    carries ``ivm_count`` — the signed row count per group."""
    s = F.lit(sign)
    # Pin every measure to one decimal type so repeated apply() rounds
    # stay type-stable (Spark widens decimal precision per SUM, and a
    # drifting type would break the union in apply()).
    aggs = [
        F.sum(F.col(src) * s).cast("decimal(38,6)").alias(dst)
        for dst, src in sum_cols.items()
    ]
    aggs.append(F.sum(s).cast("long").alias("ivm_count"))
    return facts_delta.groupBy(*keys).agg(*aggs)


def apply(
    view: DataFrame,
    delta: DataFrame,
    keys: list[str],
    measure_cols: list[str],
) -> DataFrame:
    """Apply a grouped delta (from :func:`agg_delta`) to the
    materialized view; both carry (keys, measures, ivm_count).
    Groups whose count reaches zero disappear (exact retraction)."""
    cols = [*keys, *measure_cols, "ivm_count"]
    merged = (
        view.select(*cols)
        .unionByName(delta.select(*cols))
        .groupBy(*keys)
        .agg(
            *[
                F.sum(c).cast("decimal(38,6)").alias(c)
                for c in measure_cols
            ],
            F.sum("ivm_count").cast("long").alias("ivm_count"),
        )
    )
    return merged.where(F.col("ivm_count") > 0)
