"""As-of join: for each left row, the most recent right row at or
before its timestamp, per key — the canonical time-series join the
reference lacks (SURVEY.md §2.8) and a rollup engine needs (e.g. join
each tier bucket to the latest config/annotation in effect).

Implementation is the scalable union-sort formulation, NOT a range
cross-join: tag both sides, union, and take per-key
``last(right_value ignorenulls)`` over a window ordered by
``(ts, side)`` — one shuffle on the key, one sort, linear in
|L| + |R|.  Right rows sort before left rows at equal timestamps, so
an exact-tie right row IS matched (standard as-of <= semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    right_tie: str | None = None,
) -> DataFrame:
    """Return ``left`` plus, for each value col, the right side's value
    as of the latest ``right_ts <= left_ts`` within ``keys``.

    ``right_tie``: optional right-side column that breaks ties among
    right rows sharing a timestamp (largest wins) — makes the result
    fully deterministic."""
    lcols = [c for c in left.columns]
    tagged_l = left.select(
        *keys,
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast("long").alias("_tie"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
          for c in value_cols],
        F.struct(*lcols).alias("_row"),
    )
    tagged_r = right.select(
        *keys,
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        (F.col(right_tie).cast("long") if right_tie else F.lit(0).cast("long")).alias("_tie"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
        F.lit(None).cast(tagged_l.schema["_row"].dataType).alias("_row"),
    )
    u = tagged_l.unionByName(tagged_r)
    w = (
        Window.partitionBy(*keys)
        .orderBy("_t", "_side", F.col("_tie").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.select(
        "*",
        *[
            F.last(F.col(f"_r_{c}"), ignorenulls=True).over(w).alias(f"_asof_{c}")
            for c in value_cols
        ],
    ).where(F.col("_side") == 1)
    return filled.select(
        *[F.col("_row")[c].alias(c) for c in lcols],
        *[F.col(f"_asof_{c}").alias(f"asof_{c}") for c in value_cols],
    )
