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


def asof_join_directional(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """As-of join with kdb/pandas ``direction`` semantics: ``backward``
    (latest right <= left — same as :func:`asof_join`), ``forward``
    (earliest right >= left), or ``nearest`` (closer of the two,
    backward winning ties).

    Same union-sort formulation: one shuffle on the key; backward and
    forward are each one frame pass, nearest runs both passes over ONE
    union (two sorts, one Exchange — never a range cross-join).  Exact
    ties match in both directions (right rows order before left for
    the backward frame, after left for the forward frame).  Right
    (key, ts) pairs must be unique for determinism — pre-aggregate
    duplicates before calling."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    lcols = list(left.columns)
    rtypes = {c: right.schema[c].dataType for c in value_cols}
    tagged_l = left.select(
        *keys,
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_is_left"),
        F.lit(None).cast("long").alias("_rt"),
        *[F.lit(None).cast(rtypes[c]).alias(f"_r_{c}") for c in value_cols],
        F.struct(*lcols).alias("_row"),
    )
    tagged_r = right.select(
        *keys,
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_is_left"),
        F.unix_micros(F.col(right_ts).cast("timestamp")).alias("_rt"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
        F.lit(None).cast(tagged_l.schema["_row"].dataType).alias("_row"),
    )
    u = tagged_l.unionByName(tagged_r)
    # backward: right (_is_left=0) sorts before left at equal _t
    w_b = (
        Window.partitionBy(*keys)
        .orderBy("_t", "_is_left")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # forward: left sorts before right at equal _t -> order by the
    # NEGATED flag so the frame starting at a left row still reaches
    # an exact-tie right row
    w_f = (
        Window.partitionBy(*keys)
        .orderBy("_t", (F.lit(1) - F.col("_is_left")))
        .rowsBetween(0, Window.unboundedFollowing)
    )
    cols = ["*"]
    if direction in ("backward", "nearest"):
        cols += [
            F.last(F.col(f"_r_{c}"), ignorenulls=True).over(w_b).alias(f"_b_{c}")
            for c in value_cols
        ] + [F.last("_rt", ignorenulls=True).over(w_b).alias("_b_t")]
    if direction in ("forward", "nearest"):
        cols += [
            F.first(F.col(f"_r_{c}"), ignorenulls=True).over(w_f).alias(f"_f_{c}")
            for c in value_cols
        ] + [F.first("_rt", ignorenulls=True).over(w_f).alias("_f_t")]
    filled = u.select(*cols).where(F.col("_is_left") == 1)
    if direction == "backward":
        picked = [F.col(f"_b_{c}").alias(f"asof_{c}") for c in value_cols]
    elif direction == "forward":
        picked = [F.col(f"_f_{c}").alias(f"asof_{c}") for c in value_cols]
    else:
        l_t = F.unix_micros(F.col("_t").cast("timestamp"))
        use_b = F.col("_f_t").isNull() | (
            F.col("_b_t").isNotNull()
            & ((l_t - F.col("_b_t")) <= (F.col("_f_t") - l_t))
        )
        picked = [
            F.when(use_b, F.col(f"_b_{c}"))
            .otherwise(F.col(f"_f_{c}"))
            .alias(f"asof_{c}")
            for c in value_cols
        ]
    return filled.select(
        *[F.col("_row")[c].alias(c) for c in lcols], *picked
    )
