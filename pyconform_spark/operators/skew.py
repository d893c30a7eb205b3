"""Skew handling: heavy-key detection and salted two-stage aggregation.

The reference balances work statically by output-file byte size
(``WeightBalanced`` MPI partition, ``dataflow.py:282-296,363-369``).
At 10^12 turns the equivalent problem is hot conversations: a single
conv_id can hold millions of turns, so a plain
``groupBy(conv_id, ...)`` sends one reducer the whole key.  Two
complementary mechanisms:

* AQE skew-join splitting (on by default in session.py) handles skewed
  JOIN partitions at runtime.
* For AGGREGATES, :func:`salted_agg` does an explicit two-stage
  combine: stage 1 groups on (keys..., salt) — fanning each hot key
  out over ``n_salts`` reducers — stage 2 merges the partials.  Exact
  for decomposable aggregates (count/sum/min/max).  For the tier
  rollup the map-side partial aggregation Spark already performs makes
  salting redundant *when bucket cardinality is high*; salting matters
  for low-cardinality rollups (e.g. per-conv totals over all time).

``detect_heavy_keys`` finds keys above a row-share threshold so jobs
can log/act on skew (the observability half of the north rule's
"partitioning/shuffle/skew handled explicitly").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def detect_heavy_keys(
    df: DataFrame, keys: list[str], min_share: float = 0.001, max_keys: int = 1000
) -> DataFrame:
    """Keys holding more than ``min_share`` of all rows (approximate by
    exact count — one aggregate; at extreme scale swap in a sampled
    count with the same contract)."""
    total = df.count()
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .where(F.col("n_rows") >= max(1, int(total * min_share)))
        .orderBy(F.desc("n_rows"))
        .limit(max_keys)
    )


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 32,
) -> DataFrame:
    """Two-stage salted aggregation.

    ``aggs`` maps output column -> (input column, fn) where fn is one of
    count/sum/min/max.  Stage 1 aggregates on (keys, salt); stage 2
    merges partials on keys.  The salt is a deterministic hash of the
    full row spread (monotonically_increasing_id is per-partition
    monotonic => uniform across partitions and cheap).
    """
    merge_fn = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}
    salt = (F.monotonically_increasing_id() % n_salts).alias("_salt")
    stage1 = df.select(*keys, salt, *{c for c, _ in aggs.values() if c != "*"}).groupBy(
        *keys, "_salt"
    )
    stage1_aggs = []
    for out, (col, fn) in aggs.items():
        expr = F.count(F.lit(1)) if fn == "count" else getattr(F, fn)(col)
        stage1_aggs.append(expr.alias(out))
    partial = stage1.agg(*stage1_aggs)

    final_aggs = [
        getattr(F, merge_fn[fn])(out).alias(out) for out, (_, fn) in aggs.items()
    ]
    return partial.groupBy(*keys).agg(*final_aggs)


def repartition_by_series(
    df: DataFrame, keys: list[str], num_partitions: int | None = None
) -> DataFrame:
    """Co-locate each series on one partition ahead of window/stateful
    stages; combined with a salt column for the hottest keys when the
    downstream op is decomposable."""
    cols: list[Column] = [F.col(k) for k in keys]
    if num_partitions:
        return df.repartition(num_partitions, *cols)
    return df.repartition(*cols)


def skew_split_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    min_share: float = 0.001,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with explicit hot-key splitting: keys holding more
    than ``min_share`` of the left side are joined via BROADCAST of
    their (small) right-side slice, everything else through the normal
    shuffle join; results are unioned.

    This is the deterministic counterpart of AQE's skew-join splitting
    for the case AQE can't fix: a single hot key whose left rows exceed
    one executor's memory in a shuffle join.  The hot conversation's
    rows never shuffle at all — only its right-side match set moves.
    """
    heavy = detect_heavy_keys(left, keys, min_share=min_share)
    hot_keys = F.broadcast(heavy.select(*keys))

    left_hot = left.join(hot_keys, keys, "left_semi")
    left_cold = left.join(hot_keys, keys, "left_anti")
    right_hot = right.join(hot_keys, keys, "left_semi")

    hot_joined = left_hot.join(F.broadcast(right_hot), keys, how)
    cold_joined = left_cold.join(right, keys, how)
    return hot_joined.unionByName(cold_joined)
