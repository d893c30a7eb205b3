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

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, Window, functions as F


def detect_heavy_keys(
    df: DataFrame,
    keys: list[str],
    min_share: float = 0.001,
    max_keys: int | None = 1000,
) -> DataFrame:
    """Keys holding more than ``min_share`` of all rows, in ONE pass
    over the raw table: the per-key counts and the grand total both
    derive from the same aggregate (total = sum over the tiny counts
    frame, broadcast back), never a second ``df.count()`` scan — at
    100 TB the old two-action shape was an extra full read.  Catalyst's
    ReuseExchange collapses the shared groupBy subtree, so the physical
    plan scans the source once.

    Deterministic: ties at the ``max_keys`` boundary break on the key
    columns, so repeated evaluation of this (lazy) plan always yields
    the same key set.  ``max_keys=None`` skips the sort+limit entirely
    (no single-partition gather) for callers that want the full set."""
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_rows"))
    total = counts.agg(F.sum("n_rows").alias("_total"))
    heavy = (
        counts.crossJoin(F.broadcast(total))
        .where(
            F.col("n_rows")
            >= F.greatest(F.lit(1), F.floor(F.col("_total") * min_share)).cast("long")
        )
        .drop("_total")
    )
    if max_keys is None:
        return heavy
    return heavy.orderBy(
        F.desc("n_rows"), *[F.asc(k) for k in keys]
    ).limit(max_keys)


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


def chunked_window(
    df: DataFrame,
    keys: list[str],
    order_cols: list[str],
    lookback: int,
    exprs: Callable[..., dict[str, Column]],
    ts_col: str = "ts",
    chunk_seconds: int = 7 * 86400,
) -> DataFrame:
    """Skew-parallel TRAILING window with exact tail borrowing — the
    window counterpart of :func:`skew_split_join`: a hot series no
    longer serializes through one task.

    Rows are cut into ``chunk_seconds`` time chunks; every chunk
    additionally BORROWS its series' nearest ``lookback`` predecessor
    rows ranked across ALL earlier chunks (so sparse chunks still hand
    complete context forward); ``exprs`` then runs over a window
    partitioned by (series, chunk) — a hot series spreads over #chunks
    tasks — and borrowed rows are dropped from the output.

    ``exprs(w)`` receives the (series, chunk) WindowSpec ordered by
    ``order_cols`` and returns {output column name -> Column}.  The
    CONTRACT that makes chunked output row-identical to the plain
    ``partitionBy(keys)`` window: every expression may depend only on
    the current row and its ``lookback`` nearest predecessors — i.e.
    frames within ``rowsBetween(-lookback, 0)``, ``lag(c, k)`` with
    k <= lookback, and ``row_number()`` only through the saturating
    form ``least(row_number(), lit(lookback + 1))`` (a row with >=
    lookback borrowed predecessors saturates identically under either
    partitioning; one with fewer borrowed ALL of them).

    Cost: the tails table is <= lookback rows per (series, chunk);
    fanning it to later chunks is quadratic in chunks-per-series,
    which retention bounds — negligible next to the raw scan.  Used by
    queries.anomaly_zscore_chunked and queries.ewma_chunked_frame,
    both oracle-checked against their sequential twins' DuckDB SQL;
    benched as the window_skew pair (2.3-4.2x on a 90%-hot series)."""
    data_cols = [c for c in df.columns]
    chunk = (
        F.col(ts_col).cast("timestamp").cast("long") / chunk_seconds
    ).cast("long")
    base = df.select(*data_cols, chunk.alias("_chunk"))

    desc_order = [F.desc(c) for c in order_cols]
    wd = Window.partitionBy(*keys, "_chunk").orderBy(*desc_order)
    tails = (
        base.withColumn("_rn", F.row_number().over(wd))
        .where(F.col("_rn") <= lookback)
        .select(*data_cols, "_chunk")
    ).alias("t")
    chunks = (
        base.select(*keys, F.col("_chunk").alias("_target")).distinct().alias("c")
    )
    cond = F.col("t._chunk") < F.col("c._target")
    for k in keys:
        cond = (F.col(f"t.{k}") == F.col(f"c.{k}")) & cond
    cand = tails.join(chunks, cond).select(
        *[F.col(f"t.{k}") for k in keys],
        *[F.col(f"t.{c}") for c in data_cols if c not in keys],
        F.col("c._target").alias("_target"),
    )
    wr = Window.partitionBy(*keys, "_target").orderBy(*desc_order)
    borrowed = (
        cand.withColumn("_rn2", F.row_number().over(wr))
        .where(F.col("_rn2") <= lookback)
        .select(
            *data_cols,
            F.col("_target").alias("_chunk"),
            F.lit(True).alias("_borrowed"),
        )
    )
    u = base.withColumn("_borrowed", F.lit(False)).unionByName(borrowed)
    w = Window.partitionBy(*keys, "_chunk").orderBy(*order_cols)
    computed = exprs(w)
    return (
        u.select(*data_cols, "_borrowed", *[c.alias(n) for n, c in computed.items()])
        .where(~F.col("_borrowed"))
        .drop("_borrowed")
    )


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

    Only ``inner`` and ``left`` joins are supported: for right/full
    joins the cold branch would re-emit hot-key right rows as
    null-padded unmatched rows (they match only in the hot branch), and
    semi/anti joins have the dual problem — so those are refused rather
    than silently corrupted.

    The heavy-key set is MATERIALIZED to the driver once (bounded by
    ``detect_heavy_keys``'s ``max_keys``) so all three semi/anti branch
    joins see the identical key set — re-evaluating a lazy limit-at-
    boundary plan per branch could classify a tie key hot in one branch
    and cold in another, dropping or duplicating rows.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"skew_split_join supports how='inner'|'left', got {how!r}: "
            "outer/semi/anti joins would duplicate or drop hot-key rows "
            "across the hot/cold branches"
        )
    key_schema = left.select(*keys).schema
    heavy_rows = detect_heavy_keys(left, keys, min_share=min_share).select(*keys).collect()
    if not heavy_rows:
        return left.join(right, keys, how)
    hot_keys = F.broadcast(left.sparkSession.createDataFrame(heavy_rows, key_schema))

    left_hot = left.join(hot_keys, keys, "left_semi")
    left_cold = left.join(hot_keys, keys, "left_anti")
    right_hot = right.join(hot_keys, keys, "left_semi")

    hot_joined = left_hot.join(F.broadcast(right_hot), keys, how)
    cold_joined = left_cold.join(right, keys, how)
    return hot_joined.unionByName(cold_joined)
