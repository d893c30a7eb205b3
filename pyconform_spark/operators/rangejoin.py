"""Range (interval) join — point-in-interval matching at scale.

A naive ``l.ts BETWEEN r.start AND r.end`` join has no equi-key, so
Spark plans a BroadcastNestedLoopJoin — quadratic work and a broadcast
of one whole side, the classic 100 TB killer.  The scale shape is the
standard interval-bucketing trick (the same decomposition Flink/
Trino/KDB use for temporal joins): quantize time into fixed buckets,
EXPLODE each interval into the buckets it overlaps, and equi-join on
(keys…, bucket) before applying the exact range predicate.  Work is
then linear in points + interval-bucket overlaps, shuffles hash-
partition on the equi-key, and AQE/salting applies like any other
equi-join.

Bucket size is a throughput knob: too coarse → wide buckets behave
like mini cross-joins; too fine → long intervals explode into many
rows.  Pick ~ the median interval length (``bucket_seconds``).

Reference tie-in: the reference has no join operators at all
(SURVEY §2.8 — alignment is broadcast-by-dimension-name); this is one
of the beyond-reference operators the transcripts north rule adds
(as-of join's sibling for interval semantics).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _bucket(ts: Column, seconds: int) -> Column:
    sec = ts.cast("timestamp").cast("long")
    return (sec / seconds).cast("long")


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    keys: list[str],
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 86400,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row (same ``keys``) whose
    ``[start, end]`` (inclusive) contains its timestamp.

    Implementation: intervals explode to one row per overlapped
    bucket, points carry their bucket, and the join is a plain shuffle
    equi-join on (keys…, bucket) + the exact BETWEEN filter — no
    nested-loop, no broadcast of an unbounded side (plan-gated).  An
    interval spanning B buckets contributes B rows — bounded by
    ``ceil(len/bucket_seconds)+1``.

    ``how='inner'`` or ``'left_semi'`` (points with at least one
    matching interval); other types would need match-dedup semantics
    the caller should make explicit.
    """
    if how not in ("inner", "left_semi"):
        raise ValueError(
            f"range_join supports how='inner'|'left_semi', got {how!r}"
        )
    pb = points.withColumn("_bucket", _bucket(F.col(ts_col), bucket_seconds))
    ib = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                _bucket(F.col(start_col), bucket_seconds),
                _bucket(F.col(end_col), bucket_seconds),
            )
        ),
    )
    # full-precision comparison (timestamps carry microseconds; the
    # second-floor cast is only for BUCKETING, where truncation can at
    # worst include one extra candidate bucket that the filter rejects)
    cond = (F.col(ts_col) >= F.col(start_col)) & (
        F.col(ts_col) <= F.col(end_col)
    )
    joined = pb.join(ib, [*keys, "_bucket"], "inner").where(cond)
    # each (point, interval) pair joins at most once: the point sits in
    # exactly one bucket and the interval contributes that bucket once,
    # so 'inner' equals the naive BETWEEN join row for row
    if how == "left_semi":
        # semi semantics: points with >=1 matching interval, each once
        return joined.select(*points.columns).dropDuplicates(points.columns)
    return joined.drop("_bucket")


def window_join_stats(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    value_col: str,
    before_s: int,
    after_s: int,
) -> DataFrame:
    """kdb-style window join (``wj``): for each left row, aggregate
    the right rows of the same key whose timestamps fall in
    ``[left_ts - before_s, left_ts + after_s]`` (inclusive) — the
    "context around each event" primitive (quotes around each trade,
    tool calls around each error) that is neither an as-of join (one
    nearest row) nor an interval join (static intervals).

    Scalable form: tag and UNION both sides, then ONE value-range
    window frame (``rangeBetween`` over integer microseconds)
    per key — left rows carry NULL values so they never pollute the
    aggregates, and each left row reads count/sum/min/max of the
    right rows in its range.  One shuffle on the key, one key-local
    sort — never the |L| x |R| BETWEEN join the DuckDB twin runs
    (which is the independent-formulation oracle).  Empty windows
    yield count 0 and NULL sum/min/max, matching SQL aggregate
    semantics over zero rows."""
    from pyspark.sql import Window

    lcols = list(left.columns)
    vtype = right.schema[value_col].dataType
    tag_l = left.select(
        *keys,
        F.unix_micros(F.col(left_ts).cast("timestamp")).alias("_t"),
        F.lit(1).alias("_is_left"),
        F.lit(None).cast(vtype).alias("_v"),
        F.struct(*lcols).alias("_row"),
    )
    tag_r = right.select(
        *keys,
        F.unix_micros(F.col(right_ts).cast("timestamp")).alias("_t"),
        F.lit(0).alias("_is_left"),
        F.col(value_col).alias("_v"),
        F.lit(None).cast(tag_l.schema["_row"].dataType).alias("_row"),
    )
    u = tag_l.unionByName(tag_r)
    w = (
        Window.partitionBy(*keys)
        .orderBy("_t")
        .rangeBetween(-before_s * 1_000_000, after_s * 1_000_000)
    )
    filled = u.select(
        "_is_left",
        "_row",
        F.count("_v").over(w).alias("wj_count"),
        F.sum("_v").over(w).alias("wj_sum"),
        F.min("_v").over(w).alias("wj_min"),
        F.max("_v").over(w).alias("wj_max"),
    ).where(F.col("_is_left") == 1)
    return filled.select(
        *[F.col("_row")[c].alias(c) for c in lcols],
        "wj_count",
        "wj_sum",
        "wj_min",
        "wj_max",
    )
