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
