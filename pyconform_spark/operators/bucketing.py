"""Ingest-time bucketing: the zero-shuffle tier cascade.

The tier rollups group by ``(conv_id, tool, role, bucket_start)`` —
every grouping set CONTAINS ``conv_id``.  A raw table written
``bucketBy(N, "conv_id")`` therefore already satisfies the clustered
distribution of every tier aggregate (Spark's rule: HashPartitioning
on a SUBSET of the grouping keys satisfies ClusteredDistribution —
all rows of a group share a conv_id, hence a bucket), so the 1m
rollup, the 1m→1h cascade, and the 1h→1d cascade all plan with ZERO
Exchange nodes: the shuffle that dominated the 100M-turn sustained
run (BASELINE.md round-4 section, mitigation 1) disappears at ingest.

Scale notes:

* bucket count should match target parallelism (one task per bucket
  per scan); at 10^12 turns pick N in the thousands so a bucket fits
  an executor's memory — the per-task state of the tier aggregate is
  then bounded by construction, no spill;
* ``sortBy(conv_id, ts)`` additionally makes per-series windows
  (gapfill, anomaly scoring) start from sorted runs;
* conv-keyed JOINS between two tables bucketed with the same N also
  plan shuffle-free (sort-merge on pre-sorted buckets);
* bucketing is the plain-parquet stand-in for Iceberg's
  ``bucket(N, conv_id)`` partition transform — the swap point is the
  writer only (pipeline._write_tier note).

Reference: PyConform parallelizes over output files (one variable per
MPI rank, dataflow.py:363-369); bucketing is the Spark-native
equivalent of pinning a series' data to a worker, decided once at
write time instead of per-job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table: str, n_buckets: int = 32, sort: bool = True
) -> None:
    """Write ``df`` as a parquet table bucketed by ``hash(conv_id)``
    (and per-bucket sorted by (conv_id, ts) when ``sort``)."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(
        n_buckets, "conv_id"
    )
    if sort:
        w = w.sortBy("conv_id", "ts")
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back WITH its bucketing metadata (the
    plain ``spark.read.parquet`` path would drop it)."""
    return spark.table(table)
