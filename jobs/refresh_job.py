"""spark-submit entry point: incremental late-data refresh of the
tier store (continuous-aggregate maintenance).

Usage:

    spark-submit --py-files dist/pyconform_spark.zip \
        jobs/refresh_job.py --late /path/late_turns.parquet \
        --root /path/ckpt_root [--marker backfill-2024-01-07]

Merges the late batch additively into the committed 1m/1h/1d tiers
(pipeline.refresh_late): only the day-epochs present in the batch are
read back and rewritten; every untouched partition stays byte-
identical.  With --marker, re-running the same job after a crash OR
after success is safe — an already-committed marker short-circuits to
a no-op (the marker rides the lineage append that commits the merge).
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--late", required=True, help="late-turn parquet path")
    ap.add_argument("--root", required=True, help="checkpoint root directory")
    ap.add_argument(
        "--marker",
        help="idempotency key; reuse the same value on retries of one batch",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from pyconform_spark import pipeline

    spark = (
        SparkSession.builder.appName("pyconform_spark-refresh")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    late = spark.read.parquet(args.late)
    points = pipeline.refresh_late(spark, late, args.root, marker=args.marker)
    print(json.dumps({"points_written": points, "marker": args.marker}))


if __name__ == "__main__":
    main()
