"""spark-submit entry point: CDC maintenance of the tier store —
apply a batch of signed row-level changes (inserts AND deletes) to
the committed 1m/1h/1d tiers.

Usage:

    spark-submit --py-files dist/pyconform_spark.zip \
        jobs/cdc_job.py --changes /path/changes.parquet \
        --root /path/ckpt_root [--marker redaction-2024-01-07]

``changes.parquet`` carries the transcripts columns plus ``op``
(+1 insert, -1 delete); a delete row must match the ingested turn
exactly.  The batch is applied as TWO lineage markers —
``<marker>-d`` (deletes) then ``<marker>-i`` (inserts) — because a
mixed batch whose net turn delta is zero in some epoch is refused
(the crash-recovery fingerprint cannot distinguish pre from post),
and an all-same-sign half always carries a nonzero net.  Re-running
the job after a crash or after success is safe: each committed half
short-circuits on its marker, an uncommitted half rolls forward
through the write-audit-publish intent (pipeline.refresh_cdc).
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--changes", required=True, help="signed-change parquet")
    ap.add_argument("--root", required=True, help="checkpoint root directory")
    ap.add_argument(
        "--marker",
        help="idempotency key; reuse the same value on retries of one batch",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    from pyconform_spark import pipeline

    spark = (
        SparkSession.builder.appName("pyconform_spark-cdc")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    changes = spark.read.parquet(args.changes)
    out = {}
    for suffix, side in (("-d", -1), ("-i", 1)):
        mk = (args.marker + suffix) if args.marker else None
        half = changes.where(F.col("op") == side)
        out[suffix] = pipeline.refresh_cdc(spark, half, args.root, marker=mk)
    print(
        json.dumps(
            {
                "points_deleted_side": out["-d"],
                "points_inserted_side": out["-i"],
                "marker": args.marker,
            }
        )
    )


if __name__ == "__main__":
    main()
