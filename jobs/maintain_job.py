"""spark-submit maintenance entry point: cold-store compaction +
retention enforcement over an epoch-checkpointed tier store.

    spark-submit --py-files dist/pyconform_spark.zip \
        jobs/maintain_job.py --root /path/ckpt_root \
        [--compact-tier 1h] [--keep-1m 7 --keep-1h 90 --keep-1d -1] \
        [--purge-conv CONV_ID ... [--purge-marker KEY]]

Run it after (or on a schedule alongside) jobs/rollup_job.py:
optionally erases the named conversations end to end (raw day
partitions AND every tier — pipeline.purge_conversations; pass
--purge-marker to re-purge a conversation that was re-ingested after
an earlier purge), compacts the requested tier into
Gorilla/delta-of-delta blobs, then expires epochs beyond each tier's
horizon (-1 = keep forever).  Idempotent.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root", required=True, help="checkpoint root")
    ap.add_argument("--compact-tier", default=None, choices=["1m", "1h", "1d"])
    ap.add_argument("--keep-1m", type=int, default=7)
    ap.add_argument("--keep-1h", type=int, default=90)
    ap.add_argument("--keep-1d", type=int, default=-1)
    ap.add_argument("--now-epoch", type=int, default=-1)
    ap.add_argument("--purge-conv", nargs="+", default=None,
                    help="conversation ids to erase end to end")
    ap.add_argument("--purge-marker", default=None,
                    help="explicit idempotency key for --purge-conv")
    ap.add_argument("--verify", action="store_true",
                    help="audit tiers against the lineage ledger first")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from pyconform_spark import pipeline, retention

    spark = (
        SparkSession.builder.appName("pyconform_spark-maintain")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )

    out: dict = {}
    if args.purge_conv:
        out["purge"] = pipeline.purge_conversations(
            spark, args.root, args.purge_conv, marker=args.purge_marker
        )
    if args.verify:
        audit = pipeline.verify_store(spark, args.root).collect()
        out["verify"] = {
            "ok": sum(r.status == "ok" for r in audit),
            "mismatch": [(r.tier, r.epoch) for r in audit if r.status == "mismatch"],
            "missing": [(r.tier, r.epoch) for r in audit if r.status == "missing"],
            "orphan": [(r.tier, r.epoch) for r in audit if r.status == "orphan"],
        }
    if args.compact_tier:
        out["compaction"] = pipeline.compact_tier(spark, args.root, args.compact_tier)

    policy = retention.RetentionPolicy(
        {
            "1m": None if args.keep_1m < 0 else args.keep_1m,
            "1h": None if args.keep_1h < 0 else args.keep_1h,
            "1d": None if args.keep_1d < 0 else args.keep_1d,
        }
    )
    out["expired"] = retention.apply_retention(
        spark,
        args.root,
        policy,
        now_epoch=None if args.now_epoch < 0 else args.now_epoch,
    )
    out["live_epochs"] = {
        t: len(v) for t, v in retention.live_epochs(args.root).items()
    }
    print(json.dumps(out, default=str))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
