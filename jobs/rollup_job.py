"""spark-submit entry point: epoch-checkpointed tier rollup.

Usage (local):

    spark-submit --py-files dist/pyconform_spark.zip \
        jobs/rollup_job.py --input /path/transcripts.parquet \
        --output /path/ckpt_root

Usage (cluster): same, plus --master/--num-executors etc. on
spark-submit; the job code is identical (session.get_spark only
builds a master when spark-submit has not already set one).

Resumable: re-running after a failure skips every epoch whose lineage
was committed (pyconform_spark.pipeline).  Use --synth N to generate a
deterministic N-turn input instead of --input (demo/benchmarks).
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", help="transcripts parquet path")
    ap.add_argument("--synth", type=int, help="generate N synthetic turns instead")
    ap.add_argument("--output", required=True, help="checkpoint root directory")
    ap.add_argument("--epochs", type=int, nargs="*", help="explicit epoch ids")
    ap.add_argument(
        "--mode", choices=["batch", "per-epoch"], default="batch",
        help="batch = one raw scan per commit batch (backfills); "
        "per-epoch = finest resume granularity (incremental ingest)",
    )
    ap.add_argument("--epochs-per-commit", type=int, default=64)
    args = ap.parse_args()
    if not args.input and not args.synth:
        ap.error("one of --input / --synth is required")

    from pyspark.sql import SparkSession

    from pyconform_spark import pipeline, synth

    # under spark-submit the session (master, deploy mode) is already
    # configured; just attach and keep our analytics-relevant defaults
    spark = (
        SparkSession.builder.appName("pyconform_spark-rollup")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )

    tx = (
        synth.transcripts(spark, args.synth)
        if args.synth
        else spark.read.parquet(args.input)
    )
    if args.mode == "batch":
        results = pipeline.run_batch(
            spark, tx, args.output, epochs=args.epochs,
            epochs_per_commit=args.epochs_per_commit,
        )
    else:
        results = pipeline.run(spark, tx, args.output, epochs=args.epochs)
    summary = {
        "epochs": len(results),
        "skipped": sum(r.skipped for r in results),
        "computed": sum(not r.skipped for r in results),
        "points": {
            t: sum(r.points.get(t, 0) for r in results)
            for t in pipeline.TIER_ORDER
        },
    }
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
