"""spark-submit entry point: CDC maintenance of the tier store —
apply signed row-level changes (inserts AND deletes) to the committed
1m/1h/1d tiers.

Usage:

    spark-submit --py-files dist/pyconform_spark.zip \
        jobs/cdc_job.py --changes /path/changes.parquet \
        --root /path/ckpt_root [--marker redaction-2024-01-07]

    # a marker BACKLOG (e.g. a replayed CDC topic), squashed into two
    # lineage commits instead of 2N:
    spark-submit ... jobs/cdc_job.py --batched \
        --changes day1.parquet day2.parquet day3.parquet \
        --root /path/ckpt_root --marker replay-2024-01

Each ``changes`` parquet carries the transcripts columns plus ``op``
(+1 insert, -1 delete); a delete row must match the ingested turn
exactly.  Every batch is applied as TWO sides — deletes then inserts
— because a mixed batch whose net turn delta is zero in some epoch is
refused (the crash-recovery fingerprint cannot distinguish pre from
post), and an all-same-sign half always carries a nonzero net.

Single-file mode commits markers ``<marker>-d`` then ``<marker>-i``
(pipeline.refresh_cdc).  ``--batched`` mode commits ALL files' delete
halves as ONE staged publish under markers ``<marker>-b<i>-d`` and
then all insert halves under ``<marker>-b<i>-i``
(pipeline.refresh_cdc_batched) — the touched tier partitions are read
back and rewritten once per side instead of once per file.  If a later
file deletes a turn an earlier file inserts (a cross-file dependency a
replayed topic can carry), the combined delete side is refused before
any write and the job falls back to sequential per-file application
under the SAME markers (reported as ``sequential_fallback``).
Re-running
after a crash or success is safe either way: committed markers
short-circuit individually, an uncommitted publish rolls forward
through the write-audit-publish intent.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--changes",
        required=True,
        nargs="+",
        help="signed-change parquet path(s)",
    )
    ap.add_argument("--root", required=True, help="checkpoint root directory")
    ap.add_argument(
        "--marker",
        help="idempotency key; reuse the same value on retries of one batch",
    )
    ap.add_argument(
        "--batched",
        action="store_true",
        help="apply ALL change files per side as one staged publish "
        "(requires --marker)",
    )
    args = ap.parse_args()
    if args.batched and not args.marker:
        ap.error("--batched requires --marker (stable replay keys)")
    if len(args.changes) > 1 and not args.batched:
        ap.error("multiple --changes files require --batched")

    from pyspark.sql import SparkSession, functions as F

    from pyconform_spark import pipeline

    spark = (
        SparkSession.builder.appName("pyconform_spark-cdc")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    out = {}
    fell_back = False
    if args.batched:
        frames = [spark.read.parquet(p) for p in args.changes]

        def _sequential():
            # per-file, delete half then insert half — the order a
            # replayed topic was produced in; committed halves from
            # any earlier (batched or sequential) attempt no-op on
            # their markers
            acc = {"-d": None, "-i": None}
            for i, df in enumerate(frames):
                for suffix, side in (("-d", -1), ("-i", 1)):
                    pts = pipeline.refresh_cdc(
                        spark,
                        df.where(F.col("op") == side),
                        args.root,
                        marker=f"{args.marker}-b{i}{suffix}",
                    )
                    if acc[suffix] is None:
                        acc[suffix] = dict(pts)
                    else:
                        for t, v in pts.items():
                            acc[suffix][t] += v
            return acc

        try:
            for suffix, side in (("-d", -1), ("-i", 1)):
                batches = [
                    (
                        f"{args.marker}-b{i}{suffix}",
                        df.where(F.col("op") == side),
                    )
                    for i, df in enumerate(frames)
                ]
                out[suffix] = pipeline.refresh_cdc_batched(
                    spark, batches, args.root
                )
        except ValueError:
            # cross-file dependency: a later file deletes a turn an
            # earlier file inserts, so the combined delete side
            # retracts rows not yet in the store and the rail refuses
            # BEFORE the intent commit (store untouched).  Signed sums
            # commute only when every intermediate state is valid —
            # fall back to sequential per-file order.
            fell_back = True
            acc = _sequential()
            out["-d"], out["-i"] = acc["-d"], acc["-i"]
    else:
        changes = spark.read.parquet(args.changes[0])
        for suffix, side in (("-d", -1), ("-i", 1)):
            mk = (args.marker + suffix) if args.marker else None
            half = changes.where(F.col("op") == side)
            out[suffix] = pipeline.refresh_cdc(
                spark, half, args.root, marker=mk
            )
    print(
        json.dumps(
            {
                "points_deleted_side": out["-d"],
                "points_inserted_side": out["-i"],
                "marker": args.marker,
                "batched": args.batched,
                "sequential_fallback": fell_back,
                "n_files": len(args.changes),
            }
        )
    )


if __name__ == "__main__":
    main()
