"""Epoch-checkpointed rollup pipeline with per-partition lineage.

Reference analog: PyConform's writer commits one output file at a time
by writing ``<name>.tmp.nc`` and atomically renaming on close, and
keeps a per-variable chunk-dedup set so a chunk is never written twice
(``/root/reference/source/pyconform/flownodes.py:851-861,940-972``).
Recast for a table engine:

* the unit of commit is a **checkpoint epoch** — a day-aligned slice of
  the input time range (day-aligned so no 1m/1h/1d bucket ever spans
  two epochs and the cascade stays exact per-epoch);
* each epoch writes the 1m tier from raw, then 1h from 1m and 1d from
  1h (the cascade — raw data is scanned once per epoch);
* a **lineage table** records, per (tier, epoch, shuffle partition):
  input range, point count, committed-at ordinal.  The lineage append
  is the COMMIT POINT: an epoch whose data files exist but has no
  lineage rows is considered uncommitted and is rewritten (idempotent
  overwrite), which is exactly-once at epoch granularity;
* ``run`` called again resumes: committed epochs are skipped without
  touching raw data.

Storage here is plain parquet directories (``tiers/<tier>/epoch=<k>``)
— the sandbox stand-in for Iceberg partitioned tables, where the
lineage append would ride the same snapshot commit.  The layout is
partition-pruning friendly either way: readers of a time range open
only the epochs that intersect it.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from pyconform_spark.operators import rollup
from pyconform_spark.tables import SERIES_KEYS

EPOCH_SECONDS = 86400  # day-aligned commit unit
TIER_ORDER = ["1m", "1h", "1d"]

# the ledger's full row shape (tables.LINEAGE_SCHEMA, nullable-relaxed
# so tombstone/sentinel rows can carry Nones).  Kept explicit so
# commits that cannot derive a schema from data — e.g. a pure-tombstone
# purge on a legacy ledger written before commit_seq existed — still
# build full-width rows instead of failing against a narrower on-disk
# schema
from pyconform_spark.tables import LINEAGE_SCHEMA as _TABLES_LINEAGE_SCHEMA

_LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField(f.name, f.dataType, True)
        for f in _TABLES_LINEAGE_SCHEMA.fields
    ]
)


@dataclass
class EpochResult:
    epoch: int
    skipped: bool
    points: dict[str, int]  # tier -> point count (0 if skipped)


def _tier_path(root: str, tier: str, epoch: int) -> str:
    return os.path.join(root, "tiers", tier, f"epoch={epoch}")


def _lineage_path(root: str) -> str:
    return os.path.join(root, "lineage")


def _next_commit_seq(spark: SparkSession, root: str) -> int:
    """Monotone commit ordinal: max over the ledger + 1 (0 for a new
    store).  One tiny aggregate over the lineage table — the Iceberg
    analog is the snapshot id the commit rides anyway."""
    path = _lineage_path(root)
    if not os.path.isdir(path) or not any(
        f.endswith(".parquet") for f in os.listdir(path)
    ):
        return 0
    lin = spark.read.parquet(path)
    if "commit_seq" not in lin.columns:
        return 0
    row = lin.agg(F.max("commit_seq").alias("m")).first()
    return 0 if row["m"] is None else int(row["m"]) + 1


def list_epochs(transcripts: DataFrame) -> list[int]:
    """Distinct day-aligned epoch ids present in the input (one small
    aggregate over the raw table; at 10^12 turns this is the partition
    listing of the ``days(ts)``-partitioned Iceberg table, no scan)."""
    if "epoch_day" in transcripts.columns:
        # partition-column distinct = file listing, no data scan
        rows = transcripts.select(F.col("epoch_day").alias("epoch")).distinct().collect()
    else:
        rows = (
            transcripts.select(
                (F.col("ts").cast("timestamp").cast("long") / EPOCH_SECONDS)
                .cast("long")
                .alias("epoch")
            )
            .distinct()
            .collect()
        )
    return sorted(r["epoch"] for r in rows)


def committed_epochs(spark: SparkSession, root: str) -> set[int]:
    path = _lineage_path(root)
    if not os.path.isdir(path) or not any(
        f.endswith(".parquet") for f in os.listdir(path)
    ):
        return set()
    lin = spark.read.parquet(path)
    # an epoch is committed only if ALL tiers have lineage rows
    rows = (
        lin.groupBy("checkpoint_epoch")
        .agg(F.count_distinct("tier").alias("n_tiers"))
        .where(F.col("n_tiers") == len(TIER_ORDER))
        .collect()
    )
    return {r["checkpoint_epoch"] for r in rows}


def _write_tier(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").parquet(path)


def _lineage_rows(
    tier_df: DataFrame, tier: str, epoch: int, commit_seq: int = 0
) -> DataFrame:
    """Per-shuffle-partition lineage: (partition_id, tier, input range,
    epoch, point count, conv-id range) — the observability half of the
    commit, doubling as the pruning stats :func:`read_tier` consults
    (the Iceberg file-stats analog)."""
    return (
        tier_df.select(
            F.spark_partition_id().alias("partition_id"),
            F.col("bucket_start"),
            F.col("conv_id"),
        )
        .groupBy("partition_id")
        .agg(
            F.min("bucket_start").alias("input_range_start"),
            F.max("bucket_start").alias("input_range_end"),
            F.count(F.lit(1)).alias("point_count"),
            F.min("conv_id").alias("conv_id_min"),
            F.max("conv_id").alias("conv_id_max"),
        )
        .select(
            "partition_id",
            F.lit(tier).alias("tier"),
            "input_range_start",
            "input_range_end",
            F.lit(epoch).cast("long").alias("checkpoint_epoch"),
            F.col("point_count").cast("long").alias("point_count"),
            F.lit(None).cast("string").alias("refresh_marker"),
            F.lit(commit_seq).cast("long").alias("commit_seq"),
            "conv_id_min",
            "conv_id_max",
        )
    )


def _epoch_filter(df: DataFrame, epochs: list[int]) -> DataFrame:
    """Restrict to the given day-epochs.  If the frame carries the
    ``epoch_day`` partition column (ingest_raw layout), filter on IT so
    the scan prunes partitions; otherwise fall back to a ts-range
    predicate (row-group pruning only)."""
    if "epoch_day" in df.columns:
        return df.where(F.col("epoch_day").isin(epochs)).drop("epoch_day")
    ts_long = F.col("ts").cast("timestamp").cast("long")
    return df.where((ts_long / EPOCH_SECONDS).cast("long").isin(epochs))


def run(
    spark: SparkSession,
    transcripts: DataFrame,
    root: str,
    epochs: list[int] | None = None,
) -> list[EpochResult]:
    """Roll up every (requested) epoch, resuming past committed ones.

    Returns one :class:`EpochResult` per epoch.  Safe to re-run after a
    crash at any point: the lineage append is the commit.
    """
    os.makedirs(root, exist_ok=True)
    epochs = epochs if epochs is not None else list_epochs(transcripts)
    done = committed_epochs(spark, root)
    results: list[EpochResult] = []

    for epoch in epochs:
        if epoch in done:
            results.append(EpochResult(epoch, True, {t: 0 for t in TIER_ORDER}))
            continue

        sl = _epoch_filter(transcripts, [epoch])

        points: dict[str, int] = {}
        lineage_parts: list[DataFrame] = []
        seq = _next_commit_seq(spark, root)

        t1m = rollup.tier_rollup(sl, "1m")
        _write_tier(t1m, _tier_path(root, "1m", epoch))
        prev = spark.read.parquet(_tier_path(root, "1m", epoch))
        lineage_parts.append(_lineage_rows(prev, "1m", epoch, seq))
        points["1m"] = prev.count()

        for tier in ("1h", "1d"):
            td = rollup.cascade_rollup(prev, tier)
            _write_tier(td, _tier_path(root, tier, epoch))
            prev = spark.read.parquet(_tier_path(root, tier, epoch))
            lineage_parts.append(_lineage_rows(prev, tier, epoch, seq))
            points[tier] = prev.count()

        # ---- commit point: append lineage for all three tiers at once
        lin = lineage_parts[0]
        for extra in lineage_parts[1:]:
            lin = lin.unionByName(extra)
        lin.coalesce(1).write.mode("append").parquet(_lineage_path(root))

        results.append(EpochResult(epoch, False, points))
    return results


# memo for _tier_epoch_stats keyed by (root, tier, ledger file
# signature): the ledger only changes by appending files at commit
# points, so an unchanged file listing means unchanged stats —
# repeated point reads re-pay nothing
_EPOCH_STATS_CACHE: dict[tuple, dict[int, tuple]] = {}


def _tier_epoch_stats(
    spark: SparkSession, root: str, tier: str
) -> dict[int, tuple]:
    """Per-epoch pruning stats from the LATEST lineage generation of
    each (tier, epoch): ``{epoch: (bs_min, bs_max, conv_min,
    conv_max)}`` — the Iceberg manifest-stats analog over the epoch
    ledger.  Any None inside a tuple means that bound is unknown for
    the epoch (legacy ledger rows, or a generation whose only rows are
    sentinels), which disables pruning for that epoch, never
    correctness.

    Metadata-sized and metadata-priced: ONE narrow collect of the
    (tiny, driver-coalesced) ledger with the latest-generation fold in
    Python — no shuffle, no self-join — memoized on the ledger's file
    listing so repeated point reads cost nothing."""
    path = _lineage_path(root)
    if not os.path.isdir(path):
        return {}
    sig = (root, tier, tuple(sorted(os.listdir(path))))
    hit = _EPOCH_STATS_CACHE.get(sig)
    if hit is not None:
        return hit
    lin = lineage(spark, root)
    if "conv_id_min" not in lin.columns or "commit_seq" not in lin.columns:
        _EPOCH_STATS_CACHE[sig] = {}
        return {}
    rows = (
        lin.where(F.col("tier") == tier)
        .select(
            "checkpoint_epoch",
            "commit_seq",
            "input_range_start",
            "input_range_end",
            "conv_id_min",
            "conv_id_max",
            "point_count",
        )
        .collect()
    )
    latest: dict[int, int] = {}
    for r in rows:
        e = int(r["checkpoint_epoch"])
        s = int(r["commit_seq"] or 0)
        if e not in latest or s > latest[e]:
            latest[e] = s
    # fold the latest generation per epoch; sentinel/tombstone rows
    # (point_count 0, null stats) are skipped, but a DATA row missing
    # a bound (legacy) voids the epoch's bounds entirely
    out: dict[int, tuple] = {}
    unknown: set[int] = set()
    for r in rows:
        e = int(r["checkpoint_epoch"])
        if int(r["commit_seq"] or 0) != latest[e]:
            continue
        if not r["point_count"]:
            out.setdefault(e, (None, None, None, None))
            continue
        if r["input_range_start"] is None or r["conv_id_min"] is None:
            unknown.add(e)
            continue
        cur = out.get(e)
        if cur is None or cur[0] is None:
            out[e] = (
                r["input_range_start"],
                r["input_range_end"],
                r["conv_id_min"],
                r["conv_id_max"],
            )
        else:
            out[e] = (
                min(cur[0], r["input_range_start"]),
                max(cur[1], r["input_range_end"]),
                min(cur[2], r["conv_id_min"]),
                max(cur[3], r["conv_id_max"]),
            )
    for e in unknown:
        out[e] = (None, None, None, None)
    _EPOCH_STATS_CACHE[sig] = out
    return out


def _prune_epochs_by_stats(
    epochs: list[int],
    stats: dict[int, tuple],
    conv_id: str | None,
    bucket_range: tuple | None,
) -> list[int]:
    """Drop epochs whose ledger key ranges cannot match the predicate;
    epochs with unknown bounds are always kept."""
    if not stats or (conv_id is None and bucket_range is None):
        return epochs
    keep = []
    for e in epochs:
        st = stats.get(e)
        if st is None:
            keep.append(e)
            continue
        bs_min, bs_max, cv_min, cv_max = st
        if (
            conv_id is not None
            and cv_min is not None
            and cv_max is not None
            and not (cv_min <= conv_id <= cv_max)
        ):
            continue
        if (
            bucket_range is not None
            and bs_min is not None
            and bs_max is not None
        ):
            lo, hi = bucket_range
            if (hi is not None and bs_min > hi) or (
                lo is not None and bs_max < lo
            ):
                continue
        keep.append(e)
    return keep


def _apply_key_predicates(
    df: DataFrame, conv_id: str | None, bucket_range: tuple | None
) -> DataFrame:
    if conv_id is not None:
        df = df.where(F.col("conv_id") == conv_id)
    if bucket_range is not None:
        lo, hi = bucket_range
        if lo is not None:
            df = df.where(F.col("bucket_start") >= F.lit(lo))
        if hi is not None:
            df = df.where(F.col("bucket_start") <= F.lit(hi))
    return df


def read_tier(
    spark: SparkSession,
    root: str,
    tier: str,
    conv_id: str | None = None,
    bucket_range: tuple | None = None,
) -> DataFrame:
    """All committed epochs of a tier (uncommitted data dirs excluded).

    ``conv_id`` / ``bucket_range=(lo, hi)`` (inclusive bounds, either
    side None for open) are KEY PREDICATES: they are applied as WHERE
    filters, and additionally prune whole epoch directories whose
    ledger-recorded (conv_id, bucket_start) ranges cannot match —
    BEFORE Spark ever lists them (the Iceberg manifest-pruning analog:
    a point read on a year-long store opens only the epochs that can
    hold the key, pinned by test_point_read_opens_only_matching_epochs
    and the layout_scan bench pair).  Semantics are identical to the
    unpruned read plus the same WHERE."""
    done = committed_epochs(spark, root)
    eps = sorted(done)
    if conv_id is not None or bucket_range is not None:
        eps = _prune_epochs_by_stats(
            eps, _tier_epoch_stats(spark, root, tier), conv_id, bucket_range
        )
    paths = [
        _tier_path(root, tier, e)
        for e in eps
        if os.path.isdir(_tier_path(root, tier, e))
    ]
    if not paths:
        if conv_id is not None or bucket_range is not None:
            # every epoch pruned: empty result with the tier schema
            from pyconform_spark.tables import TIER_SCHEMA

            return spark.createDataFrame([], TIER_SCHEMA)
        raise FileNotFoundError(f"no committed epochs for tier {tier} under {root}")
    return _apply_key_predicates(
        spark.read.parquet(*paths), conv_id, bucket_range
    )


def read_tier_as_of(
    spark: SparkSession, root: str, tier: str, as_of_epoch: int
) -> DataFrame:
    """Snapshot read: only epochs committed AT OR BEFORE the given
    checkpoint epoch — the Iceberg time-travel analog over the epoch
    ledger (the lineage table is the snapshot log; an epoch is visible
    exactly when its lineage rows are committed, so every reader sees
    a consistent prefix of the ingest history)."""
    done = {e for e in committed_epochs(spark, root) if e <= as_of_epoch}
    paths = [
        _tier_path(root, tier, e)
        for e in sorted(done)
        if os.path.isdir(_tier_path(root, tier, e))
    ]
    if not paths:
        raise FileNotFoundError(
            f"no epochs committed at or before {as_of_epoch} for tier "
            f"{tier} under {root}"
        )
    return spark.read.parquet(*paths)


def lineage(spark: SparkSession, root: str) -> DataFrame:
    return spark.read.parquet(_lineage_path(root))


def _bucketed_source(
    spark: SparkSession, sl: DataFrame, n_buckets: int, table: str
) -> DataFrame:
    """Stage a batch slice as a hash(conv_id)-bucketed table and read
    it back WITH bucketing metadata — the ingest-time shuffle that
    makes every tier aggregate of the batch plan with ZERO Exchange
    nodes (operators/bucketing.py; plan-gated by
    test_run_batch_bucketed_cascade_plans_zero_exchange)."""
    from pyconform_spark.operators import bucketing

    bucketing.write_bucketed(sl, table, n_buckets)
    return bucketing.read_bucketed(spark, table)


def run_batch(
    spark: SparkSession,
    transcripts: DataFrame,
    root: str,
    epochs: list[int] | None = None,
    epochs_per_commit: int = 64,
    bucketed: bool = False,
    n_buckets: int | None = None,
) -> list[EpochResult]:
    """Batched epoch processing: ONE scan of the raw table per commit
    batch regardless of how many epochs it spans (``run`` scans once
    per epoch — fine for incremental ingest, quadratic for backfills).

    The tier frames carry an ``epoch`` partition column and are written
    with dynamic partition overwrite into the same
    ``tiers/<tier>/epoch=<k>`` layout ``run`` uses, so the two modes
    interoperate and ``read_tier`` is unchanged.  Lineage for the whole
    batch is appended at the end — the commit point; a crash mid-batch
    leaves only uncommitted partition dirs, which the next run
    overwrites (same exactly-once contract, batch granularity).

    ``bucketed=True`` routes each batch through the proven
    zero-Exchange cascade (``operators/bucketing.py``): the slice is
    staged once as a ``bucketBy(n_buckets, conv_id)`` table (the
    ingest-time cost), the 1m aggregate then plans with no shuffle,
    and the 1h/1d tiers cascade from the PERSISTED in-memory 1m/1h
    frames (whose clustered partitioning they inherit) instead of the
    plain read-back — zero Exchange end to end.  Tier rows are
    bit-identical to the default path (integer sums compose;
    pytest-pinned); at the measured group≈row density this was the
    2.6x structural-spill win of the sustained 100M-turn run."""
    os.makedirs(root, exist_ok=True)
    all_epochs = epochs if epochs is not None else list_epochs(transcripts)
    done = committed_epochs(spark, root)
    pending = [e for e in all_epochs if e not in done]
    results: list[EpochResult] = [
        EpochResult(e, True, {t: 0 for t in TIER_ORDER})
        for e in all_epochs
        if e in done
    ]

    epoch_col = (
        F.col("bucket_start").cast("timestamp").cast("long") / EPOCH_SECONDS
    ).cast("long")

    for i in range(0, len(pending), epochs_per_commit):
        batch = pending[i : i + epochs_per_commit]
        seq = _next_commit_seq(spark, root)
        sl = _epoch_filter(transcripts, batch)

        staged_table = None
        cached: list[DataFrame] = []
        if bucketed:
            n = n_buckets or int(
                spark.conf.get("spark.sql.shuffle.partitions")
            )
            staged_table = (
                "pyconform_ingest_"
                + hashlib.sha256(
                    f"{root}:{batch[0]}:{batch[-1]}".encode()
                ).hexdigest()[:16]
            )
            sl = _bucketed_source(spark, sl, n, staged_table)

        lineage_parts: list[DataFrame] = []
        counts: dict[str, dict[int, int]] = {}
        source = sl  # raw transcripts feed the 1m tier; tiers cascade after

        for tier in TIER_ORDER:
            td = (
                rollup.tier_rollup(source, tier)
                if tier == "1m"
                else rollup.cascade_rollup(source, tier)
            )
            if bucketed:
                # cache the tier frame WITH its clustered partitioning:
                # the next tier cascades from it shuffle-free, and the
                # write below materializes it exactly once
                td = td.persist()
                cached.append(td)
            tier_frame = td
            td = td.withColumn("epoch", epoch_col)
            base = os.path.join(root, "tiers", tier)
            (
                td.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("epoch")
                .parquet(base)
            )
            # read back just the batch's partitions: lineage + counts
            # come from the files actually written, and the next tier
            # cascades from them (epoch pruning keeps this one batch)
            written = spark.read.parquet(base).where(F.col("epoch").isin(batch))
            lineage_parts.append(
                written.select(
                    F.spark_partition_id().alias("partition_id"),
                    "bucket_start",
                    "conv_id",
                    "epoch",
                )
                .groupBy("epoch", "partition_id")
                .agg(
                    F.min("bucket_start").alias("input_range_start"),
                    F.max("bucket_start").alias("input_range_end"),
                    F.count(F.lit(1)).alias("point_count"),
                    F.min("conv_id").alias("conv_id_min"),
                    F.max("conv_id").alias("conv_id_max"),
                )
                .select(
                    "partition_id",
                    F.lit(tier).alias("tier"),
                    "input_range_start",
                    "input_range_end",
                    F.col("epoch").cast("long").alias("checkpoint_epoch"),
                    F.col("point_count").cast("long").alias("point_count"),
                    F.lit(None).cast("string").alias("refresh_marker"),
                    F.lit(seq).cast("long").alias("commit_seq"),
                    "conv_id_min",
                    "conv_id_max",
                )
            )
            counts[tier] = {
                r["epoch"]: r["n"]
                for r in written.groupBy("epoch")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
            # bucketed mode cascades from the cached in-memory frame
            # (clustered partitioning preserved => no Exchange);
            # default mode cascades from the files actually written
            source = tier_frame if bucketed else written.drop("epoch")

        # ---- commit point for the whole batch
        lin_all = lineage_parts[0]
        for extra in lineage_parts[1:]:
            lin_all = lin_all.unionByName(extra)
        lin_all.coalesce(1).write.mode("append").parquet(_lineage_path(root))

        for c in cached:
            c.unpersist()
        if staged_table is not None:
            spark.sql(f"DROP TABLE IF EXISTS {staged_table}")

        for e in batch:
            results.append(
                EpochResult(
                    e, False, {t: counts[t].get(e, 0) for t in TIER_ORDER}
                )
            )
    return sorted(results, key=lambda r: r.epoch)


def ingest_raw(
    transcripts: DataFrame, root: str, buckets: int | None = None
) -> str:
    """Land raw transcripts partitioned by day (``epoch_day=``), the
    parquet stand-in for Iceberg's ``days(ts)`` partition transform.

    Epoch-sliced reads (run / run_batch) over this layout prune to the
    day directories instead of scanning the table — at 10^12 turns the
    difference between touching one day and touching three years.
    ``buckets`` optionally pre-shuffles by hash(conv_id) so each
    partition dir holds a bounded number of well-mixed files
    (the ``bucket(conv_id)`` transform analog).
    """
    path = os.path.join(root, "raw")
    day = (
        F.col("ts").cast("timestamp").cast("long") / EPOCH_SECONDS
    ).cast("long")
    df = transcripts.withColumn("epoch_day", day)
    if buckets:
        df = df.repartition(buckets, F.col("epoch_day"), F.col("conv_id"))
    df.write.mode("overwrite").partitionBy("epoch_day").parquet(path)
    return path


def read_raw(spark: SparkSession, root: str) -> DataFrame:
    """Read the partitioned raw store with the transcripts schema
    (epoch_day is a partition column used for pruning only)."""
    return spark.read.parquet(os.path.join(root, "raw"))


def epoch_slice(raw: DataFrame, epochs: list[int]) -> DataFrame:
    """Epoch filter expressed on the partition column => partition
    pruning (no data files outside the epochs are opened)."""
    return raw.where(F.col("epoch_day").isin(epochs)).drop("epoch_day")


def compact_tier(
    spark: SparkSession,
    root: str,
    tier: str = "1m",
    value_cols: list[str] | None = None,
    min_points: int = 8,
) -> dict:
    """HYBRID cold-store compaction: committed epochs of a tier are
    re-encoded as Gorilla/delta-of-delta blobs, one blob row per
    (series, epoch) (``cold/<tier>/epoch=<k>``) — but only for series
    with >= ``min_points`` points in the epoch.  Blob headers cost ~40
    bytes per series; below ``min_points`` (short conversations — the
    bulk of a Zipf transcript corpus) the points stay as plain parquet
    rows in ``cold/<tier>_sparse`` where columnar encoding is already
    optimal.  Returns size stats incl. the sparse row count.

    Retention interplay: expire the hot parquet tier dirs with
    ``retention.apply_retention`` once the cold copy exists; the read
    path (:func:`read_cold_tier`) unions both halves bit-exactly.
    """
    from pyconform_spark.operators import codec

    value_cols = value_cols or ["turn_rate", "text_len_avg"]
    done = sorted(committed_epochs(spark, root))
    src = read_tier(spark, root, tier)

    epoch_col = (
        F.col("bucket_start").cast("timestamp").cast("long") / EPOCH_SECONDS
    ).cast("long")
    from pyspark.sql import Window as _W

    npts = F.count(F.lit(1)).over(
        _W.partitionBy(*SERIES_KEYS, epoch_col)
    )
    marked = src.withColumn("_npts", npts)
    dense = marked.where(F.col("_npts") >= min_points).drop("_npts")
    sparse = marked.where(F.col("_npts") < min_points).drop("_npts")

    sparse_base = os.path.join(root, "cold", f"{tier}_sparse")
    (
        sparse.select(*SERIES_KEYS, "bucket_start", *value_cols)
        .withColumn("epoch", epoch_col)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("epoch")
        .parquet(sparse_base)
    )
    n_sparse = spark.read.parquet(sparse_base).count()

    blobs = codec.compress_tier_packed(
        dense, value_cols, keys=SERIES_KEYS, chunk_seconds=EPOCH_SECONDS
    )
    epoch = (
        F.col("chunk_start").cast("timestamp").cast("long") / EPOCH_SECONDS
    ).cast("long")
    base = os.path.join(root, "cold", tier)
    (
        blobs.withColumn("epoch", epoch)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("epoch")
        .parquet(base)
    )
    stats = (
        spark.read.parquet(base)
        .agg(
            F.count(F.lit(1)).alias("n_blobs"),
            F.sum("n_points").alias("n_points"),
            F.sum("raw_bytes").alias("raw_bytes"),
            F.sum("enc_bytes").alias("enc_bytes"),
        )
        .first()
    )
    return {
        "epochs": len(done),
        "n_blobs": stats["n_blobs"] or 0,
        "n_points": (stats["n_points"] or 0) + n_sparse,
        "n_blob_points": stats["n_points"] or 0,
        "n_sparse_points": n_sparse,
        "raw_bytes": stats["raw_bytes"] or 0,
        "enc_bytes": stats["enc_bytes"] or 0,
        "ratio": (stats["enc_bytes"] or 0) / max(stats["raw_bytes"] or 0, 1),
    }


def read_cold_tier(
    spark: SparkSession,
    root: str,
    tier: str = "1m",
    value_cols: list[str] | None = None,
) -> DataFrame:
    from pyconform_spark.operators import codec

    value_cols = value_cols or ["turn_rate", "text_len_avg"]
    base = os.path.join(root, "cold", tier)
    blobs = spark.read.parquet(base)
    dense = codec.decompress_tier(blobs, value_cols, keys=SERIES_KEYS)
    sparse_base = os.path.join(root, "cold", f"{tier}_sparse")
    if os.path.isdir(sparse_base):
        sparse = (
            spark.read.parquet(sparse_base)
            .drop("epoch")
            .select(*SERIES_KEYS, "bucket_start", *value_cols)
        )
        dense = dense.unionByName(sparse)
    return dense


def _refresh_dirs(root: str) -> tuple[str, str, str]:
    return (
        os.path.join(root, "refresh_intents"),
        os.path.join(root, "refresh_staging"),
        os.path.join(root, "refresh_trash"),
    )


def _safe_marker(marker: str) -> str:
    return "".join(c if c.isalnum() or c in "-_." else "_" for c in marker)


def _partition_turn_sum(spark: SparkSession, path: str) -> int | None:
    """sum(turn_count) of one live epoch partition dir, or None if the
    partition has no data files.  The refresh fingerprint: every late
    delta adds >= 1 turn, so pre-merge and post-merge sums ALWAYS
    differ and classify a partition as published/unpublished exactly."""
    if not os.path.isdir(path) or not any(
        f.endswith(".parquet") for f in os.listdir(path)
    ):
        return None
    row = spark.read.parquet(path).agg(F.sum("turn_count").alias("s")).first()
    return None if row["s"] is None else int(row["s"])


def _swap_in(
    staged: str, live: str, trash: str, allow_empty: bool = False
) -> None:
    """Publish one staged partition dir over the live one.  The staged
    copy is duplicated first (so recovery can always re-publish), the
    old live dir is moved to trash, and the copy renamed into place —
    a crash at any point leaves either old-live, missing-live, or
    new-live, all of which recovery classifies and repairs.

    With ``allow_empty``, a MISSING staged dir is an empty publish:
    the merge dropped every bucket of the partition (a CDC purge of a
    whole epoch writes no ``epoch=<k>`` dir at all), so publishing
    means REMOVING the live dir — the same to-trash move, nothing
    renamed in.  Callers must opt in ONLY where an empty result is a
    legal outcome of the staged computation (a purge's zero-sum
    fingerprint, a raw day wholly owned by erased conversations);
    everywhere else a missing staged dir is a lost staging tree and
    raises instead of silently deleting live data."""
    if not os.path.isdir(staged):
        if not allow_empty:
            raise RuntimeError(
                f"_swap_in: staged dir {staged} is missing and the "
                "caller did not declare an empty publish — refusing "
                "to remove the live partition"
            )
        if os.path.isdir(live):
            os.makedirs(trash, exist_ok=True)
            dst = os.path.join(
                trash,
                os.path.basename(os.path.dirname(live))
                + "-"
                + os.path.basename(live),
            )
            if os.path.isdir(dst):
                shutil.rmtree(dst)
            os.rename(live, dst)
        return
    tmp = live + ".publish-tmp"
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    os.makedirs(os.path.dirname(live), exist_ok=True)
    shutil.copytree(staged, tmp)
    if os.path.isdir(live):
        os.makedirs(trash, exist_ok=True)
        dst = os.path.join(trash, os.path.basename(os.path.dirname(live)) + "-" + os.path.basename(live))
        if os.path.isdir(dst):
            shutil.rmtree(dst)
        os.rename(live, dst)
    os.rename(tmp, live)


def _commit_refresh_lineage(
    spark: SparkSession,
    root: str,
    marker: str | None,
    rows: list[dict],
    seq: int,
    extra_markers: tuple[str, ...] | list[str] = (),
) -> dict[str, int]:
    """The refresh COMMIT: one lineage append covering every published
    (tier, epoch), carrying the idempotency marker.  Lineage is derived
    from the files actually on disk (back-read of the touched
    partitions), so recovery can rebuild it without the original
    delta.

    ``extra_markers`` (batched refresh): additional idempotency
    markers that rode the SAME publish — each is recorded as one
    zero-point sentinel row (``partition_id = -1``, ``point_count =
    0``) on a (tier, epoch) this commit already covers, so
    :func:`applied_refresh_markers` sees every marker while
    :func:`verify_store`'s per-epoch point sums are unchanged (+0 to
    an epoch the commit owns at the same commit_seq)."""
    by_tier: dict[str, list[int]] = {}
    for r in rows:
        by_tier.setdefault(r["tier"], []).append(r["epoch"])
    written_points: dict[str, int] = {t: 0 for t in TIER_ORDER}
    lineage_parts: list[DataFrame] = []
    tombstones: list[tuple[str, int]] = []
    for tier, eps in by_tier.items():
        base = os.path.join(root, "tiers", tier)
        # the base dir may be missing (whole tier purged on a young
        # store), or may EXIST but hold zero epoch dirs (the purge
        # removed every partition but the parent remains) — reading
        # parquet from either would throw AFTER publish, wedging the
        # commit; both cases are pure tombstones
        has_data = os.path.isdir(base) and any(
            d.startswith("epoch=")
            and any(
                f.endswith(".parquet")
                for f in os.listdir(os.path.join(base, d))
            )
            for d in os.listdir(base)
            if os.path.isdir(os.path.join(base, d))
        )
        if not has_data:
            tombstones.extend((tier, int(e)) for e in eps)
            continue
        back = spark.read.parquet(base).where(F.col("epoch").isin(eps))
        written_points[tier] = back.count()
        # epochs the refresh touched but whose merge dropped EVERY
        # bucket (full-epoch purge) have no rows to back-read — they
        # commit as zero-point TOMBSTONE generations so verify_store's
        # latest-generation expectation for them is 0, not the stale
        # pre-purge count
        present = {
            int(r2["epoch"])
            for r2 in back.select("epoch").distinct().collect()
        }
        tombstones.extend(
            (tier, int(e)) for e in eps if int(e) not in present
        )
        lineage_parts.append(
            back.select(
                F.spark_partition_id().alias("partition_id"),
                "bucket_start",
                "conv_id",
                "epoch",
            )
            .groupBy("epoch", "partition_id")
            .agg(
                F.min("bucket_start").alias("input_range_start"),
                F.max("bucket_start").alias("input_range_end"),
                F.count(F.lit(1)).alias("point_count"),
                F.min("conv_id").alias("conv_id_min"),
                F.max("conv_id").alias("conv_id_max"),
            )
            .select(
                "partition_id",
                F.lit(tier).alias("tier"),
                "input_range_start",
                "input_range_end",
                F.col("epoch").cast("long").alias("checkpoint_epoch"),
                F.col("point_count").cast("long").alias("point_count"),
                F.lit(marker).cast("string").alias("refresh_marker"),
                F.lit(seq).cast("long").alias("commit_seq"),
                "conv_id_min",
                "conv_id_max",
            )
        )
    extra_rows = [
        (-1, tier, None, None, int(e), 0, marker, seq, None, None)
        for tier, e in tombstones
    ] + [
        (
            -1,
            rows[0]["tier"],
            None,
            None,
            int(rows[0]["epoch"]),
            0,
            xm,
            seq,
            None,
            None,
        )
        for xm in extra_markers
    ]
    if lineage_parts:
        lin_all = lineage_parts[0]
        for extra in lineage_parts[1:]:
            lin_all = lin_all.unionByName(extra)
        if extra_rows:
            lin_all = lin_all.unionByName(
                spark.createDataFrame(extra_rows, lin_all.schema)
            )
    else:
        # every touched tier was fully purged: the commit is pure
        # tombstones.  Build against the EXPLICIT 8-column lineage
        # schema, not the on-disk ledger's — a ledger written before
        # commit_seq existed has 7 columns, and using it would fail
        # AFTER the partitions were published (post-publish wedge)
        lin_all = spark.createDataFrame(extra_rows, _LINEAGE_SCHEMA)
    lin_all.coalesce(1).write.mode("append").parquet(_lineage_path(root))
    return written_points


def _cleanup_refresh(root: str, marker: str) -> None:
    idir, sdir, tdir = _refresh_dirs(root)
    safe = _safe_marker(marker)
    for p in (
        os.path.join(idir, safe + ".json"),
        os.path.join(sdir, safe),
        os.path.join(tdir, safe),
    ):
        if os.path.isdir(p):
            shutil.rmtree(p)
        elif os.path.isfile(p):
            os.remove(p)


def recover_refreshes(spark: SparkSession, root: str) -> list[str]:
    """Roll FORWARD any refresh that crashed between publishing its
    first tier partition and committing its lineage marker.

    For every orphaned intent (intent file present, marker absent from
    the ledger), each (tier, epoch) it covers is classified by the
    live partition's sum(turn_count) against the intent's recorded
    fingerprints: ``pre_sum`` => not yet published (swap the retained
    staged copy in), ``pre_sum + delta_sum`` => already published
    (leave it), anything else => integrity error (page the operator —
    the store was mutated outside the protocol).  Then the lineage
    commit is replayed from the on-disk partitions.  Returns the
    markers recovered.  Also sweeps staging/trash debris from crashes
    that never reached the intent write (live store untouched there,
    so deletion is the whole recovery)."""
    idir, sdir, tdir = _refresh_dirs(root)
    recovered: list[str] = []
    intents = (
        sorted(f for f in os.listdir(idir) if f.endswith(".json"))
        if os.path.isdir(idir)
        else []
    )
    if intents:
        applied = applied_refresh_markers(spark, root)
        for fn in intents:
            with open(os.path.join(idir, fn)) as fh:
                intent = json.load(fh)
            mk = intent["marker"]
            if mk in applied:
                _cleanup_refresh(root, mk)
                continue
            if not intent["rows"]:
                # a refresh that touched zero partitions has nothing to
                # publish or commit — the intent is pure debris
                _cleanup_refresh(root, mk)
                continue
            seq = _next_commit_seq(spark, root)
            staging = os.path.join(sdir, _safe_marker(mk))
            trash = os.path.join(tdir, _safe_marker(mk))
            for r in intent["rows"]:
                live = _tier_path(root, r["tier"], r["epoch"])
                staged = os.path.join(
                    staging, r["tier"], f"epoch={r['epoch']}"
                )
                live_sum = _partition_turn_sum(spark, live)
                pre = r["pre_sum"]
                post = (pre or 0) + r["delta_sum"]
                if post == 0:
                    # full-epoch purge: published means the dir is GONE
                    if live_sum is None:
                        continue
                    if live_sum == pre:
                        _swap_in(staged, live, trash, allow_empty=True)
                        continue
                    raise RuntimeError(
                        f"refresh recovery: tier={r['tier']} "
                        f"epoch={r['epoch']} has sum(turn_count)="
                        f"{live_sum}, expected {pre} (pre-purge) or "
                        "no data (post-purge) — store mutated outside "
                        "the refresh protocol"
                    )
                if live_sum == post:
                    continue  # this partition already published
                if live_sum == pre or live_sum is None:
                    _swap_in(staged, live, trash)
                else:
                    raise RuntimeError(
                        f"refresh recovery: tier={r['tier']} "
                        f"epoch={r['epoch']} has sum(turn_count)="
                        f"{live_sum}, expected {pre} (pre-merge) or "
                        f"{post} (post-merge) — store mutated outside "
                        f"the refresh protocol"
                    )
            _commit_refresh_lineage(
                spark,
                root,
                mk,
                intent["rows"],
                seq,
                extra_markers=[
                    m for m in intent.get("markers", []) if m != mk
                ],
            )
            _cleanup_refresh(root, mk)
            recovered.append(mk)
    # staging/trash dirs with no intent: crashed before the intent
    # commit => live store untouched => plain debris
    for base in (sdir, tdir):
        if not os.path.isdir(base):
            continue
        with_intent = {_safe_marker(f[: -len(".json")]) for f in intents}
        for d in os.listdir(base):
            if d not in with_intent:
                shutil.rmtree(os.path.join(base, d))
    return recovered


def refresh_late(
    spark: SparkSession, late: DataFrame, root: str, marker: str | None = None
) -> dict[str, int]:
    """Incremental continuous-aggregate refresh: merge a batch of LATE
    (out-of-order) turns into already-committed tiers without
    recomputing untouched buckets (TimescaleDB's continuous-aggregate
    refresh semantics, public docs, recast onto the epoch ledger).

    Why this is exact: every tier statistic is an integer SUM
    (turn_count, text_len_sum) and the derived rate/avg columns are
    single divisions re-derived after the merge — so

        merge(tier(on_time), tier(late)) == tier(on_time ∪ late)

    bit-for-bit, at every tier, under any partitioning.  The 1h/1d
    deltas CASCADE from the 1m delta (sums compose), so the late batch
    is scanned once.

    Why this is incremental: only the day-epochs present in the late
    batch are read back (partition-pruned scan of
    ``tiers/<tier>/epoch=<k>``) and only those partitions are
    rewritten.  At 10^12 turns a midnight straggler touches 1-2
    epochs, not the table.

    Why this is exactly-once (write-audit-publish, the plain-parquet
    analog of Iceberg's WAP branch pattern — on Iceberg each tier is
    one MERGE INTO riding a snapshot commit and all of this machinery
    collapses into the catalog):

    1. **stage** — merged partitions are computed into
       ``refresh_staging/<marker>/`` while the live tree is untouched
       (this also breaks the read-own-partition cycle the old
       in-place overwrite needed a localCheckpoint for);
    2. **intent** — a JSON intent is atomically renamed into
       ``refresh_intents/`` recording, per (tier, epoch), the
       pre-merge and delta ``sum(turn_count)`` fingerprints.  Deltas
       are strictly positive, so pre != post always;
    3. **publish** — each staged partition dir is swapped into the
       live tree (old dir to trash, copy of staged renamed in);
    4. **commit** — ONE lineage append carrying the marker; then
       intent/staging/trash are deleted.

    A crash before (2) leaves the live store untouched (debris swept
    by :func:`recover_refreshes`).  A crash between (2) and (4) is
    rolled FORWARD at the next refresh: recovery classifies every
    partition by its fingerprint, finishes publishing from the
    retained staged copies, and replays the lineage commit — the same
    additive delta can never be applied twice because a published
    partition is recognized by its post-merge sum, not re-merged.  A
    replayed batch after (4) finds its marker in the ledger and is
    skipped before any work."""
    os.makedirs(root, exist_ok=True)
    if marker is not None and marker in applied_refresh_markers(spark, root):
        return {t: 0 for t in TIER_ORDER}
    recover_refreshes(spark, root)
    if marker is not None and marker in applied_refresh_markers(spark, root):
        # the crashed refresh WAS this batch; recovery just finished it
        return {t: 0 for t in TIER_ORDER}
    touched = list_epochs(late)
    if not touched:
        return {t: 0 for t in TIER_ORDER}
    mk = marker if marker is not None else f"auto-{time.time_ns()}"
    seq = _next_commit_seq(spark, root)
    idir, sdir, tdir = _refresh_dirs(root)
    staging = os.path.join(sdir, _safe_marker(mk))
    trash = os.path.join(tdir, _safe_marker(mk))

    epoch_col = (
        F.col("bucket_start").cast("timestamp").cast("long") / EPOCH_SECONDS
    ).cast("long")

    from pyconform_spark.tables import TIERS

    # ---- phase 1: stage merged partitions (live tree untouched)
    intent_rows: list[dict] = []
    delta = None
    for tier in TIER_ORDER:
        delta = (
            rollup.tier_rollup(late, tier)
            if delta is None
            else rollup.cascade_rollup(delta, tier)
        )
        base = os.path.join(root, "tiers", tier)
        d_sums = delta.select(
            *SERIES_KEYS, "bucket_start", "turn_count", "text_len_sum"
        )
        pre_sums: dict[int, int] = {}
        if os.path.isdir(base):
            live = spark.read.parquet(base).where(F.col("epoch").isin(touched))
            pre_sums = {
                int(r["epoch"]): int(r["s"])
                for r in live.groupBy("epoch")
                .agg(F.sum("turn_count").alias("s"))
                .collect()
            }
            existing = live.select(
                *SERIES_KEYS, "bucket_start", "turn_count", "text_len_sum"
            )
            merged_sums = (
                existing.unionByName(d_sums)
                .groupBy(*SERIES_KEYS, "bucket_start")
                .agg(
                    F.sum("turn_count").alias("turn_count"),
                    F.sum("text_len_sum").alias("text_len_sum"),
                )
            )
        else:
            merged_sums = d_sums
        delta_sums = {
            int(r["epoch"]): int(r["s"])
            for r in d_sums.withColumn("epoch", epoch_col)
            .groupBy("epoch")
            .agg(F.sum("turn_count").alias("s"))
            .collect()
        }
        merged = rollup._finish_tier(merged_sums, TIERS[tier].seconds)
        merged = merged.withColumn("epoch", epoch_col)
        (
            merged.write.mode("overwrite")
            .partitionBy("epoch")
            .parquet(os.path.join(staging, tier))
        )
        intent_rows.extend(
            {
                "tier": tier,
                "epoch": e,
                "pre_sum": pre_sums.get(e),
                "delta_sum": delta_sums[e],
            }
            for e in sorted(delta_sums)
        )
        # the next tier cascades from the late batch's own finer DELTA
        # (not the merged result) — additivity makes the two equal,
        # and the late batch is scanned only once

    return _publish_refresh(
        spark, root, mk, seq, idir, staging, trash, intent_rows
    )


def _publish_refresh(
    spark: SparkSession,
    root: str,
    mk: str,
    seq: int,
    idir: str,
    staging: str,
    trash: str,
    intent_rows: list[dict],
    extra_markers: tuple[str, ...] | list[str] = (),
) -> dict[str, int]:
    """Phases 2-4 of the write-audit-publish refresh protocol, shared
    by :func:`refresh_late`, :func:`refresh_cdc` and
    :func:`refresh_cdc_batched`: intent commit (atomic rename),
    per-partition publish, lineage commit, cleanup.  ``extra_markers``
    ride the intent (so crash recovery replays them into the lineage
    commit) and the commit itself."""
    # ---- phase 2: intent commit (atomic rename); publish may only
    # start after this survives
    os.makedirs(idir, exist_ok=True)
    ipath = os.path.join(idir, _safe_marker(mk) + ".json")
    with open(ipath + ".tmp", "w") as fh:
        json.dump(
            {
                "marker": mk,
                "markers": [mk, *extra_markers],
                "rows": intent_rows,
            },
            fh,
        )
    os.replace(ipath + ".tmp", ipath)

    # ---- phase 3: publish every staged partition into the live tree
    # (an intent row whose post-merge fingerprint is ZERO is a
    # full-epoch purge: its staged dir legitimately does not exist)
    for r in intent_rows:
        _swap_in(
            os.path.join(staging, r["tier"], f"epoch={r['epoch']}"),
            _tier_path(root, r["tier"], r["epoch"]),
            trash,
            allow_empty=(r["pre_sum"] or 0) + r["delta_sum"] == 0,
        )

    # ---- phase 4: lineage commit (every marker rides it), then cleanup
    written_points = _commit_refresh_lineage(
        spark, root, mk, intent_rows, seq, extra_markers=extra_markers
    )
    _cleanup_refresh(root, mk)
    return written_points


def refresh_cdc(
    spark: SparkSession,
    changes: DataFrame,
    root: str,
    marker: str | None = None,
) -> dict[str, int]:
    """CDC refresh: apply a batch of signed row-level CHANGES —
    transcripts columns plus ``op`` (+1 insert, -1 delete) — to the
    committed tiers, the plain-parquet analog of Iceberg MERGE INTO
    with equality deletes (merge-on-read compacted eagerly).  A
    delete row must carry the SAME (conv_id, tool, role, ts, text) as
    the turn it retracts — tier stats are signed integer sums, so

        merge(tier(live), signed_tier(changes)) ==
        tier(live rows minus deletes plus inserts)

    bit-for-bit at every tier.  Buckets whose merged turn_count
    reaches 0 are dropped from the rewritten partition.

    Safety rails, all checked BEFORE the intent commit (so a refusal
    leaves the live store untouched and any staging debris is swept
    by :func:`recover_refreshes`):

    * ``op`` values outside {-1, +1} -> ValueError;
    * an epoch whose net turn delta is ZERO -> ValueError: the WAP
      crash-recovery classifies partitions by sum(turn_count)
      fingerprints, and a zero net delta makes pre == post
      indistinguishable.  Split such batches into a delete marker and
      an insert marker (each with nonzero net);
    * a merged bucket with negative turn_count / text_len_sum, or a
      zero-count bucket with nonzero text_len_sum (a delete that
      doesn't match what the store holds) -> ValueError.

    Exactly-once semantics, crash recovery, marker replay and lineage
    are the :func:`refresh_late` machinery verbatim (shared
    :func:`_publish_refresh`); delta fingerprints may be negative,
    which the recovery classifier already handles because it compares
    equality, not ordering."""
    os.makedirs(root, exist_ok=True)
    if marker is not None and marker in applied_refresh_markers(spark, root):
        return {t: 0 for t in TIER_ORDER}
    recover_refreshes(spark, root)
    if marker is not None and marker in applied_refresh_markers(spark, root):
        return {t: 0 for t in TIER_ORDER}

    bad_ops = changes.where(~F.col("op").isin(1, -1)).count()
    if bad_ops:
        raise ValueError(
            f"refresh_cdc: {bad_ops} change rows have op outside "
            "{+1, -1}"
        )
    touched = list_epochs(changes)
    if not touched:
        return {t: 0 for t in TIER_ORDER}
    day = (
        F.col("ts").cast("timestamp").cast("long") / EPOCH_SECONDS
    ).cast("long")
    zero_net = [
        int(r["epoch"])
        for r in changes.groupBy(day.alias("epoch"))
        .agg(F.sum("op").alias("net"))
        .where(F.col("net") == 0)
        .collect()
    ]
    if zero_net:
        raise ValueError(
            "refresh_cdc: epochs with ZERO net turn delta "
            f"{sorted(zero_net)} are indistinguishable to crash "
            "recovery (pre == post fingerprint); split the batch into "
            "a delete marker and an insert marker"
        )

    mk = marker if marker is not None else f"cdc-{time.time_ns()}"
    return _apply_cdc(spark, changes, root, mk, touched)


def _retired_epochs(spark: SparkSession, root: str, tier: str) -> set[int]:
    """Epochs this tier once held but retention expired: tombstoned in
    ``retention_log`` and no longer on disk.  CDC treats them as
    already-zero — a delete targeting an expired 1m partition has
    nothing left to retract THERE (the 1h/1d tiers that still hold the
    data get their deletes normally), so the negative-bucket rail must
    not refuse the whole batch over it."""
    path = os.path.join(root, "retention_log")
    if not os.path.isdir(path) or not any(
        f.endswith(".parquet") for f in os.listdir(path)
    ):
        return set()
    logged = {
        int(r["epoch"])
        for r in spark.read.parquet(path)
        .where(F.col("tier") == tier)
        .select("epoch")
        .distinct()
        .collect()
    }
    base = os.path.join(root, "tiers", tier)
    live = set()
    if os.path.isdir(base):
        live = {
            int(n.split("=", 1)[1])
            for n in os.listdir(base)
            if n.startswith("epoch=")
        }
    return logged - live


def _apply_cdc(
    spark: SparkSession,
    changes: DataFrame,
    root: str,
    mk: str,
    touched: list[int],
    extra_markers: tuple[str, ...] | list[str] = (),
) -> dict[str, int]:
    """Stage + publish one validated CDC change set under marker
    ``mk`` (phases 1-4 of the WAP protocol); shared by
    :func:`refresh_cdc` and :func:`refresh_cdc_batched`.

    Per tier, change rows landing in RETIRED epochs (expired by
    retention, see :func:`_retired_epochs`) are dropped before the
    merge: the tier partition is already gone, so the deletes are
    already satisfied there — without this, a purge of a conversation
    older than the shortest tier horizon would go negative on the
    expired tier and abort the WHOLE erasure, including tiers that
    still hold the data."""
    seq = _next_commit_seq(spark, root)
    idir, sdir, tdir = _refresh_dirs(root)
    staging = os.path.join(sdir, _safe_marker(mk))
    trash = os.path.join(tdir, _safe_marker(mk))

    epoch_col = (
        F.col("bucket_start").cast("timestamp").cast("long") / EPOCH_SECONDS
    ).cast("long")

    from pyconform_spark.tables import TIERS

    text_len = F.coalesce(F.length("text"), F.lit(0)).cast("long")

    # ---- phase 1: stage merged partitions (live tree untouched)
    intent_rows: list[dict] = []
    delta = None
    for tier in TIER_ORDER:
        secs = TIERS[tier].seconds
        if delta is None:
            delta = (
                changes.select(
                    *SERIES_KEYS,
                    rollup.bucket_ts(F.col("ts"), secs).alias(
                        "bucket_start"
                    ),
                    F.col("op").cast("long").alias("op"),
                    (F.col("op") * text_len).cast("long").alias("slen"),
                )
                .groupBy(*SERIES_KEYS, "bucket_start")
                .agg(
                    F.sum("op").alias("turn_count"),
                    F.sum("slen").alias("text_len_sum"),
                )
            )
        else:
            delta = (
                delta.select(
                    *SERIES_KEYS,
                    rollup.bucket_ts(F.col("bucket_start"), secs).alias(
                        "bucket_start"
                    ),
                    "turn_count",
                    "text_len_sum",
                )
                .groupBy(*SERIES_KEYS, "bucket_start")
                .agg(
                    F.sum("turn_count").alias("turn_count"),
                    F.sum("text_len_sum").alias("text_len_sum"),
                )
            )
        base = os.path.join(root, "tiers", tier)
        d_sums = delta.select(
            *SERIES_KEYS, "bucket_start", "turn_count", "text_len_sum"
        )
        # drop changes aimed at retention-expired partitions of THIS
        # tier (already-zero there); the cascading `delta` stays
        # unfiltered — coarser tiers may still hold those epochs
        retired = _retired_epochs(spark, root, tier)
        if retired:
            d_sums = d_sums.where(~epoch_col.isin(sorted(retired)))
        pre_sums: dict[int, int] = {}
        if os.path.isdir(base):
            live = spark.read.parquet(base).where(F.col("epoch").isin(touched))
            pre_sums = {
                int(r["epoch"]): int(r["s"])
                for r in live.groupBy("epoch")
                .agg(F.sum("turn_count").alias("s"))
                .collect()
            }
            existing = live.select(
                *SERIES_KEYS, "bucket_start", "turn_count", "text_len_sum"
            )
            merged_sums = (
                existing.unionByName(d_sums)
                .groupBy(*SERIES_KEYS, "bucket_start")
                .agg(
                    F.sum("turn_count").alias("turn_count"),
                    F.sum("text_len_sum").alias("text_len_sum"),
                )
            )
        else:
            merged_sums = d_sums
        bad = merged_sums.where(
            (F.col("turn_count") < 0)
            | (F.col("text_len_sum") < 0)
            | ((F.col("turn_count") == 0) & (F.col("text_len_sum") != 0))
        ).count()
        if bad:
            raise ValueError(
                f"refresh_cdc: tier={tier} has {bad} merged buckets "
                "with negative or inconsistent sums — a delete does "
                "not match what the store holds; refusing before the "
                "intent commit (live store untouched)"
            )
        merged_sums = merged_sums.where(F.col("turn_count") > 0)
        delta_sums = {
            int(r["epoch"]): int(r["s"])
            for r in d_sums.withColumn("epoch", epoch_col)
            .groupBy("epoch")
            .agg(F.sum("turn_count").alias("s"))
            .collect()
        }
        merged = rollup._finish_tier(merged_sums, secs)
        merged = merged.withColumn("epoch", epoch_col)
        (
            merged.write.mode("overwrite")
            .partitionBy("epoch")
            .parquet(os.path.join(staging, tier))
        )
        intent_rows.extend(
            {
                "tier": tier,
                "epoch": e,
                "pre_sum": pre_sums.get(e),
                "delta_sum": delta_sums[e],
            }
            for e in sorted(delta_sums)
        )

    return _publish_refresh(
        spark,
        root,
        mk,
        seq,
        idir,
        staging,
        trash,
        intent_rows,
        extra_markers=extra_markers,
    )


def refresh_cdc_batched(
    spark: SparkSession,
    batches: list[tuple[str, DataFrame]],
    root: str,
) -> dict[str, int]:
    """Apply SEVERAL CDC change batches — each carrying its own
    idempotency marker — as ONE staged write-audit-publish cycle with
    ONE lineage commit recording every marker (the Iceberg analog:
    many MERGE INTOs squashed into one snapshot commit).  Compared to
    calling :func:`refresh_cdc` per batch, the touched tier
    partitions are read back and rewritten ONCE instead of once per
    batch — the dominant cost when a marker backlog (e.g. a replayed
    CDC topic) lands on the same hot epochs.

    Semantics: signed sums commute, so when every batch's deletes
    retract rows the LIVE store already holds, the combined result is
    bit-for-bit the sequential result.  The rails are stricter than
    sequential application in one case: if a later batch deletes a
    turn an earlier batch in the SAME call inserts, the combined
    delete side retracts a row not yet in the store and the
    negative-bucket rail refuses (before the intent commit — store
    untouched); apply such dependent batches sequentially
    (jobs/cdc_job.py --batched falls back automatically).  Markers already in the ledger
    are skipped up front; the survivors commit atomically — after a
    successful call (or a crash rolled forward by
    :func:`recover_refreshes`) EVERY pending marker is applied, and a
    later :func:`refresh_cdc` replay of any individual one no-ops.
    The primary marker owns the intent/staging dirs; the rest ride
    the intent file and land as zero-point sentinel lineage rows (see
    :func:`_commit_refresh_lineage`).

    Rails: duplicate markers in one call -> ValueError (the caller's
    batch list is malformed — applying one DataFrame under two names
    would double-count); per-batch op-domain check names the
    offending marker; the zero-net-epoch rail applies to the COMBINED
    change set, since the WAP fingerprint classifies partitions by
    the combined sum — batches whose deltas cancel per epoch must be
    committed separately (exactly the delete-marker/insert-marker
    split :func:`refresh_cdc` prescribes)."""
    os.makedirs(root, exist_ok=True)
    mks = [m for m, _ in batches]
    if any(m is None for m in mks):
        raise ValueError("refresh_cdc_batched: every batch needs a marker")
    dups = sorted({m for m in mks if mks.count(m) > 1})
    if dups:
        raise ValueError(
            f"refresh_cdc_batched: duplicate markers {dups} in one call"
        )
    recover_refreshes(spark, root)
    applied = applied_refresh_markers(spark, root)
    pending = [(m, df) for m, df in batches if m not in applied]
    if not pending:
        return {t: 0 for t in TIER_ORDER}
    for m, df in pending:
        bad_ops = df.where(~F.col("op").isin(1, -1)).count()
        if bad_ops:
            raise ValueError(
                f"refresh_cdc_batched: batch {m!r} has {bad_ops} change "
                "rows with op outside {+1, -1}"
            )
    changes = pending[0][1]
    for _, df in pending[1:]:
        changes = changes.unionByName(df)
    touched = list_epochs(changes)
    if not touched:
        return {t: 0 for t in TIER_ORDER}
    day = (
        F.col("ts").cast("timestamp").cast("long") / EPOCH_SECONDS
    ).cast("long")
    zero_net = [
        int(r["epoch"])
        for r in changes.groupBy(day.alias("epoch"))
        .agg(F.sum("op").alias("net"))
        .where(F.col("net") == 0)
        .collect()
    ]
    if zero_net:
        raise ValueError(
            "refresh_cdc_batched: the COMBINED batch nets ZERO turns in "
            f"epochs {sorted(zero_net)} — indistinguishable to crash "
            "recovery (pre == post fingerprint); commit the cancelling "
            "batches separately"
        )
    return _apply_cdc(
        spark,
        changes,
        root,
        pending[0][0],
        touched,
        extra_markers=[m for m, _ in pending[1:]],
    )


def _rewrite_raw_without(
    spark: SparkSession,
    rroot: str,
    ids: list[str],
    days: list[int],
    mk: str,
) -> None:
    """Rewrite the touched raw ``epoch_day=`` partitions WITHOUT the
    victim conversations: kept rows stage under the marker, then each
    day swaps in via the shared publish primitive (a day wholly owned
    by victims stages nothing and swaps to a removal).  Shared by
    :func:`purge_conversations` and :func:`purge_requests` so the two
    erasure entry points cannot diverge in crash behavior."""
    raw = read_raw(spark, rroot)
    staging = os.path.join(rroot, "raw_purge_staging", _safe_marker(mk))
    trash = os.path.join(rroot, "raw_purge_trash", _safe_marker(mk))
    kept = raw.where(F.col("epoch_day").isin(days)).where(
        ~F.col("conv_id").isin(ids)
    )
    kept.write.mode("overwrite").partitionBy("epoch_day").parquet(staging)
    raw_path = os.path.join(rroot, "raw")
    for d in days:
        _swap_in(
            os.path.join(staging, f"epoch_day={d}"),
            os.path.join(raw_path, f"epoch_day={d}"),
            trash,
            allow_empty=True,
        )
    for p in (staging, trash):
        if os.path.isdir(p):
            shutil.rmtree(p)


def purge_conversations(
    spark: SparkSession,
    root: str,
    conv_ids: list[str],
    raw_root: str | None = None,
    marker: str | None = None,
) -> dict:
    """Right-to-be-forgotten: remove EVERY turn of the given
    conversations from the tier store AND the raw day partitions — the
    end-to-end GDPR erasure a transcripts engine must offer, built
    from parts that are each already crash-safe:

    1. **tiers** — a CDC purge refresh (op = -1 for every victim turn
       in already-rolled-up epochs) under a DETERMINISTIC marker
       derived from the sorted conv-id set, so a re-run (or a crashed
       run retried) short-circuits on the ledger instead of
       double-deleting; epochs not yet rolled up are skipped (their
       raw gets cleaned below, so a later rollup never sees the
       conversation);
    2. **raw** — each touched ``epoch_day=`` partition is rewritten
       WITHOUT the victim rows into a staging dir and swapped in via
       the same publish primitive the refreshes use (:func:`_swap_in`;
       a day whose every row was the victim's stages nothing and the
       swap REMOVES the day dir — the empty-publish path).

    Idempotent end to end: filtering again removes nothing, the
    marker replays as a no-op, and a crash at any point converges on
    re-run.  The default marker hashes the conv-id set — retries of
    ONE logical purge share it; if a purged conversation is ever
    RE-INGESTED and must be purged again, pass a fresh ``marker``
    explicitly (the ledger cannot distinguish the second purge from a
    replay of the first).  Returns the marker, touched day count, raw
    rows removed, and per-tier points rewritten."""
    ids = sorted(set(conv_ids))
    if marker is None:
        marker = (
            "purge-conv-"
            + hashlib.sha256("\n".join(ids).encode()).hexdigest()[:16]
        )
    rroot = raw_root or root
    raw = read_raw(spark, rroot)
    victims = raw.where(F.col("conv_id").isin(ids))
    days = sorted(
        int(r["epoch_day"])
        for r in victims.select("epoch_day").distinct().collect()
    )
    out = {
        "marker": marker,
        "raw_days": len(days),
        "raw_rows_removed": 0,
        "tier_points": {t: 0 for t in TIER_ORDER},
    }
    if not days:
        return out
    out["raw_rows_removed"] = victims.count()

    rolled = sorted(set(days) & committed_epochs(spark, root))
    if rolled:
        deletes = (
            victims.where(F.col("epoch_day").isin(rolled))
            .drop("epoch_day")
            .withColumn("op", F.lit(-1))
        )
        out["tier_points"] = refresh_cdc(spark, deletes, root, marker=marker)

    _rewrite_raw_without(spark, rroot, ids, days, marker)
    return out


def applied_refresh_markers(spark: SparkSession, root: str) -> set[str]:
    """Markers of refresh batches whose lineage committed — the
    replay-skip set for streaming refresh (a marker rides the SAME
    single-file lineage append that is the refresh's commit point, so
    marker-present <=> refresh-applied, with no window in between)."""
    path = _lineage_path(root)
    if not os.path.isdir(path) or not any(
        f.endswith(".parquet") for f in os.listdir(path)
    ):
        return set()
    lin = spark.read.parquet(path)
    if "refresh_marker" not in lin.columns:
        return set()
    rows = (
        lin.where(F.col("refresh_marker").isNotNull())
        .select("refresh_marker")
        .distinct()
        .collect()
    )
    return {r["refresh_marker"] for r in rows}


def purge_requests(
    spark: SparkSession,
    root: str,
    requests: list[tuple[str, list[str]]],
    raw_root: str | None = None,
) -> dict:
    """Batch right-to-be-forgotten: a BACKLOG of deletion requests —
    ``(request_id, [conv_id, ...])`` pairs, e.g. a week of DSAR
    tickets — erased in ONE maintenance pass instead of one store
    rewrite per ticket.  A conversation named by several tickets is
    erased once, under the first ticket that names it (duplicate
    submissions are routine; double-retraction would trip the
    negative-bucket rail).  The pass:

    1. **tiers** — every request's victim turns (in already-rolled-up
       epochs) leave via :func:`refresh_cdc_batched`: one staged
       write-audit-publish cycle, ONE lineage commit carrying every
       request id as its marker, touched partitions rewritten once
       for the whole backlog (the measured ~2x-per-4-markers win
       scales with ticket count);
    2. **raw** — the union of all victims leaves the ``epoch_day=``
       partitions in one staged rewrite (same swap primitive; a day
       wholly owned by victims is removed).

    Idempotent per request id: already-committed ids are skipped by
    the batched refresh, and the raw rewrite always re-derives from
    what is still on disk — a crashed run converges on retry, a
    replayed backlog no-ops.  As with :func:`purge_conversations`,
    re-purging a conversation RE-INGESTED after an earlier purge
    needs a fresh request id.  Returns per-request raw row counts and
    the tier points rewritten."""
    rroot = raw_root or root
    # a conversation named by SEVERAL tickets (duplicate DSAR
    # submissions are routine) is erased ONCE, under the first ticket
    # that names it — without this dedup the batched deletes would
    # retract the same turns twice and the negative-bucket rail would
    # refuse the whole backlog
    seen: set[str] = set()
    ids_by_req = []
    for rid, cs in requests:
        mine = sorted(set(cs) - seen)
        seen.update(mine)
        ids_by_req.append((rid, mine))
    all_ids = sorted(seen)
    raw = read_raw(spark, rroot)
    victims = raw.where(F.col("conv_id").isin(all_ids))
    days = sorted(
        int(r["epoch_day"])
        for r in victims.select("epoch_day").distinct().collect()
    )
    out = {
        "requests": len(ids_by_req),
        "raw_days": len(days),
        "raw_rows_removed": 0,
        "tier_points": {t: 0 for t in TIER_ORDER},
    }
    if not days:
        return out
    out["raw_rows_removed"] = victims.count()

    rolled = sorted(set(days) & committed_epochs(spark, root))
    if rolled:
        batches = []
        for rid, cs in ids_by_req:
            deletes = (
                victims.where(F.col("epoch_day").isin(rolled))
                .where(F.col("conv_id").isin(cs))
                .drop("epoch_day")
                .withColumn("op", F.lit(-1))
            )
            batches.append((f"purge-req-{rid}", deletes))
        out["tier_points"] = refresh_cdc_batched(spark, batches, root)

    mk = "purge-batch-" + hashlib.sha256(
        "\n".join(rid for rid, _ in ids_by_req).encode()
    ).hexdigest()[:16]
    _rewrite_raw_without(spark, rroot, all_ids, days, mk)
    return out


def latest_commit_seq(spark: SparkSession, root: str) -> int:
    """The highest committed ``commit_seq`` in the ledger (0 when the
    ledger predates the commit-ordinal schema or is empty) — the
    cursor an incremental consumer saves between runs."""
    return max(0, _next_commit_seq(spark, root) - 1)


def read_tier_changes(
    spark: SparkSession,
    root: str,
    tier: str,
    since_seq: int,
    conv_id: str | None = None,
    bucket_range: tuple | None = None,
) -> tuple[DataFrame | None, list[int]]:
    """Incremental tier read — the Iceberg incremental-scan analog
    over the epoch ledger: the (tier) epochs whose LATEST lineage
    generation has ``commit_seq > since_seq`` (ingested, refreshed,
    CDC-edited, or purged since the consumer's saved cursor), plus the
    current rows of those epochs.

    ``conv_id`` / ``bucket_range`` key predicates prune the SCANNED
    changed epochs via the ledger's per-epoch key stats (see
    :func:`read_tier`) and filter the returned rows; the
    ``changed_epochs`` list itself is NOT narrowed — the consumer
    still learns every changed epoch (tombstone detection), it just
    never opens files that cannot hold the key.

    A downstream consumer starts at ``since_seq = -1`` (the initial
    ingest commits at ordinal 0), runs
    ``cur = latest_commit_seq(...)`` after each sync and passes the
    saved cursor here on the next one — unchanged epochs are never
    re-read (partition-pruned multi-path scan), which at 10^12 turns
    is the difference between re-syncing a day and re-syncing years.

    Returns ``(changed_rows, changed_epochs)``; ``changed_rows`` is
    None when nothing changed or every changed epoch was purged
    (epochs present in ``changed_epochs`` but with no live dir are
    purge/retention tombstones — the consumer deletes its copy)."""
    lin = lineage(spark, root)
    if "commit_seq" not in lin.columns:
        lin = lin.withColumn("commit_seq", F.lit(0).cast("long"))
    lin = lin.withColumn(
        "commit_seq", F.coalesce(F.col("commit_seq"), F.lit(0)).cast("long")
    )
    rows = (
        lin.where(F.col("tier") == tier)
        .groupBy("checkpoint_epoch")
        .agg(F.max("commit_seq").alias("mx"))
        .where(F.col("mx") > since_seq)
        .collect()
    )
    changed = sorted(int(r["checkpoint_epoch"]) for r in rows)
    scan = changed
    if conv_id is not None or bucket_range is not None:
        scan = _prune_epochs_by_stats(
            scan, _tier_epoch_stats(spark, root, tier), conv_id, bucket_range
        )
    paths = [
        _tier_path(root, tier, e)
        for e in scan
        if os.path.isdir(_tier_path(root, tier, e))
    ]
    if not paths:
        return None, changed
    return (
        _apply_key_predicates(
            spark.read.parquet(*paths), conv_id, bucket_range
        ),
        changed,
    )


def verify_store(spark: SparkSession, root: str) -> DataFrame:
    """Integrity audit of a tier store against its lineage ledger.

    For every (tier, epoch): the CURRENT truth is the lineage
    generation with the highest ``commit_seq`` (refreshes re-commit an
    epoch); its summed ``point_count`` must equal the rows actually on
    disk.  Returns one row per (tier, epoch) with status:

    * ``ok``         — counts match;
    * ``mismatch``   — data and ledger disagree (corruption / partial
      write that somehow got committed — page the operator);
    * ``missing``    — committed in lineage but no data dir (retention
      expiry or cold-tier compaction move both land here; cross-check
      retention_log / the cold store);
    * ``orphan``     — data dir with NO lineage (a crash between data
      write and commit; the next run overwrites it — expected debris,
      listed so operators can reclaim space).

    Scale shape: the ledger is tiny; per-epoch data counts are
    partition-pruned parquet counts (metadata-only row counts — no
    column data read)."""
    from pyspark.sql import types as T

    lin = lineage(spark, root)
    # ledgers written before the commit_seq schema change (or mixed
    # old+new ledgers, where old rows read as NULL) default to seq 0 so
    # their epochs still resolve a latest generation instead of being
    # dropped by the max-join and surfacing as spurious mismatches
    if "commit_seq" not in lin.columns:
        lin = lin.withColumn("commit_seq", F.lit(0).cast("long"))
    else:
        lin = lin.withColumn(
            "commit_seq", F.coalesce(F.col("commit_seq"), F.lit(0)).cast("long")
        )
    latest = (
        lin.groupBy("tier", "checkpoint_epoch")
        .agg(F.max("commit_seq").alias("_mx"))
        .select(
            F.col("tier").alias("_t"),
            F.col("checkpoint_epoch").alias("_e"),
            "_mx",
        )
    )
    expected = (
        lin.join(
            latest,
            (lin.tier == latest["_t"])
            & (lin.checkpoint_epoch == latest["_e"])
            & (lin.commit_seq == latest["_mx"]),
        )
        .groupBy("tier", "checkpoint_epoch")
        .agg(F.sum("point_count").alias("expected_points"))
        .collect()
    )
    exp = {(r["tier"], r["checkpoint_epoch"]): r["expected_points"] for r in expected}

    def _count_rows(path: str) -> int:
        if not any(f.endswith(".parquet") for f in os.listdir(path)):
            return 0
        return spark.read.parquet(path).count()

    rows = []
    seen_dirs = set()
    for tier in TIER_ORDER:
        base = os.path.join(root, "tiers", tier)
        if os.path.isdir(base):
            for d in os.listdir(base):
                if d.startswith("epoch=") and any(
                    f.endswith(".parquet")
                    for f in os.listdir(os.path.join(base, d))
                ):
                    seen_dirs.add((tier, int(d.split("=")[1])))
    for (tier, epoch), want in sorted(exp.items()):
        if (tier, epoch) not in seen_dirs:
            # a zero-point latest generation is a TOMBSTONE (full-epoch
            # CDC purge): no data dir is the CORRECT state
            rows.append(
                (tier, epoch, int(want), None,
                 "ok" if int(want) == 0 else "missing")
            )
            continue
        got = _count_rows(_tier_path(root, tier, epoch))
        rows.append(
            (tier, epoch, int(want), got, "ok" if got == want else "mismatch")
        )
    for tier, epoch in sorted(seen_dirs - set(exp)):
        rows.append((tier, epoch, None, _count_rows(_tier_path(root, tier, epoch)), "orphan"))

    schema = T.StructType(
        [
            T.StructField("tier", T.StringType(), False),
            T.StructField("epoch", T.LongType(), False),
            T.StructField("expected_points", T.LongType(), True),
            T.StructField("actual_points", T.LongType(), True),
            T.StructField("status", T.StringType(), False),
        ]
    )
    return spark.createDataFrame(rows, schema)


# ---------------------------------------------------------------- compaction
def _compact_dirs(root: str) -> tuple[str, str, str]:
    return (
        os.path.join(root, "compact_intents"),
        os.path.join(root, "compact_staging"),
        os.path.join(root, "compact_trash"),
    )


def _epoch_files(path: str) -> list[str]:
    if not os.path.isdir(path):
        return []
    return [f for f in os.listdir(path) if f.endswith(".parquet")]


def compact_small_files(
    spark: SparkSession,
    root: str,
    tier: str = "1m",
    min_files: int = 2,
    marker: str = "compact",
) -> dict:
    """Bin-pack each committed epoch partition's small files into one
    — the Iceberg ``rewrite_data_files`` maintenance action for the
    epoch-dir store.  Ingest parallelism decides how many files an
    epoch lands as; query latency wants few, large, footer-prunable
    files; this closes the gap WITHOUT changing a row, so lineage
    point counts and ``verify_store`` stay green.

    Write-audit-publish like ``refresh_late``: every epoch's compacted
    copy is fully staged and row-counted first, an intent file commits
    the plan, then partitions swap in one by one (``_swap_in`` keeps a
    re-publishable staged copy at every step).  Because content is
    IDENTICAL, recovery (:func:`recover_compactions`) only needs to
    classify live-missing vs live-present — both states hold correct
    data.  Idempotent: epochs already at one file are skipped.

    Returns ``{epoch: (files_before, files_after, n_rows)}``."""
    idir, sdir, tdir = _compact_dirs(root)
    safe = _safe_marker(marker)
    plan: list[dict] = []
    out: dict[int, tuple[int, int, int]] = {}
    for epoch in _tier_epochs_dir(root, tier):
        live = _tier_path(root, tier, epoch)
        files = _epoch_files(live)
        if len(files) < min_files:
            continue
        df = spark.read.parquet(live)
        n = df.count()
        staged = os.path.join(sdir, safe, tier, f"epoch={epoch}")
        if os.path.isdir(staged):
            shutil.rmtree(staged)
        df.coalesce(1).write.parquet(staged)
        n_staged = spark.read.parquet(staged).count()
        if n_staged != n:
            raise RuntimeError(
                f"compaction staging lost rows: {n_staged} != {n}"
            )
        plan.append({"tier": tier, "epoch": epoch, "n_rows": n,
                     "files_before": len(files)})
    if not plan:
        return out
    os.makedirs(idir, exist_ok=True)
    intent_path = os.path.join(idir, safe + ".json")
    with open(intent_path, "w") as fh:
        json.dump({"marker": marker, "rows": plan}, fh)
    for r in plan:
        live = _tier_path(root, tier, r["epoch"])
        staged = os.path.join(sdir, safe, tier, f"epoch={r['epoch']}")
        _swap_in(staged, live, os.path.join(tdir, safe))
        out[r["epoch"]] = (
            r["files_before"], len(_epoch_files(live)), r["n_rows"]
        )
    _log_compaction(spark, root, marker, plan)
    for p in (intent_path, os.path.join(sdir, safe), os.path.join(tdir, safe)):
        if os.path.isdir(p):
            shutil.rmtree(p)
        elif os.path.isfile(p):
            os.remove(p)
    return out


def _tier_epochs_dir(root: str, tier: str) -> list[int]:
    d = os.path.join(root, "tiers", tier)
    if not os.path.isdir(d):
        return []
    return sorted(
        int(n.split("=", 1)[1])
        for n in os.listdir(d)
        if n.startswith("epoch=")
    )


def _logged_compactions(spark: SparkSession, root: str) -> set[str]:
    path = os.path.join(root, "compaction_log")
    if not os.path.isdir(path):
        return set()
    return {
        r["marker"] for r in
        spark.read.parquet(path).select("marker").distinct().collect()
    }


def _log_compaction(
    spark: SparkSession, root: str, marker: str, plan: list[dict]
) -> None:
    if marker in _logged_compactions(spark, root):
        return
    rows = [
        (marker, r["tier"], int(r["epoch"]), int(r["files_before"]),
         int(r["n_rows"]))
        for r in plan
    ]
    schema = ("marker string, tier string, epoch long, "
              "files_before long, n_rows long")
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "append"
    ).parquet(os.path.join(root, "compaction_log"))


def recover_compactions(spark: SparkSession, root: str) -> list[str]:
    """Roll forward compactions that crashed mid-publish.  Content is
    identical pre/post, so classification is simple: a live partition
    missing its data is re-published from the retained staged copy;
    a present one (old or new layout) is already correct.  The log
    append is replayed if absent; staging/trash debris without an
    intent is deleted (live store untouched there)."""
    idir, sdir, tdir = _compact_dirs(root)
    recovered: list[str] = []
    intents = (
        sorted(f for f in os.listdir(idir) if f.endswith(".json"))
        if os.path.isdir(idir)
        else []
    )
    for fn in intents:
        with open(os.path.join(idir, fn)) as fh:
            intent = json.load(fh)
        marker = intent["marker"]
        safe = _safe_marker(marker)
        for r in intent["rows"]:
            live = _tier_path(root, r["tier"], r["epoch"])
            if _epoch_files(live):
                continue
            staged = os.path.join(sdir, safe, r["tier"], f"epoch={r['epoch']}")
            _swap_in(staged, live, os.path.join(tdir, safe))
        _log_compaction(spark, root, marker, intent["rows"])
        for p in (
            os.path.join(idir, fn),
            os.path.join(sdir, safe),
            os.path.join(tdir, safe),
        ):
            if os.path.isdir(p):
                shutil.rmtree(p)
            elif os.path.isfile(p):
                os.remove(p)
        recovered.append(marker)
    with_intent = {_safe_marker(f[: -len(".json")]) for f in intents}
    for base in (sdir, tdir):
        if not os.path.isdir(base):
            continue
        for d in os.listdir(base):
            if d not in with_intent:
                shutil.rmtree(os.path.join(base, d))
    return recovered


def tier_diff(a: DataFrame, b: DataFrame) -> DataFrame:
    """Exact diff of two tier frames: every (series, bucket) point
    ADDED, REMOVED, or CHANGED going from ``a`` to ``b``.  One
    full-outer join on (series, bucket); change detection compares the
    integer statistics (turn_count, text_len_sum), so the diff is
    exact; rows equal in both snapshots are dropped."""
    keys = [*SERIES_KEYS, "bucket_start"]
    a = a.select(
        *[F.col(k).alias(f"a_{k}") for k in keys],
        F.col("turn_count").alias("turn_count_a"),
        F.col("text_len_sum").alias("text_len_sum_a"),
    )
    b = b.select(
        *[F.col(k).alias(f"b_{k}") for k in keys],
        F.col("turn_count").alias("turn_count_b"),
        F.col("text_len_sum").alias("text_len_sum_b"),
    )
    # NULL-SAFE key equality: ``tool`` is nullable, and a plain join
    # would misclassify every null-tool point as added+removed
    cond = None
    for k in keys:
        c = F.col(f"a_{k}").eqNullSafe(F.col(f"b_{k}"))
        cond = c if cond is None else cond & c
    joined = a.join(b, cond, "full_outer").select(
        *[
            F.coalesce(F.col(f"a_{k}"), F.col(f"b_{k}")).alias(k)
            for k in keys
        ],
        "turn_count_a",
        "turn_count_b",
        "text_len_sum_a",
        "text_len_sum_b",
    )
    status = (
        F.when(F.col("turn_count_a").isNull(), F.lit("added"))
        .when(F.col("turn_count_b").isNull(), F.lit("removed"))
        .when(
            (F.col("turn_count_a") != F.col("turn_count_b"))
            | (F.col("text_len_sum_a") != F.col("text_len_sum_b")),
            F.lit("changed"),
        )
        .otherwise(F.lit(None).cast("string"))
    )
    return (
        joined.withColumn("status", status)
        .where(F.col("status").isNotNull())
        .select(
            *keys,
            "status",
            "turn_count_a",
            "turn_count_b",
            "text_len_sum_a",
            "text_len_sum_b",
        )
    )


def store_diff(
    spark: SparkSession,
    root: str,
    tier: str,
    epoch_a: int,
    epoch_b: int,
) -> DataFrame:
    """Time-travel diff between two as-of views of a tier — the "what
    did that backfill add?" audit (Iceberg ``snapshot_diff`` analog
    over the epoch ledger).  NOTE the as-of scope: epoch-id time
    travel selects WHICH epochs are visible, not their historical
    content — a late-data refresh rewrites its partition in place (the
    ledger records it via commit_seq), so diffs across a refresh show
    the refreshed content on both sides.  Use :func:`tier_diff`
    directly to compare a store against an independent recompute."""
    return tier_diff(
        read_tier_as_of(spark, root, tier, epoch_a),
        read_tier_as_of(spark, root, tier, epoch_b),
    )


# ------------------------------------------------------ schema evolution
#
# Iceberg-analog ADD COLUMN / type-widening semantics over the epoch-dir
# store: each epoch directory carries the schema its writer shipped with
# (the parquet footers are the schema metadata), and readers resolve
# columns BY NAME across epochs — a column added in release N+1 surfaces
# as NULL for epochs written by release N, and an integral column widened
# from int to long reads as long everywhere.  Positional resolution (what
# a naive multi-path parquet read does) would silently misbind reordered
# columns; a plain ``mergeSchema`` read handles add-column but refuses
# type widening.

_WIDENING: dict[str, int] = {
    "byte": 0, "short": 1, "integer": 2, "long": 3,
    "float": 10, "double": 11,
}


def _widen_type(a, b):
    """The narrower-to-wider merge of two primitive Spark types; raises
    on an incompatible pair (the Iceberg rule: widen, never narrow or
    cross families)."""
    if a == b:
        return a
    an, bn = a.typeName(), b.typeName()
    if an in _WIDENING and bn in _WIDENING:
        fam_a, fam_b = _WIDENING[an] // 10, _WIDENING[bn] // 10
        if fam_a == fam_b:
            return a if _WIDENING[an] >= _WIDENING[bn] else b
    raise ValueError(f"incompatible evolution {a.simpleString()} -> {b.simpleString()}")


def tier_schemas(spark: SparkSession, root: str, tier: str):
    """Per committed epoch, the schema its writer recorded in the
    parquet footers — the store's schema history, oldest first.
    Control-plane: one footer read per epoch, never a data scan."""
    done = sorted(committed_epochs(spark, root))
    out = []
    for e in done:
        p = _tier_path(root, tier, e)
        if os.path.isdir(p):
            out.append((e, spark.read.parquet(p).schema))
    return out


def evolved_schema(schemas):
    """Union-by-name of a schema history with type widening: field
    order is first-seen, types widen monotonically, every field is
    nullable (an added column is absent from older epochs)."""
    from pyspark.sql.types import StructField, StructType

    order: list[str] = []
    types: dict[str, object] = {}
    for _, sch in schemas:
        for f in sch.fields:
            if f.name not in types:
                order.append(f.name)
                types[f.name] = f.dataType
            else:
                types[f.name] = _widen_type(types[f.name], f.dataType)
    return StructType([StructField(n, types[n], True) for n in order])


def read_tier_evolved(spark: SparkSession, root: str, tier: str) -> DataFrame:
    """All committed epochs of a tier under the EVOLVED schema:
    by-name column resolution, added columns NULL for pre-addition
    epochs, integral/floating types widened.  Epoch runs that share a
    schema read as ONE multi-path parquet scan (partition-count and
    pushdown behavior identical to :func:`read_tier`); a schema change
    starts a new scan group, so the number of unioned scans equals the
    number of schema GENERATIONS, not epochs."""
    history = tier_schemas(spark, root, tier)
    if not history:
        raise FileNotFoundError(f"no committed epochs for tier {tier} under {root}")
    target = evolved_schema(history)

    groups: list[tuple[object, list[int]]] = []
    for e, sch in history:
        if groups and groups[-1][0] == sch:
            groups[-1][1].append(e)
        else:
            groups.append((sch, [e]))

    out = None
    for sch, epochs in groups:
        df = spark.read.parquet(
            *[_tier_path(root, tier, e) for e in epochs]
        )
        have = {f.name: f.dataType for f in sch.fields}
        cols = []
        for f in target.fields:
            if f.name not in have:
                cols.append(F.lit(None).cast(f.dataType).alias(f.name))
            elif have[f.name] != f.dataType:
                cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
            else:
                cols.append(F.col(f.name))
        df = df.select(*cols)
        out = df if out is None else out.unionByName(df)
    return out


def _dir_bytes(path: str) -> int:
    total = 0
    for dp, _, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(dp, f))
            except OSError:
                pass
    return total


def gc_orphans(spark: SparkSession, root: str, dry_run: bool = False):
    """Iceberg ``remove_orphan_files`` analog for the epoch-dir store:
    sweep write-audit-publish debris that no reader or recovery path
    will ever consult again, and REPORT every decision (the audit a
    storage team wants before trusting an automated janitor at 100 TB).

    Swept (strictly safe):
      * refresh/compaction staging + trash + intent artifacts whose
        marker is ALREADY COMMITTED (in the lineage ledger /
        compaction log) — the normal post-commit cleanup that a crash
        between commit and cleanup leaves behind;
      * staging/trash directories with NO intent file — a crash before
        the intent write, so the live store was never touched;
      * stray ``.publish-tmp`` partition copies under ``tiers/`` —
        ``_swap_in`` recreates them from staging on every (re)publish.

    Kept, reported as ``kept_pending``: anything belonging to an
    intent whose marker has NOT committed — :func:`recover_refreshes`
    / :func:`recover_compactions` need exactly those artifacts to roll
    the crashed publish forward; GC must never race recovery.

    ``dry_run=True`` reports without deleting.  Returns a DataFrame
    (kind, marker, path, bytes, action)."""
    rows: list[tuple] = []

    def _rm(path: str) -> None:
        if dry_run:
            return
        if os.path.isdir(path):
            shutil.rmtree(path)
        elif os.path.isfile(path):
            os.remove(path)

    def sweep(kind: str, dirs: tuple, applied: set) -> None:
        idir, sdir, tdir = dirs
        intents: dict[str, tuple[str, str]] = {}
        if os.path.isdir(idir):
            for fn in sorted(os.listdir(idir)):
                if not fn.endswith(".json"):
                    continue
                p = os.path.join(idir, fn)
                with open(p) as fh:
                    mk = json.load(fh)["marker"]
                intents[_safe_marker(mk)] = (mk, p)
        pending = {s for s, (mk, _) in intents.items() if mk not in applied}
        for safe, (mk, p) in intents.items():
            if safe in pending:
                rows.append(
                    (f"{kind}_intent", mk, p, os.path.getsize(p),
                     "kept_pending")
                )
            else:
                rows.append(
                    (f"{kind}_intent", mk, p, os.path.getsize(p), "removed")
                )
                _rm(p)
        for base, sub in ((sdir, "staging"), (tdir, "trash")):
            if not os.path.isdir(base):
                continue
            for d in sorted(os.listdir(base)):
                p = os.path.join(base, d)
                action = "kept_pending" if d in pending else "removed"
                rows.append((f"{kind}_{sub}", d, p, _dir_bytes(p), action))
                if action == "removed":
                    _rm(p)

    sweep("refresh", _refresh_dirs(root), applied_refresh_markers(spark, root))
    sweep("compact", _compact_dirs(root), _logged_compactions(spark, root))
    tiers_dir = os.path.join(root, "tiers")
    if os.path.isdir(tiers_dir):
        for tier in sorted(os.listdir(tiers_dir)):
            td = os.path.join(tiers_dir, tier)
            if not os.path.isdir(td):
                continue
            for d in sorted(os.listdir(td)):
                if d.endswith(".publish-tmp"):
                    p = os.path.join(td, d)
                    rows.append(
                        ("publish_tmp", d, p, _dir_bytes(p), "removed")
                    )
                    _rm(p)
    schema = "kind string, marker string, path string, bytes long, action string"
    return spark.createDataFrame(
        [(k, m, p, int(b), a) for k, m, p, b, a in rows], schema
    )


def autoparse_filename(
    fname: str, df: DataFrame, time_col: str = "ts"
) -> str:
    """Fill every ``{fmt1-fmt2}`` segment of ``fname`` with the
    strftime of the frame's FIRST and LAST time values — the
    reference's filename date-range autoparse (flownodes.py:672-731):
    ``tier_{%Y%m%d-%Y%m%d}.parquet`` becomes
    ``tier_20240101-20240312.parquet``.  Spaces in the rendered dates
    are replaced by ``'0'`` exactly like the reference; unbalanced
    braces raise ValueError.  One min/max aggregate of the time
    column — a metadata-priced job, no full materialization."""
    if "{" not in fname:
        return fname
    row = df.agg(
        F.min(F.col(time_col).cast("timestamp")).alias("t1"),
        F.max(F.col(time_col).cast("timestamp")).alias("t2"),
    ).first()
    t1, t2 = row["t1"], row["t2"]
    if t1 is None:
        raise ValueError(
            f"autoparse_filename: no time values in column {time_col!r}"
        )
    while "{" in fname:
        beg = fname.find("{")
        end = fname.find("}", beg)
        if end == -1:
            raise ValueError(
                f"Filename {fname!r} has unbalanced special characters"
            )
        fmt1, fmt2 = fname[beg + 1 : end].split("-")
        d1 = t1.strftime(fmt1).replace(" ", "0")
        d2 = t2.strftime(fmt2).replace(" ", "0")
        fname = f"{fname[:beg]}{d1}-{d2}{fname[end + 1:]}"
    return fname


def export_named(
    df: DataFrame, root: str, template: str, time_col: str = "ts"
) -> str:
    """Write ``df`` as parquet under ``root/<resolved name>`` where the
    name is :func:`autoparse_filename` applied to ``template`` — the
    human-readable date-range naming option next to the epoch-dir
    layout (the epoch dirs remain the resumable commit unit; this is
    the hand-off/export surface a downstream consumer reads by
    name)."""
    name = autoparse_filename(template, df, time_col)
    df.write.mode("overwrite").parquet(os.path.join(root, name))
    return name
