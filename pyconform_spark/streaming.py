"""Structured Streaming front-end for the tier rollup.

The reference is batch-only ("time-series" = an ordered batch axis,
SURVEY.md §2.8); this module is the continuous-ingest path the north
rule's retention engine needs: the SAME tier semantics as
``operators.rollup``, expressed over ``readStream`` with watermarked
tumbling windows, so late transcript turns are folded in until the
watermark closes a bucket and dropped (counted) afterwards.

Scale notes:

* state per open window = one (series, bucket) row of partial sums —
  the same partials the batch hash-agg keeps; watermark bounds state;
* ``availableNow`` triggers give batch-sized backfills through the
  identical query graph (stream/batch parity is what makes the tier
  cascade resumable mid-stream);
* sink = epoch parquet dirs (pipeline.py layout) or Iceberg
  ``writeStream.toTable`` in production; checkpointLocation carries
  the exactly-once ledger the same way lineage rows do for batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from pyconform_spark.tables import SERIES_KEYS, TIERS


def stream_tier_rollup(
    stream: DataFrame, tier: str = "1m", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling-window tier rollup over a streaming frame.

    Works identically on a batch frame (window() is mode-agnostic),
    which is how stream/batch parity is tested.
    """
    t = TIERS[tier]
    src = stream
    if stream.isStreaming:
        src = stream.withWatermark("ts", watermark)
    text_len = F.coalesce(F.length("text"), F.lit(0)).cast("long")
    win = F.window(F.col("ts"), f"{t.seconds} seconds")
    agg = (
        src.select(*SERIES_KEYS, F.col("ts"), text_len.alias("text_len"))
        .groupBy(*SERIES_KEYS, win.alias("w"))
        .agg(
            F.count(F.lit(1)).alias("turn_count"),
            F.sum("text_len").alias("text_len_sum"),
        )
    )
    return agg.select(
        *SERIES_KEYS,
        F.col("w.start").cast("timestamp_ntz").alias("bucket_start"),
        F.col("turn_count").cast("long").alias("turn_count"),
        (F.col("turn_count") / F.lit(float(t.seconds))).alias("turn_rate"),
        F.col("text_len_sum").cast("long").alias("text_len_sum"),
        (F.col("text_len_sum") / F.col("turn_count")).alias("text_len_avg"),
        F.lit(False).alias("gap_filled"),
    )


def stream_dedup_ingest(
    stream: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming exact-dedup on ingest: the continuous twin of
    ``textops.exact_dedup`` — each transcript turn is keyed by its
    content hash and only the FIRST arrival within the watermark
    horizon passes; replays/duplicates are dropped at the door.

    Scale notes: state = one (sha) row per distinct text seen inside
    the watermark window — ``dropDuplicatesWithinWatermark`` evicts
    state once the event-time watermark passes, so state is bounded by
    the dedup horizon, not the stream's lifetime.  A duplicate arriving
    later than the horizon is admitted (documented trade: unbounded
    exact dedup needs the batch pipeline's full-corpus pass —
    ``curation_pipeline`` — which this stage front-loads, not
    replaces).  Works on a batch frame via plain dropDuplicates for
    parity testing."""
    src = stream.withColumn("text_sha", F.sha2(F.col("text"), 256))
    if stream.isStreaming:
        # watermarks require TIMESTAMP (session tz = UTC, so the cast
        # from the store's timestamp_ntz is a stable reinterpretation)
        src = src.withColumn("ts", F.col("ts").cast("timestamp"))
        src = src.withWatermark("ts", watermark)
        return src.dropDuplicatesWithinWatermark(["text_sha"])
    return src.dropDuplicates(["text_sha"])


def stream_sessionize(
    stream: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Per-conversation session windows (a >gap silence closes the
    session) — the streaming analog of queries.sessionize, using
    Spark's native session_window state machine."""
    src = stream
    if stream.isStreaming:
        src = stream.withWatermark("ts", watermark)
    return (
        src.groupBy("conv_id", F.session_window(F.col("ts"), gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_turns"))
        .select(
            "conv_id",
            F.col("w.start").cast("timestamp_ntz").alias("session_start"),
            F.col("w.end").cast("timestamp_ntz").alias("session_end"),
            F.col("n_turns").cast("long").alias("n_turns"),
        )
    )


def run_stream_to_memory(
    stream_out: DataFrame, name: str, output_mode: str = "complete"
):
    """Drive a streaming frame into a memory sink until drained
    (test/backfill helper)."""
    q = (
        stream_out.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def stream_conv_stats(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-conversation
    running stats — turn count, text bytes, last timestamp, and the
    count of intra-conversation gaps > 30 min — maintained across
    micro-batches in group state.

    This is the streaming generalization of the reference's per-file
    sequential scan (``mapdates.py:167-216`` gap checks): state per
    conv is O(1), keyed shuffle is on conv_id, and the Arrow batch per
    group is processed vectorized in numpy.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("n_turns", T.LongType(), False),
            T.StructField("text_bytes", T.LongType(), False),
            T.StructField("last_ts", T.TimestampType(), True),
            T.StructField("n_gaps", T.LongType(), False),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n_turns", T.LongType(), False),
            T.StructField("text_bytes", T.LongType(), False),
            T.StructField("last_ts_epoch", T.LongType(), True),
            T.StructField("n_gaps", T.LongType(), False),
        ]
    )

    def _update(key, pdfs, state: GroupState):
        (conv_id,) = key
        if state.exists:
            n_turns, text_bytes, last_epoch, n_gaps = state.get
        else:
            n_turns, text_bytes, last_epoch, n_gaps = 0, 0, None, 0
        for pdf in pdfs:
            pdf = pdf.sort_values("ts", kind="mergesort")
            ts = (pdf["ts"].astype("datetime64[s]").astype("int64")).to_numpy()
            n_turns += len(pdf)
            text_bytes += int(pdf["text"].str.len().fillna(0).sum())
            if len(ts):
                prevs = np.concatenate(
                    ([last_epoch if last_epoch is not None else ts[0]], ts[:-1])
                )
                n_gaps += int(((ts - prevs) > 1800).sum())
                last_epoch = int(ts[-1])
        state.update((n_turns, text_bytes, last_epoch, n_gaps))
        yield pd.DataFrame(
            {
                "conv_id": [conv_id],
                "n_turns": [n_turns],
                "text_bytes": [text_bytes],
                "last_ts": [pd.Timestamp(last_epoch, unit="s")
                            if last_epoch is not None else None],
                "n_gaps": [n_gaps],
            }
        )

    src = stream
    if stream.isStreaming:
        src = stream.withWatermark("ts", watermark)
    return src.groupBy("conv_id").applyInPandasWithState(
        _update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_to_store(
    stream: DataFrame,
    root: str,
    tier: str = "1m",
    watermark: str = "2 hours",
    checkpoint: str | None = None,
):
    """Exactly-once streaming ingest into the tier store.

    Append-mode watermarked aggregation emits each closed (series,
    bucket) exactly once; ``foreachBatch`` lands every micro-batch
    under ``stream_tiers/<tier>/ingest_batch=<id>/epoch=<k>`` with
    OVERWRITE of the batch directory — so a replayed batch (foreachBatch
    is at-least-once) rewrites its own directory instead of duplicating
    rows.  Combined with the streaming checkpoint this is the
    exactly-once contract of pipeline.run, at micro-batch granularity
    (Iceberg: the same idempotency via commit-dedup on batch id).
    """
    import os

    from pyconform_spark.pipeline import EPOCH_SECONDS

    out = stream_tier_rollup(stream, tier, watermark)
    base = os.path.join(root, "stream_tiers", tier)
    epoch = (
        F.col("bucket_start").cast("timestamp").cast("long") / EPOCH_SECONDS
    ).cast("long")

    def _write_batch(df: DataFrame, batch_id: int) -> None:
        (
            df.withColumn("epoch", epoch)
            .write.mode("overwrite")
            .partitionBy("epoch")
            .parquet(os.path.join(base, f"ingest_batch={batch_id}"))
        )

    writer = (
        out.writeStream.outputMode("append")
        .foreachBatch(_write_batch)
    )
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer


def read_stream_store(spark, root: str, tier: str = "1m") -> DataFrame:
    import os

    base = os.path.join(root, "stream_tiers", tier)
    return spark.read.option("basePath", base).parquet(base).drop(
        "epoch", "ingest_batch"
    )


def cascade_stream_store(spark, root: str) -> None:
    """Derive the 1h and 1d tiers from the streaming-ingested 1m store
    (batch cascade over closed windows — exact, since tier sums are
    integer compositions).  Run after (or periodically alongside) the
    streaming query; rewrites the coarse tiers from the current 1m
    state (cheap: coarse tiers are 60x/1440x smaller)."""
    import os

    from pyconform_spark.operators import rollup

    t1m = read_stream_store(spark, root, "1m")
    t1h = rollup.cascade_rollup(t1m, "1h")
    t1h.write.mode("overwrite").parquet(os.path.join(root, "stream_tiers", "1h"))
    t1h_back = spark.read.parquet(os.path.join(root, "stream_tiers", "1h"))
    rollup.cascade_rollup(t1h_back, "1d").write.mode("overwrite").parquet(
        os.path.join(root, "stream_tiers", "1d")
    )


def read_cascade_tier(spark, root: str, tier: str):
    import os

    return spark.read.parquet(os.path.join(root, "stream_tiers", tier))


def cascade_stream_store_incremental(spark, root: str) -> list[int]:
    """Incremental 1h/1d cascade over the streaming 1m store: only
    day-epochs whose 1m row count changed since the last cascade are
    recomputed (their coarse partitions rewritten via dynamic partition
    overwrite); everything else is untouched.

    Correct because epochs are day-aligned: a 1h/1d bucket derives from
    exactly one epoch's 1m rows, so per-epoch rewrite is closed.  A
    manifest parquet records the per-epoch 1m counts that produced the
    current coarse tiers (the lineage-style commit of this operator).
    Returns the recomputed epoch ids.
    """
    import os

    from pyconform_spark.operators import rollup
    from pyconform_spark.pipeline import EPOCH_SECONDS

    base = os.path.join(root, "stream_tiers")
    manifest_path = os.path.join(base, "_cascade_manifest")
    t1m = read_stream_store(spark, root, "1m")
    epoch = (
        F.col("bucket_start").cast("timestamp").cast("long") / EPOCH_SECONDS
    ).cast("long")
    counts = {
        r["epoch"]: r["n"]
        for r in t1m.groupBy(epoch.alias("epoch"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    prev: dict[int, int] = {}
    if os.path.isdir(manifest_path):
        prev = {
            r["epoch"]: r["n"]
            for r in spark.read.parquet(manifest_path).collect()
        }
    changed = sorted(e for e, n in counts.items() if prev.get(e) != n)
    if not changed:
        return []

    src = t1m.withColumn("epoch", epoch).where(F.col("epoch").isin(changed))
    for tier in ("1h", "1d"):
        td = rollup.cascade_rollup(src.drop("epoch"), tier).withColumn(
            "epoch", epoch
        )
        (
            td.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            .parquet(os.path.join(base, f"{tier}_inc"))
        )
    spark.createDataFrame(
        [(int(e), int(n)) for e, n in counts.items()], "epoch long, n long"
    ).coalesce(1).write.mode("overwrite").parquet(manifest_path)
    return changed


def read_incremental_tier(spark, root: str, tier: str):
    import os

    base = os.path.join(root, "stream_tiers", f"{tier}_inc")
    return spark.read.option("basePath", base).parquet(base).drop("epoch")


def stream_spec_to_store(
    stream: DataFrame,
    spec,
    root: str,
    checkpoint: str | None = None,
):
    """Continuous spec-driven standardization: the SAME JSON output
    spec that drives specs.run_spec applied to a Structured Stream,
    landed exactly-once.

    apply_spec compiles to a pure projection, so it rides the stream
    unchanged (no watermark needed — no state); ``foreachBatch``
    OVERWRITES each micro-batch's own directory
    (``spec_stream/ingest_batch=<id>/epoch=<k>``), so at-least-once
    batch replays rewrite instead of duplicating — the
    stream_to_store idempotency contract applied to the xconform
    lifecycle.  Read back with :func:`read_spec_stream_store`.
    """
    import os

    from pyconform_spark import specs as S
    from pyconform_spark.pipeline import EPOCH_SECONDS

    epoch = (F.col("ts").cast("timestamp").cast("long") / EPOCH_SECONDS).cast(
        "long"
    )
    with_epoch = stream.withColumn("epoch", epoch)
    out, _, _ = S.apply_spec(
        with_epoch, spec, observe=False, passthrough=["epoch"]
    )
    base = os.path.join(root, "spec_stream")

    def _write_batch(df: DataFrame, batch_id: int) -> None:
        (
            df.write.mode("overwrite")
            .partitionBy("epoch")
            .parquet(os.path.join(base, f"ingest_batch={batch_id}"))
        )

    writer = out.writeStream.outputMode("append").foreachBatch(_write_batch)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer


def read_spec_stream_store(spark, root: str) -> DataFrame:
    import os

    base = os.path.join(root, "spec_stream")
    return spark.read.option("basePath", base).parquet(base).drop(
        "epoch", "ingest_batch"
    )


def stream_refresh_tiers(
    stream: DataFrame, root: str, checkpoint: str | None = None
):
    """Streaming continuous-aggregate maintenance: every micro-batch of
    (possibly late / out-of-order) turns is MERGED into the committed
    1m/1h/1d tier store through :func:`pipeline.refresh_late` — the
    raw rows flow straight into the additive merge, no watermark and
    no streaming state, so arbitrarily late data still lands in its
    true bucket (the watermarked ``stream_to_store`` path instead
    drops what arrives after the watermark).

    Exactly-once under foreachBatch's at-least-once contract: each
    batch carries the idempotency marker ``stream-<batch_id>``.
    refresh_late applies it write-audit-publish style — merged
    partitions staged, a fingerprint intent recorded, partitions
    swapped in, then ONE lineage append carrying the marker.  A batch
    replayed after the commit finds its marker in
    ``pipeline.applied_refresh_markers`` and is skipped; a batch
    replayed after a crash in any earlier phase is rolled FORWARD from
    the intent (published partitions recognized by fingerprint, never
    re-merged), so the additive delta can never double-count
    (crash-injection tests in tests/test_pipeline.py)."""
    from pyconform_spark import pipeline as _pl

    def _apply(df: DataFrame, batch_id: int) -> None:
        _pl.refresh_late(
            df.sparkSession, df, root, marker=f"stream-{batch_id}"
        )

    writer = stream.writeStream.outputMode("append").foreachBatch(_apply)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer


def stream_refresh_cdc(
    stream: DataFrame, root: str, checkpoint: str | None = None
):
    """Streaming CDC maintenance: micro-batches of signed changes
    (transcripts columns + ``op`` +1/-1) merge into the committed tier
    store through :func:`pipeline.refresh_cdc` — the streaming face of
    the Iceberg MERGE-INTO analog, for upsert feeds (a conversation
    edited or redacted after ingest).

    Each micro-batch is applied as TWO markers — deletes first
    (``stream-cdc-<id>-d``), then inserts (``stream-cdc-<id>-i``) —
    because refresh_cdc refuses mixed batches whose net turn delta is
    zero in some epoch (the WAP fingerprint blind spot), and an
    all-same-sign batch always carries a nonzero net.  Exactly-once
    under foreachBatch's at-least-once contract survives a crash
    BETWEEN the two applies: on replay the delete marker is found in
    the ledger and skipped, the insert marker is applied — each half
    commits independently through the intent/fingerprint protocol."""
    from pyconform_spark import pipeline as _pl
    from pyspark.sql import functions as F

    def _apply(df: DataFrame, batch_id: int) -> None:
        sp = df.sparkSession
        dels = df.where(F.col("op") == -1)
        ins = df.where(F.col("op") == 1)
        _pl.refresh_cdc(sp, dels, root, marker=f"stream-cdc-{batch_id}-d")
        _pl.refresh_cdc(sp, ins, root, marker=f"stream-cdc-{batch_id}-i")

    writer = stream.writeStream.outputMode("append").foreachBatch(_apply)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer


def stream_anomaly_zscore(stream: DataFrame, window: int = 20,
                          threshold: float = 3.0) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-series
    rolling z-score over an EVENTS stream — the streaming twin of
    queries.anomaly_zscore, maintaining only the trailing
    ``window - 1`` quantized values per (user_id, event_type) in group
    state (O(window) state per series, not O(history)).

    Assumes in-order arrival per series across micro-batches (the
    usual ingest contract; late rows belong to the refresh path).
    Each Arrow batch is scored vectorized in numpy with the SAME
    integer-moment construction as the batch query —

        z = (n*v - S) / sqrt(n * (n*Q - S*S) / (n - 1))

    from int64 prefix sums — so stream output equals the batch query
    BIT-FOR-BIT (pytest parity gate), not approximately."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql import types as T

    out_schema = T.StructType([
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("event_id", T.LongType(), False),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("zscore", T.DoubleType(), True),
        T.StructField("is_anomaly", T.BooleanType(), False),
    ])
    state_schema = T.StructType([
        T.StructField("tail", T.ArrayType(T.LongType()), True),
    ])

    def _update(key, pdfs, state: GroupState):
        user_id, event_type = key
        tail = list(state.get[0]) if state.exists else []
        # a group's micro-batch rows may arrive split across several
        # Arrow record batches (engine artifact: maxRecordsPerBatch) —
        # concatenate and sort ONCE so a cross-chunk out-of-order row
        # still scores against the correct trailing window; per-chunk
        # sorting would corrupt the carried tail
        parts = list(pdfs)
        if not parts:
            return
        pdf = parts[0] if len(parts) == 1 else pd.concat(parts, ignore_index=True)
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        vq = np.floor(pdf["value"].to_numpy(dtype=np.float64) * 100
                      ).astype(np.int64)
        a = np.concatenate([np.asarray(tail, dtype=np.int64), vq])
        p = len(tail)
        cs = np.cumsum(a)
        cq = np.cumsum(a * a)
        idx = np.arange(p, p + len(vq))
        lo = np.maximum(0, idx - window + 1)
        n = idx - lo + 1
        S = cs[idx] - np.where(lo > 0, cs[lo - 1], 0)
        Q = cq[idx] - np.where(lo > 0, cq[lo - 1], 0)
        num = n * vq - S
        varnum = n * (n * Q - S * S)
        with np.errstate(divide="ignore", invalid="ignore"):
            den = np.sqrt(varnum / (n - 1))
            z = num / den
        ok = (n > 1) & (varnum > 0)
        zscore = np.where(ok, z, np.nan)
        is_anom = ok & (np.abs(zscore) > threshold)
        out = pd.DataFrame({
            "user_id": np.full(len(vq), user_id, dtype=np.int64),
            "event_type": event_type,
            "ts": pdf["ts"].to_numpy(),
            "event_id": pdf["event_id"].to_numpy(dtype=np.int64),
            "value": pdf["value"].to_numpy(dtype=np.float64),
            "zscore": zscore,
            "is_anomaly": is_anom,
        })
        out["zscore"] = out["zscore"].where(ok, None)
        yield out
        tail = list(a[-(window - 1):]) if window > 1 else []
        state.update(([int(x) for x in tail],))

    src = stream
    return src.groupBy("user_id", "event_type").applyInPandasWithState(
        _update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_ohlc(
    stream: DataFrame, tier: str = "1m", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked OHLC bars over the per-turn text-length series:
    open/close are the first/last turn's text length in the bucket
    under the total (ts, turn_idx) order, high/low the extremes — the
    streaming twin of queries.ohlc_1h's min_by/max_by shape (one
    watermark-bounded stateful aggregate; state per open bar only).

    Works identically on a batch frame, which is how parity is tested.
    """
    t = TIERS[tier]
    src = stream
    if stream.isStreaming:
        src = stream.withWatermark("ts", watermark)
    text_len = F.coalesce(F.length("text"), F.lit(0)).cast("long")
    okey = F.struct(F.col("ts"), F.col("turn_idx"))
    win = F.window(F.col("ts"), f"{t.seconds} seconds")
    agg = (
        src.select(
            *SERIES_KEYS,
            F.col("ts"),
            F.col("turn_idx"),
            text_len.alias("v"),
        )
        .groupBy(*SERIES_KEYS, win.alias("w"))
        .agg(
            F.min_by("v", okey).alias("open"),
            F.max("v").alias("high"),
            F.min("v").alias("low"),
            F.max_by("v", okey).alias("close"),
            F.count(F.lit(1)).alias("n_turns"),
        )
    )
    return agg.select(
        *SERIES_KEYS,
        F.col("w.start").cast("timestamp_ntz").alias("bucket_start"),
        F.col("open").cast("long").alias("open"),
        F.col("high").cast("long").alias("high"),
        F.col("low").cast("long").alias("low"),
        F.col("close").cast("long").alias("close"),
        F.col("n_turns").cast("long").alias("n_turns"),
    )


def stream_quantile_sketch(
    stream: DataFrame,
    tier: str = "1h",
    watermark: str = "2 hours",
    bucket_shift: int = 4,
) -> DataFrame:
    """Streaming histogram-sketch tier: per (series, window) bucket
    counts of turn text length (bucket = text_len >> bucket_shift — a
    power-of-two width, so the bucket id is exact integer math in any
    engine).  ONE watermark-bounded stateful aggregate; emitting
    COUNTS, not quantiles, keeps the state mergeable — downstream
    ``sketch_quantile_readoff`` answers any p over any key/time slice
    of the stored sketch without touching raw (the streaming twin of
    queries.quantile_sketch_tier_merge).

    Works identically on a batch frame, which is how parity is tested.
    """
    t = TIERS[tier]
    src = stream
    if stream.isStreaming:
        src = stream.withWatermark("ts", watermark)
    text_len = F.coalesce(F.length("text"), F.lit(0)).cast("long")
    win = F.window(F.col("ts"), f"{t.seconds} seconds")
    agg = (
        src.select(
            *SERIES_KEYS,
            F.col("ts"),
            F.shiftright(text_len, bucket_shift).alias("vbucket"),
        )
        .groupBy(*SERIES_KEYS, win.alias("w"), F.col("vbucket"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return agg.select(
        *SERIES_KEYS,
        F.col("w.start").cast("timestamp_ntz").alias("bucket_start"),
        F.col("vbucket").cast("long").alias("vbucket"),
        F.col("c").cast("long").alias("c"),
    )


def sketch_quantile_readoff(
    sketch: DataFrame,
    keys: list[str],
    qs: tuple[float, ...] = (0.5, 0.95),
    bucket_shift: int = 4,
) -> DataFrame:
    """Merge sketch rows down to ``keys`` granularity (bucket-wise
    count sum — the tier-merge identity) and read off upper-bound
    quantile estimates ((b+1) * bucket width).  The cumulative and
    total windows share one sort; the rank threshold is
    ceil(q * total), matching the batch query's readoff exactly."""
    merged = sketch.groupBy(*keys, "vbucket").agg(F.sum("c").alias("c"))
    wcum = (
        Window.partitionBy(*keys)
        .orderBy("vbucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy(*keys)
    cum = merged.select(
        *keys,
        "vbucket",
        F.sum("c").over(wcum).alias("_cum"),
        F.sum("c").over(wall).alias("_tot"),
    )
    width = float(1 << bucket_shift)
    aggs = []
    for q in qs:
        hit = F.col("_cum") >= F.ceil(F.lit(q) * F.col("_tot"))
        est = (F.min(F.when(hit, F.col("vbucket"))) + 1).cast(
            "double"
        ) * F.lit(width)
        aggs.append(est.alias(f"p{int(round(q * 100))}_est"))
    aggs.append(F.max("_tot").alias("n_points"))
    return cum.groupBy(*keys).agg(*aggs)


def stream_holt(
    stream: DataFrame, sf: float = 0.5, tf: float = 0.25
) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-series
    Holt linear smoothing over an EVENTS stream — the streaming twin
    of operators/smooth.holt_linear, carrying exactly TWO floats of
    state (level, trend) per (user_id, event_type).

    Assumes in-order arrival per series across micro-batches (ingest
    contract; late rows belong to the refresh path).  A group's
    micro-batch rows are concatenated across Arrow chunks and sorted
    ONCE, then stepped with the SAME scalar-float recurrence as the
    batch operator — same expressions, same order — so stream output
    equals the batch query BIT-FOR-BIT (pytest parity gate)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql import types as T

    out_schema = T.StructType([
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("event_id", T.LongType(), False),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("holt_level", T.DoubleType(), True),
        T.StructField("holt_trend", T.DoubleType(), True),
    ])
    state_schema = T.StructType([
        T.StructField("level", T.DoubleType(), True),
        T.StructField("trend", T.DoubleType(), True),
    ])

    def _update(key, pdfs, state: GroupState):
        user_id, event_type = key
        s_prev, b_prev = (state.get if state.exists else (None, None))
        parts = list(pdfs)
        if not parts:
            return
        pdf = parts[0] if len(parts) == 1 else pd.concat(
            parts, ignore_index=True
        )
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        levels, trends = [], []
        for vi in pdf["value"].astype(float).tolist():
            if s_prev is None:
                s, b = float(vi), 0.0
            else:
                s = sf * vi + (1.0 - sf) * (s_prev + b_prev)
                b = tf * (s - s_prev) + (1.0 - tf) * b_prev
            levels.append(s)
            trends.append(b)
            s_prev, b_prev = s, b
        out = pd.DataFrame({
            "user_id": pdf["user_id"].astype("int64").to_numpy(),
            "event_type": event_type,
            "ts": pdf["ts"].to_numpy(),
            "event_id": pdf["event_id"].astype("int64").to_numpy(),
            "value": pdf["value"].astype(float).to_numpy(),
            "holt_level": levels,
            "holt_trend": trends,
        })
        yield out
        state.update((float(s_prev), float(b_prev)))

    return stream.groupBy("user_id", "event_type").applyInPandasWithState(
        _update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_sliding_distinct(
    stream: DataFrame,
    window_s: int = 21600,
    step_s: int = 3600,
    watermark: str = "8 hours",
) -> DataFrame:
    """Distinct conversations per sliding window, continuously — the
    streaming twin of ``queries.sliding_distinct_users`` as a CHAINED
    windowed aggregation (Spark 3.4+ multiple stateful operators):

    1. ``groupBy(window(ts, 6h, 1h), conv_id)`` — one state row per
       (window, conversation), the streaming form of the batch
       query's dedup-then-explode (Spark expands each event into its
       window/step windows and the aggregate dedups); watermark-evicted.
    2. ``groupBy(window)`` count — finalized in append mode the moment
       the watermark passes each window's end.

    State is bounded by (active conversations x windows inside the
    horizon), the same bound the batch shape has per partition.  Works
    identically on a batch frame for parity testing."""
    live = stream.isStreaming
    src = stream
    if live:
        src = stream.withColumn("ts", F.col("ts").cast("timestamp"))
        src = src.withWatermark("ts", watermark)
    win = F.window(F.col("ts"), f"{window_s} seconds", f"{step_s} seconds")
    pairs = src.groupBy(win.alias("w"), "conv_id").agg(
        F.count(F.lit(1)).alias("_n")
    )
    agg = pairs.groupBy("w").agg(F.count(F.lit(1)).alias("distinct_convs"))
    return agg.select(
        F.col("w.start").cast("timestamp_ntz").alias("window_start"),
        F.col("w.end").cast("timestamp_ntz").alias("window_end"),
        F.col("distinct_convs").cast("long").alias("distinct_convs"),
    )


def stream_token_bucket(
    stream: DataFrame,
    capacity: int = 5_000_000,
    cost: int = 1_000_000,
    refill_divisor: int = 50_000,
) -> DataFrame:
    """Continuous quota enforcement (applyInPandasWithState): the
    streaming twin of operators/ratelimit.token_bucket — per user, TWO
    integers of state (bucket level, last event time) carried across
    micro-batches, so an admission decision made online equals the
    batch replay BIT-FOR-BIT (pure integer arithmetic; pytest parity
    gate with the input split mid-stream).

    Assumes in-order arrival per user across micro-batches (ingest
    contract, like stream_holt); rows inside a micro-batch are
    concatenated across Arrow chunks and sorted once."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql import types as T

    out_schema = T.StructType([
        T.StructField("user_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("event_id", T.LongType(), False),
        T.StructField("allowed", T.IntegerType(), False),
        T.StructField("tokens_after", T.LongType(), False),
    ])
    state_schema = T.StructType([
        T.StructField("level", T.LongType(), True),
        T.StructField("prev_t_us", T.LongType(), True),
    ])

    def _update(key, pdfs, state: GroupState):
        (user_id,) = key
        lvl, prev = (state.get if state.exists else (None, None))
        parts = list(pdfs)
        if not parts:
            return
        pdf = parts[0] if len(parts) == 1 else pd.concat(
            parts, ignore_index=True
        )
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        t_us = (
            pdf["ts"].astype("datetime64[us]").astype("int64").tolist()
        )
        allowed, after = [], []
        for t in t_us:
            if prev is None:
                lvl = capacity
            else:
                lvl = min(capacity, lvl + (t - prev) // refill_divisor)
            if lvl >= cost:
                lvl -= cost
                allowed.append(1)
            else:
                allowed.append(0)
            after.append(lvl)
            prev = t
        yield pd.DataFrame({
            "user_id": pdf["user_id"].astype("int64").to_numpy(),
            "ts": pdf["ts"].to_numpy(),
            "event_id": pdf["event_id"].astype("int64").to_numpy(),
            "allowed": pd.array(allowed, dtype="int32"),
            "tokens_after": pd.array(after, dtype="int64"),
        })
        state.update((int(lvl), int(prev)))

    return stream.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_staleness(
    stream: DataFrame,
    horizon_s: int = 7200,
    watermark: str = "1 hour",
) -> DataFrame:
    """Online staleness alerts: emit ONE row per conversation the
    moment the watermark proves it has been silent longer than
    ``horizon_s`` — the continuous twin of queries.stale_series, and
    the one stateful pattern the other twins don't exercise:
    EVENT-TIME TIMEOUTS (the alert fires from the absence of data, so
    no arriving row can trigger it; the state machine must wake
    itself).

    State per conversation: the last-seen event time.  Every batch
    refreshes the timeout deadline to last_seen + horizon; when the
    watermark passes a deadline with no new data, the group times out,
    emits its staleness record, and clears its state — bounded by the
    number of live conversations, self-cleaning thereafter."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql import types as T

    out_schema = T.StructType([
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("last_seen", T.TimestampType(), True),
        T.StructField("stale_after_s", T.LongType(), False),
    ])
    state_schema = T.StructType([
        T.StructField("last_s", T.LongType(), True),
    ])

    src = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    src = src.withWatermark("ts", watermark)

    def _update(key, pdfs, state: GroupState):
        (conv_id,) = key
        if state.hasTimedOut:
            (last_s,) = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "conv_id": [conv_id],
                    "last_seen": [pd.Timestamp(last_s, unit="s")],
                    "stale_after_s": pd.array([horizon_s], dtype="int64"),
                }
            )
            return
        last_s = state.get[0] if state.exists else None
        for pdf in pdfs:
            if len(pdf):
                batch_max = int(
                    pdf["ts"].astype("datetime64[us]").astype("int64").max()
                    // 1_000_000
                )
                last_s = batch_max if last_s is None else max(last_s, batch_max)
        if last_s is not None:
            state.update((int(last_s),))
            state.setTimeoutTimestamp((int(last_s) + horizon_s) * 1000)
        return
        yield  # pragma: no cover - makes this a generator

    return src.groupBy("conv_id").applyInPandasWithState(
        _update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def stream_burst_detect(
    stream: DataFrame, window_s: int = 3600, threshold: int = 7
) -> DataFrame:
    """Online burst-episode detection: the streaming twin of
    queries.burst_detect — per event_type, a trailing ``window_s``
    event-count window flags rate exceedances and contiguous flagged
    instants merge into episodes; each episode is emitted the moment
    it CLOSES (the first unflagged instant after a flagged run), so
    the pager fires while the incident is still fresh.

    EXACT parity with the batch run on every closed episode (pytest
    gate splits the input mid-stream): the batch RANGE frame gives all
    rows sharing a second the same rate, so the state machine
    processes per-SECOND groups — and because a second's peers may
    straddle micro-batches, the newest second is HELD PENDING until a
    strictly newer second arrives (only then is its count final).
    State per event_type: the trailing window's (second, count) pairs
    — bounded by window_s × peak rate — plus the open episode and the
    pending second.  Assumes in-order arrival per key across
    micro-batches (ingest contract, like stream_token_bucket)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql import types as T

    out_schema = T.StructType([
        T.StructField("event_type", T.StringType(), False),
        T.StructField("episode", T.LongType(), False),
        T.StructField("burst_start", T.TimestampType(), True),
        T.StructField("burst_end", T.TimestampType(), True),
        T.StructField("duration_s", T.LongType(), False),
        T.StructField("peak_rate", T.LongType(), False),
        T.StructField("n_hits", T.LongType(), False),
    ])
    state_schema = T.StructType([
        T.StructField("secs", T.ArrayType(T.LongType()), True),
        T.StructField("cnts", T.ArrayType(T.LongType()), True),
        T.StructField("island", T.LongType(), True),
        T.StructField("prev_flag", T.LongType(), True),
        T.StructField("o_start", T.LongType(), True),
        T.StructField("o_end", T.LongType(), True),
        T.StructField("o_peak", T.LongType(), True),
        T.StructField("o_hits", T.LongType(), True),
        T.StructField("p_s", T.LongType(), True),
        T.StructField("p_cnt", T.LongType(), True),
    ])

    def _update(key, pdfs, state: GroupState):
        (event_type,) = key
        if state.exists:
            secs, cnts, island, prev_flag, o_start, o_end, o_peak, o_hits, p_s, p_cnt = state.get
            secs, cnts = list(secs), list(cnts)
        else:
            secs, cnts, island, prev_flag = [], [], 0, 0
            o_start = o_end = o_peak = o_hits = None
            p_s = p_cnt = None
        parts = [p for p in pdfs if len(p)]
        out = []

        def process(s, c):
            nonlocal secs, cnts, island, prev_flag
            nonlocal o_start, o_end, o_peak, o_hits
            lo = s - (window_s - 1)
            while secs and secs[0] < lo:
                secs.pop(0)
                cnts.pop(0)
            secs.append(s)
            cnts.append(c)
            rate = sum(cnts)
            flag = 1 if rate >= threshold else 0
            if flag:
                if not prev_flag:
                    island += 1
                    o_start, o_end, o_peak, o_hits = s, s, rate, c
                else:
                    o_end = s
                    o_peak = max(o_peak, rate)
                    o_hits += c
            elif prev_flag:
                out.append((island, o_start, o_end, o_peak, o_hits))
                o_start = o_end = o_peak = o_hits = None
            prev_flag = flag

        if parts:
            pdf = parts[0] if len(parts) == 1 else pd.concat(
                parts, ignore_index=True
            )
            pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
            t_s = (
                pdf["ts"].astype("datetime64[us]").astype("int64") // 1_000_000
            )
            for s, c in t_s.groupby(t_s, sort=True).count().items():
                s, c = int(s), int(c)
                if p_s is None:
                    p_s, p_cnt = s, c
                elif s == p_s:
                    p_cnt += c
                else:
                    process(p_s, p_cnt)
                    p_s, p_cnt = s, c
        if out:
            yield pd.DataFrame({
                "event_type": [event_type] * len(out),
                "episode": pd.array([o[0] for o in out], dtype="int64"),
                "burst_start": [pd.Timestamp(o[1], unit="s") for o in out],
                "burst_end": [pd.Timestamp(o[2], unit="s") for o in out],
                "duration_s": pd.array(
                    [o[2] - o[1] for o in out], dtype="int64"
                ),
                "peak_rate": pd.array([o[3] for o in out], dtype="int64"),
                "n_hits": pd.array([o[4] for o in out], dtype="int64"),
            })
        state.update((
            secs, cnts, int(island), int(prev_flag),
            o_start, o_end, o_peak, o_hits, p_s, p_cnt,
        ))

    return stream.groupBy("event_type").applyInPandasWithState(
        _update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_decayed_state(stream: DataFrame) -> DataFrame:
    """Continuous decayed-leaderboard maintenance
    (applyInPandasWithState): per user, carry the BOUNDED map
    day -> daily centi-sum (at most 31 live days — older days are
    pruned relative to the user's own max day, which provably never
    drops a day the batch query would count, since the global
    reference day is >= every user's max).  After each micro-batch the
    operator emits the user's full updated map; the leaderboard is
    then one tiny stateless fold over the latest emission per user
    (sum of vq << (30 - age)), evaluated against whatever reference
    day "now" is — the decay re-anchors at READ time, so the state
    never has to be rewritten as days pass (the reason the state holds
    raw daily sums, not a pre-decayed scalar: an integer pre-decayed
    accumulator would need a lossy right-shift per day rollover and
    break bit-parity with the batch query).

    Parity gate (pytest): folding the final emissions with the batch
    query's global max day reproduces ``queries.decayed_leaderboard``
    bit-for-bit."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql import types as T

    out_schema = T.StructType([
        T.StructField("user_id", T.LongType(), False),
        T.StructField("as_of_day", T.IntegerType(), False),
        T.StructField("days", T.ArrayType(T.IntegerType()), False),
        T.StructField("vqs", T.ArrayType(T.LongType()), False),
    ])
    state_schema = T.StructType([
        T.StructField("days", T.ArrayType(T.IntegerType()), True),
        T.StructField("vqs", T.ArrayType(T.LongType()), True),
    ])

    def _update(key, pdfs, state: GroupState):
        (user_id,) = key
        cur: dict[int, int] = {}
        if state.exists:
            days0, vqs0 = state.get
            cur = dict(zip(days0, vqs0))
        parts = list(pdfs)
        if not parts:
            return
        pdf = parts[0] if len(parts) == 1 else pd.concat(
            parts, ignore_index=True
        )
        # day ordinal = days since epoch (naive UTC), vq = floor(v*100)
        day = (
            pdf["ts"].to_numpy().astype("datetime64[D]").astype("int64")
        )
        import numpy as np

        vq = np.floor(pdf["value"].to_numpy(dtype="float64") * 100).astype(
            "int64"
        )
        for d, v in zip(day.tolist(), vq.tolist()):
            cur[d] = cur.get(d, 0) + v
        mx = max(cur)
        cur = {d: v for d, v in cur.items() if mx - d <= 30}
        days = sorted(cur)
        state.update(([int(d) for d in days], [int(cur[d]) for d in days]))
        yield pd.DataFrame(
            {
                "user_id": [int(user_id)],
                "as_of_day": [int(mx)],
                "days": [[int(d) for d in days]],
                "vqs": [[int(cur[d]) for d in days]],
            }
        )

    return stream.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_conversion_join(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon_s: int = 3600,
    watermark: str = "2 hours",
) -> DataFrame:
    """STREAM-STREAM inner join: each purchase matched to every click
    by the same user in the preceding ``horizon_s`` seconds — the
    online conversion-attribution join, and the one Structured
    Streaming operator class (two watermarked stateful inputs joined
    on key + event-time range) nothing else in this module exercises.

    Both sides carry watermarks so Spark can bound join state: a click
    is held only until the purchase-side watermark passes
    click.ts + horizon (the range condition makes state eviction
    provable — an equality-only stream-stream join would hold state
    forever).  Inner-join emissions are append-only and EXACTLY the
    batch join's rows once the stream drains, which is the pytest
    parity gate.  Works identically on batch frames (the watermark
    step is skipped) for that gate.

    Scale shape: both inputs shuffle once on user_id; state per key is
    (clicks in horizon) x (purchases in horizon) — bounded by the
    watermark, skew-safe under AQE like any keyed join."""
    live = clicks.isStreaming
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    if live:
        c = c.withColumn("click_ts", F.col("click_ts").cast("timestamp"))
        p = p.withColumn(
            "purchase_ts", F.col("purchase_ts").cast("timestamp")
        )
        c = c.withWatermark("click_ts", watermark)
        p = p.withWatermark("purchase_ts", watermark)
    j = c.join(
        p,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {horizon_s} SECONDS")
        ),
    )
    return j.select(
        "click_id",
        "purchase_id",
        "user_id",
        F.col("click_ts").cast("timestamp_ntz").alias("click_ts"),
        F.col("purchase_ts").cast("timestamp_ntz").alias("purchase_ts"),
        F.expr("timestampdiff(SECOND, click_ts, purchase_ts)")
        .cast("long")
        .alias("delay_s"),
        "purchase_value",
    )


def stream_cdc_view(
    stream: DataFrame,
    root: str,
    keys: list[str],
    value_col: str,
    op_col: str = "op",
    checkpoint: str | None = None,
):
    """Streaming CDC consumer that maintains an aggregate view under
    inserts AND deletes — the maintenance mode watermarked window
    rollups cannot express (a delete must RETRACT from its group,
    while append-mode aggregation only ever adds).

    Each micro-batch reduces to a SIGNED grouped delta
    (operators/ivm.py algebra: +value/+1 per insert row, -value/-1
    per delete row — one map-side-combined aggregate over the batch
    only), applies it to the latest persisted view, and lands the new
    view under ``cdc_view/batch=<id>`` — the full view is |keys| rows,
    so rewriting it per batch is O(view), never O(history).

    Exactly-once under foreachBatch's at-least-once replay: batch N
    always merges onto the newest view with id < N and OVERWRITES its
    own directory, so a replayed batch recomputes the identical
    result instead of double-applying; readers take the max batch id
    (:func:`read_cdc_view`).  Fully-retracted groups disappear (counts
    decide existence, not sums).  Measures must be exact types —
    the view is bit-equal to a batch recompute over the net rows,
    parity-gated in tests/test_streaming.py."""
    import os

    from pyconform_spark.operators import ivm

    base = os.path.join(root, "cdc_view")

    def _prev_view(spark, before: int):
        ids = [
            int(d.split("=", 1)[1])
            for d in (os.listdir(base) if os.path.isdir(base) else [])
            if d.startswith("batch=") and int(d.split("=", 1)[1]) < before
        ]
        if not ids:
            return None
        return spark.read.parquet(os.path.join(base, f"batch={max(ids)}"))

    def _apply_batch(df: DataFrame, batch_id: int) -> None:
        spark = df.sparkSession
        sign = F.when(F.col(op_col) == "D", F.lit(-1)).otherwise(F.lit(1))
        signed = df.select(
            *keys,
            (F.col(value_col) * sign).alias("_sv"),
            sign.alias("_s"),
        )
        delta = signed.groupBy(*keys).agg(
            F.sum("_sv").cast("decimal(38,6)").alias("total"),
            F.sum("_s").cast("long").alias("ivm_count"),
        )
        prev = _prev_view(spark, batch_id)
        view = (
            ivm.apply(prev, delta, keys, ["total"])
            if prev is not None
            else delta.where(F.col("ivm_count") > 0)
        )
        view.write.mode("overwrite").parquet(
            os.path.join(base, f"batch={batch_id}")
        )

    writer = stream.writeStream.outputMode("append").foreachBatch(_apply_batch)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer


def read_cdc_view(spark, root: str) -> DataFrame:
    """Latest committed CDC view (max batch id under ``cdc_view/``)."""
    import os

    base = os.path.join(root, "cdc_view")
    ids = [
        int(d.split("=", 1)[1])
        for d in os.listdir(base)
        if d.startswith("batch=")
    ]
    return spark.read.parquet(os.path.join(base, f"batch={max(ids)}"))


def stream_mann_kendall(stream: DataFrame, k: int = 24) -> DataFrame:
    """Continuous Mann-Kendall trend monitoring
    (applyInPandasWithState): per (user_id, event_type) the state is
    the k=24 MOST RECENT samples as (t_us, event_id, vq) arrays —
    bounded, and merged by (ts, event_id) recency on every
    micro-batch, so the carried top-k is ORDER-ROBUST: any arrival
    order of the same rows converges to the same state (late data
    needs no special path — a late sample either displaces the
    window's oldest entry or is too old to matter, exactly as in the
    batch query's recency frame).  Each update emits the refreshed
    (n, S, var18, z, trend) row computed with the identical integer
    tie-corrected formulas as ``queries.mann_kendall_trend``.

    Parity gate (pytest): after all micro-batches the latest emission
    per series equals the batch query bit-for-bit.

    Scale shape: 24 triples per live series of state, one emission
    per touched series per micro-batch — the alerting loop runs the
    O(k^2) sign count on 276 pairs per update, never on history."""
    import math

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = T.StructType([
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("n", T.LongType(), False),
        T.StructField("s_stat", T.LongType(), False),
        T.StructField("var18", T.LongType(), False),
        T.StructField("z", T.DoubleType(), False),
        T.StructField("trend", T.StringType(), False),
    ])
    state_schema = T.StructType([
        T.StructField("t_us", T.ArrayType(T.LongType()), True),
        T.StructField("eid", T.ArrayType(T.LongType()), True),
        T.StructField("vq", T.ArrayType(T.LongType()), True),
    ])

    def _update(key, pdfs, state: GroupState):
        user_id, event_type = key
        rows: list[tuple[int, int, int]] = []
        if state.exists:
            t0, e0, v0 = state.get
            rows = list(zip(t0, e0, v0))
        parts = list(pdfs)
        if parts:
            pdf = (
                parts[0]
                if len(parts) == 1
                else pd.concat(parts, ignore_index=True)
            )
            t_us = (
                pdf["ts"].to_numpy().astype("datetime64[us]").astype("int64")
            )
            vq = np.floor(
                pdf["value"].to_numpy(dtype="float64") * 100
            ).astype("int64")
            eid = pdf["event_id"].to_numpy(dtype="int64")
            rows += list(zip(t_us.tolist(), eid.tolist(), vq.tolist()))
        if not rows:
            return
        rows.sort(key=lambda r: (r[0], r[1]), reverse=True)
        rows = rows[:k]
        state.update((
            [r[0] for r in rows],
            [r[1] for r in rows],
            [r[2] for r in rows],
        ))
        vals = [r[2] for r in rows][::-1]  # time-ascending
        n = len(vals)
        if n < 2:
            return
        s = sum(
            (vals[j] > vals[i]) - (vals[j] < vals[i])
            for i in range(n)
            for j in range(i + 1, n)
        )
        tie: dict[int, int] = {}
        for v in vals:
            tie[v] = tie.get(v, 0) + 1
        var18 = n * (n - 1) * (2 * n + 5) - sum(
            t * (t - 1) * (2 * t + 5) for t in tie.values()
        )
        z = (
            0.0
            if s == 0
            else (s - (1 if s > 0 else -1)) / math.sqrt(var18 / 18.0)
        )
        trend = (
            "increasing"
            if z > 1.959963984540054
            else "decreasing"
            if z < -1.959963984540054
            else "no_trend"
        )
        yield pd.DataFrame(
            {
                "user_id": [int(user_id)],
                "event_type": [event_type],
                "n": [int(n)],
                "s_stat": [int(s)],
                "var18": [int(var18)],
                "z": [float(z)],
                "trend": [trend],
            }
        )

    return stream.groupBy("user_id", "event_type").applyInPandasWithState(
        _update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_tvd_drift(
    stream: DataFrame,
    split_s: dict[str, int],
    bin_width: int = 5000,
    n_bins: int = 32,
) -> DataFrame:
    """Continuous distribution-drift monitoring
    (applyInPandasWithState): per event_type the state is TWO bounded
    histogram arrays — the REFERENCE window (events at or before the
    type's split epoch-second, e.g. "what the model was trained on")
    and the CURRENT window (everything after) — and every micro-batch
    emits the refreshed total-variation distance between them with the
    identical exact-integer formula as ``queries.tvd_drift``
    (sum |c_a*n_b - c_b*n_a| BIGINT, ONE divide by 2*n_a*n_b).

    The state is ORDER-ROBUST by construction: histogram counts are
    commutative sums, so any arrival order (and any micro-batch
    split) of the same rows converges to the same state — late data
    lands in whichever side of the fixed split it belongs to, no
    special path.  ``split_s`` maps event_type -> split epoch-second
    (a CONFIG in production — the reference-corpus boundary — not
    data-derived; the parity test derives it from the batch query's
    own midpoint so stream == batch bit-for-bit).

    Scale shape: 2 x n_bins longs per live type of state; one
    emission per touched type per micro-batch; nothing ever rescans
    history."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = T.StructType([
        T.StructField("event_type", T.StringType(), False),
        T.StructField("n_a", T.LongType(), False),
        T.StructField("n_b", T.LongType(), False),
        T.StructField("n_bins", T.LongType(), False),
        T.StructField("tvd_num", T.LongType(), False),
        T.StructField("tvd", T.DoubleType(), True),
    ])
    state_schema = T.StructType([
        T.StructField("c_a", T.ArrayType(T.LongType()), True),
        T.StructField("c_b", T.ArrayType(T.LongType()), True),
    ])

    def _update(key, pdfs, state: GroupState):
        (event_type,) = key
        if state.exists:
            a0, b0 = state.get
            c_a = np.asarray(a0, dtype="int64")
            c_b = np.asarray(b0, dtype="int64")
        else:
            c_a = np.zeros(n_bins, dtype="int64")
            c_b = np.zeros(n_bins, dtype="int64")
        split = int(split_s.get(event_type, 0))
        touched = False
        for pdf in pdfs:
            if not len(pdf):
                continue
            touched = True
            es = (
                pdf["ts"].to_numpy().astype("datetime64[s]").astype("int64")
            )
            vq = np.floor(
                pdf["value"].to_numpy(dtype="float64") * 100
            ).astype("int64")
            b = vq // bin_width
            if (b < 0).any() or (b >= n_bins).any():
                raise ValueError(
                    "tvd_drift bin out of range — raise n_bins"
                )
            in_a = es <= split
            c_a += np.bincount(b[in_a], minlength=n_bins)
            c_b += np.bincount(b[~in_a], minlength=n_bins)
        if not touched:
            return
        state.update((c_a.tolist(), c_b.tolist()))
        n_a = int(c_a.sum())
        n_b = int(c_b.sum())
        tvd_num = int(np.abs(c_a * n_b - c_b * n_a).sum())
        tvd = (
            float(tvd_num) / float(2 * n_a * n_b)
            if n_a > 0 and n_b > 0
            else None
        )
        yield pd.DataFrame(
            {
                "event_type": [event_type],
                "n_a": [n_a],
                "n_b": [n_b],
                "n_bins": [int(((c_a + c_b) > 0).sum())],
                "tvd_num": [tvd_num],
                "tvd": [tvd],
            }
        )

    return (
        stream.select("event_type", "ts", "value")
        .groupBy("event_type")
        .applyInPandasWithState(
            _update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stream_rolling_p90(stream: DataFrame, k: int = 20) -> DataFrame:
    """Continuous trailing-p90 monitoring (applyInPandasWithState):
    per (user_id, event_type) the state is the k=20 MOST RECENT
    samples as (t_us, event_id, vq) arrays — the same order-robust
    bounded top-k-recency state as ``stream_mann_kendall`` (any
    arrival order of the same rows converges to the same state) —
    and every micro-batch emits the refreshed exact order statistic
    p90 = element ceil(0.9*n) of the ascending-sorted window, the
    IDENTICAL integer convention as ``queries.rolling_p90``'s last
    row per series.

    Parity gate (pytest): after all micro-batches the latest emission
    per series equals the batch query's final row bit-for-bit.

    Scale shape: 20 triples per live series of state, one emission
    per touched series per micro-batch; nothing rescans history."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = T.StructType([
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("n_win", T.LongType(), False),
        T.StructField("p90_cq", T.LongType(), False),
        T.StructField("p90_value", T.DoubleType(), False),
    ])
    state_schema = T.StructType([
        T.StructField("t_us", T.ArrayType(T.LongType()), True),
        T.StructField("eid", T.ArrayType(T.LongType()), True),
        T.StructField("vq", T.ArrayType(T.LongType()), True),
    ])

    def _update(key, pdfs, state: GroupState):
        user_id, event_type = key
        rows: list[tuple[int, int, int]] = []
        if state.exists:
            t0, e0, v0 = state.get
            rows = list(zip(t0, e0, v0))
        touched = False
        for pdf in pdfs:
            if not len(pdf):
                continue
            touched = True
            t_us = (
                pdf["ts"].to_numpy().astype("datetime64[us]").astype("int64")
            )
            vq = np.floor(
                pdf["value"].to_numpy(dtype="float64") * 100
            ).astype("int64")
            eid = pdf["event_id"].to_numpy(dtype="int64")
            rows += list(zip(t_us.tolist(), eid.tolist(), vq.tolist()))
        if not rows or not touched:
            return
        rows.sort(key=lambda r: (r[0], r[1]), reverse=True)
        rows = rows[:k]
        state.update((
            [r[0] for r in rows],
            [r[1] for r in rows],
            [r[2] for r in rows],
        ))
        win = sorted(r[2] for r in rows)
        n = len(win)
        p90 = win[(9 * n + 9) // 10 - 1]
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "event_type": [event_type],
                "n_win": [n],
                "p90_cq": [p90],
                "p90_value": [p90 / 100.0],
            }
        )

    return (
        stream.select("user_id", "event_type", "ts", "event_id", "value")
        .groupBy("user_id", "event_type")
        .applyInPandasWithState(
            _update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stream_cusum(
    stream: DataFrame,
    target_cu: int = 10_000,
    slack_cu: int = 500,
    h_cu: int = 80_000,
) -> DataFrame:
    """Streaming one-sided CUSUM (Page's test) per series — the
    continuous twin of queries.cusum_changepoints, which documents the
    closed form S_i = C_i - least(0, min(C_1..C_i)).  The carried
    state is exactly TWO BIGINTs per series: the last cumulative sum C
    and the running minimum of C — O(1) state, not O(history), and
    both compose associatively so state never needs the raw tail.

    Assumes in-order arrival per series across micro-batches (the
    ingest contract shared by the other recursion twins; late rows
    belong to the refresh path).  A group's rows inside one
    micro-batch are concatenated and sorted ONCE before scoring, so
    Arrow chunk splits cannot corrupt the carry.  All arithmetic is
    int64 on centi-quantized values — stream output equals the batch
    query BIT-FOR-BIT (pytest parity gate)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql import types as T

    out_schema = T.StructType([
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("event_id", T.LongType(), False),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("cusum_cu", T.LongType(), True),
        T.StructField("is_alarm", T.BooleanType(), False),
    ])
    state_schema = T.StructType([
        T.StructField("c_last", T.LongType(), True),
        T.StructField("c_min", T.LongType(), True),
    ])
    shift = target_cu + slack_cu

    def _update(key, pdfs, state: GroupState):
        user_id, event_type = key
        parts = list(pdfs)
        if not parts:
            return
        pdf = parts[0] if len(parts) == 1 else pd.concat(parts, ignore_index=True)
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        if state.exists:
            c0, m0 = state.get
        else:
            c0, m0 = 0, None
        xc = (
            np.floor(pdf["value"].to_numpy(dtype=np.float64) * 100
                     ).astype(np.int64)
            - shift
        )
        c = c0 + np.cumsum(xc)
        runmin = np.minimum.accumulate(c)
        if m0 is not None:
            runmin = np.minimum(runmin, m0)
        s = c - np.minimum(0, runmin)
        out = pd.DataFrame({
            "user_id": np.full(len(xc), user_id, dtype=np.int64),
            "event_type": event_type,
            "ts": pdf["ts"].to_numpy(),
            "event_id": pdf["event_id"].to_numpy(dtype=np.int64),
            "value": pdf["value"].to_numpy(dtype=np.float64),
            "cusum_cu": s,
            "is_alarm": s > h_cu,
        })
        yield out
        state.update((int(c[-1]), int(runmin[-1])))

    return stream.groupBy("user_id", "event_type").applyInPandasWithState(
        _update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_hll_registers(stream: DataFrame) -> DataFrame:
    """Continuous cardinality: HyperLogLog registers per event_type as
    a STREAMING stateful max-aggregate — the streaming twin of
    queries.hll_distinct_users (same md5 hash, same bucket/rank
    staging via the shared queries.hll_registers builder).

    Emits (event_type, _b, m) register updates in UPDATE mode.  No
    watermark, deliberately: register state never expires and is
    bounded at |event_types| x 512 rows regardless of stream length —
    the sketch IS the eviction policy.  Registers are max-mergeable,
    so folding the memory-sink updates with max over (event_type, _b)
    yields exactly the batch register table at any point; feed that to
    queries.hll_estimate_from_registers for the estimate (a second
    unwindowed stateful agg cannot be chained in one streaming query,
    so the fold-at-read split mirrors how a production job would serve
    the estimate from the continuously-maintained register store)."""
    from pyconform_spark import queries as Q

    return Q.hll_registers(stream)


def stream_mg_summary(
    stream: DataFrame,
    key_col: str = "user_id",
    k: int = 8,
    shards: int = 8,
) -> DataFrame:
    """Continuous Misra-Gries heavy-hitter summaries — the streaming
    twin of operators.heavyhitters (same _mg_merge decrement rule, so
    the mergeable-summaries guarantee ``true_count - N/(k+1) <=
    summed_mg <= true_count`` holds for ANY arrival order and ANY
    micro-batch split).

    Sharded exactly like the batch sketch is partitioned: each of
    ``shards`` hash shards keeps one k-entry summary in state (bounded
    at shards x k rows forever — the sketch IS the eviction policy,
    like stream_hll_registers).  Every micro-batch each touched shard
    re-emits its full summary in UPDATE mode stamped with a
    monotonically increasing ``emit_seq``; the reader folds the memory
    sink with "latest emit_seq per shard", sums summaries across
    shards, applies the candidate rule ``mg_sum >= T - N/(k+1)`` and
    verifies exactly — identical downstream composition to
    heavy_hitters_exact, so the VERIFIED output is bit-equal to the
    batch run (exactness comes from the verify, not the sketch).

    One sentinel row per shard (NULL key) carries the shard's total
    row count N_shard, mirroring the batch summaries' contract."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    from pyconform_spark.operators.heavyhitters import _mg_merge

    out_schema = (
        f"shard long, {key_col} long, mg_count long, "
        "part_rows long, emit_seq long"
    )
    state_schema = (
        "keys array<long>, counts array<long>, total long, seq long"
    )

    def upd(key, pdfs, state):
        shard = int(key[0])
        if state.exists:
            keys, counts, total, seq = state.get
            acc = pd.Series(
                [float(c) for c in counts], index=list(keys), dtype="float64"
            )
        else:
            acc, total, seq = pd.Series(dtype="float64"), 0, 0
        for pdf in pdfs:
            total += len(pdf)
            acc = _mg_merge(acc, pdf[key_col].value_counts(), k)
        seq += 1
        state.update((
            [int(x) for x in acc.index],
            [int(x) for x in acc.values],
            int(total),
            int(seq),
        ))
        ks = [int(x) for x in acc.index]
        cs = [int(x) for x in acc.values]
        yield pd.DataFrame(
            {
                "shard": pd.array([shard] * (len(ks) + 1), dtype="Int64"),
                key_col: pd.array(ks + [None], dtype="Int64"),
                "mg_count": pd.array(cs + [0], dtype="Int64"),
                "part_rows": pd.array(
                    [0] * len(ks) + [int(total)], dtype="Int64"
                ),
                "emit_seq": pd.array(
                    [int(seq)] * (len(ks) + 1), dtype="Int64"
                ),
            }
        )

    shard = (F.col(key_col) % shards).cast("long").alias("shard")
    return (
        stream.select(shard, key_col)
        .groupBy("shard")
        .applyInPandasWithState(
            upd,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stream_time_decay(stream: DataFrame) -> DataFrame:
    """Streaming twin of ``queries.ewma_time_decay_1h`` — the
    half-life-1h wall-clock-decayed hourly mean per user, emitted
    continuously.  The carried state is the trailing ≤ 41 hourly
    cells (hour, Σvq, count) per user — bounded by the EXACT window
    the batch query uses (2⁻⁴⁰ contributions are dropped there too),
    so state is O(window), never O(history).

    Contract: in-order arrival per user across micro-batches (the
    recursion twins' shared ingest contract).  Within a batch, rows
    aggregate into hourly partials first, so Arrow chunk splits and
    intra-batch disorder are harmless; an hour SPLIT across batches
    re-emits its row with the updated value — with update-mode
    semantics the LAST emission per (user, hour) equals the batch
    query bit-for-bit (pytest parity gate): Python's float(int) and
    Spark's DECIMAL(38,0)→double cast are both correctly-rounded, and
    the division is the same IEEE op."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql import types as T

    out_schema = T.StructType([
        T.StructField("user_id", T.LongType(), False),
        T.StructField("bucket_ts", T.TimestampNTZType(), True),
        T.StructField("decayed_mean", T.DoubleType(), True),
    ])
    state_schema = T.StructType([
        T.StructField("hbs", T.ArrayType(T.LongType()), True),
        T.StructField("vsums", T.ArrayType(T.LongType()), True),
        T.StructField("cnts", T.ArrayType(T.LongType()), True),
    ])

    def _update(key, pdfs, state: GroupState):
        (user_id,) = key
        parts = list(pdfs)
        if not parts:
            return
        pdf = (
            parts[0]
            if len(parts) == 1
            else pd.concat(parts, ignore_index=True)
        )
        ns = pdf["ts"].to_numpy(dtype="datetime64[ns]").astype("int64")
        hb = (ns // (3600 * 10**9)).astype("int64")
        vq = np.floor(
            pdf["value"].to_numpy(dtype=np.float64) * 100
        ).astype(np.int64)
        cells: dict[int, tuple[int, int]] = {}
        for h, v in zip(hb.tolist(), vq.tolist()):
            s = cells.get(h)
            cells[h] = (s[0] + v, s[1] + 1) if s else (v, 1)
        if state.exists:
            hbs, vsums, cnts = state.get
            for h, v, c in zip(hbs, vsums, cnts):
                s = cells.get(h)
                cells[h] = (s[0] + v, s[1] + c) if s else (v, c)
        # emit every hour touched by THIS batch from the full cells
        out_h, out_m = [], []
        for h in sorted(set(hb.tolist())):
            num = 0
            den = 0
            for h2, (v, c) in cells.items():
                if h - 40 <= h2 <= h:
                    w = 1 << (40 - (h - h2))
                    num += v * w
                    den += c * w
            out_h.append(h)
            out_m.append(float(num) / float(den))
        yield pd.DataFrame(
            {
                "user_id": np.full(len(out_h), user_id, dtype=np.int64),
                "bucket_ts": pd.to_datetime(
                    np.array(out_h, dtype="int64") * 3600, unit="s"
                ),
                "decayed_mean": np.array(out_m, dtype=np.float64),
            }
        )
        hmax = max(cells)
        kept = sorted(h for h in cells if h >= hmax - 40)
        state.update(
            (
                [int(h) for h in kept],
                [int(cells[h][0]) for h in kept],
                [int(cells[h][1]) for h in kept],
            )
        )

    return stream.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_kalman_level(
    stream: DataFrame, q: float = 0.25, r: float = 1.0
) -> DataFrame:
    """Streaming twin of ``queries.kalman_hourly_rate`` — the
    local-level Kalman filter over per-type hourly event counts,
    emitted continuously.  The carried state is FOUR scalars per
    event_type: the in-progress hour and its running count, plus the
    filter's (level, variance) at the last CLOSED hour — O(1), never
    O(history), because the local-level recurrence needs nothing else.

    An hour CLOSES when a later hour's first event arrives; closing
    steps the recurrence once for the closed hour's final count and
    once (y = 0) for every empty hour in the gap — reproducing the
    batch query's dense axis.  The still-open hour emits a PROVISIONAL
    row each batch, recomputed from the committed state plus the
    running count WITHOUT updating state, so an hour split across
    micro-batches re-emits with a growing count and the emission with
    the LARGEST count per (type, hour) — its final one — equals the
    batch query BIT-FOR-BIT, including the series' last hour, which
    no later event ever closes (pytest parity gate with a mid-hour
    batch cut).

    Contract: in-order arrival per type across micro-batches (the
    recursion twins' shared ingest contract); within a batch the
    group's chunks are concatenated and sorted ONCE, so Arrow chunk
    splits are harmless."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql import types as T

    out_schema = T.StructType([
        T.StructField("event_type", T.StringType(), False),
        T.StructField("h", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("kalman_level", T.DoubleType(), True),
        T.StructField("kalman_gain", T.DoubleType(), True),
        T.StructField("kalman_var", T.DoubleType(), True),
    ])
    state_schema = T.StructType([
        T.StructField("h_cur", T.LongType(), True),
        T.StructField("c_cur", T.LongType(), True),
        T.StructField("lvl", T.DoubleType(), True),
        T.StructField("pvar", T.DoubleType(), True),
        T.StructField("inited", T.BooleanType(), True),
    ])

    def _step(l: float, p: float, y: float):
        Pp = p + q
        K = Pp / (Pp + r)
        return l + K * (y - l), (1.0 - K) * Pp, K

    def _close(l, p, y: float, inited: bool):
        if not inited:
            return y, r, None
        return _step(l, p, y)

    def _update(key, pdfs, state: GroupState):
        (event_type,) = key
        parts = list(pdfs)
        if not parts:
            return
        pdf = parts[0] if len(parts) == 1 else pd.concat(
            parts, ignore_index=True
        )
        if len(pdf) == 0 and not state.exists:
            # a group batch with zero rows and no prior state has no
            # hour to open or close — emitting would fabricate an
            # h=None row (non-null schema) or hit uninitialized state
            return
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        hours = (
            pdf["ts"].to_numpy(dtype="datetime64[ns]").astype("int64")
            // (3600 * 10**9)
        ).astype(np.int64)
        uh, counts = np.unique(hours, return_counts=True)  # ascending
        if state.exists:
            h_cur, c_cur, l, p, inited = state.get
        else:
            h_cur = None
        rows = []
        for h, c in zip(uh.tolist(), counts.tolist()):
            if h_cur is None:
                h_cur, c_cur, l, p, inited = h, 0, None, None, False
            if h == h_cur:
                c_cur += int(c)
                continue
            # close the open hour, then the empty gap, then move on
            l, p, K = _close(l, p, float(c_cur), inited)
            inited = True
            rows.append((event_type, h_cur, c_cur, l, K, p))
            for hz in range(h_cur + 1, h):
                l, p, K = _step(l, p, 0.0)
                rows.append((event_type, hz, 0, l, K, p))
            h_cur, c_cur = h, int(c)
        # provisional row for the still-open hour (state not advanced)
        lp, pp, Kp = _close(l, p, float(c_cur), inited)
        rows.append((event_type, h_cur, c_cur, lp, Kp, pp))
        yield pd.DataFrame(
            rows,
            columns=[
                "event_type", "h", "n_events",
                "kalman_level", "kalman_gain", "kalman_var",
            ],
        )
        state.update((int(h_cur), int(c_cur), l, p, bool(inited)))

    return stream.groupBy("event_type").applyInPandasWithState(
        _update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_backlog(stream: DataFrame, capacity_per_min: int) -> DataFrame:
    """Streaming queue-depth monitor — the continuous twin of
    queries.backlog_drain_planner's Lindley sweep at a FIXED
    provisioned capacity: per event_type, the backlog
    b_m = max(0, b_{m-1} + arrivals_m - C) emitted per minute as the
    stream advances.  The carried state is FOUR BIGINTs per type: the
    open minute and its running count, plus the closed-prefix drift
    sum and its running minimum — the closed form
    b = drift - min(0, min-prefix-drift) needs nothing else, so state
    is O(1), never O(history).

    A minute CLOSES when a later minute's first event arrives
    (empty gap minutes each step the drift by -C and emit their
    backlog); the open minute emits a PROVISIONAL row per batch,
    recomputed without committing state — the emission with the
    largest count per (type, minute) equals the batch sweep
    bit-for-bit, including the final minute no later event closes
    (pytest parity vs an independent Lindley loop, with a mid-minute
    batch cut).  In-order arrival per type across micro-batches, as
    with the other recursion twins; in-batch chunks are concatenated
    and sorted once."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql import types as T

    cap = int(capacity_per_min)
    out_schema = T.StructType([
        T.StructField("event_type", T.StringType(), False),
        T.StructField("m", T.LongType(), False),
        T.StructField("n_arrivals", T.LongType(), False),
        T.StructField("backlog", T.LongType(), False),
    ])
    state_schema = T.StructType([
        T.StructField("m_cur", T.LongType(), True),
        T.StructField("a_cur", T.LongType(), True),
        T.StructField("drift", T.LongType(), True),
        T.StructField("runmin", T.LongType(), True),
    ])

    def _update(key, pdfs, state: GroupState):
        (event_type,) = key
        parts = list(pdfs)
        if not parts:
            return
        pdf = parts[0] if len(parts) == 1 else pd.concat(
            parts, ignore_index=True
        )
        if len(pdf) == 0 and not state.exists:
            # no rows and no carried state: nothing to close, and the
            # provisional close would emit m=None into a non-null column
            return
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        mins = (
            pdf["ts"].to_numpy(dtype="datetime64[ns]").astype("int64")
            // (60 * 10**9)
        ).astype(np.int64)
        um, counts = np.unique(mins, return_counts=True)
        if state.exists:
            m_cur, a_cur, drift, runmin = state.get
        else:
            m_cur, a_cur, drift, runmin = None, 0, 0, 0
        rows = []

        def close(m, a, drift, runmin):
            drift += a - cap
            runmin = min(runmin, drift)
            rows.append(
                (event_type, m, a, drift - min(0, runmin))
            )
            return drift, runmin

        for m, c in zip(um.tolist(), counts.tolist()):
            if m_cur is None:
                m_cur, a_cur = m, 0
            if m == m_cur:
                a_cur += int(c)
                continue
            drift, runmin = close(m_cur, a_cur, drift, runmin)
            for mz in range(m_cur + 1, m):
                drift, runmin = close(mz, 0, drift, runmin)
            m_cur, a_cur = m, int(c)
        # provisional open-minute row (state not advanced)
        close(m_cur, a_cur, drift, runmin)
        yield pd.DataFrame(
            rows, columns=["event_type", "m", "n_arrivals", "backlog"]
        )
        state.update((int(m_cur), int(a_cur), int(drift), int(runmin)))

    return stream.groupBy("event_type").applyInPandasWithState(
        _update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
