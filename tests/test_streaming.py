"""Stream/batch parity for the tier rollup and session windows.

The streaming query graph must produce exactly the batch tier over the
same input once drained (availableNow backfill) — this is the parity
that makes streaming ingest resumable into the same tier tables.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyconform_spark import streaming, synth
from pyconform_spark.operators import rollup
from pyconform_spark.tables import TRANSCRIPTS_SCHEMA


@pytest.fixture(scope="module")
def tx_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("tx") / "transcripts")
    synth.transcripts(spark, 8000).write.mode("overwrite").parquet(path)
    return path


def _key(t):
    return tuple((x is None, x) for x in t)


def _rows(df):
    return sorted(map(tuple, df.collect()), key=_key)


def test_stream_rollup_matches_batch(spark, tx_dir):
    batch = spark.read.parquet(tx_dir)
    # ts must be TimestampType for watermarks; synth emits ntz
    stream = (
        spark.readStream.schema(batch.schema)
        .parquet(tx_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    out = streaming.stream_tier_rollup(stream, "1m")
    assert out.isStreaming
    streaming.run_stream_to_memory(out, "t1m_stream")
    got = _rows(spark.table("t1m_stream"))
    want = _rows(rollup.tier_rollup(batch, "1m"))
    assert got == want


def test_stream_sessionize_matches_batch(spark, tx_dir):
    batch = spark.read.parquet(tx_dir).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    stream = (
        spark.readStream.schema(spark.read.parquet(tx_dir).schema)
        .parquet(tx_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    out = streaming.stream_sessionize(stream)
    streaming.run_stream_to_memory(out, "sess_stream")
    got = _rows(spark.table("sess_stream"))
    want = _rows(streaming.stream_sessionize(batch))
    assert got == want
    assert len(got) > 0


def test_append_mode_emits_only_closed_windows(spark, tmp_path):
    """Append mode with a watermark: after draining batch 1, a second
    much-later batch advances the watermark and flushes the earlier
    windows."""
    src = str(tmp_path / "in")
    ckpt = str(tmp_path / "ck")
    early = synth.transcripts(spark, 500)
    # single file => batch 1 is ONE micro-batch, so the watermark only
    # advances after it completes and nothing is emitted yet
    early.coalesce(1).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA)
        .option("maxFilesPerTrigger", "1000")
        .parquet(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    out = streaming.stream_tier_rollup(stream, "1m", watermark="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("append_tier")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        n1 = spark.table("append_tier").count()

        # batch 2: shift far into the future -> watermark passes batch 1
        late = early.withColumn(
            "ts", F.col("ts") + F.expr("INTERVAL 30 DAYS")
        )
        late.coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        early_max = early.agg(
            F.max(F.col("ts").cast("timestamp"))
        ).first()[0]
        emitted_early = _rows(
            spark.table("append_tier").where(
                F.col("bucket_start").cast("timestamp") <= early_max
            )
        )
    finally:
        q.stop()

    want = rollup.tier_rollup(early, "1m")
    n_want = want.count()
    # after batch 1 the watermark sits 1h behind max event time: only
    # windows ending before it are emitted — some, but not the tail
    n_closed = want.where(
        F.col("bucket_start").cast("timestamp").cast("long") + 60
        <= early.agg(F.max(F.col("ts").cast("timestamp").cast("long"))).first()[0]
        - 3600
    ).count()
    assert n1 == n_closed
    assert 0 < n1 < n_want
    # the late batch pushed the watermark past all of batch 1: batch 1's
    # windows are now all flushed and value-identical to the batch tier
    assert emitted_early == _rows(want)


def test_stateful_conv_stats_across_batches(spark, tmp_path):
    """applyInPandasWithState: state carries across micro-batches —
    batch 2's emitted counts include batch 1's turns."""
    src = str(tmp_path / "in2")
    ckpt = str(tmp_path / "ck2")
    tx = synth.transcripts(spark, 400).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    tx.persist().count()
    b1 = tx.where(F.col("turn_idx") % 2 == 0)
    b2 = tx.where(F.col("turn_idx") % 2 == 1)
    b1.coalesce(1).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", "1000")
        .parquet(src)
    )
    out = streaming.stream_conv_stats(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("conv_stats")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        mid = {
            r["conv_id"]: r["n_turns"]
            for r in spark.table("conv_stats").collect()
        }
        b2.coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        # memory sink in update mode appends rows; keep the LAST emit
        # per conv (the most recent state)
        final_rows = spark.table("conv_stats").collect()
    finally:
        q.stop()

    final = {}
    for r in final_rows:
        final[r["conv_id"]] = r  # later rows overwrite earlier emissions

    want = {
        r["conv_id"]: (r["n"], r["b"])
        for r in tx.groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.coalesce(F.length("text"), F.lit(0))).alias("b"),
        )
        .collect()
    }
    assert set(final) == set(want)
    for cid, row in final.items():
        assert row["n_turns"] == want[cid][0], cid
        assert row["text_bytes"] == want[cid][1], cid
        assert row["n_turns"] > mid.get(cid, 0)  # state accumulated
    tx.unpersist()


def test_stream_to_store_exactly_once(spark, tmp_path):
    """Streaming ingest writes each closed window exactly once into the
    epoch-partitioned store; the stored rows equal the batch tier over
    the closed range."""
    src = str(tmp_path / "in3")
    root = str(tmp_path / "store3")
    ckpt = str(tmp_path / "ck3")
    early = synth.transcripts(spark, 600)
    early.coalesce(1).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA)
        .parquet(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    q = streaming.stream_to_store(
        stream, root, "1m", watermark="1 hour", checkpoint=ckpt
    ).start()
    try:
        q.processAllAvailable()
        late = early.withColumn("ts", F.col("ts") + F.expr("INTERVAL 30 DAYS"))
        late.coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    stored = streaming.read_stream_store(spark, root, "1m")
    early_max = early.agg(F.max(F.col("ts").cast("timestamp"))).first()[0]
    stored_early = stored.where(
        F.col("bucket_start").cast("timestamp") <= early_max
    )
    want = rollup.tier_rollup(early, "1m")
    assert _rows(stored_early) == _rows(want)
    # no duplicates anywhere in the store
    n_all = stored.count()
    n_distinct = stored.dropDuplicates(
        ["conv_id", "tool", "role", "bucket_start"]
    ).count()
    assert n_all == n_distinct


def test_stream_store_cascade_matches_batch(spark, tmp_path):
    src = str(tmp_path / "in4")
    root = str(tmp_path / "store4")
    ckpt = str(tmp_path / "ck4")
    tx = synth.transcripts(spark, 500)
    tx.coalesce(1).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA)
        .parquet(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    q = streaming.stream_to_store(
        stream, root, "1m", watermark="1 hour", checkpoint=ckpt
    ).start()
    try:
        q.processAllAvailable()
        late = tx.withColumn("ts", F.col("ts") + F.expr("INTERVAL 30 DAYS"))
        late.coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    streaming.cascade_stream_store(spark, root)
    # the 1h cascade over the streamed 1m points equals a direct batch
    # 1h rollup over exactly those closed 1m points' source rows
    t1m = streaming.read_stream_store(spark, root, "1m")
    want = rollup.cascade_rollup(t1m, "1h")
    got = streaming.read_cascade_tier(spark, root, "1h")
    assert _rows(got) == _rows(want)
    assert got.count() > 0


def test_incremental_cascade_recomputes_only_changed_epochs(spark, tmp_path):
    src = str(tmp_path / "in5")
    root = str(tmp_path / "store5")
    ckpt = str(tmp_path / "ck5")
    tx = synth.transcripts(spark, 800)
    tx.coalesce(1).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA)
        .parquet(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    q = streaming.stream_to_store(
        stream, root, "1m", watermark="1 hour", checkpoint=ckpt
    ).start()
    try:
        q.processAllAvailable()
        late = tx.withColumn("ts", F.col("ts") + F.expr("INTERVAL 40 DAYS"))
        late.coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        changed1 = streaming.cascade_stream_store_incremental(spark, root)
        assert changed1  # first cascade covers everything present

        # third batch far in the future: flushes late's tail, adds new epochs
        later = tx.withColumn("ts", F.col("ts") + F.expr("INTERVAL 80 DAYS"))
        later.coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    changed2 = streaming.cascade_stream_store_incremental(spark, root)
    assert changed2
    # epochs fully flushed before (from batch-1 era) are untouched now
    assert min(changed2) > min(changed1)

    # incremental result == full cascade from the current 1m store
    t1m = streaming.read_stream_store(spark, root, "1m")
    want = rollup.cascade_rollup(t1m, "1h")
    got = streaming.read_incremental_tier(spark, root, "1h")
    assert _rows(got) == _rows(want)

    # no-op when nothing changed
    assert streaming.cascade_stream_store_incremental(spark, root) == []


def test_spec_pipeline_applies_to_streams(spark, tx_dir):
    """The spec compiler output is a pure projection, so the SAME spec
    drives batch and Structured Streaming unchanged: streaming
    apply_spec == batch apply_spec over the same input (observe=False —
    streaming metrics ride query-progress listeners instead)."""
    from pyconform_spark import specs

    spec = {
        "conv": {"datatype": "string", "definition": "conv_id"},
        "idx": {"datatype": "bigint", "definition": "turn_idx"},
        "len2": {"datatype": "double", "definition": "turn_idx * 2.0 + 1.0"},
        "capped": {
            "datatype": "double",
            "definition": "limit(turn_idx, above=5.0)",
        },
    }
    batch = spark.read.parquet(tx_dir)
    want_df, _, _ = specs.apply_spec(batch, spec, observe=False)
    stream = spark.readStream.schema(batch.schema).parquet(tx_dir)
    got_df, _, warns = specs.apply_spec(stream, spec, observe=False)
    assert got_df.isStreaming and warns == []
    from pyconform_spark import streaming as S

    S.run_stream_to_memory(got_df, "spec_stream", output_mode="append")
    got = _rows(spark.table("spec_stream"))
    want = _rows(want_df)
    assert got == want


def test_stream_spec_store_matches_batch_run_spec(spark, tx_dir, tmp_path):
    """Continuous standardization: streaming spec materialization over
    the transcripts store equals the batch run_spec outputs row for
    row (exactly-once via per-batch directory overwrite)."""
    from pyconform_spark import specs, streaming as S

    spec = {
        "conv": {"datatype": "string", "definition": "conv_id"},
        "idx": {"datatype": "bigint", "definition": "turn_idx"},
        "scaled": {"datatype": "double", "definition": "turn_idx * 3.0 + 1.0"},
    }
    batch = spark.read.parquet(tx_dir)
    stream = spark.readStream.schema(batch.schema).parquet(tx_dir)

    root = str(tmp_path / "sstore")
    q = S.stream_spec_to_store(
        stream, spec, root, checkpoint=str(tmp_path / "ckpt")
    ).trigger(availableNow=True).start()
    q.awaitTermination()

    got = _rows(S.read_spec_stream_store(spark, root))

    broot = str(tmp_path / "bstore")
    specs.run_spec(spark, batch, spec, broot)
    want = _rows(specs.read_spec_outputs(spark, broot))
    assert got == want and len(got) == batch.count()


def test_stream_dedup_ingest_drops_replays(spark, tx_dir, tmp_path):
    """Continuous exact-dedup: an availableNow pass over a parquet dir
    containing DUPLICATED transcript turns emits exactly one row per
    distinct text, and the surviving sha set equals the batch
    dropDuplicates result."""
    from pyconform_spark import streaming as S

    tx = spark.read.parquet(tx_dir)
    dup_dir = str(tmp_path / "dup_tx")
    # every turn written twice -> a stream full of replays
    tx.unionAll(tx).write.mode("overwrite").parquet(dup_dir)

    stream = spark.readStream.schema(tx.schema).parquet(dup_dir)
    q = (
        S.stream_dedup_ingest(stream, watermark="1 hour")
        .writeStream.format("memory")
        .queryName("dedup_ingest")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT text_sha FROM dedup_ingest").toPandas()["text_sha"]
    batch = (
        S.stream_dedup_ingest(spark.read.parquet(dup_dir))
        .select("text_sha")
        .toPandas()["text_sha"]
    )
    assert got.nunique() == len(got)          # no duplicate passed
    assert set(got) == set(batch)             # same survivor set as batch
    assert len(got) == tx.select("text").distinct().count()


def test_stream_refresh_merges_late_data_exactly_once(spark, tmp_path):
    """stream_refresh_tiers: micro-batches (including arbitrarily-late
    rows) merge additively into the committed tier store; the final
    tiers equal the batch rollup over everything, and a replayed batch
    (foreachBatch at-least-once) is skipped via its lineage marker."""
    from pyconform_spark import pipeline

    src = str(tmp_path / "in6")
    root = str(tmp_path / "store6")
    ckpt = str(tmp_path / "ck6")
    tx = synth.transcripts(spark, 2000)
    day = F.floor(
        F.col("ts").cast("timestamp").cast("long") / pipeline.EPOCH_SECONDS
    ).cast("long")
    first_day = pipeline.list_epochs(tx)[0]
    ontime = tx.where(day != first_day)
    late = tx.where(day == first_day)  # arrives AFTER newer data
    ontime.coalesce(1).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA)
        .parquet(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    q = streaming.stream_refresh_tiers(stream, root, checkpoint=ckpt).start()
    try:
        q.processAllAvailable()
        late.coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    direct = rollup.all_tiers(tx)
    for tier in pipeline.TIER_ORDER:
        got = _rows(pipeline.read_tier(spark, root, tier))
        assert got == _rows(direct[tier]), tier

    # replay simulation: re-applying an already-committed batch is a no-op
    markers = pipeline.applied_refresh_markers(spark, root)
    assert len(markers) >= 2
    bid = sorted(markers)[-1]
    points = pipeline.refresh_late(spark, late, root, marker=bid)
    assert points == {t: 0 for t in pipeline.TIER_ORDER}
    for tier in pipeline.TIER_ORDER:
        assert _rows(pipeline.read_tier(spark, root, tier)) == _rows(
            direct[tier]
        ), tier


def test_stream_anomaly_zscore_matches_batch_bitwise(spark, tmp_path):
    """Stateful streaming z-score == batch anomaly_zscore bit-for-bit:
    the trailing-window state carries across micro-batch boundaries
    (the input is split mid-series by time)."""
    import math

    from pyconform_spark import queries as Q

    sf = "/root/testdata/sf0.001"
    events = spark.read.parquet(f"{sf}/events.parquet")
    src = str(tmp_path / "ev_in")
    cut = F.lit("2024-01-15").cast("timestamp_ntz")
    events.where(F.col("ts") < cut).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)

    stream = spark.readStream.schema(events.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    out = streaming.stream_anomaly_zscore(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("zstream")
        .start()
    )
    try:
        q.processAllAvailable()
        events.where(F.col("ts") >= cut).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        r.event_id: (r.zscore, r.is_anomaly)
        for r in spark.sql("select * from zstream").collect()
    }
    want = {
        r.event_id: (r.zscore, r.is_anomaly)
        for r in Q.anomaly_zscore(spark, sf).collect()
    }
    assert set(got) == set(want)
    for eid in want:
        gz, ga = got[eid]
        wz, wa = want[eid]
        assert ga == wa, eid
        assert (gz is None and wz is None) or gz == wz, (eid, gz, wz)


def test_stream_ohlc_matches_batch(spark, tx_dir):
    """OHLC bars computed by a streaming watermarked aggregate must
    equal the batch min_by/max_by aggregate row-for-row (turn ordering
    inside a bucket is (ts, turn_idx) in both modes)."""
    batch = spark.read.parquet(tx_dir)
    stream = (
        spark.readStream.schema(batch.schema)
        .parquet(tx_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    out = streaming.stream_ohlc(stream, "1m")
    assert out.isStreaming
    streaming.run_stream_to_memory(out, "ohlc_stream")
    got = _rows(spark.table("ohlc_stream"))
    want = _rows(streaming.stream_ohlc(batch, "1m"))
    assert len(got) > 100
    assert got == want

def test_stream_anomaly_zscore_multi_arrow_chunk_out_of_order(spark, tmp_path):
    """A single micro-batch whose rows for ONE group span multiple
    Arrow record batches AND are written out of time order: per-chunk
    sorting would score later chunks against a stale tail — the sort
    must happen once over the concatenated group (regression for the
    maxRecordsPerBatch engine artifact)."""
    import datetime as dt

    from pyconform_spark import queries as Q

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # one series, 40 rows, shuffled so chunk boundaries split runs
    order = [(i * 17) % 40 for i in range(40)]  # permutation of 0..39
    for pos, i in enumerate(order):
        rows.append(
            (i, t0 + dt.timedelta(seconds=i), 7, "m", float(100 + (i * 13) % 37), "{}")
        )
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    )
    src = str(tmp_path / "chunked_in")
    df.coalesce(1).write.mode("overwrite").parquet(src)
    sf = str(tmp_path)
    df.coalesce(1).write.mode("overwrite").parquet(f"{sf}/events.parquet")

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "8")
    try:
        stream = spark.readStream.schema(df.schema).option(
            "maxFilesPerTrigger", 1
        ).parquet(src)
        out = streaming.stream_anomaly_zscore(stream)
        q = (
            out.writeStream.outputMode("update")
            .format("memory")
            .queryName("zchunks")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        if old is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)

    got = {
        r.event_id: (r.zscore, r.is_anomaly)
        for r in spark.sql("select * from zchunks").collect()
    }
    want = {
        r.event_id: (r.zscore, r.is_anomaly)
        for r in Q.anomaly_zscore(spark, sf).collect()
    }
    assert set(got) == set(want)
    for eid in want:
        assert got[eid] == want[eid], (eid, got[eid], want[eid])


def test_stream_quantile_sketch_matches_batch(spark, tx_dir):
    """The streaming sketch tier equals the batch sketch over the same
    input once drained, and the merged readoff equals a readoff of
    bucket counts computed DIRECTLY from raw — the merge identity the
    sketch's usefulness rests on."""
    batch = spark.read.parquet(tx_dir).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    stream = (
        spark.readStream.schema(spark.read.parquet(tx_dir).schema)
        .parquet(tx_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    out = streaming.stream_quantile_sketch(stream, "1h")
    assert out.isStreaming
    streaming.run_stream_to_memory(out, "qsk_stream")
    got = _rows(spark.table("qsk_stream"))
    want = _rows(streaming.stream_quantile_sketch(batch, "1h"))
    assert got == want
    assert len(got) > 0

    # merged readoff (role granularity, through the hourly tier) ==
    # direct readoff (bucket counts straight from raw)
    merged_ro = streaming.sketch_quantile_readoff(
        spark.table("qsk_stream"), ["role"], qs=(0.5, 0.95)
    )
    direct = (
        batch.select(
            "role",
            F.shiftright(
                F.coalesce(F.length("text"), F.lit(0)).cast("long"), 4
            ).alias("vbucket"),
        )
        .groupBy("role", "vbucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    direct_ro = streaming.sketch_quantile_readoff(
        direct, ["role"], qs=(0.5, 0.95)
    )
    assert _rows(merged_ro) == _rows(direct_ro)


def test_stream_holt_matches_batch_bitwise(spark, tmp_path):
    """Stateful streaming Holt smoothing == batch holt_smoothing
    bit-for-bit: the (level, trend) state carries across micro-batch
    boundaries (input split mid-series by time)."""
    from pyconform_spark import queries as Q

    sf = "/root/testdata/sf0.001"
    events = spark.read.parquet(f"{sf}/events.parquet")
    src = str(tmp_path / "holt_in")
    cut = F.lit("2024-01-15").cast("timestamp_ntz")
    events.where(F.col("ts") < cut).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)

    stream = spark.readStream.schema(events.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    out = streaming.stream_holt(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("holtstream")
        .start()
    )
    try:
        q.processAllAvailable()
        events.where(F.col("ts") >= cut).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        r.event_id: (r.holt_level, r.holt_trend)
        for r in spark.sql("select * from holtstream").collect()
    }
    want = {
        r.event_id: (r.holt_level, r.holt_trend)
        for r in Q.holt_smoothing(spark, sf).collect()
    }
    assert set(got) == set(want)
    for eid in want:
        assert got[eid] == want[eid], (eid, got[eid], want[eid])


def test_stream_sliding_distinct_matches_batch(spark, tx_dir):
    """Sliding distinct-conversation counts from the streaming chained
    windowed aggregation must equal the batch run on every FINALIZED
    window (append mode only emits windows whose end the final
    watermark passed; the open tail stays in state — asserted to be
    exactly the missing set, nothing else)."""
    from datetime import timedelta

    batch = spark.read.parquet(tx_dir)
    stream = (
        spark.readStream.schema(batch.schema)
        .parquet(tx_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    out = streaming.stream_sliding_distinct(stream)
    assert out.isStreaming
    streaming.run_stream_to_memory(out, "sliding_distinct", output_mode="append")
    got = _rows(spark.table("sliding_distinct"))
    want_all = _rows(streaming.stream_sliding_distinct(batch))
    max_ts = batch.agg(F.max("ts")).first()[0]
    horizon = max_ts - timedelta(hours=8)
    finalized = [r for r in want_all if r[1] <= horizon]
    open_tail = [r for r in want_all if r[1] > horizon]
    assert len(finalized) > 10 and len(open_tail) > 0
    assert got == finalized


def test_stream_token_bucket_matches_batch_exactly(spark, tmp_path):
    """Online quota decisions == the batch token-bucket replay, with
    the (level, last-ts) state carried across a mid-stream micro-batch
    split — integer state, so equality is exact, not approximate."""
    from pyconform_spark import queries as Q

    sf = "/root/testdata/sf0.001"
    events = spark.read.parquet(f"{sf}/events.parquet")
    src = str(tmp_path / "tb_in")
    cut = F.lit("2024-01-15").cast("timestamp_ntz")
    cols = ["user_id", "ts", "event_id"]
    events.select(*cols).where(F.col("ts") < cut).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)

    schema = events.select(*cols).schema
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    out = streaming.stream_token_bucket(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("tbstream")
        .start()
    )
    try:
        q.processAllAvailable()
        events.select(*cols).where(F.col("ts") >= cut).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        r.event_id: (r.allowed, r.tokens_after)
        for r in spark.sql("select * from tbstream").collect()
    }
    want = {
        r.event_id: (r.allowed, r.tokens_after)
        for r in Q.token_bucket_throttle(spark, sf).collect()
    }
    assert len(got) == len(want) > 500
    assert got == want


def test_stream_staleness_fires_on_silence_only(spark, tmp_path):
    """Event-time-timeout staleness: a conversation that stops
    reporting gets exactly one alert once the watermark proves the
    silence exceeds the horizon; conversations that keep reporting
    never alert."""
    from datetime import datetime
    import pandas as pd

    src = str(tmp_path / "stale_in")
    schema = "conv_id string, ts timestamp"
    t0 = datetime(2024, 1, 1, 0, 0, 0)

    def _write(rows, mode):
        pdf = pd.DataFrame(rows, columns=["conv_id", "ts"])
        spark.createDataFrame(pdf, schema).coalesce(1).write.mode(
            mode
        ).parquet(src)

    # batch 1: A and B alive at t0
    _write([("A", t0), ("B", t0)], "overwrite")
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).option("maxFilesPerTrigger", 1).parquet(src)
    out = streaming.stream_staleness(stream, horizon_s=7200,
                                     watermark="1 hour")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("stalestream")
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.table("stalestream").count() == 0
        # batch 2: only B, four hours later -> watermark = t0+3h passes
        # A's deadline (t0+2h): A times out; B's deadline moves on
        _write([("B", datetime(2024, 1, 1, 4, 0, 0))], "append")
        q.processAllAvailable()
        # one more batch so the new watermark is applied to timeouts
        _write([("B", datetime(2024, 1, 1, 4, 30, 0))], "append")
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.table("stalestream").collect()
    assert [
        (r["conv_id"], r["last_seen"], r["stale_after_s"]) for r in rows
    ] == [("A", t0, 7200)]


def test_stream_burst_detect_matches_batch_episodes(spark, tmp_path):
    """Online burst episodes == the batch gaps-and-islands run,
    exactly, with the input split mid-stream: the pending-second
    holdback makes same-second peers straddling micro-batches safe,
    and two far-future unflagged sentinels close (and flush) every
    open episode so the comparison set is total."""
    from datetime import timedelta
    from pyconform_spark import queries as Q

    sf = "/root/testdata/sf0.001"
    events = spark.read.parquet(f"{sf}/events.parquet")
    cols = ["event_type", "ts", "event_id"]
    src = str(tmp_path / "burst_in")
    cut = F.lit("2024-01-15").cast("timestamp_ntz")
    events.select(*cols).where(F.col("ts") < cut).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)

    schema = events.select(*cols).schema
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    out = streaming.stream_burst_detect(stream, threshold=3)
    assert out.isStreaming
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("burststream")
        .start()
    )
    try:
        q.processAllAvailable()
        events.select(*cols).where(F.col("ts") >= cut).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q.processAllAvailable()
        max_ts = events.agg(F.max("ts")).first()[0]
        types = [r.event_type for r in events.select("event_type").distinct().collect()]
        sent = []
        for i, t in enumerate(sorted(types)):
            sent.append((t, max_ts + timedelta(days=2), 10_000_000 + i))
            sent.append((t, max_ts + timedelta(days=2, hours=1), 20_000_000 + i))
        spark.createDataFrame(sent, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    def norm(rows):
        return sorted(
            (
                r.event_type,
                r.episode,
                int(r.burst_start.timestamp() if r.burst_start.tzinfo
                    else r.burst_start.replace(tzinfo=None).timestamp()),
                r.duration_s,
                r.peak_rate,
                r.n_hits,
            )
            for r in rows
        )

    got = norm(spark.sql("select * from burststream").collect())
    want = norm(Q.burst_detect(spark, sf, threshold=3).collect())
    assert len(want) > 20
    assert got == want


def test_stream_decayed_state_folds_to_batch_leaderboard(spark, tmp_path):
    """The streaming day-map state, folded at the batch query's global
    reference day, must reproduce decayed_leaderboard bit-for-bit —
    across a micro-batch split that lands mid-corpus (state carries
    partial daily sums over the boundary)."""
    from pyconform_spark import queries as Q

    sf = "/root/testdata/sf0.001"
    events = spark.read.parquet(f"{sf}/events.parquet")
    src = str(tmp_path / "decay_in")
    cut = F.lit("2024-01-15").cast("timestamp_ntz")
    events.where(F.col("ts") < cut).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)

    stream = spark.readStream.schema(events.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    out = streaming.stream_decayed_state(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("decaystream")
        .start()
    )
    try:
        q.processAllAvailable()
        events.where(F.col("ts") >= cut).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    # latest emission per user (largest as_of_day, then widest map)
    latest = {}
    for r in spark.sql("select * from decaystream").collect():
        k = latest.get(r.user_id)
        if k is None or (r.as_of_day, len(r.days)) >= (k.as_of_day, len(k.days)):
            latest[r.user_id] = r
    ref = max(r.as_of_day for r in latest.values())
    nums = {}
    for u, r in latest.items():
        n = 0
        for d, v in zip(r.days, r.vqs):
            age = ref - d
            if age <= 30:
                n += v << (30 - age)
        nums[u] = n
    top = sorted(nums.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    want = [
        (r.user_id, r.decayed_num, r.decayed_score)
        for r in Q.decayed_leaderboard(spark, sf).collect()
    ]
    got = [(u, n, n / ((1 << 30) * 100)) for u, n in top]
    assert got == want


def test_stream_stream_conversion_join_matches_batch(spark, tmp_path):
    """Stream-stream inner join parity: with both sides fed in two
    micro-batches each (so matches CROSS batch boundaries: an early
    click pairs with a purchase arriving two triggers later), the
    drained emissions equal the batch join exactly."""
    sf = "/root/testdata/sf0.001"
    events = spark.read.parquet(f"{sf}/events.parquet")
    kinds = [r.event_type for r in events.select("event_type").distinct().collect()]
    a_kind, b_kind = sorted(kinds)[:2]
    clicks_b = events.where(F.col("event_type") == a_kind)
    purch_b = events.where(F.col("event_type") == b_kind)

    cdir, pdir = str(tmp_path / "c"), str(tmp_path / "p")
    cut = F.lit("2024-01-15").cast("timestamp_ntz")
    clicks_b.where(F.col("ts") < cut).coalesce(1).write.parquet(cdir)
    purch_b.where(F.col("ts") < cut).coalesce(1).write.parquet(pdir)

    cs = spark.readStream.schema(events.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(cdir)
    ps = spark.readStream.schema(events.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(pdir)
    out = streaming.stream_conversion_join(cs, ps)
    assert out.isStreaming
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("convjoin")
        .start()
    )
    try:
        q.processAllAvailable()
        clicks_b.where(F.col("ts") >= cut).coalesce(1).write.mode(
            "append"
        ).parquet(cdir)
        purch_b.where(F.col("ts") >= cut).coalesce(1).write.mode(
            "append"
        ).parquet(pdir)
        q.processAllAvailable()
    finally:
        q.stop()

    got = _rows(spark.table("convjoin"))
    want = _rows(streaming.stream_conversion_join(clicks_b, purch_b))
    assert got == want
    assert len(got) > 0


def test_stream_cdc_view_retracts_exactly(spark, tmp_path):
    """The CDC view after an insert batch + a mixed insert/delete batch
    equals a batch recompute over the NET rows: deleted keys shrink,
    a fully-retracted key disappears, measures stay decimal-exact."""
    from decimal import Decimal

    src = str(tmp_path / "cdc_in")
    root = str(tmp_path / "cdc_store")
    ckpt = str(tmp_path / "cdc_ck")
    schema = "k string, v decimal(20,6), op string"
    b1 = spark.createDataFrame(
        [("a", Decimal(3), "I"), ("a", Decimal(4), "I"),
         ("b", Decimal(5), "I"), ("c", Decimal(9), "I")],
        schema,
    )
    b1.coalesce(1).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(b1.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = streaming.stream_cdc_view(
        stream, root, ["k"], "v", checkpoint=ckpt
    ).start()
    try:
        q.processAllAvailable()
        after1 = {
            r.k: (r.total, r.ivm_count)
            for r in streaming.read_cdc_view(spark, root).collect()
        }
        # batch 2: delete one of a's rows, ALL of c, insert d
        b2 = spark.createDataFrame(
            [("a", Decimal(3), "D"), ("c", Decimal(9), "D"),
             ("d", Decimal(7), "I")],
            schema,
        )
        b2.coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    assert after1["a"] == (Decimal("7.000000"), 2)
    got = {
        r.k: (r.total, r.ivm_count)
        for r in streaming.read_cdc_view(spark, root).collect()
    }
    assert got == {
        "a": (Decimal("4.000000"), 1),
        "b": (Decimal("5.000000"), 1),
        "d": (Decimal("7.000000"), 1),
    }  # c fully retracted -> gone


def test_stream_mann_kendall_matches_batch(spark, tmp_path):
    """The bounded top-24-recency state must converge to the batch
    Mann-Kendall rows bit-for-bit across a mid-corpus micro-batch
    split — including z and the trend label."""
    from pyconform_spark import queries as Q

    sf = "/root/testdata/sf0.001"
    events = spark.read.parquet(f"{sf}/events.parquet")
    src = str(tmp_path / "mk_in")
    cut = F.lit("2024-01-15").cast("timestamp_ntz")
    events.where(F.col("ts") < cut).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)

    stream = spark.readStream.schema(events.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    out = streaming.stream_mann_kendall(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("mkstream")
        .start()
    )
    try:
        q.processAllAvailable()
        events.where(F.col("ts") >= cut).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    # latest emission per series: n only grows and S stabilizes at the
    # final state; memory sink appends, so take the LAST row per key
    latest = {}
    for r in spark.sql("select * from mkstream").collect():
        latest[(r.user_id, r.event_type)] = (
            r.n, r.s_stat, r.var18, r.z, r.trend
        )
    want = {
        (r.user_id, r.event_type): (r.n, r.s_stat, r.var18, r.z, r.trend)
        for r in Q.mann_kendall_trend(spark, sf).collect()
    }
    assert latest == want


def test_stream_tvd_drift_matches_batch(spark, tmp_path):
    """The commutative two-histogram state must converge to the batch
    tvd_drift rows bit-for-bit across a mid-corpus micro-batch split,
    with the split boundary fed as config (derived here from the batch
    query's own per-type midpoint)."""
    from pyconform_spark import queries as Q

    sf = "/root/testdata/sf0.001"
    events = spark.read.parquet(f"{sf}/events.parquet")
    es = F.col("ts").cast("timestamp").cast("long")
    split_s = {
        r.event_type: r.mid
        for r in events.groupBy("event_type")
        .agg(
            F.floor((F.min(es) + F.max(es)) / 2).cast("long").alias("mid")
        )
        .collect()
    }
    src = str(tmp_path / "tvd_in")
    cut = F.lit("2024-01-10").cast("timestamp_ntz")
    events.where(F.col("ts") < cut).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)

    stream = spark.readStream.schema(events.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    out = streaming.stream_tvd_drift(stream, split_s)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("tvdstream")
        .start()
    )
    try:
        q.processAllAvailable()
        events.where(F.col("ts") >= cut).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    latest = {}
    for r in spark.sql(
        "select * from tvdstream"
    ).collect():
        latest[r.event_type] = (r.n_a, r.n_b, r.n_bins, r.tvd_num, r.tvd)
    want = {
        r.event_type: (r.n_a, r.n_b, r.n_bins, r.tvd_num, r.tvd)
        for r in Q.tvd_drift(spark, sf).collect()
    }
    assert latest == want


def test_stream_rolling_p90_matches_batch_final(spark, tmp_path):
    """The bounded top-20-recency state must converge to the batch
    rolling_p90's FINAL row per series bit-for-bit across a
    mid-corpus micro-batch split."""
    from pyconform_spark import queries as Q

    sf = "/root/testdata/sf0.001"
    events = spark.read.parquet(f"{sf}/events.parquet")
    src = str(tmp_path / "p90_in")
    cut = F.lit("2024-01-12").cast("timestamp_ntz")
    events.where(F.col("ts") < cut).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)

    stream = spark.readStream.schema(events.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    out = streaming.stream_rolling_p90(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("p90stream")
        .start()
    )
    try:
        q.processAllAvailable()
        events.where(F.col("ts") >= cut).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    latest = {}
    for r in spark.sql("select * from p90stream").collect():
        latest[(r.user_id, r.event_type)] = (r.n_win, r.p90_cq, r.p90_value)

    from pyspark.sql import Window

    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    final = (
        Q.rolling_p90(spark, sf)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    want = {
        (r.user_id, r.event_type): (r.n_win, r.p90_cq, r.p90_value)
        for r in final.collect()
    }
    # the batch trailing frame is ROWS 19 PRECEDING (max 20 rows), the
    # stream state is the 20 most recent rows: identical final window
    assert latest == want


def test_stream_cusum_matches_batch_bitwise(spark, tmp_path):
    """Streaming CUSUM == batch cusum_changepoints bit-for-bit with the
    series split MID-RECURSION across micro-batches: the two-BIGINT
    carry (last C, running min of C) must reproduce the closed form
    exactly, including alarms that latch only because of pre-split
    history."""
    from pyconform_spark import queries as Q

    sf = "/root/testdata/sf0.001"
    events = spark.read.parquet(f"{sf}/events.parquet")
    src = str(tmp_path / "cusum_in")
    cut = F.lit("2024-01-15").cast("timestamp_ntz")
    events.where(F.col("ts") < cut).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)

    stream = spark.readStream.schema(events.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    out = streaming.stream_cusum(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("cusumstream")
        .start()
    )
    try:
        q.processAllAvailable()
        events.where(F.col("ts") >= cut).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        r.event_id: (r.cusum_cu, r.is_alarm)
        for r in spark.sql("select * from cusumstream").collect()
    }
    want = {
        r.event_id: (r.cusum_cu, r.is_alarm)
        for r in Q.cusum_changepoints(spark, sf).collect()
    }
    assert set(got) == set(want)
    assert got == want
    # the cut must actually split series mid-recursion, or the carry
    # was never exercised
    n_pre = events.where(F.col("ts") < cut).count()
    assert 0 < n_pre < events.count()


def test_stream_hll_registers_fold_matches_batch(spark, tmp_path):
    """Streaming HLL register updates, max-folded at read, must equal
    the batch register table bit-for-bit across a mid-corpus
    micro-batch split — and the folded estimate must equal
    hll_distinct_users' estimate exactly."""
    from pyconform_spark import queries as Q

    sf = "/root/testdata/sf0.001"
    events = spark.read.parquet(f"{sf}/events.parquet")
    src = str(tmp_path / "hll_in")
    cut = F.lit("2024-01-15").cast("timestamp_ntz")
    events.where(F.col("ts") < cut).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    stream = spark.readStream.schema(events.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    out = streaming.stream_hll_registers(stream)
    assert out.isStreaming
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("hllstream")
        .start()
    )
    try:
        q.processAllAvailable()
        events.where(F.col("ts") >= cut).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()
    folded = (
        spark.table("hllstream")
        .groupBy("event_type", "_b")
        .agg(F.max("m").alias("m"))
    )
    want = Q.hll_registers(events)
    assert _rows(folded) == _rows(want)
    got_est = {
        r["event_type"]: r["hll_estimate"]
        for r in Q.hll_estimate_from_registers(folded).collect()
    }
    want_est = {
        r["event_type"]: r["hll_estimate"]
        for r in Q.hll_distinct_users(spark, sf).collect()
    }
    assert got_est == want_est


def test_stream_mg_summary_guarantee_and_verified_parity(spark, tmp_path):
    """Streaming MG summaries (latest per shard), summed across
    shards, must satisfy the Misra-Gries band
    true - N/(k+1) <= mg_sum <= true for EVERY key, across a
    mid-corpus micro-batch split; and the candidate->exact-verify
    composition must reproduce heavy_hitters_exact bit-for-bit."""
    from pyconform_spark.operators.heavyhitters import heavy_hitters_exact

    sf = "/root/testdata/sf0.001"
    events = spark.read.parquet(f"{sf}/events.parquet")
    src = str(tmp_path / "mg_in")
    cut = F.lit("2024-01-15").cast("timestamp_ntz")
    events.where(F.col("ts") < cut).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    stream = spark.readStream.schema(events.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    k, shards, threshold = 8, 4, 30
    out = streaming.stream_mg_summary(stream, "user_id", k=k, shards=shards)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("mgstream")
        .start()
    )
    try:
        q.processAllAvailable()
        events.where(F.col("ts") >= cut).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()
    sink = spark.table("mgstream").toPandas()
    latest = sink[sink.groupby("shard")["emit_seq"].transform("max")
                  == sink["emit_seq"]]
    n_total = int(latest.loc[latest["user_id"].isna(), "part_rows"].sum())
    assert n_total == events.count()
    mg = (latest.dropna(subset=["user_id"])
          .groupby("user_id")["mg_count"].sum())
    exact = {r["user_id"]: r["c"] for r in events.groupBy("user_id")
             .agg(F.count(F.lit(1)).alias("c")).collect()}
    # per-shard band: summed over shards the slack is N_total/(k+1)
    for key, true in exact.items():
        got = float(mg.get(key, 0.0))
        assert true - n_total / (k + 1) <= got <= true, (key, got, true)
    # candidates -> exact verify == batch composition
    cand = [int(key) for key in exact
            if float(mg.get(key, 0.0)) >= threshold - n_total / (k + 1)]
    verified = sorted(
        key for key in cand if exact[key] >= threshold
    )
    want = sorted(
        r["user_id"]
        for r in heavy_hitters_exact(
            events, "user_id", threshold, k * shards
        ).collect()
    )
    assert verified == want and len(want) > 0


def test_stream_time_decay_matches_batch_bitwise(spark, tmp_path):
    """Streaming half-life decay == batch ewma_time_decay_1h with the
    corpus split mid-corpus (and therefore mid-hour for some users):
    update-mode re-emission means the LAST row per (user, hour) must
    equal the batch value bit-for-bit."""
    from pyconform_spark import queries as Q

    sf = "/root/testdata/sf0.001"
    events = spark.read.parquet(f"{sf}/events.parquet")
    src = str(tmp_path / "decay_in")
    cut = F.lit("2024-01-15").cast("timestamp_ntz")
    events.where(F.col("ts") < cut).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)

    stream = spark.readStream.schema(events.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    out = streaming.stream_time_decay(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("decaystream")
        .start()
    )
    try:
        q.processAllAvailable()
        events.where(F.col("ts") >= cut).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    # last emission per (user, hour) — memory sink appends in batch
    # order, so keep the final row
    rows = spark.sql(
        "select * from decaystream"
    ).collect()
    got = {}
    for r in rows:
        got[(r.user_id, r.bucket_ts)] = r.decayed_mean
    want = {
        (r.user_id, r.bucket_ts): r.decayed_mean
        for r in Q.ewma_time_decay_1h(spark, sf).collect()
    }
    assert set(got) == set(want)
    assert got == want
    n_pre = events.where(F.col("ts") < cut).count()
    assert 0 < n_pre < events.count()


def test_stream_cdc_applies_deletes_and_inserts_exactly_once(spark, tmp_path):
    """stream_refresh_cdc: signed micro-batches (delete feed, then an
    insert feed) edit the committed store; final tiers equal the batch
    rollup over the EDITED raw set, and each half-batch marker replays
    as a no-op."""
    from pyspark.sql import types as T

    from pyconform_spark import pipeline

    src = str(tmp_path / "in_cdc")
    root = str(tmp_path / "store_cdc")
    ckpt = str(tmp_path / "ck_cdc")
    tx = synth.transcripts(spark, 2000)
    pipeline.run_batch(spark, tx, root)

    is_del = F.abs(F.hash("conv_id", "turn_idx")) % 4 == 0
    deletes = tx.where(is_del).withColumn("op", F.lit(-1))
    inserts = (
        tx.where(F.abs(F.hash("conv_id", "turn_idx")) % 4 == 1)
        .withColumn("turn_idx", F.col("turn_idx") + 100000)
        .withColumn("op", F.lit(1))
    )
    cdc_schema = T.StructType(
        list(TRANSCRIPTS_SCHEMA) + [T.StructField("op", T.IntegerType(), True)]
    )
    deletes.coalesce(1).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(cdc_schema)
        .parquet(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    q = streaming.stream_refresh_cdc(stream, root, checkpoint=ckpt).start()
    try:
        q.processAllAvailable()
        inserts.coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    edited = tx.where(~is_del).unionByName(inserts.drop("op"))
    direct = rollup.all_tiers(edited)
    for tier in pipeline.TIER_ORDER:
        assert _rows(pipeline.read_tier(spark, root, tier)) == _rows(
            direct[tier]
        ), tier

    # replay: both half-markers of the delete batch are in the ledger,
    # so re-applying is a no-op
    markers = pipeline.applied_refresh_markers(spark, root)
    assert any(m.endswith("-d") for m in markers)
    assert any(m.endswith("-i") for m in markers)
    mk = next(m for m in markers if m.endswith("-d"))
    points = pipeline.refresh_cdc(spark, deletes, root, marker=mk)
    assert points == {t: 0 for t in pipeline.TIER_ORDER}


def test_stream_kalman_matches_batch_bitwise(spark, tmp_path):
    """Streaming Kalman == batch kalman_hourly_rate bit-for-bit with
    the stream cut MID-HOUR across micro-batches: the provisional
    re-emission of the split hour must be superseded by its final
    emission (largest count per hour), and the O(1) (level, var)
    carry must reproduce the dense-axis recurrence exactly, zero-gap
    hours included."""
    from pyconform_spark import queries as Q

    sf = "/root/testdata/sf0.001"
    events = spark.read.parquet(f"{sf}/events.parquet")
    src = str(tmp_path / "kalman_in")
    # a cut mid-hour: hour 2024-01-02 11:00 has 4 events spanning
    # 11:18-11:40, so cutting at 11:30 splits that cell across batches
    cut = F.lit("2024-01-02 11:30:00").cast("timestamp_ntz")
    events.where(F.col("ts") < cut).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)

    stream = spark.readStream.schema(events.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    out = streaming.stream_kalman_level(stream)
    qs = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("kalmanstream")
        .start()
    )
    try:
        qs.processAllAvailable()
        events.where(F.col("ts") >= cut).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        qs.processAllAvailable()
    finally:
        qs.stop()

    emitted = spark.sql("select * from kalmanstream").toPandas()
    # fold update-mode re-emissions: final emission per (type, hour)
    # is the one with the largest count
    idx = emitted.groupby(["event_type", "h"])["n_events"].idxmax()
    import pandas as pd

    got = {
        (r.event_type, int(r.h)): (
            int(r.n_events),
            r.kalman_level,
            None if pd.isna(r.kalman_gain) else r.kalman_gain,
            r.kalman_var,
        )
        for r in emitted.loc[idx].itertuples()
    }
    batch = Q.kalman_hourly_rate(spark, sf).collect()
    want = {
        (r.event_type, int(r.bucket_ts.timestamp() // 3600)): (
            int(r.n_events), r.kalman_level, r.kalman_gain, r.kalman_var
        )
        for r in batch
    }
    assert set(got) == set(want)
    assert got == want
    # the cut must split at least one (type, hour) cell across batches
    h_start = F.lit("2024-01-02 11:00:00").cast("timestamp_ntz")
    h_end = F.lit("2024-01-02 12:00:00").cast("timestamp_ntz")
    n_pre = events.where((F.col("ts") >= h_start) & (F.col("ts") < cut)).count()
    n_post = events.where((F.col("ts") >= cut) & (F.col("ts") < h_end)).count()
    assert n_pre > 0 and n_post > 0  # provisional emission exercised


def test_stream_backlog_matches_lindley_loop(spark, tmp_path):
    """Streaming backlog == an independent per-minute Lindley loop
    over the same events, bit-for-bit, with the stream cut MID-MINUTE
    (the split minute re-emits provisionally and its final emission
    — largest count per minute — wins), gap minutes included."""
    import pandas as pd

    sf = "/root/testdata/sf0.001"
    events = spark.read.parquet(f"{sf}/events.parquet")
    src = str(tmp_path / "backlog_in")
    cut = F.lit("2024-01-02 11:30:00").cast("timestamp_ntz")
    events.where(F.col("ts") < cut).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)

    cap = 2
    stream = spark.readStream.schema(events.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    out = streaming.stream_backlog(stream, capacity_per_min=cap)
    qs = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("backlogstream")
        .start()
    )
    try:
        qs.processAllAvailable()
        events.where(F.col("ts") >= cut).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        qs.processAllAvailable()
    finally:
        qs.stop()

    emitted = spark.sql("select * from backlogstream").toPandas()
    idx = emitted.groupby(["event_type", "m"])["n_arrivals"].idxmax()
    got = {
        (r.event_type, int(r.m)): (int(r.n_arrivals), int(r.backlog))
        for r in emitted.loc[idx].itertuples()
    }

    # independent Lindley recurrence per type over the dense minute axis
    pdf = events.select(
        "event_type", F.floor(F.col("ts").cast("timestamp").cast("long") / 60)
        .cast("long").alias("m")
    ).toPandas()
    want = {}
    for et, g in pdf.groupby("event_type"):
        counts = g.groupby("m").size()
        b = 0
        for m in range(int(counts.index.min()), int(counts.index.max()) + 1):
            a = int(counts.get(m, 0))
            b = max(0, b + a - cap)
            want[(et, m)] = (a, b)
    assert set(got) == set(want)
    assert got == want
