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

from pyspark.sql import DataFrame, functions as F

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
