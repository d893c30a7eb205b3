"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``BinaryType`` payloads plus typed metadata — the
Spark-side schema, partitioning, and Arrow batch shapes are real and
tested; only the actual media decoding is stubbed (the sandbox has no
image/audio libs).  Swap ``decode_stub`` for a PIL/torchaudio call and
nothing else changes.

Design for 100 TB of media:

* payloads ride ``mapInPandas`` so a task streams Arrow batches and
  never materializes a partition of blobs as one pandas object;
* ``spark.sql.files.maxPartitionBytes`` (session.py) bounds blob
  bytes per task; metadata-only transformations (filtering by format,
  size, duration) stay columnar and never touch the payload column —
  column pruning means the parquet reader skips the blob pages
  entirely (check ``ReadSchema`` in ``explain``);
* feature extraction emits fixed-width ``array<float>`` so downstream
  joins/ANN (simsearch.py) apply unchanged.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("format", T.StringType(), False),  # png | wav | mp4 ...
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("payload_sha", T.StringType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), False),
    ]
)


def synth_media(spark: SparkSession, n: int = 256) -> DataFrame:
    """Deterministic fake media table: payload = repeatable bytes from
    the id (columnar generation, no Python loop)."""
    df = spark.range(n).withColumnRenamed("id", "media_id")
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("media_id") % 3 + 1).cast("int"),
    )
    fmt = F.element_at(
        F.array(F.lit("png"), F.lit("wav"), F.lit("mp4")),
        (F.col("media_id") % 3 + 1).cast("int"),
    )
    payload = F.encode(
        F.repeat(
            F.concat(F.lit("blob-"), F.col("media_id").cast("string"), F.lit("|")),
            (F.col("media_id") % 7 + 1).cast("int"),
        ),
        "UTF-8",
    )
    return df.select(
        "media_id",
        kind.alias("kind"),
        fmt.alias("format"),
        payload.alias("payload"),
        F.when(kind == "image", (F.col("media_id") % 64 + 1) * 16)
        .otherwise(F.lit(None))
        .cast("int")
        .alias("width"),
        F.when(kind == "image", (F.col("media_id") % 48 + 1) * 16)
        .otherwise(F.lit(None))
        .cast("int")
        .alias("height"),
        F.when(kind != "image", (F.col("media_id") % 1000 + 1) * 250)
        .otherwise(F.lit(None))
        .cast("long")
        .alias("duration_ms"),
    )


def decode_stub(payload: bytes, kind: str) -> np.ndarray:
    """STUB decoder — deterministic fake 'pixels/samples'.

    Real deployment: replace with PIL.Image.open / soundfile.read /
    pyav frame sampling.  Raises for unknown kinds exactly like a real
    decoder would.
    """
    if kind not in ("image", "audio", "video"):
        raise NotImplementedError(f"no decoder for kind={kind!r}")
    digest = hashlib.sha256(payload).digest()
    return np.frombuffer(digest, dtype=np.uint8).astype(np.float32)


def extract_features(media: DataFrame, batch_hint: int = 64) -> DataFrame:
    """payload -> fixed-width feature vector via mapInPandas.

    Arrow-batched: one Python call per batch; inside the batch the
    decode loop is per-blob (unavoidable for codecs — same shape a PIL
    call would have), everything else vectorized.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = np.empty((len(pdf), FEATURE_DIM), dtype=np.float32)
            shas = []
            for i, (payload, kind) in enumerate(
                zip(pdf["payload"], pdf["kind"])
            ):
                raw = decode_stub(bytes(payload), kind)
                # fold the fake samples down to FEATURE_DIM "moments"
                feats[i] = raw.reshape(FEATURE_DIM, -1).mean(axis=1)
                shas.append(hashlib.sha256(bytes(payload)).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "kind": pdf["kind"].to_numpy(),
                    "n_bytes": pdf["payload"].map(len).to_numpy(),
                    "payload_sha": shas,
                    "features": list(feats),
                }
            )

    pruned = media.select("media_id", "kind", "payload")
    return pruned.mapInPandas(_extract, schema=FEATURES_SCHEMA)


def media_stats(media: DataFrame) -> DataFrame:
    """Metadata-plus-size aggregate: the only payload access is
    ``length`` (byte count, no decode).  At scale, store ``n_bytes``
    as its own metadata column at ingest so this query prunes the blob
    pages entirely; the decode path stays in extract_features."""
    return (
        media.groupBy("kind", "format")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.length("payload").cast("long")).alias("total_bytes"),
            F.avg("width").alias("avg_width"),
            F.avg("duration_ms").alias("avg_duration_ms"),
        )
    )


def exact_dup_media(media: DataFrame) -> DataFrame:
    """Binary exact-dedup: group by payload hash (never by the blob)."""
    return (
        media.select(
            "media_id", F.sha2(F.col("payload"), 256).alias("payload_sha")
        )
        .groupBy("payload_sha")
        .agg(F.min("media_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )
