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


# ------------------------------------------------- real format codecs
# Three genuinely-decodable formats with pure-Python/numpy codecs (the
# sandbox has no media libs, but WAV, PPM, and uncompressed RIFF/AVI
# are simple enough to parse from first principles): the decode stage
# below exercises real bytes end-to-end, not a hash.  Compressed video
# stays behind the stub (no pure-Python codec is reasonable).


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Minimal RIFF/WAVE writer: PCM16 mono."""
    import struct

    pcm = np.asarray(samples, dtype="<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(pcm), b"WAVE",
        b"fmt ", 16, 1, 1, rate, rate * 2, 2, 16,
        b"data", len(pcm),
    )
    return hdr + pcm


def decode_wav(payload: bytes) -> dict:
    """Minimal RIFF/WAVE reader: walks the chunk list, returns sample
    rate / channel count / bit depth / samples (int16 numpy) /
    duration_ms.  Raises ValueError on malformed input like a real
    decoder."""
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid, clen = payload[pos : pos + 4], struct.unpack(
            "<I", payload[pos + 4 : pos + 8]
        )[0]
        body = payload[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, n_ch, rate, _, _, bits = fmt
    if audio_fmt != 1 or bits != 16:
        raise ValueError(f"unsupported WAV encoding fmt={audio_fmt} bits={bits}")
    samples = np.frombuffer(data, dtype="<i2")
    n = len(samples) // n_ch
    return {
        "rate": rate,
        "channels": n_ch,
        "bits": bits,
        "samples": samples,
        "n_samples": n,
        "duration_ms": (n * 1000) // rate,
    }


def encode_ppm(pixels: np.ndarray, width: int, height: int) -> bytes:
    """Binary PPM (P6) writer: RGB8 raster."""
    raster = np.asarray(pixels, dtype=np.uint8).tobytes()
    return f"P6\n{width} {height}\n255\n".encode() + raster


def decode_ppm(payload: bytes) -> dict:
    """Binary PPM (P6) reader: header ints (whitespace/comment
    tolerant) + RGB8 raster; returns width/height/pixels/mean."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to EOL
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    width, height, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    raster = np.frombuffer(payload, dtype=np.uint8, count=width * height * 3, offset=pos)
    return {
        "width": width,
        "height": height,
        "pixels": raster,
        "mean": float(raster.sum()) / len(raster),
    }


def encode_avi(frames: np.ndarray, fps: int = 10) -> bytes:
    """Minimal uncompressed-AVI (RIFF) writer: one 'vids'/DIB stream of
    BI_RGB 24-bit frames ('00db' chunks — bottom-up rows, BGR pixels,
    rows padded to 4 bytes, the DIB conventions).  ``frames`` is
    (n_frames, height, width, 3) uint8 RGB."""
    import struct

    frames = np.asarray(frames, dtype=np.uint8)
    n, h, w, _ = frames.shape
    stride = (w * 3 + 3) & ~3
    usec = 1_000_000 // fps

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" * (len(body) & 1))

    def lst(subtype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", subtype + body)

    dibs = []
    for f in range(n):
        rows = []
        for y in range(h - 1, -1, -1):  # bottom-up
            bgr = frames[f, y, :, ::-1].tobytes()  # RGB -> BGR
            rows.append(bgr + b"\x00" * (stride - w * 3))
        dibs.append(chunk(b"00db", b"".join(rows)))
    avih = chunk(
        b"avih",
        struct.pack("<14I", usec, stride * h * fps, 0, 0, n, 0, 1,
                    stride * h, w, h, 0, 0, 0, 0),
    )
    strh = chunk(
        b"strh",
        b"vids" + b"DIB " + struct.pack("<IHHIIIIIIII4H",
            0, 0, 0, 0, 1, fps, 0, n, stride * h, 0xFFFFFFFF, 0,
            0, 0, w, h),
    )
    strf = chunk(
        b"strf",
        struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, stride * h,
                    0, 0, 0, 0),
    )
    hdrl = lst(b"hdrl", avih + lst(b"strl", strh + strf))
    movi = lst(b"movi", b"".join(dibs))
    return chunk(b"RIFF", b"AVI " + hdrl + movi)


def _parse_avi(payload: bytes) -> dict:
    """Walk the RIFF chunk tree (hdrl/avih for geometry, strl/strh for
    the fps rational, movi for '00db' DIB frames); return geometry +
    the raw DIB frame chunks.  Raises ValueError on malformed or
    compressed input like a real decoder."""
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")

    found: dict = {"frames": []}

    def walk(buf: bytes, pos: int, end: int) -> None:
        while pos + 8 <= end:
            cid = buf[pos : pos + 4]
            clen = struct.unpack("<I", buf[pos + 4 : pos + 8])[0]
            body_start, body_end = pos + 8, pos + 8 + clen
            if cid == b"LIST":
                walk(buf, body_start + 4, body_end)
            elif cid == b"avih":
                found["avih"] = struct.unpack(
                    "<14I", buf[body_start : body_start + 56]
                )
            elif cid == b"strh" and buf[body_start : body_start + 4] == b"vids":
                found["strh"] = struct.unpack(
                    "<IHHIIIIIIII4H", buf[body_start + 8 : body_start + 56]
                )
            elif cid == b"strf" and "strf" not in found:
                found["strf"] = struct.unpack(
                    "<IiiHHIIiiII", buf[body_start : body_start + 40]
                )
            elif cid in (b"00db", b"00dc"):
                found["frames"].append(buf[body_start:body_end])
            pos = body_end + (clen & 1)

    walk(payload, 12, len(payload))
    if "avih" not in found or "strh" not in found or not found["frames"]:
        raise ValueError("missing avih/strh/frame chunks")
    avih = found["avih"]
    w, h = avih[8], avih[9]
    scale, rate = found["strh"][4], found["strh"][5]
    if scale == 0 or rate == 0:
        raise ValueError("bad stream rate")
    if "strf" in found and found["strf"][5] != 0:
        raise ValueError("compressed AVI is not supported")
    return {
        "width": w,
        "height": h,
        "scale": scale,
        "rate": rate,
        "frames": found["frames"],
    }


def _dib_to_rgb(dib: bytes, w: int, h: int) -> np.ndarray:
    """Undo the DIB conventions: bottom-up rows, BGR, stride padding."""
    stride = (w * 3 + 3) & ~3
    if len(dib) < stride * h:
        raise ValueError("truncated DIB frame")
    raster = np.frombuffer(dib, dtype=np.uint8, count=stride * h).reshape(
        h, stride
    )
    return raster[::-1, : w * 3].reshape(h, w, 3)[:, :, ::-1]


def _luma_sum(frame: np.ndarray) -> int:
    """ITU-R 601 integer luma sum (scaled ×1000) over an RGB frame."""
    px = frame.reshape(-1, 3).astype(np.int64)
    return int((px[:, 0] * 299 + px[:, 1] * 587 + px[:, 2] * 114).sum())


def decode_avi(payload: bytes) -> dict:
    """Minimal uncompressed-AVI (RIFF) reader: returns width / height /
    n_frames / fps / duration_ms / frame0 (RGB, top-down) /
    mean_luma_frame0 (ITU-R 601 integer luma, one final division)."""
    p = _parse_avi(payload)
    w, h, scale, rate = p["width"], p["height"], p["scale"], p["rate"]
    n_frames = len(p["frames"])
    frame0 = _dib_to_rgb(p["frames"][0], w, h)
    return {
        "width": w,
        "height": h,
        "n_frames": n_frames,
        "fps": rate // scale,
        "duration_ms": (n_frames * 1000 * scale) // rate,
        "frame0": frame0,
        "mean_luma_frame0": float(_luma_sum(frame0)) / (1000 * w * h),
    }


def decode_avi_frames(payload: bytes) -> dict:
    """Like ``decode_avi`` but decodes EVERY DIB frame to an RGB array
    (top-down) — the primitive frame sampling builds on."""
    p = _parse_avi(payload)
    w, h = p["width"], p["height"]
    return {
        "width": w,
        "height": h,
        "fps": p["rate"] // p["scale"],
        "frames": [_dib_to_rgb(d, w, h) for d in p["frames"]],
    }


def decode_stub(payload: bytes, kind: str) -> np.ndarray:
    """STUB decoder — deterministic fake 'pixels/samples'.

    Real deployment: replace with PIL.Image.open / soundfile.read /
    pyav frame sampling.  Raises for unknown kinds exactly like a real
    decoder would.  (WAV, PPM, and uncompressed AVI have REAL decoders
    above; this stub remains only for formats with no pure-Python
    codec in the sandbox.)
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


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_units", T.LongType(), False),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mean_value", T.DoubleType(), False),
    ]
)


def synth_real_media(ids: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Stage 1 — REAL payload synthesis (mapInPandas): even ids get a
    PCM16 WAV (n = (id%50+1)*40 samples of ((i*(id%7+1)) % 256) - 128
    at 8 kHz), odd ids a P6 PPM ((id%16+1) × (id%8+1), pixel k =
    (k+id) % 256).  Deterministic closed forms so a SQL oracle can
    predict every decoded property without parsing bytes."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, kinds = [], []
            for mid in pdf[id_col]:
                mid = int(mid)
                if mid % 2 == 0:
                    k = mid % 7 + 1
                    n = (mid % 50 + 1) * 40
                    i = np.arange(n, dtype=np.int64)
                    payloads.append(encode_wav((i * k) % 256 - 128, rate=8000))
                    kinds.append("audio")
                else:
                    w, h = mid % 16 + 1, mid % 8 + 1
                    kpix = np.arange(w * h * 3, dtype=np.int64)
                    payloads.append(encode_ppm((kpix + mid) % 256, w, h))
                    kinds.append("image")
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].to_numpy(dtype=np.int64),
                    "kind": kinds,
                    "payload": payloads,
                }
            )

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("kind", T.StringType(), False),
            T.StructField("payload", T.BinaryType(), False),
        ]
    )
    return ids.select(F.col(id_col)).mapInPandas(_gen, schema=schema)


def synth_real_video(ids: DataFrame, id_col: str = "media_id") -> DataFrame:
    """REAL uncompressed-AVI synthesis (mapInPandas), closed forms a
    SQL oracle can predict without parsing bytes: id ``mid`` gets
    width = mid%8+2, height = mid%4+1, n_frames = mid%5+2 at 10 fps,
    and frame ``f``'s RGB raster byte ``j`` (row-major, top-down) is
    ``(j + f + mid) % 256`` — the writer applies the DIB conventions
    (bottom-up/BGR/stride padding) which the reader must undo
    exactly."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for mid in pdf[id_col]:
                mid = int(mid)
                w, h = mid % 8 + 2, mid % 4 + 1
                nf = mid % 5 + 2
                j = np.arange(w * h * 3, dtype=np.int64)
                frames = np.stack(
                    [((j + f + mid) % 256).reshape(h, w, 3) for f in range(nf)]
                ).astype(np.uint8)
                payloads.append(encode_avi(frames, fps=10))
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].to_numpy(dtype=np.int64),
                    "kind": ["video"] * len(pdf),
                    "payload": payloads,
                }
            )

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("kind", T.StringType(), False),
            T.StructField("payload", T.BinaryType(), False),
        ]
    )
    return ids.select(F.col(id_col)).mapInPandas(_gen, schema=schema)


def decode_media_props(media: DataFrame) -> DataFrame:
    """Stage 2 — REAL decode (mapInPandas): parse the WAV chunk list /
    PPM header / AVI chunk tree from the binary column that crossed
    the Arrow boundary and emit typed properties.  All three kinds now
    have real pure-Python decoders; the NotImplementedError path is
    reserved for genuinely unknown kinds."""

    def _dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "media_id", "kind", "n_units", "duration_ms",
                "width", "height", "mean_value",
            )}
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                b = bytes(payload)
                if kind == "audio":
                    d = decode_wav(b)
                    n = d["n_samples"]
                    out["n_units"].append(n)
                    out["duration_ms"].append(d["duration_ms"])
                    out["width"].append(None)
                    out["height"].append(None)
                    out["mean_value"].append(
                        float(d["samples"].astype(np.int64).sum()) / n
                    )
                elif kind == "image":
                    # container sniff: the image kind carries either
                    # P6 PPM or PNG payloads — dispatch on magic bytes
                    d = decode_png(b) if b[:4] == b"\x89PNG" else decode_ppm(b)
                    n = len(d["pixels"])
                    out["n_units"].append(n)
                    out["duration_ms"].append(None)
                    out["width"].append(d["width"])
                    out["height"].append(d["height"])
                    out["mean_value"].append(
                        float(d["pixels"].astype(np.int64).sum()) / n
                    )
                elif kind == "video":
                    d = decode_avi(b)
                    out["n_units"].append(d["n_frames"])
                    out["duration_ms"].append(d["duration_ms"])
                    out["width"].append(d["width"])
                    out["height"].append(d["height"])
                    out["mean_value"].append(d["mean_luma_frame0"])
                else:
                    raise NotImplementedError(f"no decoder for kind={kind!r}")
                out["media_id"].append(int(mid))
                out["kind"].append(kind)
            yield pd.DataFrame(out)

    pruned = media.select("media_id", "kind", "payload")
    return pruned.mapInPandas(_dec, schema=DECODED_SCHEMA)


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


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("out_w", T.IntegerType(), False),
        T.StructField("out_h", T.IntegerType(), False),
        T.StructField("resized_payload", T.BinaryType(), False),
        T.StructField("resized_bytes", T.LongType(), False),
        T.StructField("pixel_sum", T.LongType(), False),
        T.StructField("mean_value", T.DoubleType(), False),
    ]
)


def resize_images(
    media: DataFrame, out_w: int = 4, out_h: int = 2
) -> DataFrame:
    """REAL image resize (mapInPandas): decode each P6 PPM, resample
    onto an (out_h × out_w) grid by nearest-neighbor (source pixel
    ``(oy*h // out_h, ox*w // out_w)`` — pure integer index math, no
    interpolation rounding), re-encode as P6 PPM.  The resized payload
    stays a binary column for downstream stages; exact integer
    diagnostics (byte length, channel sum) ride alongside so a SQL
    oracle can certify the kernel from closed forms without parsing
    bytes.  Streams Arrow batches; non-image rows are dropped (resize
    is an image op), payload pages of other kinds are never read
    because the filter happens on the pruned ``kind`` column."""

    def _rs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "media_id", "width", "height", "out_w", "out_h",
                "resized_payload", "resized_bytes", "pixel_sum",
                "mean_value",
            )}
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if kind != "image":
                    continue
                d = decode_ppm(bytes(payload))
                w, h = d["width"], d["height"]
                pix = d["pixels"].reshape(h, w, 3)
                xs = (np.arange(out_w, dtype=np.int64) * w) // out_w
                ys = (np.arange(out_h, dtype=np.int64) * h) // out_h
                rp = pix[np.ix_(ys, xs)]
                flat = rp.reshape(-1)
                enc = encode_ppm(flat, out_w, out_h)
                s = int(flat.astype(np.int64).sum())
                out["media_id"].append(int(mid))
                out["width"].append(w)
                out["height"].append(h)
                out["out_w"].append(out_w)
                out["out_h"].append(out_h)
                out["resized_payload"].append(enc)
                out["resized_bytes"].append(len(enc))
                out["pixel_sum"].append(s)
                out["mean_value"].append(float(s) / (out_w * out_h * 3))
            yield pd.DataFrame(out)

    pruned = media.where(F.col("kind") == "image").select(
        "media_id", "kind", "payload"
    )
    return pruned.mapInPandas(_rs, schema=RESIZED_SCHEMA)


FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("frame_sum", T.LongType(), False),
        T.StructField("mean_luma", T.DoubleType(), False),
    ]
)


def sample_video_frames(media: DataFrame, stride: int = 2) -> DataFrame:
    """REAL video frame sampling (mapInPandas): decode every DIB frame
    of each uncompressed AVI, keep frames ``f % stride == 0``, and emit
    one ROW per sampled frame — the explode-shaped primitive a frame-
    level pipeline (dedup, captioning, quality filters) consumes.
    ``frame_sum`` is the exact RGB byte sum; ``mean_luma`` is the
    ITU-R 601 integer luma with ONE final division — both closed-form
    predictable by a SQL oracle.  Streams Arrow batches; output
    cardinality is bounded by ceil(n_frames/stride) per video."""
    if stride < 1:
        raise ValueError("stride must be >= 1")

    def _fs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "media_id", "frame_idx", "width", "height",
                "frame_sum", "mean_luma",
            )}
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if kind != "video":
                    continue
                d = decode_avi_frames(bytes(payload))
                w, h = d["width"], d["height"]
                for f in range(0, len(d["frames"]), stride):
                    frame = d["frames"][f]
                    out["media_id"].append(int(mid))
                    out["frame_idx"].append(f)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["frame_sum"].append(
                        int(frame.reshape(-1).astype(np.int64).sum())
                    )
                    out["mean_luma"].append(
                        float(_luma_sum(frame)) / (1000 * w * h)
                    )
            yield pd.DataFrame(out)

    pruned = media.where(F.col("kind") == "video").select(
        "media_id", "kind", "payload"
    )
    return pruned.mapInPandas(_fs, schema=FRAME_SAMPLE_SCHEMA)


# ------------------------------------------------------------------ PNG
def encode_png(pixels: np.ndarray, width: int, height: int) -> bytes:
    """Standards-compliant PNG writer (8-bit RGB, zlib stdlib): real
    chunk CRCs, and NON-ZERO row filters — row 0 uses Sub(1), later
    rows Up(2) — so the reader's unfiltering is genuinely exercised
    (an all-filter-0 writer would let a broken unfilter pass)."""
    import struct
    import zlib

    raster = (
        np.asarray(pixels, dtype=np.uint8)
        .reshape(height, width * 3)
        .astype(np.int64)
    )
    lines = []
    for y in range(height):
        if y == 0:  # Sub: delta against the pixel 3 bytes left
            row = raster[0].copy()
            row[3:] = (row[3:] - raster[0][:-3]) % 256
            lines.append(b"\x01" + row.astype(np.uint8).tobytes())
        else:  # Up: delta against the row above
            row = (raster[y] - raster[y - 1]) % 256
            lines.append(b"\x02" + row.astype(np.uint8).tobytes())
    idat = zlib.compress(b"".join(lines), 6)

    def chunk(tag: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(tag + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + tag + body + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> dict:
    """PNG reader (pure Python + stdlib zlib): chunk walk with CRC
    verification, IHDR validation (8-bit RGB, no interlace), inflate,
    and FULL filter reconstruction — None/Sub/Up/Average/Paeth — per
    the spec's byte-recurrences.  Returns width/height/pixels/mean."""
    import struct
    import zlib

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos, width = 8, None
    idat = b""
    while pos < len(payload):
        (ln,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack(">I", payload[pos + 8 + ln : pos + 12 + ln])
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r}")
        if tag == b"IHDR":
            width, height, depth, ctype, comp, filt, inter = struct.unpack(
                ">IIBBBBB", body
            )
            if (depth, ctype, comp, filt, inter) != (8, 2, 0, 0, 0):
                raise ValueError("unsupported PNG variant")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if width is None:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(idat)
    stride = width * 3
    if len(raw) != height * (stride + 1):
        raise ValueError("raster length mismatch")
    out = np.zeros((height, stride), dtype=np.int64)
    bpp = 3
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int64)
        prev = out[y - 1] if y > 0 else np.zeros(stride, dtype=np.int64)
        cur = out[y]
        if ftype == 0:
            cur[:] = line
        elif ftype == 2:  # Up (vectorizable: no intra-row recurrence)
            cur[:] = (line + prev) % 256
        elif ftype in (1, 3, 4):  # Sub/Average/Paeth: left-recurrent
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                up = prev[x]
                ul = prev[x - bpp] if x >= bpp else 0
                if ftype == 1:
                    pred = left
                elif ftype == 3:
                    pred = (left + up) // 2
                else:
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = (
                        left if pa <= pb and pa <= pc else up if pb <= pc else ul
                    )
                cur[x] = (line[x] + pred) % 256
        else:
            raise ValueError(f"bad filter {ftype}")
    pixels = out.reshape(-1)
    return {
        "width": int(width),
        "height": int(height),
        "pixels": pixels.astype(np.uint8),
        "mean": float(pixels.sum()) / len(pixels),
    }


def synth_real_png(ids: DataFrame, id_col: str = "media_id") -> DataFrame:
    """REAL PNG synthesis (mapInPandas): id ``mid`` gets a
    (mid%12+1) x (mid%6+1) 8-bit RGB PNG whose raster byte k is
    (3*k + mid) % 256 — a closed form a SQL oracle can sum without
    parsing bytes, while the payload itself is a fully filtered,
    CRC-carrying PNG stream."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for mid in pdf[id_col]:
                mid = int(mid)
                w, h = mid % 12 + 1, mid % 6 + 1
                k = np.arange(w * h * 3, dtype=np.int64)
                payloads.append(encode_png((3 * k + mid) % 256, w, h))
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].to_numpy(dtype=np.int64),
                    "kind": ["image"] * len(pdf),
                    "payload": payloads,
                }
            )

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("kind", T.StringType(), False),
            T.StructField("payload", T.BinaryType(), False),
        ]
    )
    return ids.select(F.col(id_col)).mapInPandas(_gen, schema=schema)
