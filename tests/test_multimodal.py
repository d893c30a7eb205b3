"""Multimodal plumbing tests: schema, Arrow batch shape, feature
extraction determinism, metadata-only pruning, binary dedup."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from pyconform_spark import multimodal
from pyconform_spark import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    df = multimodal.synth_media(spark, 120)
    df.persist().count()
    yield df
    df.unpersist()


def test_media_schema(media):
    assert [f.name for f in media.schema.fields] == [
        f.name for f in multimodal.MEDIA_SCHEMA.fields
    ]


def test_extract_features_shape_and_determinism(spark, media):
    out = multimodal.extract_features(media)
    rows = {r["media_id"]: r for r in out.collect()}
    assert len(rows) == 120
    for r in rows.values():
        assert len(r["features"]) == multimodal.FEATURE_DIM
    # deterministic: same media_id -> same features across runs
    again = {r["media_id"]: r for r in multimodal.extract_features(media).collect()}
    for mid, r in rows.items():
        assert r["features"] == again[mid]["features"]
        assert r["payload_sha"] == again[mid]["payload_sha"]


def test_feature_values_match_local_stub(spark, media):
    row = media.where("media_id = 10").first()
    out = (
        multimodal.extract_features(media.where("media_id = 10"))
        .first()
    )
    raw = multimodal.decode_stub(bytes(row["payload"]), row["kind"])
    want = raw.reshape(multimodal.FEATURE_DIM, -1).mean(axis=1)
    assert np.allclose(out["features"], want)
    assert out["payload_sha"] == hashlib.sha256(bytes(row["payload"])).hexdigest()


def test_decode_stub_unknown_kind_raises():
    with pytest.raises(NotImplementedError):
        multimodal.decode_stub(b"x", "hologram")


def test_media_stats_prunes_payload(spark, media, tmp_path):
    path = str(tmp_path / "media")
    media.write.mode("overwrite").parquet(path)
    on_disk = spark.read.parquet(path)
    stats = multimodal.media_stats(on_disk)
    got = {(r["kind"], r["format"]): r["n_items"] for r in stats.collect()}
    assert sum(got.values()) == 120
    # payload-free projection prunes the blob column from the scan
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        on_disk.select("media_id", "kind").explain("formatted")
    explained = buf.getvalue()
    read_schema = explained.split("ReadSchema")[1].splitlines()[0]
    assert "payload" not in read_schema


def test_exact_dup_media(spark):
    base = multimodal.synth_media(spark, 40)
    dup = base.withColumn("media_id", base["media_id"] + 1000)
    dups = multimodal.exact_dup_media(base.unionByName(dup))
    rows = dups.collect()
    assert len(rows) == 40
    assert all(r["n_copies"] == 2 for r in rows)
    assert all(r["keep_id"] < 1000 for r in rows)


def test_media_features_feed_similarity_search(spark):
    """The promised composition: extract_features emits fixed-width
    array<float>, so the similarity-search operators apply to media
    UNCHANGED — rename (media_id, features) -> the embeddings layout
    and run brute-force cosine top-k over it."""
    from pyspark.sql import functions as F

    from pyconform_spark import multimodal, simsearch

    media = multimodal.synth_media(spark, 64)
    feats = multimodal.extract_features(media)
    emb = feats.select(
        F.col("media_id").alias("vec_id"),
        F.col("kind").alias("label"),
        F.col("features").alias("embedding"),
    )
    out = simsearch.knn_bruteforce(emb, n_queries=3, k=4).collect()
    assert len(out) == 3 * 4
    for r in out:
        assert r["query_id"] < 3 and r["vec_id"] != r["query_id"]
        assert -1.0 <= r["cosine"] <= 1.0
    # top-k per query is sorted descending by cosine
    from collections import defaultdict

    per_q = defaultdict(list)
    for r in out:
        per_q[r["query_id"]].append(r["cosine"])
    for q, cs in per_q.items():
        assert cs == sorted(cs, reverse=True)


def test_wav_codec_roundtrip():
    """Pure-Python RIFF/WAVE writer+reader recover samples bit-exact."""
    import numpy as np

    from pyconform_spark.multimodal import decode_wav, encode_wav

    samples = ((np.arange(800, dtype=np.int64) * 3) % 256 - 128).astype("<i2")
    blob = encode_wav(samples, rate=8000)
    d = decode_wav(bytes(blob))
    assert d["rate"] == 8000 and d["channels"] == 1 and d["bits"] == 16
    assert d["n_samples"] == 800 and d["duration_ms"] == 100
    assert (d["samples"] == samples).all()
    import pytest

    with pytest.raises(ValueError):
        decode_wav(b"nope" * 10)


def test_ppm_codec_roundtrip():
    import numpy as np
    import pytest

    from pyconform_spark.multimodal import decode_ppm, encode_ppm

    w, h = 5, 3
    pix = (np.arange(w * h * 3, dtype=np.int64) * 7) % 256
    blob = encode_ppm(pix, w, h)
    d = decode_ppm(bytes(blob))
    assert d["width"] == w and d["height"] == h
    assert (d["pixels"] == pix.astype(np.uint8)).all()
    assert d["mean"] == float(pix.sum()) / len(pix)
    # comment-tolerant header parse
    blob2 = b"P6\n# a comment\n5 3\n255\n" + bytes(pix.astype(np.uint8))
    assert decode_ppm(blob2)["width"] == 5
    with pytest.raises(ValueError):
        decode_ppm(b"P3\n1 1\n255\n000")


def test_real_decode_pipeline_through_spark(spark):
    """synth_real_media -> Arrow boundary -> decode_media_props: the
    decoded properties equal the closed forms the payloads were built
    from."""
    from pyconform_spark import multimodal

    ids = spark.range(40).withColumnRenamed("id", "media_id")
    media = multimodal.synth_real_media(ids)
    rows = {r["media_id"]: r for r in multimodal.decode_media_props(media).collect()}
    assert len(rows) == 40
    for mid, r in rows.items():
        if mid % 2 == 0:
            n = (mid % 50 + 1) * 40
            k = mid % 7 + 1
            assert r["kind"] == "audio"
            assert r["n_units"] == n
            assert r["duration_ms"] == (n * 1000) // 8000
            want = sum(((i * k) % 256) - 128 for i in range(n)) / n
            assert r["mean_value"] == want
        else:
            w, hh = mid % 16 + 1, mid % 8 + 1
            n = w * hh * 3
            assert r["kind"] == "image"
            assert (r["width"], r["height"], r["n_units"]) == (w, hh, n)
            want = sum((kk + mid) % 256 for kk in range(n)) / n
            assert r["mean_value"] == want


# ------------------------------------------------ property-based codecs
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=50, deadline=None)
@given(
    st.lists(st.integers(min_value=-32768, max_value=32767), max_size=400),
    st.sampled_from([8000, 16000, 44100]),
)
def test_wav_roundtrip_property(samples, rate):
    import numpy as np

    from pyconform_spark.multimodal import decode_wav, encode_wav

    arr = np.asarray(samples, dtype="<i2")
    d = decode_wav(bytes(encode_wav(arr, rate=rate)))
    assert d["rate"] == rate and d["n_samples"] == len(arr)
    assert (d["samples"] == arr).all()
    assert d["duration_ms"] == (len(arr) * 1000) // rate


@settings(max_examples=50, deadline=None)
@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_ppm_roundtrip_property(w, h, seed):
    import numpy as np

    from pyconform_spark.multimodal import decode_ppm, encode_ppm

    rng = np.random.RandomState(seed % (2**31))
    pix = rng.randint(0, 256, w * h * 3).astype(np.uint8)
    d = decode_ppm(bytes(encode_ppm(pix, w, h)))
    assert (d["width"], d["height"]) == (w, h)
    assert (d["pixels"] == pix).all()


def test_avi_roundtrip_and_conventions():
    """encode_avi/decode_avi roundtrip: the reader must undo the DIB
    conventions (bottom-up rows, BGR pixels, stride padding) exactly —
    frame 0 comes back as the original top-down RGB array.  Width 3
    forces a non-trivial stride pad (9 -> 12 bytes)."""
    import numpy as np

    from pyconform_spark import multimodal as M

    rng = np.random.RandomState(7)
    frames = rng.randint(0, 256, size=(4, 5, 3, 3), dtype=np.uint8)
    payload = M.encode_avi(frames, fps=25)
    d = M.decode_avi(payload)
    assert (d["width"], d["height"], d["n_frames"]) == (3, 5, 4)
    assert d["fps"] == 25
    assert d["duration_ms"] == 4 * 1000 // 25
    assert (d["frame0"] == frames[0]).all()
    px = frames[0].reshape(-1, 3).astype(np.int64)
    want = float((px[:, 0] * 299 + px[:, 1] * 587 + px[:, 2] * 114).sum()) / (
        1000 * 15
    )
    assert d["mean_luma_frame0"] == want


def test_avi_decoder_refuses_malformed():
    import numpy as np
    import pytest

    from pyconform_spark import multimodal as M

    with pytest.raises(ValueError, match="RIFF/AVI"):
        M.decode_avi(b"not an avi at all")
    # compressed stream (biCompression != 0) must be refused, not
    # silently mis-decoded
    frames = np.zeros((2, 2, 2, 3), dtype=np.uint8)
    payload = bytearray(M.encode_avi(frames))
    i = payload.index(b"strf")
    # biCompression is the 6th field of BITMAPINFOHEADER (offset 16)
    payload[i + 8 + 16 : i + 8 + 20] = (1).to_bytes(4, "little")
    with pytest.raises(ValueError, match="compressed"):
        M.decode_avi(bytes(payload))


def test_decode_media_props_handles_video(spark):
    """The mapInPandas decode path now covers kind='video' (the
    NotImplementedError retires to unknown kinds only)."""
    from pyconform_spark import multimodal as M

    ids = spark.range(6).withColumnRenamed("id", "media_id")
    media = M.synth_real_video(ids)
    rows = {r.media_id: r for r in M.decode_media_props(media).collect()}
    assert len(rows) == 6
    for mid, r in rows.items():
        assert r.width == mid % 8 + 2 and r.height == mid % 4 + 1
        assert r.n_units == mid % 5 + 2
        assert r.duration_ms == (mid % 5 + 2) * 100


def test_resize_nearest_neighbor_picks_exact_pixels():
    """decode(resize(x)) equals the numpy nearest-neighbor reference:
    output pixel (oy, ox) = input pixel (oy*h//out_h, ox*w//out_w)."""
    w, h, out_w, out_h = 7, 5, 4, 2
    pix = (np.arange(w * h * 3, dtype=np.int64) * 31 % 256).astype(np.uint8)
    enc = mm.encode_ppm(pix, w, h)
    d = mm.decode_ppm(enc)
    src = d["pixels"].reshape(h, w, 3)
    xs = (np.arange(out_w) * w) // out_w
    ys = (np.arange(out_h) * h) // out_h
    expected = src[np.ix_(ys, xs)]
    # through the re-encoded payload, like the Spark op does
    enc2 = mm.encode_ppm(expected.reshape(-1), out_w, out_h)
    d2 = mm.decode_ppm(enc2)
    assert d2["width"] == out_w and d2["height"] == out_h
    np.testing.assert_array_equal(
        d2["pixels"].reshape(out_h, out_w, 3), expected
    )


def test_decode_avi_frames_returns_every_frame_exactly():
    """decode_avi_frames round-trips ALL frames (not just frame 0)
    through the DIB conventions (bottom-up, BGR, stride padding)."""
    rng = np.random.default_rng(7)
    frames = rng.integers(0, 256, size=(4, 3, 5, 3), dtype=np.uint8)
    payload = mm.encode_avi(frames, fps=10)
    d = mm.decode_avi_frames(payload)
    assert d["width"] == 5 and d["height"] == 3 and d["fps"] == 10
    assert len(d["frames"]) == 4
    for f in range(4):
        np.testing.assert_array_equal(d["frames"][f], frames[f])


def test_sample_video_frames_stride_and_sums(spark):
    """The Spark frame-sample op emits exactly the f%stride==0 frames
    with exact sums, matching a local decode of the same payloads."""
    ids = spark.range(6).withColumnRenamed("id", "media_id")
    media = mm.synth_real_video(ids)
    rows = {
        (r["media_id"], r["frame_idx"]): r
        for r in mm.sample_video_frames(media, stride=2).collect()
    }
    local = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    n_expected = 0
    for mid, payload in local.items():
        d = mm.decode_avi_frames(payload)
        for f in range(0, len(d["frames"]), 2):
            n_expected += 1
            r = rows[(mid, f)]
            frame = d["frames"][f]
            assert r["frame_sum"] == int(
                frame.reshape(-1).astype(np.int64).sum()
            )
    assert len(rows) == n_expected


def test_png_roundtrip_and_filter_reconstruction():
    """encode_png writes Sub+Up filtered rows with real CRCs;
    decode_png must restore the exact raster — plus hand-built
    Average/Paeth/None payloads to cover the full filter set."""
    import struct
    import zlib

    import numpy as np

    from pyconform_spark import multimodal as M

    for mid in (0, 9, 100, 251):
        w, h = mid % 12 + 1, mid % 6 + 1
        k = np.arange(w * h * 3, dtype=np.int64)
        px = (3 * k + mid) % 256
        d = M.decode_png(M.encode_png(px, w, h))
        assert (d["width"], d["height"]) == (w, h)
        assert (d["pixels"].astype(np.int64) == px).all()

    # full-filter payload: rows use Average(3), Paeth(4), None(0)
    w, h = 4, 3
    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, size=h * w * 3).astype(np.int64)
    raster = px.reshape(h, w * 3)
    lines = []
    enc0 = np.zeros(w * 3, dtype=np.int64)
    for x in range(w * 3):
        left = raster[0][x - 3] if x >= 3 else 0
        enc0[x] = (raster[0][x] - left // 2) % 256
    lines.append(b"\x03" + enc0.astype(np.uint8).tobytes())
    enc1 = np.zeros(w * 3, dtype=np.int64)
    for x in range(w * 3):
        left = raster[1][x - 3] if x >= 3 else 0
        up = raster[0][x]
        ul = raster[0][x - 3] if x >= 3 else 0
        p = left + up - ul
        pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
        pred = left if pa <= pb and pa <= pc else up if pb <= pc else ul
        enc1[x] = (raster[1][x] - pred) % 256
    lines.append(b"\x04" + enc1.astype(np.uint8).tobytes())
    lines.append(b"\x00" + raster[2].astype(np.uint8).tobytes())

    def chunk(tag, body):
        crc = zlib.crc32(tag + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + tag + body + struct.pack(">I", crc)

    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + chunk(b"IEND", b"")
    )
    d = M.decode_png(payload)
    assert (d["pixels"].astype(np.int64) == px).all()

    # corrupted CRC must be rejected, not silently decoded
    bad = bytearray(payload)
    bad[-5] ^= 0xFF  # flip a bit inside IEND's CRC
    import pytest

    with pytest.raises(ValueError):
        M.decode_png(bytes(bad))
