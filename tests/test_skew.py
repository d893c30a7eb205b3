"""Skew handling over the Zipf-skewed synthetic transcripts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyconform_spark import synth
from pyconform_spark.operators import skew


@pytest.fixture(scope="module")
def tx(spark):
    df = synth.transcripts(spark, 30_000)
    df.persist().count()
    yield df
    df.unpersist()


def test_detect_heavy_keys_finds_zipf_head(spark, tx):
    heavy = skew.detect_heavy_keys(tx, ["conv_id"], min_share=0.01).collect()
    assert heavy  # the Zipf head exists
    # the hottest conversation is conv-00000000 by construction
    assert heavy[0]["conv_id"] == "conv-00000000"
    total = tx.count()
    assert all(r["n_rows"] >= total * 0.01 for r in heavy)


def test_salted_agg_equals_plain_agg_on_skewed_keys(spark, tx):
    aggs = {
        "n_turns": ("*", "count"),
        "first_idx": ("turn_idx", "min"),
        "last_idx": ("turn_idx", "max"),
    }
    salted = {
        tuple(r[:1]): (r["n_turns"], r["first_idx"], r["last_idx"])
        for r in skew.salted_agg(tx, ["conv_id"], aggs, n_salts=32).collect()
    }
    plain = {
        tuple(r[:1]): (r["n"], r["lo"], r["hi"])
        for r in tx.groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("turn_idx").alias("lo"),
            F.max("turn_idx").alias("hi"),
        )
        .collect()
    }
    assert salted == plain


def test_salted_agg_fans_hot_key_over_salts(spark, tx):
    """Stage 1 must actually spread the hot key: partial rows for the
    hottest conversation land in >1 salt group."""
    hot = tx.where(F.col("conv_id") == "conv-00000000")
    n = hot.count()
    assert n > 64
    salt = (F.monotonically_increasing_id() % 32).alias("_salt")
    n_salts = (
        hot.select("conv_id", salt)
        .groupBy("conv_id", "_salt")
        .count()
        .count()
    )
    assert n_salts > 1


def test_skew_split_join_equals_plain_join(spark, tx):
    """Hot-key split join must be result-identical to the plain join."""
    from pyspark.sql import functions as F

    convs = tx.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n_turns"))
    plain = tx.join(convs, ["conv_id"]).select("conv_id", "turn_idx", "n_turns")
    split = skew.skew_split_join(tx, convs, ["conv_id"], min_share=0.005).select(
        "conv_id", "turn_idx", "n_turns"
    )
    key = lambda t: tuple((x is None, x) for x in t)
    assert sorted(map(tuple, split.collect()), key=key) == sorted(
        map(tuple, plain.collect()), key=key
    )


def test_skew_split_join_refuses_unsupported_join_types(spark, tx):
    """right/full/semi/anti joins would duplicate or drop hot-key rows
    across the hot/cold branches — refused, not silently corrupted."""
    convs = tx.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n_turns"))
    for how in ("right", "full", "left_semi", "left_anti"):
        with pytest.raises(ValueError, match="inner"):
            skew.skew_split_join(tx, convs, ["conv_id"], how=how)


def test_skew_split_join_left_keeps_unmatched(spark, tx):
    """how='left': left rows without a right match survive null-padded,
    identically to the plain left join."""
    convs = (
        tx.groupBy("conv_id")
        .agg(F.count(F.lit(1)).alias("n_turns"))
        .where(F.col("conv_id") != "conv-00000000")  # drop the hot key
    )
    plain = tx.join(convs, ["conv_id"], "left").select(
        "conv_id", "turn_idx", "n_turns"
    )
    split = skew.skew_split_join(
        tx, convs, ["conv_id"], min_share=0.005, how="left"
    ).select("conv_id", "turn_idx", "n_turns")
    key = lambda t: tuple((x is None, x) for x in t)
    assert sorted(map(tuple, split.collect()), key=key) == sorted(
        map(tuple, plain.collect()), key=key
    )


def test_skew_split_join_broadcasts_hot_side(spark, tx):
    import contextlib
    import io

    from pyspark.sql import functions as F

    convs = tx.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n_turns"))
    out = skew.skew_split_join(tx, convs, ["conv_id"], min_share=0.005)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    assert "BroadcastHashJoin" in buf.getvalue()


def test_range_join_matches_naive_between_join(spark, tx):
    """Bucketed range join == naive BETWEEN join row for row, at any
    bucket size (coarse and fine), including left_semi semantics."""
    from pyconform_spark.operators.rangejoin import range_join

    pts = tx.select("conv_id", "turn_idx", "ts").where(F.col("turn_idx") < 50)
    iv = (
        tx.groupBy("conv_id")
        .agg(F.min("ts").alias("w_start"))
        .withColumn("w_end", F.col("w_start") + F.expr("INTERVAL 40 MINUTES"))
    )
    naive = pts.join(iv, "conv_id").where(
        (F.col("ts") >= F.col("w_start")) & (F.col("ts") <= F.col("w_end"))
    ).select("conv_id", "turn_idx")
    key = lambda t: tuple((x is None, x) for x in t)
    want = sorted(map(tuple, naive.collect()), key=key)
    for bs in (3600, 60):
        got_df = range_join(
            pts, iv, ["conv_id"], "ts", "w_start", "w_end", bucket_seconds=bs
        ).select("conv_id", "turn_idx")
        got = sorted(map(tuple, got_df.collect()), key=key)
        assert got == want, bs
    semi = range_join(
        pts, iv, ["conv_id"], "ts", "w_start", "w_end",
        bucket_seconds=3600, how="left_semi",
    )
    assert sorted(map(tuple, semi.select("conv_id", "turn_idx").collect()), key=key) == sorted(set(want))

    import pytest as _pytest
    with _pytest.raises(ValueError, match="inner"):
        range_join(pts, iv, ["conv_id"], "ts", "w_start", "w_end", how="left")
