"""Ingest-time bucketing: the tier cascade over a conv_id-bucketed
table must plan ZERO exchanges (the shuffle disappears at write time),
with output identical to the plain-parquet path.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from pyconform_spark import synth
from pyconform_spark.operators import bucketing, rollup


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _n_exchanges(plan: str) -> int:
    import re

    return len(re.findall(r"^\(\d+\) Exchange", plan, re.M))


def _rows(df):
    def key(t):
        return tuple((x is None, x) for x in t)

    return sorted(map(tuple, df.collect()), key=key)


@pytest.fixture(scope="module")
def bucketed_tx(spark):
    tx = synth.transcripts(spark, 20_000)
    bucketing.write_bucketed(tx, "tx_bucketed_test", n_buckets=8)
    yield bucketing.read_bucketed(spark, "tx_bucketed_test")
    spark.sql("DROP TABLE IF EXISTS tx_bucketed_test")


def test_bucketed_tier_cascade_plans_zero_exchanges(spark, bucketed_tx):
    """hash(conv_id) bucketing satisfies the clustered distribution of
    EVERY tier aggregate (conv_id is in every grouping set), so 1m,
    1m→1h, and 1h→1d all plan without a single shuffle."""
    t1m = rollup.tier_rollup(bucketed_tx, "1m")
    assert _n_exchanges(_plan(t1m)) == 0
    t1h = rollup.cascade_rollup(t1m, "1h")
    assert _n_exchanges(_plan(t1h)) == 0
    t1d = rollup.cascade_rollup(t1h, "1d")
    assert _n_exchanges(_plan(t1d)) == 0


def test_bucketed_rollup_rows_match_plain_path(spark, bucketed_tx):
    """Zero-shuffle ≠ different answer: the bucketed 1m tier equals
    the plain-parquet 1m tier row for row."""
    plain = synth.transcripts(spark, 20_000)
    got = _rows(rollup.tier_rollup(bucketed_tx, "1m"))
    want = _rows(rollup.tier_rollup(plain, "1m"))
    assert got == want
    assert len(got) > 0


def test_unbucketed_baseline_does_shuffle(spark):
    """Control: the same rollup over the unbucketed frame plans the
    Exchange the bucketed path eliminated."""
    tx = synth.transcripts(spark, 20_000)
    assert _n_exchanges(_plan(rollup.tier_rollup(tx, "1m"))) >= 1


def test_bucketed_join_plans_no_exchange(spark, bucketed_tx):
    """Two tables bucketed the same way join WITHOUT shuffling either
    side — the sort-merge-bucket join every conv-keyed enrichment
    (tier ⋈ raw, raw ⋈ raw self-join) gets for free after ingest."""
    from pyspark.sql import functions as F

    convs = (
        bucketed_tx.groupBy("conv_id")
        .agg(F.count(F.lit(1)).alias("n_turns"))
    )
    bucketing.write_bucketed(
        convs.withColumn("ts", F.lit(None).cast("timestamp_ntz")),
        "tx_convs_test",
        n_buckets=8,
    )
    dim = bucketing.read_bucketed(spark, "tx_convs_test").drop("ts")
    try:
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = bucketed_tx.join(dim, "conv_id")
            plan = _plan(joined)
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        assert _n_exchanges(plan) == 0
        assert "SortMergeJoin" in plan
        n = joined.count()
        assert n == bucketed_tx.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS tx_convs_test")


def test_run_batch_bucketed_identical_tiers_and_zero_exchange(
    spark, tmp_path
):
    """The default pipeline path accepts bucketed=True: each batch is
    staged once as a bucketBy(conv_id) table and the whole cascade
    plans with ZERO Exchange nodes (gated below via the same
    _bucketed_source helper run_batch uses); tier rows are
    bit-identical to the plain path, and the staging table is dropped
    after the commit."""
    from pyspark.sql import functions as F

    from pyconform_spark import pipeline

    tx = synth.transcripts(spark, 20_000)
    tx.persist().count()
    r_plain = str(tmp_path / "plain")
    r_buck = str(tmp_path / "bucketed")
    res_a = pipeline.run_batch(spark, tx, r_plain)
    res_b = pipeline.run_batch(spark, tx, r_buck, bucketed=True, n_buckets=8)
    assert [ (r.epoch, r.points) for r in res_a ] == [
        (r.epoch, r.points) for r in res_b
    ]
    for tier in pipeline.TIER_ORDER:
        a = _rows(pipeline.read_tier(spark, r_plain, tier))
        b = _rows(pipeline.read_tier(spark, r_buck, tier))
        assert a == b, tier
    # staging table cleaned up
    leftovers = [
        t.name
        for t in spark.catalog.listTables()
        if t.name.startswith("pyconform_ingest_")
    ]
    assert leftovers == []
    # the exact staged source run_batch builds plans a zero-Exchange
    # cascade (1m agg + both cascades)
    src = pipeline._bucketed_source(
        spark, tx, 8, "pyconform_ingest_plangate"
    )
    try:
        t1m = rollup.tier_rollup(src, "1m")
        t1h = rollup.cascade_rollup(t1m, "1h")
        t1d = rollup.cascade_rollup(t1h, "1d")
        for frame in (t1m, t1h, t1d):
            assert _n_exchanges(_plan(frame)) == 0
    finally:
        spark.sql("DROP TABLE IF EXISTS pyconform_ingest_plangate")
    tx.unpersist()
