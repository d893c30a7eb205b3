"""Token-bucket replay: refill clamp, denial, burst recovery."""

from __future__ import annotations

from pyconform_spark.operators.ratelimit import token_bucket


def _mk(spark, times_us):
    rows = [("u", i, t) for i, t in enumerate(times_us)]
    return spark.createDataFrame(rows, "k string, eid long, t_us long")


def _replay(spark, times_us, capacity=3, cost=1, div=1_000_000):
    df = _mk(spark, times_us)
    out = token_bucket(
        df, ["k"], ["t_us", "eid"], "t_us",
        capacity=capacity, cost=cost, refill_divisor=div,
    )
    rows = sorted(out.collect(), key=lambda r: r["eid"])
    return [(r["allowed"], r["tokens_after"]) for r in rows]


def test_burst_drains_then_denies(spark):
    # 5 events in the same microsecond window, capacity 3
    got = _replay(spark, [0, 1, 2, 3, 4])
    assert got == [(1, 2), (1, 1), (1, 0), (0, 0), (0, 0)]


def test_refill_recovers_and_clamps_at_capacity(spark):
    # drain 3, wait 2s (refill 2), consume, wait 100s (clamps at 3)
    got = _replay(
        spark, [0, 1, 2, 2_000_002, 102_000_002, 102_000_003]
    )
    assert got[:3] == [(1, 2), (1, 1), (1, 0)]
    assert got[3] == (1, 1)       # refilled 2, spent 1
    assert got[4] == (1, 2)       # clamped at 3, spent 1
    assert got[5] == (1, 1)


def test_floor_refill_is_not_fractional(spark):
    # 999999 us refills 0 tokens at 1 token/s
    got = _replay(spark, [0, 999_999, 1_999_998])
    assert got == [(1, 2), (1, 1), (1, 0)]


def test_first_event_sees_full_bucket_per_key(spark):
    df = spark.createDataFrame(
        [("a", 0, 0), ("b", 0, 0)], "k string, eid long, t_us long"
    )
    out = token_bucket(df, ["k"], ["t_us", "eid"], "t_us", 2, 1, 10)
    assert {(r["k"], r["allowed"], r["tokens_after"]) for r in out.collect()} == {
        ("a", 1, 1), ("b", 1, 1)
    }
