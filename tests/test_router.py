"""Resolution router: tier-choice arithmetic + routed store reads."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest

from pyconform_spark import pipeline, synth
from pyconform_spark.router import TIER_SECONDS, choose_tier, route_read


def test_choose_tier_finest_that_fits():
    # 2h at <=200 points: 1m gives 120 points -> finest wins
    assert choose_tier(7200, 200) == ("1m", 60)
    # exactly at the cap still fits (ceil(7200/60) = 120)
    assert choose_tier(7200, 120) == ("1m", 60)
    # one second more overflows the 1m budget -> 1h
    assert choose_tier(7201, 120) == ("1h", 3600)
    # 7 days at <=500: 1m = 10080, 1h = 168
    assert choose_tier(7 * 86400, 500) == ("1h", 3600)
    # 30 days at <=50: 1d = 30
    assert choose_tier(30 * 86400, 50) == ("1d", 86400)


def test_choose_tier_ceil_not_floor():
    # 90 seconds spans 2 one-minute buckets, not 1
    assert choose_tier(90, 1) != ("1m", 60)
    assert choose_tier(90, 2) == ("1m", 60)


def test_choose_tier_falls_back_to_coarsest():
    # even 1d overflows (400 points > 100) -> still answer, coarsest
    assert choose_tier(400 * 86400, 100) == ("1d", 86400)


def test_choose_tier_custom_tiers_and_validation():
    assert choose_tier(100, 10, {"10s": 10, "5m": 300}) == ("10s", 10)
    assert choose_tier(10_000, 10, {"10s": 10, "5m": 300}) == ("5m", 300)
    with pytest.raises(ValueError):
        choose_tier(0, 10)
    with pytest.raises(ValueError):
        choose_tier(100, 0)


def test_route_read_reads_the_routed_tier(spark, tmp_path):
    tx = synth.transcripts(spark, 20_000)
    root = str(tmp_path / "store")
    pipeline.run(spark, tx, root)

    # pick a mid-store week so the range filter actually prunes
    lo, hi = tx.selectExpr("min(ts)", "max(ts)").first()
    start = lo.replace(tzinfo=timezone.utc)
    end = datetime.fromtimestamp(
        int(start.timestamp()) + 7 * 86400, tz=timezone.utc
    )

    tier, df = route_read(spark, root, start, end, max_points=500)
    assert tier == "1h"

    direct = pipeline.read_tier(spark, root, "1h").where(
        (
            "cast(cast(bucket_start as timestamp) as long) >= "
            f"{int(start.timestamp())}"
        )
    ).where(
        (
            "cast(cast(bucket_start as timestamp) as long) < "
            f"{int(end.timestamp())}"
        )
    )
    got = sorted(
        map(tuple, df.collect()),
        key=lambda t: tuple((x is None, x) for x in t),
    )
    want = sorted(
        map(tuple, direct.collect()),
        key=lambda t: tuple((x is None, x) for x in t),
    )
    assert got == want and len(got) > 0


def test_tier_seconds_sorted_finest_first():
    steps = sorted(TIER_SECONDS.values())
    assert steps == [60, 3600, 86400]
