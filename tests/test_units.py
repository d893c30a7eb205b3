"""Unit-carrying column tests (PhysArray units semantics on Spark)."""

from __future__ import annotations

import pytest

from pyconform_spark import units


@pytest.fixture()
def df(spark):
    d = spark.createDataFrame(
        [(1, 1500.0, 2.0, 25.0), (2, 250.0, 0.5, -40.0)],
        "id long, dur double, dur2 double, temp double",
    )
    d = units.with_units(d, "dur", "ms")
    d = units.with_units(d, "dur2", "s")
    d = units.with_units(d, "temp", "degC")
    return d


def test_metadata_rides_the_schema(df):
    assert units.unit_of(df, "dur") == "ms"
    # metadata survives projection
    assert units.unit_of(df.select("id", "dur"), "dur") == "ms"


def test_convert_affine(df):
    out = units.convert(df, "dur", "s")
    vals = {r["id"]: r["dur"] for r in out.collect()}
    assert vals == {1: 1.5, 2: 0.25}
    assert units.unit_of(out, "dur") == "s"

    k = units.convert(df, "temp", "K")
    vals = {r["id"]: r["temp"] for r in k.collect()}
    assert vals == {1: 298.15, 2: 233.14999999999998}


def test_convert_incompatible_raises_at_plan_time(df):
    with pytest.raises(units.UnitsError, match="time.*bytes|bytes"):
        units.convert(df, "dur", "MiB")
    with pytest.raises(units.UnitsError, match="no units"):
        units.convert(df.withMetadata("dur", {}), "dur", "s")
    with pytest.raises(units.UnitsError, match="unknown unit"):
        units.with_units(df, "dur", "parsecs")


def test_add_converts_rhs_to_lhs_units(df):
    # dur[ms] + dur2[s]: rhs converted to ms (reference +/- rule)
    out = units.add_compatible(df, "dur", "dur2", "total")
    vals = {r["id"]: r["total"] for r in out.collect()}
    assert vals == {1: 1500.0 + 2000.0, 2: 250.0 + 500.0}
    assert units.unit_of(out, "total") == "ms"
    with pytest.raises(units.UnitsError):
        units.add_compatible(df, "dur", "temp", "nope")


def test_multiply_units_compose(df):
    out = units.multiply(df, "dur", "dur2", "prod")
    assert units.unit_of(out, "prod") == "(ms)*(s)"


def test_units_survive_parquet_roundtrip(spark, df, tmp_path):
    path = str(tmp_path / "u")
    df.write.parquet(path)
    back = spark.read.parquet(path)
    assert units.unit_of(back, "dur") == "ms"
    assert units.unit_of(back, "temp") == "degC"


def test_tier_rollup_carries_units(spark):
    from pyconform_spark import synth
    from pyconform_spark.operators import rollup

    tier = rollup.tier_rollup(synth.transcripts(spark, 500), "1m")
    assert units.unit_of(tier, "turn_rate") == "1/s"
    assert units.unit_of(tier, "text_len_avg") == "B"
    # convertible: per-second rate to per-hour rate, values x3600
    conv = units.convert(tier.limit(5), "turn_rate", "1/h")
    rows = conv.collect()
    assert all(abs(r["turn_rate"] % 1.0) < 1e-9 or r["turn_rate"] > 0 for r in rows)
    assert units.unit_of(conv, "turn_rate") == "1/h"
