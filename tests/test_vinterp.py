"""Golden tests for the vinth2p analog (operators/vinterp.py).

Reference semantics (pnglfunctions.py:12-77 wrapping NCAR vinth2p):
per column of air, interpolate v from its hybrid-law pressures onto
fixed target levels, linearly in p (intyp=1) or log p (intyp=2);
with extrapolation off, out-of-range targets are missing.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from pyconform_spark.operators.vinterp import (
    vertical_interp,
    vertical_interp_pandas,
)

COLS = "k string, p double, v double"


def _col_air(spark, ps, vs):
    return spark.createDataFrame(
        [("a", float(p), float(v)) for p, v in zip(ps, vs)], COLS
    )


def test_linear_interp_matches_hand_computation(spark):
    ps = [100.0, 200.0, 400.0, 800.0]
    vs = [1.0, 3.0, 2.0, 10.0]
    tgts = [150.0, 300.0, 400.0, 50.0, 900.0]
    got = {
        r["plev"]: r["v_interp"]
        for r in vertical_interp(
            _col_air(spark, ps, vs), ["k"], "p", "v", tgts
        ).collect()
    }
    assert got[150.0] == 1.0 + (3.0 - 1.0) * ((150.0 - 100.0) / (200.0 - 100.0))
    assert got[300.0] == 3.0 + (2.0 - 3.0) * ((300.0 - 200.0) / (400.0 - 200.0))
    assert got[400.0] == 2.0  # exact knot hit -> knot value
    assert got[50.0] is None  # below column -> missing (ixtrp=0)
    assert got[900.0] is None  # above column -> missing


def test_log_interp_matches_numpy(spark):
    ps = [100.0, 250.0, 700.0]
    vs = [5.0, -1.0, 4.0]
    tgts = [180.0, 500.0]
    got = {
        r["plev"]: r["v_interp"]
        for r in vertical_interp(
            _col_air(spark, ps, vs), ["k"], "p", "v", tgts, log_space=True
        ).collect()
    }
    for t in tgts:
        i = np.searchsorted(ps, t)
        frac = (math.log(t) - math.log(ps[i - 1])) / (
            math.log(ps[i]) - math.log(ps[i - 1])
        )
        want = vs[i - 1] + (vs[i] - vs[i - 1]) * frac
        assert got[t] == pytest.approx(want, rel=1e-12)


@pytest.mark.parametrize("log_space", [False, True])
def test_pandas_twin_agrees_with_catalyst(spark, log_space):
    """The grouped-Arrow-UDF hosting pattern must agree with the pure
    Catalyst expression (exactly for linear; within ulps for log —
    np.log vs Math.log differ by 1 ulp on some inputs)."""
    rng = np.random.RandomState(7)
    ps = np.sort(rng.uniform(50, 5000, 40))
    vs = rng.uniform(-10, 10, 40)
    tgts = [25.0, 60.0, 444.0, 2500.0, 4999.0, 6000.0]
    df = _col_air(spark, ps, vs)
    a = {
        r["plev"]: r["v_interp"]
        for r in vertical_interp(
            df, ["k"], "p", "v", tgts, log_space=log_space
        ).collect()
    }
    b = {
        r["plev"]: r["v_interp"]
        for r in vertical_interp_pandas(
            df, ["k"], "p", "v", tgts, log_space=log_space
        ).collect()
    }
    assert set(a) == set(b) == set(tgts)
    for t in tgts:
        av, bv = a[t], b[t]
        if av is None or (isinstance(av, float) and math.isnan(av)):
            assert bv is None or math.isnan(bv)
        elif log_space:
            assert bv == pytest.approx(av, rel=1e-12)
        else:
            assert bv == av


def test_multiple_columns_stay_independent(spark):
    rows = [("a", 100.0, 1.0), ("a", 300.0, 5.0), ("b", 150.0, -2.0), ("b", 350.0, 6.0)]
    df = spark.createDataFrame(rows, COLS)
    got = {
        (r["k"], r["plev"]): r["v_interp"]
        for r in vertical_interp(df, ["k"], "p", "v", [200.0]).collect()
    }
    assert got[("a", 200.0)] == 1.0 + (5.0 - 1.0) * ((200.0 - 100.0) / (300.0 - 100.0))
    assert got[("b", 200.0)] == -2.0 + (6.0 - -2.0) * ((200.0 - 150.0) / (350.0 - 150.0))
