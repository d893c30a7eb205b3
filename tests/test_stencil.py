"""Golden tests for neighbor-stencil operators vs numpy references.

Mirrors the reference's golden-value style for ``idl.deriv``
(``/root/reference/source/test/modules/idlTests.py:16-57``).
"""

from __future__ import annotations

import numpy as np
import pytest

from pyconform_spark.operators.stencil import (
    bounds,
    deriv3,
    diff,
    lead_diff,
    running_sum,
    weighted_mean,
)


def _np_deriv(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """IDL DERIV 3-point nonuniform formula (idl.py:24-70 semantics)."""
    n = len(x)
    d = np.empty(n)
    x01 = x[:-2] - x[1:-1]
    x02 = x[:-2] - x[2:]
    x12 = x[1:-1] - x[2:]
    d[1:-1] = (
        y[:-2] * (x12 / (x01 * x02))
        + y[1:-1] * (1.0 / x12 - 1.0 / x01)
        - y[2:] * (x01 / (x02 * x12))
    )
    a01, a02, a12 = x[0] - x[1], x[0] - x[2], x[1] - x[2]
    d[0] = y[0] * (a01 + a02) / (a01 * a02) - y[1] * a02 / (a01 * a12) + y[2] * a01 / (
        a02 * a12
    )
    b01, b02, b12 = x[-3] - x[-2], x[-3] - x[-1], x[-2] - x[-1]
    d[-1] = -y[-3] * (b12 / (b01 * b02)) + y[-2] * (b02 / (b01 * b12)) - y[-1] * (
        b02 + b12
    ) / (b02 * b12)
    return d


def _series(spark, xs, ys):
    return spark.createDataFrame(
        [("s", float(x), float(y)) for x, y in zip(xs, ys)], "k string, x double, y double"
    )


def test_diff_and_lead_diff(spark):
    df = _series(spark, range(5), [3, 5, 2, 2, 9])
    got = diff(df, "y", ["k"], "x").orderBy("x").toPandas()["y_diff"].tolist()
    assert got == [3.0, 2.0, -3.0, 0.0, 7.0]
    got = lead_diff(df, "y", ["k"], "x").orderBy("x").toPandas()["y_absorb"].tolist()
    assert got == [-2.0, 3.0, 0.0, -7.0, 9.0]


def test_bounds_midpoints(spark):
    df = _series(spark, [0.0, 1.0, 3.0], [0, 0, 0])
    pdf = bounds(df, "x", ["k"]).orderBy("x").toPandas()
    assert pdf["x_lb"].tolist() == [-0.5, 0.5, 2.0]
    assert pdf["x_ub"].tolist() == [0.5, 2.0, 4.0]


def test_running_sum(spark):
    df = _series(spark, range(4), [1, 2, 3, 4])
    got = running_sum(df, "y", ["k"], "x").orderBy("x").toPandas()["y_cum"].tolist()
    assert got == [1.0, 3.0, 6.0, 10.0]


def test_weighted_mean(spark):
    from pyspark.sql import functions as F

    df = _series(spark, range(4), [10, 20, 30, 40]).withColumn(
        "w", F.col("x") + 1
    )
    got = weighted_mean(df, "y", F.col("w"), ["k"]).collect()[0]["y_wmean"]
    exp = (10 * 1 + 20 * 2 + 30 * 3 + 40 * 4) / 10.0
    assert got == exp


@pytest.mark.parametrize("uniform", [True, False])
def test_deriv3_matches_idl_formula(spark, uniform):
    rng = np.random.RandomState(7)
    x = np.arange(12, dtype=np.float64) if uniform else np.sort(rng.uniform(0, 10, 12))
    y = rng.uniform(-5, 5, 12)
    df = _series(spark, x, y)
    got = deriv3(df, "x", "y", ["k"]).orderBy("x").toPandas()["y_deriv"].to_numpy()
    exp = _np_deriv(x, y)
    assert got == pytest.approx(exp, rel=1e-12)
    if uniform:
        # interior of a uniform grid also equals np.gradient
        assert got[1:-1] == pytest.approx(np.gradient(y, x)[1:-1], rel=1e-12)


def _np_bounds(x: np.ndarray, location: int, endpoints: bool) -> np.ndarray:
    """Reference BoundsFunction computed-idata branch
    (commonfunctions.py:295-310) transcribed for golden comparison."""
    n = len(x)
    out = np.stack([x, x], axis=1).astype(float)
    dx = np.diff(x)
    if location == 0:
        out[:-1, 1] = x[:-1] + dx
        if endpoints:
            out[-1, 1] = x[-1] + dx[-1]
    elif location == 1:
        hdx = 0.5 * dx
        out[1:, 0] = x[1:] - hdx
        out[:-1, 1] = x[:-1] + hdx
        if endpoints:
            out[0, 0] = x[0] - hdx[0]
            out[-1, 1] = x[-1] + hdx[-1]
    else:
        out[1:, 0] = x[1:] - dx
        if endpoints:
            out[0, 0] = x[0] - dx[0]
    return out


@pytest.mark.parametrize("location", [0, 1, 2])
@pytest.mark.parametrize("endpoints", [True, False])
def test_bounds_locations_match_reference_logic(spark, location, endpoints):
    xs = [0.0, 1.0, 3.0, 7.0, 8.5]
    df = _series(spark, xs, [0] * len(xs))
    got = (
        bounds(df, "x", ["k"], location=location, endpoints=endpoints)
        .orderBy("x")
        .toPandas()
    )
    want = _np_bounds(np.array(xs), location, endpoints)
    assert got["x_lb"].tolist() == pytest.approx(want[:, 0].tolist(), abs=0)
    assert got["x_ub"].tolist() == pytest.approx(want[:, 1].tolist(), abs=0)


def _np_bounds_ifc(x: np.ndarray, idata: np.ndarray, location: int) -> np.ndarray:
    """Reference idata branch (commonfunctions.py:313-341): full or
    inner interfaces."""
    n = len(x)
    ifc = np.empty(n + 1)
    if len(idata) == n + 1:
        ifc[:] = idata
    else:  # inner
        ifc[1:-1] = idata
        if location == 0:
            ifc[0] = x[0]
            ifc[-1] = 2 * x[-1] - x[-2]
        elif location == 1:
            ifc[0] = 2 * x[0] - idata[0]
            ifc[-1] = 2 * x[-1] - idata[-1]
        else:
            ifc[0] = 2 * x[0] - x[1]
            ifc[-1] = x[-1]
    return np.stack([ifc[:-1], ifc[1:]], axis=1)


@pytest.mark.parametrize("location", [0, 1, 2])
def test_bounds_from_inner_interfaces(spark, location):
    from pyconform_spark.operators.stencil import bounds_from_interfaces

    xs = [0.0, 1.0, 3.0, 7.0, 8.5]
    inner = [0.6, 2.1, 6.0, 7.7]  # asymmetric inner edges (n-1 of them)
    cells = _series(spark, xs, [0] * len(xs))
    ifc = spark.createDataFrame(
        [("s", float(v)) for v in inner], "k string, iv double"
    )
    got = (
        bounds_from_interfaces(cells, ifc, "x", "iv", ["k"], location=location)
        .orderBy("x")
        .toPandas()
    )
    want = _np_bounds_ifc(np.array(xs), np.array(inner), location)
    assert got["x_lb"].tolist() == pytest.approx(want[:, 0].tolist(), abs=0)
    assert got["x_ub"].tolist() == pytest.approx(want[:, 1].tolist(), abs=0)


def test_bounds_from_full_interfaces(spark):
    from pyconform_spark.operators.stencil import bounds_from_interfaces

    xs = [0.0, 1.0, 3.0]
    full = [-0.5, 0.4, 2.2, 3.3]
    cells = _series(spark, xs, [0] * len(xs))
    ifc = spark.createDataFrame(
        [("s", float(v)) for v in full], "k string, iv double"
    )
    got = (
        bounds_from_interfaces(
            cells, ifc, "x", "iv", ["k"], location=1, inner=False
        )
        .orderBy("x")
        .toPandas()
    )
    want = _np_bounds_ifc(np.array(xs), np.array(full), 1)
    assert got["x_lb"].tolist() == want[:, 0].tolist()
    assert got["x_ub"].tolist() == want[:, 1].tolist()
