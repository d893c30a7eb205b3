"""Gap detection / dense grid / locf / linear fill golden tests.

Reference-analog cases: mapdates gap checks (``mapdates.py:112-216``)
and yeartomonth upsampling (``commonfunctions.py:402-522``); linear
golden values come from np.interp exactly as the reference leans on
numpy (``commonfunctions.py:390``).
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest

from pyconform_spark.operators.gapfill import (
    dense_grid,
    detect_gaps,
    fill_linear,
    fill_linear_pandas,
    fill_locf,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _mk_tier(spark, minutes_values):
    """Tiny 1m tier table for one series; minutes_values: {minute: v}."""
    rows = [
        ("c1", "bash", "user", T0 + dt.timedelta(minutes=m), 1, float(v), int(v), float(v), False)
        for m, v in minutes_values.items()
    ]
    return spark.createDataFrame(
        rows,
        "conv_id string, tool string, role string, bucket_start timestamp_ntz,"
        " turn_count long, turn_rate double, text_len_sum long, text_len_avg double,"
        " gap_filled boolean",
    )


def test_detect_gaps(spark):
    df = _mk_tier(spark, {0: 1, 1: 2, 10: 3, 11: 4, 30: 5})
    gaps = (
        detect_gaps(df, ts_col="bucket_start", threshold_seconds=120)
        .orderBy("gap_start")
        .collect()
    )
    assert [(g.gap_seconds) for g in gaps] == [540, 1140]
    assert gaps[0].gap_start == T0 + dt.timedelta(minutes=1)
    assert gaps[0].gap_end == T0 + dt.timedelta(minutes=10)


def test_dense_grid_and_locf(spark):
    df = _mk_tier(spark, {0: 10, 3: 40})
    dense = dense_grid(df, "1m")
    assert dense.count() == 4
    filled = fill_locf(
        dense, ["turn_rate", "text_len_avg"], zero_fill=["turn_count", "text_len_sum"]
    )
    pdf = filled.orderBy("bucket_start").toPandas()
    assert pdf["turn_rate"].tolist() == [10.0, 10.0, 10.0, 40.0]
    assert pdf["turn_count"].tolist() == [1, 0, 0, 1]
    assert pdf["gap_filled"].tolist() == [False, True, True, False]


@pytest.mark.parametrize("impl", ["sql", "pandas"])
def test_linear_matches_np_interp(spark, impl):
    obs = {0: 10.0, 4: 50.0, 5: -3.0, 9: 1.0}
    df = _mk_tier(spark, obs)
    dense = dense_grid(df, "1m")
    if impl == "sql":
        filled = fill_linear(dense, ["turn_rate"])
    else:
        filled = fill_linear_pandas(
            dense.selectExpr(
                "conv_id", "tool", "role", "bucket_start",
                "cast(turn_count as double) turn_count",
                "turn_rate",
                "cast(text_len_sum as double) text_len_sum",
                "text_len_avg", "gap_filled",
            ),
            ["turn_rate"],
        )
    pdf = filled.orderBy("bucket_start").toPandas()
    t = np.arange(10) * 60.0
    tk = np.array(sorted(obs)) * 60.0
    vk = np.array([obs[k] for k in sorted(obs)])
    exp = np.interp(t, tk, vk)
    got = pdf["turn_rate"].to_numpy(dtype=np.float64)
    assert got == pytest.approx(exp.tolist(), abs=0, rel=0), got
    # bit-for-bit vs np.interp
    assert (got.view(np.uint64) == exp.view(np.uint64)).all()


def test_linear_sql_edges(spark):
    # leading + trailing missing buckets clamp to nearest observation
    df = _mk_tier(spark, {2: 7.0, 5: 13.0})
    dense = dense_grid(df, "1m")
    # grid only spans observed extent [2..5]; extend by unioning edge nulls
    filled = fill_linear(dense, ["turn_rate"]).orderBy("bucket_start").toPandas()
    assert filled["turn_rate"].tolist() == [7.0, 9.0, 11.0, 13.0]


class TestSplineFill:
    def test_spline_init_matches_linear_on_linear_data(self):
        import numpy as np

        from pyconform_spark.operators import gapfill as gf

        x = np.array([0.0, 10.0, 25.0, 40.0, 70.0])
        y = 3.0 * x + 7.0
        y2 = gf.spline_second_derivs(x, y)
        assert np.allclose(y2, 0.0, atol=1e-9)
        xq = np.linspace(0, 70, 29)
        out = gf.spline_eval(x, y, y2, xq)
        assert np.allclose(out, 3.0 * xq + 7.0)

    def test_spline_passes_through_knots(self):
        import numpy as np

        from pyconform_spark.operators import gapfill as gf

        rng = np.random.default_rng(7)
        x = np.sort(rng.uniform(0, 100, 12))
        y = rng.normal(size=12)
        y2 = gf.spline_second_derivs(x, y)
        assert np.allclose(gf.spline_eval(x, y, y2, x), y, atol=1e-12)

    def test_fill_spline_dataframe(self, spark):
        import numpy as np
        from pyspark.sql import functions as F

        from pyconform_spark.operators import gapfill as gf

        # one series, hourly grid 0..11h, observations at 0,3,6,9,11 of
        # a smooth quadratic — spline fill should beat linear fill
        base = 1704067200
        obs_idx = [0, 3, 6, 9, 11]
        f = lambda h: 0.5 * h * h + 2.0 * h + 1.0
        rows = [
            ("c1", "bash", "user",
             __import__("datetime").datetime.utcfromtimestamp(base + 3600 * h),
             float(f(h)) if h in obs_idx else None,
             h not in obs_idx)
            for h in range(12)
        ]
        dense = spark.createDataFrame(
            rows,
            "conv_id string, tool string, role string, "
            "bucket_start timestamp_ntz, v double, gap_filled boolean",
        )
        got = {
            r["bucket_start"].hour: r["v"]
            for r in gf.fill_spline(dense, ["v"]).collect()
        }
        for h in range(12):
            if h in obs_idx:
                assert got[h] == f(h)
            else:
                # natural BC forces zero curvature at the ends, so edge
                # panels deviate more on a quadratic — correct behavior
                tol = 0.5 if h < 3 or h > 8 else 0.2
                assert abs(got[h] - f(h)) < tol, (h, got[h], f(h))


# ------------------------------------------------- int_tabulated golden
def test_int_tabulated_knot_quadrature_identity():
    """When the input grid is ALREADY uniform with nseg % 4 == 0, the
    spline resample is the identity at the knots, so the integral
    reduces EXACTLY to sum(y * 2h/45 * coef) — computed here
    independently of the implementation."""
    import numpy as np

    from pyconform_spark.operators import gapfill

    x = np.linspace(0.0, 8.0, 9)  # nseg = 8, nint = 2
    y = np.array([3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0, 5.0])
    h = 1.0
    coef = np.array([7, 32, 12, 32, 14, 32, 12, 32, 7], dtype="d")
    # same sequential accumulation convention the implementation pins
    # (np.sum's pairwise tree is not reproducible in SQL)
    want = float(np.cumsum(y * (2.0 * h * coef / 45.0))[-1])
    got = gapfill.int_tabulated_np(x, y)
    assert got == want


def test_int_tabulated_analytic_accuracy():
    """5-point Newton-Cotes over a natural-cubic resample integrates
    smooth functions to high accuracy, including NON-uniform input
    grids (the reference's use case)."""
    import numpy as np

    from pyconform_spark.operators import gapfill

    rng = np.random.RandomState(7)
    # x^2 over [0, 2] -> 8/3, on a jittered non-uniform grid
    x = np.sort(np.concatenate([[0.0, 2.0], rng.uniform(0, 2, 30)]))
    got = gapfill.int_tabulated_np(x, x**2)
    assert abs(got - 8.0 / 3.0) < 1e-3

    # sin over [0, pi] -> 2
    x2 = np.sort(np.concatenate([[0.0, np.pi], rng.uniform(0, np.pi, 40)]))
    got2 = gapfill.int_tabulated_np(x2, np.sin(x2))
    assert abs(got2 - 2.0) < 1e-4


def test_integrate_series_matches_local_numpy(spark):
    """The grouped-Arrow Spark path returns exactly the local numpy
    result per series (and drops NaNs/duplicate abscissae first)."""
    import numpy as np
    import pandas as pd

    from pyconform_spark.operators import gapfill

    rng = np.random.RandomState(3)
    rows = []
    series = {}
    for k in ["a", "b"]:
        x = np.sort(rng.uniform(0, 10, 17))
        y = np.cos(x) + x
        series[k] = (x, y)
        rows += [(k, float(xi), float(yi)) for xi, yi in zip(x, y)]
    rows.append(("a", float(series["a"][0][0]), 99.0))  # duplicate abscissa
    rows.append(("b", float("nan"), 1.0))               # NaN x dropped
    df = spark.createDataFrame(rows, "k string, x double, y double")

    got = {
        r["k"]: (r["integral"], r["n_points"])
        for r in gapfill.integrate_series(df, "x", "y", ["k"]).collect()
    }
    for k, (x, y) in series.items():
        assert got[k][0] == gapfill.int_tabulated_np(x, y)
        assert got[k][1] == len(x)
