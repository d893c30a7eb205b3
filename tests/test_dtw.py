from __future__ import annotations

import datetime as dt

import numpy as np

from pyconform_spark.operators.dtw import (
    _dtw_band,
    dtw_pairs,
    hourly_profiles,
)


def _dtw_ref(x, y):
    """Unbanded reference DP, plain Python."""
    n, m = len(x), len(y)
    INF = float("inf")
    d = [[INF] * (m + 1) for _ in range(n + 1)]
    d[0][0] = 0
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            c = abs(x[i - 1] - y[j - 1])
            d[i][j] = c + min(
                d[i - 1][j], d[i][j - 1], d[i - 1][j - 1]
            )
    return d[n][m]


def test_dtw_band_matches_unbanded_when_band_covers_grid():
    x = [3, 1, 4, 1, 5, 9, 2, 6]
    y = [2, 7, 1, 8, 2, 8, 1, 8]
    got = _dtw_band(
        np.array(x, dtype=np.int64), np.array(y, dtype=np.int64), r=8
    )
    assert got == _dtw_ref(x, y)


def test_dtw_tolerates_time_shift_where_euclidean_does_not():
    base = [0, 0, 10, 10, 10, 0, 0, 0]
    shift = [0, 0, 0, 10, 10, 10, 0, 0]  # same pulse, one step later
    flat = [5, 5, 5, 5, 5, 5, 5, 5]
    d_shift = _dtw_band(
        np.array(base, dtype=np.int64),
        np.array(shift, dtype=np.int64),
        r=3,
    )
    d_flat = _dtw_band(
        np.array(base, dtype=np.int64),
        np.array(flat, dtype=np.int64),
        r=3,
    )
    euclid = sum(abs(a - b) for a, b in zip(base, shift))
    assert d_shift == 0  # the warp absorbs the shift entirely
    assert euclid > 0
    assert d_flat > d_shift


def test_hourly_profiles_dense_and_pairs_exact(spark):
    # two series with known hour histograms; hour 2 absent from "b"
    # must read back as 0, and the pair distance is hand-checkable
    rows = []
    for h, n in [(0, 2), (1, 1), (2, 3)]:
        rows += [("a", dt.datetime(2024, 1, 1, h, 0, i)) for i in range(n)]
    for h, n in [(0, 1), (1, 2)]:
        rows += [("b", dt.datetime(2024, 1, 1, h, 0, i)) for i in range(n)]
    ev = spark.createDataFrame(rows, "event_type string, ts timestamp_ntz")
    prof = {
        r["series"]: r["profile"]
        for r in hourly_profiles(ev).collect()
    }
    assert prof["a"][:3] == [2, 1, 3] and sum(prof["a"]) == 6
    assert prof["b"][:3] == [1, 2, 0] and sum(prof["b"]) == 3
    out = dtw_pairs(hourly_profiles(ev)).collect()
    assert len(out) == 1
    row = out[0]
    expected = _dtw_ref(prof["a"], prof["b"])
    assert (row["series_a"], row["series_b"]) == ("a", "b")
    assert row["dtw_dist"] == expected
