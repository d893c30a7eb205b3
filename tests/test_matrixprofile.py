"""Matrix profile: the numpy diagonal recurrence against a
brute-force O(n^2 m) Python-int recompute (no numpy, so int64 wrap
can't hide in the reference), the tie rule, the exclusion zone, the
overflow guard, and the short-series edge."""

from __future__ import annotations

import numpy as np
import pytest

from pyconform_spark.operators import matrixprofile
from pyconform_spark.operators.matrixprofile import _profile_one


def _brute(v: list[int], m: int) -> dict[int, tuple[int, int]]:
    n = len(v)
    nw = n - m + 1
    out = {}
    for i in range(nw):
        best = None
        for j in range(nw):
            if abs(i - j) < m:
                continue
            d = sum((v[i + k] - v[j + k]) ** 2 for k in range(m))
            if best is None or d < best[0] or (d == best[0] and j < best[1]):
                best = (d, j)
        if best is not None:
            out[i] = best
    return out


def test_profile_matches_bruteforce_random():
    rng = np.random.RandomState(7)
    for trial in range(5):
        n, m = 40 + 10 * trial, 5
        v = rng.randint(-50, 50, size=n).astype(np.int64)
        best, bj = _profile_one(v, m)
        want = _brute([int(x) for x in v], m)
        got = {i: (int(best[i]), int(bj[i])) for i in range(len(best)) if bj[i] >= 0}
        assert got == want


def test_tie_breaks_to_smallest_neighbor():
    # three identical windows far apart: each picks the SMALLEST other
    m = 3
    v = np.array([9, 9, 9, 0, 1, 0, 9, 9, 9, 0, 2, 0, 9, 9, 9], dtype=np.int64)
    best, bj = _profile_one(v, m)
    # windows 0, 6, 12 are identical (dist 0); 0 -> 6, 6 -> 0, 12 -> 0
    assert best[0] == 0 and bj[0] == 6
    assert best[6] == 0 and bj[6] == 0
    assert best[12] == 0 and bj[12] == 0


def test_exclusion_zone_blocks_trivial_matches():
    # constant series: every window identical, but |i-j| < m excluded
    m = 4
    v = np.zeros(12, dtype=np.int64)
    best, bj = _profile_one(v, m)
    for i in range(len(best)):
        assert abs(i - bj[i]) >= m


def test_overflow_guard_raises_loudly():
    v = np.full(100, 2**31, dtype=np.int64)
    with pytest.raises(ValueError, match="overflow"):
        _profile_one(v, 10)


def test_short_series_emits_nothing(spark):
    import pandas as pd

    pts = spark.createDataFrame(
        pd.DataFrame(
            {
                "series": ["a"] * 10,
                "pos": list(range(10)),
                "h_s": [3600 * i for i in range(10)],
                "v": [1] * 10,
            }
        )
    )
    # n=10, m=6 -> nw=5 < m+1: no pair clears the exclusion zone
    assert matrixprofile.matrix_profile(pts, 6).count() == 0


def _points_df(spark, v):
    import pandas as pd

    return spark.createDataFrame(
        pd.DataFrame(
            {
                "series": ["s"] * len(v),
                "pos": list(range(len(v))),
                "h_s": [3600 * i for i in range(len(v))],
                "v": [int(x) for x in v],
            }
        )
    )


def _rows(df):
    return sorted(
        (r.series, r.pos, r.ws_s, r.mp_dist, r.nn_pos) for r in df.collect()
    )


def test_tiled_profile_row_identical_to_single_group(spark):
    """The SCAMP tiling must reproduce the single-group profile
    bit-for-bit — distances AND tie-broken neighbors — at chunk sizes
    that do and don't divide the series, including chunk == m."""
    rng = np.random.RandomState(11)
    v = rng.randint(-30, 30, size=90).astype(np.int64)
    pts = _points_df(spark, v)
    m = 6
    want = _rows(matrixprofile.matrix_profile(pts, m))
    assert len(want) > 0
    for chunk in (m, 17, 40, 90, 200):
        got = _rows(matrixprofile.matrix_profile_tiled(pts, m, chunk))
        assert got == want, f"chunk={chunk}"


def test_tiled_profile_tie_rule_survives_merge(spark):
    """Identical windows in three different chunks: the min-struct
    merge must still pick the smallest neighbor globally."""
    m = 3
    v = [9, 9, 9, 0, 1, 0, 9, 9, 9, 0, 2, 0, 9, 9, 9]
    pts = _points_df(spark, np.array(v, dtype=np.int64))
    got = {r.pos: (r.mp_dist, r.nn_pos)
           for r in matrixprofile.matrix_profile_tiled(pts, m, 5).collect()}
    assert got[0] == (0, 6)
    assert got[6] == (0, 0)
    assert got[12] == (0, 0)


def test_tiled_chunk_smaller_than_m_rejected(spark):
    pts = _points_df(spark, np.arange(30, dtype=np.int64))
    with pytest.raises(ValueError, match="chunk"):
        matrixprofile.matrix_profile_tiled(pts, 8, 7)
