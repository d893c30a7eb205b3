"""Directional as-of join semantics: backward/forward/nearest, exact
ties, tie-distance rule, and missing-side behavior."""

from __future__ import annotations

from datetime import datetime

import pytest

from pyconform_spark.operators.asof import asof_join, asof_join_directional


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01 00:00:10"), 1),
            ("a", _ts("2024-01-01 00:01:00"), 2),  # exact tie with right
            ("a", _ts("2024-01-01 00:02:30"), 3),  # equidistant 00:02/00:03
            ("a", _ts("2024-01-01 00:09:00"), 4),  # far after last right
            ("b", _ts("2024-01-01 00:00:30"), 5),  # key with no right rows
        ],
        "k string, ts timestamp, lid long",
    )
    right = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01 00:01:00"), 100),
            ("a", _ts("2024-01-01 00:02:00"), 200),
            ("a", _ts("2024-01-01 00:03:00"), 300),
        ],
        "k string, ts timestamp, v long",
    )
    return left, right


def _vals(df):
    return {r["lid"]: r["asof_v"] for r in df.collect()}


def test_backward_matches_legacy_asof(spark, frames):
    left, right = frames
    got = _vals(
        asof_join_directional(left, right, ["k"], "ts", "ts", ["v"], "backward")
    )
    legacy = {
        r["lid"]: r["asof_v"]
        for r in asof_join(left, right, ["k"], "ts", "ts", ["v"]).collect()
    }
    assert got == legacy
    # exact tie matches; before-first is NULL; no-right key is NULL
    assert got == {1: None, 2: 100, 3: 200, 4: 300, 5: None}


def test_forward_semantics_and_exact_tie(spark, frames):
    left, right = frames
    got = _vals(
        asof_join_directional(left, right, ["k"], "ts", "ts", ["v"], "forward")
    )
    # lid=2 sits exactly on a right row -> matches it (>= semantics);
    # lid=4 is after the last right row -> NULL
    assert got == {1: 100, 2: 100, 3: 300, 4: None, 5: None}


def test_nearest_picks_closer_backward_wins_ties(spark, frames):
    left, right = frames
    got = _vals(
        asof_join_directional(left, right, ["k"], "ts", "ts", ["v"], "nearest")
    )
    # lid=1: only forward exists; lid=3: equidistant -> backward wins;
    # lid=4: only backward exists
    assert got == {1: 100, 2: 100, 3: 200, 4: 300, 5: None}


def test_unknown_direction_rejected(spark, frames):
    left, right = frames
    with pytest.raises(ValueError):
        asof_join_directional(left, right, ["k"], "ts", "ts", ["v"], "sideways")
