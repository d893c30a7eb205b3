"""Crafted-input semantics for the TSDB-flavored operators
(counter_rate reset handling, M4 pixel-bucket picks) — the oracle
tests prove cross-engine equality; these pin the SEMANTICS against
hand-computed expectations.
"""

from __future__ import annotations

import datetime as dt

from pyconform_spark import queries as Q


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")


def test_counter_rate_handles_resets_like_prometheus(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        # one series: counter 10 -> 25 -> 3 (RESET) -> 8 within one hour
        (0, t0, 1, "c", 10.0, "{}"),
        (1, t0 + dt.timedelta(minutes=10), 1, "c", 25.0, "{}"),
        (2, t0 + dt.timedelta(minutes=20), 1, "c", 3.0, "{}"),
        (3, t0 + dt.timedelta(minutes=30), 1, "c", 8.0, "{}"),
    ]
    _write_events(spark, tmp_path, rows)
    out = Q.counter_rate(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    # increases: first sample 0, +15, reset->3 (post-reset value), +5 = 23
    assert r.increase == 23.0
    assert r.rate_per_sec == 23.0 / 3600
    assert r.n_samples == 4


def test_counter_rate_first_sample_of_each_series_contributes_zero(
    spark, tmp_path
):
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (0, t0, 1, "a", 100.0, "{}"),
        (1, t0, 2, "a", 50.0, "{}"),  # different series, same ts
    ]
    _write_events(spark, tmp_path, rows)
    out = {r.user_id: r for r in Q.counter_rate(spark, str(tmp_path)).collect()}
    assert out[1].increase == 0.0 and out[2].increase == 0.0


def test_m4_picks_min_max_first_last(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (0, t0, 1, "g", 5.0, "{}"),
        (1, t0 + dt.timedelta(hours=1), 1, "g", 9.0, "{}"),
        (2, t0 + dt.timedelta(hours=2), 1, "g", 1.0, "{}"),
        (3, t0 + dt.timedelta(hours=3), 1, "g", 7.0, "{}"),
    ]
    _write_events(spark, tmp_path, rows)
    out = Q.m4_downsample(spark, str(tmp_path)).collect()
    assert len(out) == 1  # all four in one 6h pixel bucket
    r = out[0]
    assert (r.v_first, r.v_min, r.v_max, r.v_last) == (5.0, 1.0, 9.0, 7.0)
    assert r.n_points == 4


def test_bloom_prune_no_false_negatives(spark, tmp_path):
    """The Bloom invariant that makes pruning safe: every exact member
    passes the filter (false positives allowed, negatives never) —
    crafted input with known non-members so the prune is observable."""
    from pyspark.sql import functions as F

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # users 1-5 purchase; users 100-139 only click (non-members)
    for i in range(50):
        u = (i % 5) + 1
        rows.append((i, t0 + dt.timedelta(minutes=i), u, "purchase", 1.0, "{}"))
    for i in range(40):
        rows.append(
            (100 + i, t0 + dt.timedelta(minutes=i), 100 + i, "click", 1.0, "{}")
        )
    _write_events(spark, tmp_path, rows)
    df = Q.bloom_join_prune(spark, str(tmp_path)).persist()
    assert df.where(F.col("exact_member") & ~F.col("bloom_pass")).count() == 0
    # with 15 bits set of 16384, ~40 non-members all fail w.h.p.;
    # require that pruning removes at least half of them
    assert df.where(~F.col("bloom_pass")).count() >= 20
    df.unpersist()
