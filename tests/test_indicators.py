"""Crafted-input semantics for the round-4 continuation operators
(indicators, control charts, complexity, planners) — the oracle sweep
proves cross-engine equality; these pin the SEMANTICS against
hand-computed expectations and structural invariants.
"""

from __future__ import annotations

import datetime as dt

from pyconform_spark import queries as Q

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/events.parquet"
    )


def _hourly(eid, hours_values, etype):
    """One event per hour: [(hour_offset, value), ...]."""
    return [
        (eid + i, T0 + dt.timedelta(hours=h), 1, etype, v, "{}")
        for i, (h, v) in enumerate(hours_values)
    ]


def test_macd_constant_series_is_flat(spark, tmp_path):
    rows = _hourly(0, [(h, 7.0) for h in range(30)], "flat")
    _write_events(spark, tmp_path, rows)
    out = Q.macd_signal(spark, str(tmp_path)).collect()
    assert len(out) == 30 - 18
    for r in out:
        assert r.macd == 0.0 and r.macd_sig == 0.0 and r.hist == 0.0
        assert not r.cross_up and not r.cross_down


def test_page_hinkley_flags_step_shift_only(spark, tmp_path):
    rows = _hourly(0, [(h, 1.0) for h in range(16)], "flat")
    rows += _hourly(
        100,
        [(h, 0.0) for h in range(8)] + [(h, 10000.0) for h in range(8, 16)],
        "shift",
    )
    _write_events(spark, tmp_path, rows)
    out = {
        r.event_type: r
        for r in Q.page_hinkley_drift(spark, str(tmp_path)).collect()
    }
    assert not out["flat"].drifted
    assert out["shift"].drifted
    assert out["shift"].ph_alarm > out["flat"].ph_alarm


def _lz76_reference(s: str) -> int:
    """Independent Kaspar-Schuster LZ76 phrase count."""
    n, c, i = len(s), 1, 2
    for j in range(2, n + 1):
        if s[i - 1 : j] in s[: j - 1]:
            continue
        c += 1
        i = j + 1
    return c + (1 if i <= n else 0)


def test_lz76_matches_independent_reference(spark, tmp_path):
    vals = [10.0, 10.0, 0.0, 0.0] * 4  # binarizes to '1100' * 4
    rows = _hourly(0, list(enumerate(vals)), "pat")
    _write_events(spark, tmp_path, rows)
    out = Q.lz76_complexity(spark, str(tmp_path)).collect()
    assert len(out) == 1
    assert out[0].lz_phrases == _lz76_reference("1100110011001100")
    assert out[0].n_symbols == 16


def test_lb_keogh_lower_bounds_dtw(spark):
    out = Q.lb_keogh_pairs(spark, "/root/testdata/sf0.001").collect()
    assert len(out) > 0
    for r in out:
        assert r.lb_l1 <= r.dtw_dist, (r.series_a, r.series_b)


def test_walsh_parseval_identity(spark, tmp_path):
    vals = [float((t % 7) + 1) for t in range(256)]
    rows = _hourly(0, list(enumerate(vals)), "w")
    _write_events(spark, tmp_path, rows)
    out = Q.walsh_band_energy(spark, str(tmp_path)).collect()
    xs = [int(v * 100) for v in vals]
    assert sum(r.energy for r in out) == 256 * sum(x * x for x in xs)
    dc = [r for r in out if r.band == 0]
    assert dc[0].energy == sum(xs) ** 2
    assert abs(sum(r.energy_frac for r in out) - 1.0) < 1e-12


def test_xmr_rules_fire_on_crafted_runs(spark, tmp_path):
    # two runs of 10 on opposite sides of the mean -> rule 2 fires at
    # run positions 9 and 10 in each run = 4 points
    rows = _hourly(
        0,
        [(h, 1.0) for h in range(10)] + [(h, 100.0) for h in range(10, 20)],
        "runs",
    )
    # 12 strictly increasing points -> rule 3 at t = 6..12 = 7 points
    rows += _hourly(100, [(h, float(h)) for h in range(12)], "mono")
    _write_events(spark, tmp_path, rows)
    out = {
        r.event_type: r
        for r in Q.xmr_western_electric(spark, str(tmp_path)).collect()
    }
    assert out["runs"].n_rule2 == 4
    assert out["mono"].n_rule3 == 7
    assert out["mono"].n_rule4 == 0


def test_demand_classification_regular_cadence_is_smooth(spark, tmp_path):
    rows = _hourly(0, [(h, 5.0) for h in range(48)], "reg")
    _write_events(spark, tmp_path, rows)
    out = Q.demand_classification(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.adi == 1.0 and r.cv2 == 0.0 and r.quadrant == "smooth"


def test_backfill_planner_caps_batches(spark, tmp_path):
    present = list(range(0, 6)) + [26] + [57] + [68]
    rows = _hourly(0, [(h, 1.0) for h in present], "gappy")
    _write_events(spark, tmp_path, rows)
    out = sorted(
        Q.backfill_job_planner(spark, str(tmp_path)).collect(),
        key=lambda r: r.gap_start_hr,
    )
    assert [(r.n_missing, r.batch_id) for r in out] == [
        (20, 0),
        (30, 0),
        (10, 2),
    ]


def test_interrupted_time_series_exact_segments(spark, tmp_path):
    vals = [(h, float(h + 1)) for h in range(10)]
    vals += [(h, 100.0 + 3.0 * (h + 1)) for h in range(10, 20)]
    rows = _hourly(0, vals, "its")
    _write_events(spark, tmp_path, rows)
    out = Q.interrupted_time_series(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.pre_slope == 1.0
    assert r.post_slope == 3.0
    assert r.slope_change == 2.0
    # pre line y = t, post line y = 100 + 3t, evaluated at t_b + 1 = 11
    assert r.level_change == (100.0 + 33.0) - 11.0


def test_dod_profile_regular_cadence_all_class0(spark, tmp_path):
    rows = _hourly(0, [(h, 1.0) for h in range(24)], "tick")
    _write_events(spark, tmp_path, rows)
    out = Q.dod_bucket_profile(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.cls == 0 and r.frac == 1.0 and r.bits_per_sample == 1.0


def test_goodman_kruskal_perfect_concordance(spark, tmp_path):
    rows = []
    eid = 0
    for day in range(4):
        for quad, hour, val in [
            (0, 0, 1.0),
            (1, 6, 2.0),
            (2, 12, 3.0),
            (3, 18, 4.0),
        ]:
            rows.append(
                (
                    eid,
                    T0 + dt.timedelta(days=day, hours=hour),
                    1,
                    "g",
                    val,
                    "{}",
                )
            )
            eid += 1
    _write_events(spark, tmp_path, rows)
    out = Q.goodman_kruskal_gamma(spark, str(tmp_path)).collect()
    assert len(out) == 1
    assert out[0].d_pairs == 0
    assert out[0].gamma == 1.0


def test_rle_compressibility_alternating_vs_block(spark, tmp_path):
    alt = [(h, 1.0 if h % 2 else 100.0) for h in range(20)]
    blk = [(h, 1.0 if h < 10 else 100.0) for h in range(20)]
    rows = _hourly(0, alt, "alt") + _hourly(100, blk, "blk")
    _write_events(spark, tmp_path, rows)
    out = {
        r.event_type: r
        for r in Q.rle_compressibility(spark, str(tmp_path)).collect()
    }
    assert out["blk"].n_runs == 2
    assert out["alt"].n_runs == 20
    assert out["blk"].rle_ratio < out["alt"].rle_ratio
