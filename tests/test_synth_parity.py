"""North-rule parity gates (BASELINE.md):

* per-turn text equality between the Spark synth and the single-process
  numpy/pandas reference under stable (conv_id, turn_idx) ordering;
* bit-for-bit tier point match at 1m/1h/1d, both direct and cascaded.

Reference-analog: golden-value comparison discipline of
``/root/reference/source/test/modules/idlTests.py:16-57``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyconform_spark import oracle, synth
from pyconform_spark.operators.rollup import all_tiers, cascade_rollup, tier_rollup

N = 6000


def _sorted(pdf: pd.DataFrame, keys: list[str]) -> pd.DataFrame:
    return pdf.sort_values(keys, kind="mergesort").reset_index(drop=True)


def test_per_turn_text_equality(spark):
    got = _sorted(
        synth.transcripts(spark, N).toPandas(), ["conv_id", "turn_idx"]
    )
    exp = _sorted(oracle.transcripts_pdf(N), ["conv_id", "turn_idx"])
    assert len(got) == len(exp)
    assert got["conv_id"].tolist() == exp["conv_id"].tolist()
    assert got["turn_idx"].tolist() == exp["turn_idx"].tolist()
    # the per-row invariant: exact text equality under stable ordering
    assert got["text"].tolist() == exp["text"].tolist()
    assert got["role"].tolist() == exp["role"].tolist()
    assert (
        got["tool"].where(pd.notna(got["tool"]), None).tolist()
        == exp["tool"].where(pd.notna(exp["tool"]), None).tolist()
    )
    assert got["ts"].tolist() == exp["ts"].tolist()


def test_ts_strictly_increasing_per_conv(spark):
    pdf = _sorted(
        synth.transcripts(spark, N).toPandas(), ["conv_id", "turn_idx"]
    )
    for _, g in pdf.groupby("conv_id"):
        ts = g["ts"].to_numpy()
        assert (np.diff(ts.astype("int64")) > 0).all()


def _assert_tier_bitexact(got: pd.DataFrame, exp: pd.DataFrame):
    keys = ["conv_id", "tool", "role", "bucket_start"]
    got = _sorted(got.fillna({"tool": "\0"}), keys)
    exp = _sorted(exp.fillna({"tool": "\0"}), keys)
    assert len(got) == len(exp)
    for k in keys:
        assert got[k].tolist() == exp[k].tolist(), k
    for c in ["turn_count", "text_len_sum"]:
        assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c
    for c in ["turn_rate", "text_len_avg"]:
        # bit-for-bit: compare raw float64 bit patterns, not approx
        gb = got[c].to_numpy(dtype=np.float64).view(np.uint64)
        eb = exp[c].to_numpy(dtype=np.float64).view(np.uint64)
        assert (gb == eb).all(), c
    assert (~got["gap_filled"].to_numpy()).all()


def test_tier_1m_bitexact(spark):
    tr = synth.transcripts(spark, N)
    got = tier_rollup(tr, "1m").toPandas()
    exp = oracle.tier_rollup_pdf(oracle.transcripts_pdf(N), "1m")
    _assert_tier_bitexact(got, exp)


def test_cascade_matches_direct_and_oracle(spark):
    tr = synth.transcripts(spark, N)
    tiers = all_tiers(tr)
    ref = oracle.transcripts_pdf(N)
    for name in ["1h", "1d"]:
        got = tiers[name].toPandas()
        exp = oracle.tier_rollup_pdf(ref, name)
        _assert_tier_bitexact(got, exp)
    # cascade == direct rollup from raw (integer-sum composition)
    direct_1d = tier_rollup(tr, "1d").toPandas()
    _assert_tier_bitexact(tiers["1d"].toPandas(), direct_1d)


def test_oracle_cascade_self_consistent():
    ref = oracle.transcripts_pdf(N)
    t1m = oracle.tier_rollup_pdf(ref, "1m")
    via = oracle.cascade_rollup_pdf(t1m, "1m", "1h")
    direct = oracle.tier_rollup_pdf(ref, "1h")
    pd.testing.assert_frame_equal(
        via.sort_values(["conv_id", "tool", "role", "bucket_start"]).reset_index(drop=True),
        direct.sort_values(["conv_id", "tool", "role", "bucket_start"]).reset_index(drop=True),
    )
