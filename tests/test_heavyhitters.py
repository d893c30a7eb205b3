"""Misra-Gries heavy hitters: merge-rule error bound, superset
guarantee, exactness of the candidate+verify composition."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pyconform_spark.operators.heavyhitters import (
    _mg_merge,
    heavy_hitters_exact,
    mg_summaries,
)


def _zipf_frame(spark, n_rows=20_000, n_keys=400, seed=7):
    """Deterministic Zipf-ish keys: key i appears ~ n/(i+1) times."""
    rng = np.random.default_rng(seed)
    ranks = rng.zipf(1.3, size=n_rows)
    keys = (ranks % n_keys).astype("int64")
    pdf = pd.DataFrame({"k": keys})
    return spark.createDataFrame(pdf), pdf


def test_mg_merge_bound_and_size():
    rng = np.random.default_rng(1)
    vals = pd.Series(rng.zipf(1.5, size=5000) % 200)
    k = 32
    acc = pd.Series(dtype="float64")
    # feed in 10 batches to exercise repeated decrements
    for chunk in np.array_split(vals.values, 10):
        acc = _mg_merge(acc, pd.Series(chunk).value_counts(), k)
    assert len(acc) <= k
    true = vals.value_counts()
    n = len(vals)
    for key, mg in acc.items():
        t = true.get(key, 0)
        assert mg <= t, "MG never overcounts"
        assert t - mg <= n / (k + 1) + 1e-9, "MG error bound"
    # every key heavier than n/(k+1) must survive
    for key, t in true.items():
        if t > n / (k + 1):
            assert key in acc.index, f"heavy key {key} evicted"


def test_summaries_sentinel_recovers_total(spark):
    df, pdf = _zipf_frame(spark)
    df = df.repartition(8)
    summ = mg_summaries(df, "k", 64)
    total = summ.agg(F.sum("part_rows")).first()[0]
    assert total == len(pdf)
    # sentinel rows are NULL-keyed, one per non-empty partition
    n_sent = summ.where(F.col("k").isNull()).count()
    assert 1 <= n_sent <= 8


@pytest.mark.parametrize("parts", [2, 16])
def test_exact_heavy_hitters_any_partitioning(spark, parts):
    df, pdf = _zipf_frame(spark)
    df = df.repartition(parts)
    true = pdf["k"].value_counts()
    threshold = int(true.quantile(0.97))
    got = {
        r["k"]: r["n_rows"]
        for r in heavy_hitters_exact(df, "k", threshold, k=128).collect()
    }
    want = {int(k): int(v) for k, v in true[true >= threshold].items()}
    assert got == want


def test_small_k_still_correct_just_more_candidates(spark):
    """Any k is correct — an undersized sketch only weakens pruning."""
    df, pdf = _zipf_frame(spark, n_rows=5_000)
    true = pdf["k"].value_counts()
    threshold = int(true.max())  # only the single heaviest key(s)
    got = {
        r["k"]: r["n_rows"]
        for r in heavy_hitters_exact(df, "k", threshold, k=8).collect()
    }
    want = {int(k): int(v) for k, v in true[true >= threshold].items()}
    assert got == want
