"""KLL-style deterministic compactor sketch gates (operators/kll.py).

No DuckDB oracle can replay partition-order-dependent compaction, so
the gates are algorithmic invariants: exact weight conservation,
rank-error bound against exact ranks, merge preserving the bound,
bounded sketch size, and small-n exactness.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pyconform_spark.operators import kll

SF = "/root/testdata/sf0.01"
K = 200


def _vals(spark):
    df = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_type",
        F.floor(F.col("value") * 100).cast("long").alias("vq"),
    )
    return df


def test_distributed_build_weight_and_rank_bound(spark):
    df = _vals(spark).repartition(8)  # force multi-partition build
    sk = kll.build_group_sketches(df, ["event_type"], "vq", k=K).toPandas()
    exact = df.toPandas()
    for et, g in exact.groupby("event_type"):
        s = sk[sk.event_type == et]
        n = len(g)
        # exact weight conservation
        assert int(s.weight.sum()) == n
        # size bounded by (k+1) * levels
        n_levels = int(np.log2(max(s.weight.max(), 1))) + 1
        assert len(s) <= (K + 1) * n_levels
        v = np.sort(g.vq.to_numpy())
        h = n_levels
        bound = max(3 * n * h // (2 * K), 1)
        for q in np.linspace(0.05, 0.95, 19):
            x = int(v[int(q * (n - 1))])
            err = abs(kll.rank_of(s, x) - int((g.vq <= x).sum()))
            assert err <= bound, (et, q, err, bound)


def test_merge_preserves_weight_and_bound(spark):
    df = _vals(spark).where(F.col("event_type") == "click")
    pdf = df.toPandas()
    half = len(pdf) // 2
    parts = []
    for chunk in (pdf[:half], pdf[half:]):
        levels, counters = [[]], [0]
        kll._feed(levels, counters, chunk.vq.to_numpy(), K)
        parts.append(
            pd.DataFrame(kll._sketch_rows(levels), columns=["item", "weight"])
        )
    merged = kll.merge_pdf(pd.concat(parts, ignore_index=True), K)
    n = len(pdf)
    assert int(merged.weight.sum()) == n
    v = np.sort(pdf.vq.to_numpy())
    h = int(np.log2(max(merged.weight.max(), 1))) + 1
    bound = max(3 * n * h // (2 * K), 1)
    for q in (0.05, 0.25, 0.5, 0.75, 0.95):
        x = int(v[int(q * (n - 1))])
        err = abs(kll.rank_of(merged, x) - int((pdf.vq <= x).sum()))
        assert err <= bound


def test_small_n_is_exact_and_deterministic():
    vals = np.array([5, 1, 9, 3, 7], dtype=np.int64)
    for _ in range(2):
        levels, counters = [[]], [0]
        kll._feed(levels, counters, vals, K)
        s = pd.DataFrame(kll._sketch_rows(levels), columns=["item", "weight"])
        # below k: every item retained at weight 1 -> ranks exact
        assert sorted(s.item.tolist()) == [1, 3, 5, 7, 9]
        assert set(s.weight) == {1}
        assert kll.rank_of(s, 5) == 3
        assert kll.quantile_of(s, 0.5) == 5


def test_quantile_readoff_matches_rank_inverse():
    vals = (np.arange(5000) * 2654435761 % 99991).astype(np.int64)
    levels, counters = [[]], [0]
    kll._feed(levels, counters, vals, K)
    s = pd.DataFrame(kll._sketch_rows(levels), columns=["item", "weight"])
    v = np.sort(vals)
    h = int(np.log2(max(s.weight.max(), 1))) + 1
    bound = max(3 * len(vals) * h // (2 * K), 1)
    for q in (0.1, 0.5, 0.9, 0.99):
        est = kll.quantile_of(s, q)
        true_rank = int((vals <= est).sum())
        assert abs(true_rank - q * len(vals)) <= bound


def test_ascending_feed_preserves_extremes():
    """The invariant kll_range_sketch_readouts relies on: feeding a
    sorted run into the deterministic compactor keeps the exact min
    (every level's first compaction has offset 0, where the minimum
    sits) and the exact max (even capacity => every level-0 compaction
    processes an odd buffer and retains its largest item; the tail
    stays uncompacted) — at EVERY prefix length, including ones that
    trigger compaction cascades."""
    rng = np.random.default_rng(7)
    vals = np.sort(rng.integers(-10**6, 10**6, size=5000))
    for k in (2, 8, 200):
        for n in (1, 2, k, k + 1, 3 * k + 2, 2500, 5000):
            levels: list[list] = [[]]
            counters = [0]
            kll._feed(levels, counters, vals[:n], k)
            items = [v for lvl in levels for v in lvl]
            assert min(items) == int(vals[:n].min()), (k, n)
            assert max(items) == int(vals[:n].max()), (k, n)
            # weight conservation at every prefix too
            total = sum(len(lvl) << i for i, lvl in enumerate(levels))
            assert total == n, (k, n)


def test_cross_batch_feed_is_one_run(spark):
    """A cell larger than one Arrow batch must behave as ONE ascending
    feed — exact min/max and total weight — not as per-batch sketches
    re-merged (the merge path can drop the true minimum once a level's
    compaction offset has flipped).  30k rows at the default 10k-row
    Arrow batch size exercises three batches through one compactor."""
    n = 30_000
    df = (
        spark.range(n)
        .selectExpr("'g' AS g", "CAST(id * 7 - 1000 AS LONG) AS vq")
        .repartition(1, "g")
        .sortWithinPartitions("g", "vq")
    )
    sk = kll.build_group_sketches(df, ["g"], "vq", k=64).toPandas()
    assert int(sk.weight.sum()) == n
    assert int(sk.item.min()) == -1000
    assert int(sk.item.max()) == (n - 1) * 7 - 1000
    # bounded: one compactor's worth of rows, not three merged ones
    import numpy as np
    n_levels = int(np.log2(max(int(sk.weight.max()), 1))) + 1
    assert len(sk) <= (64 + 1) * n_levels


def test_cross_batch_feed_null_key(spark):
    """The cross-batch compactor state must keep feeding a NULL-keyed
    group too: pandas surfaces the null key as NaN, and NaN != NaN
    would miss the dict lookup on every Arrow batch after the first —
    silently reverting to per-batch sketches and voiding the
    single-ascending-run min/max-survival guarantee."""
    n = 30_000
    df = (
        spark.range(n)
        .selectExpr(
            "CAST(NULL AS STRING) AS g",
            "CAST(id * 7 - 1000 AS LONG) AS vq",
        )
        .repartition(1)
        .sortWithinPartitions("vq")
    )
    sk = kll.build_group_sketches(df, ["g"], "vq", k=64).toPandas()
    assert sk.g.isna().all()
    assert int(sk.weight.sum()) == n
    assert int(sk.item.min()) == -1000
    assert int(sk.item.max()) == (n - 1) * 7 - 1000
