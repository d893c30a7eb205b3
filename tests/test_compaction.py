"""Small-file compaction: identical data, fewer files, crash-safe."""

from __future__ import annotations

import os

import pytest

from pyconform_spark import pipeline, synth


@pytest.fixture()
def store(spark, tmp_path):
    tx = synth.transcripts(spark, 20_000)
    root = str(tmp_path / "store")
    pipeline.run(spark, tx, root)
    # fragment every 1m epoch into many small files (high ingest
    # parallelism simulation)
    for epoch in pipeline._tier_epochs_dir(root, "1m"):
        p = pipeline._tier_path(root, "1m", epoch)
        df = spark.read.parquet(p).repartition(6)
        tmp = p + ".frag"
        df.write.parquet(tmp)
        import shutil

        shutil.rmtree(p)
        os.rename(tmp, p)
    return root


def _rows(df):
    return sorted(
        map(tuple, df.collect()),
        key=lambda t: tuple((x is None, x) for x in t),
    )


def test_compact_preserves_rows_and_reduces_files(spark, store):
    before = _rows(pipeline.read_tier(spark, store, "1m"))
    stats = pipeline.compact_small_files(spark, store, "1m")
    assert stats, "fragmented store must compact something"
    for epoch, (fb, fa, n) in stats.items():
        assert fb >= 6 and fa == 1 and n > 0
    after = _rows(pipeline.read_tier(spark, store, "1m"))
    assert before == after
    # audit trail exists and covers every compacted epoch
    log = spark.read.parquet(os.path.join(store, "compaction_log"))
    assert {r["epoch"] for r in log.collect()} == set(stats)
    # store integrity audit still green
    bad = pipeline.verify_store(spark, store).where("status <> 'ok'")
    assert bad.count() == 0


def test_compact_is_idempotent(spark, store):
    pipeline.compact_small_files(spark, store, "1m")
    again = pipeline.compact_small_files(spark, store, "1m", marker="c2")
    assert again == {}


def test_compact_crash_mid_publish_rolls_forward(
    spark, store, monkeypatch
):
    before = _rows(pipeline.read_tier(spark, store, "1m"))
    real = pipeline._swap_in
    calls = {"n": 0}

    def explode(staged, live, trash):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("injected crash mid-publish")
        real(staged, live, trash)

    monkeypatch.setattr(pipeline, "_swap_in", explode)
    with pytest.raises(RuntimeError, match="injected"):
        pipeline.compact_small_files(spark, store, "1m")
    monkeypatch.setattr(pipeline, "_swap_in", real)

    recovered = pipeline.recover_compactions(spark, store)
    assert recovered == ["compact"]
    after = _rows(pipeline.read_tier(spark, store, "1m"))
    assert before == after
    # debris gone, log written exactly once
    assert not os.path.isdir(os.path.join(store, "compact_staging")) or not os.listdir(
        os.path.join(store, "compact_staging")
    )
    log = spark.read.parquet(os.path.join(store, "compaction_log"))
    assert log.groupBy("epoch").count().where("count > 1").count() == 0
    bad = pipeline.verify_store(spark, store).where("status <> 'ok'")
    assert bad.count() == 0


def test_recover_is_noop_on_clean_store(spark, store):
    pipeline.compact_small_files(spark, store, "1m")
    assert pipeline.recover_compactions(spark, store) == []
