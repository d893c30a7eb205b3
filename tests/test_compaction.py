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


def test_gc_orphans_sweeps_committed_debris_keeps_pending(spark, store, tmp_path):
    """Post-commit leftovers (applied compaction marker's staging/
    trash/intent) and intent-less debris are removed; a PENDING
    refresh intent's artifacts survive GC and recovery still rolls the
    refresh forward afterwards; the store verifies green throughout."""
    import json
    import shutil

    from pyspark.sql import functions as F

    before = _rows(pipeline.read_tier(spark, store, "1m"))
    stats = pipeline.compact_small_files(spark, store, "1m", marker="gc-test")
    assert stats

    # 1. recreate post-commit debris for the APPLIED compaction marker
    idir, sdir, tdir = pipeline._compact_dirs(store)
    os.makedirs(os.path.join(sdir, "gc-test", "1m"), exist_ok=True)
    with open(os.path.join(sdir, "gc-test", "1m", "junk.parquet"), "wb") as fh:
        fh.write(b"x" * 128)
    os.makedirs(idir, exist_ok=True)
    with open(os.path.join(idir, "gc-test.json"), "w") as fh:
        json.dump({"marker": "gc-test", "rows": []}, fh)

    # 2. intent-less refresh staging debris
    ridir, rsdir, rtdir = pipeline._refresh_dirs(store)
    os.makedirs(os.path.join(rsdir, "crashed-early"), exist_ok=True)
    with open(os.path.join(rsdir, "crashed-early", "junk"), "wb") as fh:
        fh.write(b"y" * 64)

    # 3. a stray publish-tmp copy next to a live partition
    ep = pipeline._tier_epochs_dir(store, "1m")[0]
    live = pipeline._tier_path(store, "1m", ep)
    shutil.copytree(live, live + ".publish-tmp")

    # 4. a PENDING refresh intent (marker not in the ledger) with its
    #    staging artifacts — GC must keep every piece
    os.makedirs(ridir, exist_ok=True)
    os.makedirs(os.path.join(rsdir, "pending-mk"), exist_ok=True)
    with open(os.path.join(rsdir, "pending-mk", "keep"), "wb") as fh:
        fh.write(b"z" * 32)
    with open(os.path.join(ridir, "pending-mk.json"), "w") as fh:
        json.dump({"marker": "pending-mk", "rows": []}, fh)

    report = pipeline.gc_orphans(spark, store, dry_run=True).collect()
    acts = {(r["kind"], r["marker"]): r["action"] for r in report}
    assert acts[("compact_intent", "gc-test")] == "removed"
    assert acts[("compact_staging", "gc-test")] == "removed"
    assert acts[("refresh_staging", "crashed-early")] == "removed"
    assert acts[("publish_tmp", f"epoch={ep}.publish-tmp")] == "removed"
    assert acts[("refresh_intent", "pending-mk")] == "kept_pending"
    assert acts[("refresh_staging", "pending-mk")] == "kept_pending"
    # dry run deleted nothing
    assert os.path.isfile(os.path.join(idir, "gc-test.json"))
    assert os.path.isdir(live + ".publish-tmp")

    report2 = pipeline.gc_orphans(spark, store).collect()
    assert any(r["bytes"] > 0 for r in report2)
    assert not os.path.isfile(os.path.join(idir, "gc-test.json"))
    assert not os.path.isdir(os.path.join(sdir, "gc-test"))
    assert not os.path.isdir(os.path.join(rsdir, "crashed-early"))
    assert not os.path.isdir(live + ".publish-tmp")
    # pending artifacts untouched
    assert os.path.isfile(os.path.join(ridir, "pending-mk.json"))
    assert os.path.isfile(os.path.join(rsdir, "pending-mk", "keep"))

    # store content identical, verify green, recovery path intact
    assert _rows(pipeline.read_tier(spark, store, "1m")) == before
    bad = pipeline.verify_store(spark, store).where(
        F.col("status") != "ok"
    )
    assert bad.count() == 0
    pipeline.recover_refreshes(spark, store)  # consumes pending intent
    assert not os.path.isfile(os.path.join(ridir, "pending-mk.json"))
