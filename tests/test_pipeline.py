"""Checkpoint/lineage/resume pipeline tests.

Proves the reference's chunk-dedup + atomic-rename semantics
(flownodes.py:851-861,940-972) hold in the epoch protocol:

* a full run over all epochs equals the direct (no-checkpoint) rollup
  bit-for-bit at every tier;
* a crashed run (some epochs committed, one written-but-uncommitted)
  resumes to the identical result, recomputing only what was not
  committed;
* lineage point counts reconcile with the tier tables.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from pyconform_spark import pipeline, synth
from pyconform_spark.operators import rollup


@pytest.fixture(scope="module")
def tx(spark):
    # 60k turns => the hottest conversations span multiple days => >=3 epochs
    df = synth.transcripts(spark, 60_000)
    df.persist().count()
    yield df
    df.unpersist()


def _tier_rows(df):
    # None-safe total order (tool is nullable)
    return sorted(
        map(tuple, df.collect()),
        key=lambda t: tuple((x is None, x) for x in t),
    )


def test_full_run_matches_direct(spark, tx, tmp_path):
    root = str(tmp_path / "ckpt")
    results = pipeline.run(spark, tx, root)
    assert len(results) >= 2 and not any(r.skipped for r in results)

    direct = rollup.all_tiers(tx)
    for tier in ("1m", "1h", "1d"):
        got = _tier_rows(pipeline.read_tier(spark, root, tier))
        want = _tier_rows(direct[tier])
        assert got == want, f"tier {tier} mismatch"


def test_resume_skips_committed_and_completes(spark, tx, tmp_path):
    root = str(tmp_path / "ckpt2")
    epochs = pipeline.list_epochs(tx)
    assert len(epochs) >= 3

    # run only the first two epochs (simulates a job killed mid-stream)
    first = pipeline.run(spark, tx, root, epochs=epochs[:2])
    assert [r.skipped for r in first] == [False, False]

    # crash scenario: epoch[2] data written but lineage never committed
    lo = epochs[2] * pipeline.EPOCH_SECONDS
    sl = tx.where(
        (F.col("ts").cast("timestamp").cast("long") >= lo)
        & (F.col("ts").cast("timestamp").cast("long") < lo + pipeline.EPOCH_SECONDS)
    )
    rollup.tier_rollup(sl, "1m").limit(3).write.mode("overwrite").parquet(
        pipeline._tier_path(root, "1m", epochs[2])
    )  # partial garbage data, no lineage row

    assert pipeline.committed_epochs(spark, root) == set(epochs[:2])

    # resume over everything
    second = pipeline.run(spark, tx, root)
    by_epoch = {r.epoch: r for r in second}
    assert by_epoch[epochs[0]].skipped and by_epoch[epochs[1]].skipped
    assert not by_epoch[epochs[2]].skipped  # uncommitted -> recomputed

    direct = rollup.all_tiers(tx)
    for tier in ("1m", "1h", "1d"):
        got = _tier_rows(pipeline.read_tier(spark, root, tier))
        want = _tier_rows(direct[tier])
        assert got == want, f"tier {tier} mismatch after resume"


def test_lineage_counts_reconcile(spark, tx, tmp_path):
    root = str(tmp_path / "ckpt3")
    pipeline.run(spark, tx, root)
    lin = pipeline.lineage(spark, root)
    per_tier = {
        r["tier"]: r["pts"]
        for r in lin.groupBy("tier").agg(F.sum("point_count").alias("pts")).collect()
    }
    for tier in ("1m", "1h", "1d"):
        assert per_tier[tier] == pipeline.read_tier(spark, root, tier).count()
    # idempotent re-run must not inflate lineage
    pipeline.run(spark, tx, root)
    lin2 = pipeline.lineage(spark, root)
    assert lin2.count() == lin.count()


def test_run_batch_matches_run_and_interops(spark, tx, tmp_path):
    """run_batch (one scan per commit batch) must produce byte-identical
    tiers to the per-epoch run, interoperate with its layout, and
    resume past epochs either mode committed."""
    epochs = pipeline.list_epochs(tx)
    root_a = str(tmp_path / "per_epoch")
    root_b = str(tmp_path / "batched")

    pipeline.run(spark, tx, root_a)
    res_b = pipeline.run_batch(spark, tx, root_b, epochs_per_commit=2)
    assert not any(r.skipped for r in res_b)
    for tier in ("1m", "1h", "1d"):
        assert _tier_rows(pipeline.read_tier(spark, root_b, tier)) == _tier_rows(
            pipeline.read_tier(spark, root_a, tier)
        ), tier

    # resume: everything committed => all skipped
    again = pipeline.run_batch(spark, tx, root_b)
    assert all(r.skipped for r in again)

    # interop: first epoch committed by per-epoch run, rest by batch
    root_c = str(tmp_path / "mixed")
    pipeline.run(spark, tx, root_c, epochs=epochs[:1])
    mixed = pipeline.run_batch(spark, tx, root_c)
    by_epoch = {r.epoch: r.skipped for r in mixed}
    assert by_epoch[epochs[0]] is True
    assert not any(by_epoch[e] for e in epochs[1:])
    for tier in ("1m", "1h", "1d"):
        assert _tier_rows(pipeline.read_tier(spark, root_c, tier)) == _tier_rows(
            pipeline.read_tier(spark, root_a, tier)
        ), tier


def test_partitioned_ingest_prunes_epoch_scans(spark, tx, tmp_path):
    import contextlib
    import io

    root = str(tmp_path / "ingested")
    pipeline.ingest_raw(tx, root)
    raw = pipeline.read_raw(spark, root)
    epochs = pipeline.list_epochs(tx)
    sl = pipeline.epoch_slice(raw, epochs[:1])

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        sl.explain("formatted")
    plan = buf.getvalue()
    # the epoch filter must land in PartitionFilters (pruning), and the
    # sliced rows must equal the ts-range filter over the raw frame
    scan = plan[plan.index("Scan parquet") :]
    pf = scan.split("PartitionFilters:")[1].splitlines()[0]
    assert "epoch_day" in pf
    lo = epochs[0] * pipeline.EPOCH_SECONDS
    want = tx.where(
        (F.col("ts").cast("timestamp").cast("long") >= lo)
        & (F.col("ts").cast("timestamp").cast("long") < lo + pipeline.EPOCH_SECONDS)
    ).count()
    assert sl.count() == want

    # round trip: row-for-row identical to the source
    assert raw.drop("epoch_day").count() == tx.count()


def test_compact_tier_roundtrip_bitexact(spark, tx, tmp_path):
    import numpy as np

    root = str(tmp_path / "compact")
    # bounded series count: blob-per-series cost is what we exercise,
    # not 40k tiny groups
    small = tx.where(F.col("conv_id") < "conv-00000120")
    pipeline.run_batch(spark, small, root)
    stats = pipeline.compact_tier(spark, root, "1h")
    hot = pipeline.read_tier(spark, root, "1h")
    assert stats["n_points"] == hot.count()
    assert stats["enc_bytes"] > 0

    cold = pipeline.read_cold_tier(spark, root, "1h")
    kf = lambda r: (r[0], r[1] is None, r[1], r[2], r[3])
    hot_rows = sorted(
        (
            (r["conv_id"], r["tool"], r["role"], r["bucket_start"],
             r["turn_rate"], r["text_len_avg"])
            for r in hot.collect()
        ),
        key=lambda t: tuple((x is None, x) for x in t[:4]),
    )
    cold_rows = sorted(
        (
            (r["conv_id"], r["tool"], r["role"], r["bucket_start"],
             r["turn_rate"], r["text_len_avg"])
            for r in cold.collect()
        ),
        key=lambda t: tuple((x is None, x) for x in t[:4]),
    )
    assert len(hot_rows) == len(cold_rows)
    for h, c in zip(hot_rows, cold_rows):
        assert h[:4] == c[:4]
        assert np.array_equal(
            np.array(h[4:], dtype=np.float64).view(np.uint64),
            np.array(c[4:], dtype=np.float64).view(np.uint64),
        ), h[:4]


def test_run_batch_over_ingested_raw_prunes_and_matches(spark, tx, tmp_path):
    """run_batch over the day-partitioned raw store must produce the
    same tiers as over the flat frame, with the epoch filter landing in
    PartitionFilters."""
    import contextlib
    import io

    root = str(tmp_path / "ing2")
    pipeline.ingest_raw(tx, root)
    raw = pipeline.read_raw(spark, root)

    epochs = pipeline.list_epochs(raw)
    assert epochs == pipeline.list_epochs(tx)

    sl = pipeline._epoch_filter(raw, epochs[:1])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        sl.explain("formatted")
    plan = buf.getvalue()
    pf = plan.split("PartitionFilters:")[1].splitlines()[0]
    assert "epoch_day" in pf

    store = str(tmp_path / "store_ing")
    pipeline.run_batch(spark, raw, store)
    direct = rollup.all_tiers(tx)
    for tier in ("1m", "1h", "1d"):
        got = _tier_rows(pipeline.read_tier(spark, store, tier))
        want = _tier_rows(direct[tier])
        assert got == want, tier


def test_read_tier_as_of_is_a_consistent_prefix(spark, tmp_path):
    """Time-travel reads: as-of an intermediate checkpoint epoch, the
    tier equals exactly the epochs committed up to that point —
    unaffected by later commits."""
    from pyconform_spark import pipeline, synth

    tx = synth.transcripts(spark, 30_000)
    root = str(tmp_path / "asof")
    res = pipeline.run(spark, tx, root)
    epochs = sorted(r.epoch for r in res)
    assert len(epochs) >= 2
    mid = epochs[len(epochs) // 2 - 1]
    snap = pipeline.read_tier_as_of(spark, root, "1m", mid)
    full = pipeline.read_tier(spark, root, "1m")
    # the snapshot is a strict prefix of the full tier
    assert snap.count() < full.count()
    import pyspark.sql.functions as F

    want = sum(
        spark.read.parquet(pipeline._tier_path(root, "1m", e)).count()
        for e in epochs
        if e <= mid
    )
    assert snap.count() == want
    with pytest.raises(FileNotFoundError):
        pipeline.read_tier_as_of(spark, root, "1m", min(epochs) - 1)


def test_late_refresh_matches_full_recompute(spark, tx, tmp_path):
    """Incremental continuous-aggregate refresh: committing on-time
    rows, then merging the late stragglers with refresh_late, must
    equal the full recompute bit-for-bit at every tier — and must NOT
    rewrite epoch partitions the late batch doesn't touch."""
    import os

    root = str(tmp_path / "late")
    epochs = pipeline.list_epochs(tx)
    hot = epochs[-1]
    day = F.floor(
        F.col("ts").cast("timestamp").cast("long") / pipeline.EPOCH_SECONDS
    ).cast("long")
    is_late = (day == hot) & (
        F.abs(F.hash("conv_id", "turn_idx")) % 5 == 0
    )
    ontime, late = tx.where(~is_late), tx.where(is_late)
    assert late.count() > 0

    pipeline.run_batch(spark, ontime, root)

    def snapshot(tier):
        out = {}
        base = os.path.join(root, "tiers", tier)
        for d in os.listdir(base):
            if not d.startswith("epoch="):
                continue
            p = os.path.join(base, d)
            out[d] = sorted(
                (f, os.path.getmtime(os.path.join(p, f)))
                for f in os.listdir(p)
                if f.endswith(".parquet")
            )
        return out

    before = {t: snapshot(t) for t in pipeline.TIER_ORDER}
    points = pipeline.refresh_late(spark, late, root)
    assert all(points[t] > 0 for t in pipeline.TIER_ORDER)

    direct = rollup.all_tiers(tx)
    for tier in pipeline.TIER_ORDER:
        got = _tier_rows(pipeline.read_tier(spark, root, tier))
        want = _tier_rows(direct[tier])
        assert got == want, tier

    # untouched epochs' data files are byte-identical on disk
    for tier in pipeline.TIER_ORDER:
        after = snapshot(tier)
        for d, files in before[tier].items():
            if d != f"epoch={hot}":
                assert after[d] == files, (tier, d)


def test_late_refresh_creates_new_epochs(spark, tx, tmp_path):
    """A late batch for a day NEVER committed (pure backfill) must
    create the epoch partitions and commit lineage for them."""
    root = str(tmp_path / "backfill")
    epochs = pipeline.list_epochs(tx)
    first, rest_days = epochs[0], epochs[1:]
    day = F.floor(
        F.col("ts").cast("timestamp").cast("long") / pipeline.EPOCH_SECONDS
    ).cast("long")
    pipeline.run_batch(spark, tx.where(day != first), root)
    pipeline.refresh_late(spark, tx.where(day == first), root)
    assert first in pipeline.committed_epochs(spark, root)
    direct = rollup.all_tiers(tx)
    for tier in pipeline.TIER_ORDER:
        got = _tier_rows(pipeline.read_tier(spark, root, tier))
        assert got == _tier_rows(direct[tier]), tier


def test_verify_store_audits_clean_corrupt_and_orphan(spark, tx, tmp_path):
    """verify_store: clean store (incl. a late refresh) is all-ok;
    a deleted data file flips that epoch to mismatch/missing; an
    uncommitted dir shows as orphan."""
    import os

    root = str(tmp_path / "audit")
    epochs = pipeline.list_epochs(tx)
    hot = epochs[-1]
    day = F.floor(
        F.col("ts").cast("timestamp").cast("long") / pipeline.EPOCH_SECONDS
    ).cast("long")
    late = tx.where((day == hot) & (F.abs(F.hash("conv_id", "turn_idx")) % 7 == 0))
    pipeline.run_batch(spark, tx.subtract(late), root)
    pipeline.refresh_late(spark, late, root)

    audit = pipeline.verify_store(spark, root).collect()
    assert len(audit) == 3 * len(epochs)
    assert all(r.status == "ok" for r in audit), [
        (r.tier, r.epoch, r.status) for r in audit if r.status != "ok"
    ]

    # corruption: remove one parquet part from a committed 1m epoch
    victim = os.path.join(root, "tiers", "1m", f"epoch={epochs[0]}")
    parts = [f for f in os.listdir(victim) if f.endswith(".parquet")]
    os.remove(os.path.join(victim, parts[0]))
    # orphan: a data dir that never got lineage
    orphan = os.path.join(root, "tiers", "1d", "epoch=99999")
    os.makedirs(orphan)
    spark.range(3).withColumn("bucket_start", F.current_timestamp()).write.mode(
        "overwrite"
    ).parquet(orphan)

    remaining = [f for f in os.listdir(victim) if f.endswith(".parquet")]
    audit2 = {(r.tier, r.epoch): r for r in pipeline.verify_store(spark, root).collect()}
    bad = audit2[("1m", epochs[0])]
    if remaining:  # partial loss -> count disagrees
        assert bad.status == "mismatch"
        assert bad.actual_points < bad.expected_points
    else:  # the only part vanished -> whole epoch gone
        assert bad.status == "missing"
    assert audit2[("1d", 99999)].status == "orphan"
    assert audit2[("1h", epochs[0])].status == "ok"


def _refresh_split(tx):
    epochs = pipeline.list_epochs(tx)
    hot = epochs[-1]
    day = F.floor(
        F.col("ts").cast("timestamp").cast("long") / pipeline.EPOCH_SECONDS
    ).cast("long")
    is_late = (day == hot) & (F.abs(F.hash("conv_id", "turn_idx")) % 5 == 0)
    return tx.where(~is_late), tx.where(is_late)


def test_refresh_crash_before_commit_never_double_counts(
    spark, tx, tmp_path, monkeypatch
):
    """THE crash window the old in-place merge got wrong: all tier
    partitions published, lineage append not yet run.  Replaying the
    SAME late batch must roll forward (not re-merge), so every tier
    still equals the full recompute — an additive double-count would
    inflate turn_count and fail the bit-for-bit check."""
    root = str(tmp_path / "crash1")
    ontime, late = _refresh_split(tx)
    pipeline.run_batch(spark, ontime, root)

    real_commit = pipeline._commit_refresh_lineage

    def boom(*a, **k):
        raise RuntimeError("injected crash before lineage commit")

    monkeypatch.setattr(pipeline, "_commit_refresh_lineage", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        pipeline.refresh_late(spark, late, root, marker="m1")
    monkeypatch.setattr(pipeline, "_commit_refresh_lineage", real_commit)

    # marker never committed; the data IS on disk (published, uncommitted)
    assert "m1" not in pipeline.applied_refresh_markers(spark, root)

    # replay the same batch: recovery rolls the intent forward
    points = pipeline.refresh_late(spark, late, root, marker="m1")
    assert "m1" in pipeline.applied_refresh_markers(spark, root)
    assert all(points[t] == 0 for t in pipeline.TIER_ORDER) or all(
        points[t] > 0 for t in pipeline.TIER_ORDER
    )

    direct = rollup.all_tiers(tx)
    for tier in pipeline.TIER_ORDER:
        got = _tier_rows(pipeline.read_tier(spark, root, tier))
        assert got == _tier_rows(direct[tier]), tier


def test_refresh_crash_mid_publish_rolls_forward(spark, tx, tmp_path, monkeypatch):
    """Crash after publishing only SOME tier partitions (the 1m swap
    done, 1h/1d not): recovery must classify each partition by its
    fingerprint and finish publishing only the unpublished ones."""
    root = str(tmp_path / "crash2")
    ontime, late = _refresh_split(tx)
    pipeline.run_batch(spark, ontime, root)

    real_swap = pipeline._swap_in
    calls = {"n": 0}

    def swap_then_die(staged, live, trash, **kw):
        if calls["n"] >= 1:
            raise RuntimeError("injected crash mid-publish")
        calls["n"] += 1
        real_swap(staged, live, trash, **kw)

    monkeypatch.setattr(pipeline, "_swap_in", swap_then_die)
    with pytest.raises(RuntimeError, match="mid-publish"):
        pipeline.refresh_late(spark, late, root, marker="m2")
    monkeypatch.setattr(pipeline, "_swap_in", real_swap)

    pipeline.refresh_late(spark, late, root, marker="m2")
    assert "m2" in pipeline.applied_refresh_markers(spark, root)
    direct = rollup.all_tiers(tx)
    for tier in pipeline.TIER_ORDER:
        got = _tier_rows(pipeline.read_tier(spark, root, tier))
        assert got == _tier_rows(direct[tier]), tier

    # audit agrees end-to-end and all staging debris is gone
    audit = pipeline.verify_store(spark, root).collect()
    assert all(r.status == "ok" for r in audit)
    import os

    for d in ("refresh_intents", "refresh_staging", "refresh_trash"):
        p = os.path.join(root, d)
        assert not os.path.isdir(p) or os.listdir(p) == [], d


def test_refresh_crash_during_staging_leaves_live_untouched(
    spark, tx, tmp_path, monkeypatch
):
    """Crash BEFORE the intent commit (while staging): the live store
    must be byte-identical afterwards and recovery just sweeps debris."""
    import os

    root = str(tmp_path / "crash3")
    ontime, late = _refresh_split(tx)
    pipeline.run_batch(spark, ontime, root)

    def snapshot():
        out = {}
        for tier in pipeline.TIER_ORDER:
            base = os.path.join(root, "tiers", tier)
            for d in os.listdir(base):
                p = os.path.join(base, d)
                out[(tier, d)] = sorted(
                    (f, os.path.getsize(os.path.join(p, f)))
                    for f in os.listdir(p)
                    if f.endswith(".parquet")
                )
        return out

    before = snapshot()

    real = pipeline.rollup.cascade_rollup

    def die(*a, **k):
        raise RuntimeError("injected crash during staging")

    monkeypatch.setattr(pipeline.rollup, "cascade_rollup", die)
    with pytest.raises(RuntimeError, match="during staging"):
        pipeline.refresh_late(spark, late, root, marker="m3")
    monkeypatch.setattr(pipeline.rollup, "cascade_rollup", real)

    assert snapshot() == before
    assert "m3" not in pipeline.applied_refresh_markers(spark, root)
    # debris swept on the next refresh entry, which then applies cleanly
    pipeline.refresh_late(spark, late, root, marker="m3")
    direct = rollup.all_tiers(tx)
    for tier in pipeline.TIER_ORDER:
        got = _tier_rows(pipeline.read_tier(spark, root, tier))
        assert got == _tier_rows(direct[tier]), tier


def test_verify_store_tolerates_pre_commit_seq_ledger(spark, tx, tmp_path):
    """A ledger written before the commit_seq column existed (or mixed
    old+new rows reading as NULL) must still audit clean, not raise or
    flag spurious mismatches."""
    root = str(tmp_path / "oldledger")
    pipeline.run_batch(spark, tx, root)
    # rewrite the ledger without commit_seq, as an old build would have
    lin = pipeline.lineage(spark, root).drop("commit_seq").localCheckpoint()
    import shutil as _sh

    _sh.rmtree(pipeline._lineage_path(root))
    lin.coalesce(1).write.mode("overwrite").parquet(pipeline._lineage_path(root))
    audit = pipeline.verify_store(spark, root).collect()
    assert audit and all(r.status == "ok" for r in audit)


def test_store_diff_classifies_backfill_changes(spark, tx, tmp_path):
    """Time-travel diff: a later epoch shows only 'added' points;
    identical snapshots diff to empty; tier_diff against a perturbed
    recompute classifies 'changed' and 'removed' exactly."""
    from pyspark.sql import functions as F

    root = str(tmp_path / "diffstore")
    pipeline.run(spark, tx, root)
    epochs = sorted(pipeline.committed_epochs(spark, root))
    assert len(epochs) >= 2
    e_first, e_last = epochs[0], epochs[-1]

    # identical snapshots -> empty diff
    assert pipeline.store_diff(spark, root, "1m", e_last, e_last).count() == 0

    # first epoch vs full history -> only additions, count-exact
    d = pipeline.store_diff(spark, root, "1m", e_first, e_last)
    kinds = {r["status"] for r in d.select("status").distinct().collect()}
    assert kinds == {"added"}
    n_first = pipeline.read_tier_as_of(spark, root, "1m", e_first).count()
    n_all = pipeline.read_tier(spark, root, "1m").count()
    assert d.count() == n_all - n_first

    # frame-level diff vs a perturbed recompute: bump one bucket's
    # count ('changed') and drop one series ('removed')
    cur = pipeline.read_tier(spark, root, "1m")
    victim = cur.select("conv_id").first()["conv_id"]
    perturbed = cur.where(F.col("conv_id") != victim).withColumn(
        "turn_count",
        F.when(
            F.col("bucket_start")
            == cur.agg(F.min("bucket_start")).first()[0],
            F.col("turn_count") + 1,
        ).otherwise(F.col("turn_count")),
    )
    d2 = pipeline.tier_diff(cur, perturbed)
    kinds2 = {r["status"] for r in d2.select("status").distinct().collect()}
    assert "removed" in kinds2 and "changed" in kinds2
    assert "added" not in kinds2


def test_cdc_refresh_matches_edited_recompute(spark, tx, tmp_path):
    """Committing ALL rows, then applying a CDC batch that deletes a
    deterministic ~10%% slice and inserts replacement turns, must
    equal the full recompute over (tx minus deletes plus inserts)
    bit-for-bit at every tier."""
    root = str(tmp_path / "cdc")
    pipeline.run_batch(spark, tx, root)

    is_del = F.abs(F.hash("conv_id", "turn_idx")) % 10 == 0
    deletes = tx.where(is_del).withColumn("op", F.lit(-1))
    inserts = (
        tx.where(F.abs(F.hash("conv_id", "turn_idx")) % 10 == 3)
        .withColumn("turn_idx", F.col("turn_idx") + 100000)
        .withColumn("op", F.lit(1))
    )
    assert deletes.count() > 0 and inserts.count() > 0

    # a mixed batch can net zero in an epoch (the documented refusal);
    # apply as the documented split: one delete marker, one insert
    # marker — all-same-sign batches always carry nonzero net deltas
    points = pipeline.refresh_cdc(spark, deletes, root, marker="cdc1-del")
    assert any(points[t] != 0 for t in pipeline.TIER_ORDER)
    points = pipeline.refresh_cdc(spark, inserts, root, marker="cdc1-ins")
    assert any(points[t] != 0 for t in pipeline.TIER_ORDER)

    edited = tx.where(~is_del).unionByName(inserts.drop("op"))
    direct = rollup.all_tiers(edited)
    for tier in pipeline.TIER_ORDER:
        got = _tier_rows(pipeline.read_tier(spark, root, tier))
        want = _tier_rows(direct[tier])
        assert got == want, tier

    # marker replay is a no-op
    again = pipeline.refresh_cdc(spark, deletes, root, marker="cdc1-del")
    assert all(again[t] == 0 for t in pipeline.TIER_ORDER)


def test_cdc_refusals_leave_store_untouched(spark, tx, tmp_path):
    """Zero-net epochs, bad op values, and deletes that don't match
    the store all refuse BEFORE the intent commit."""
    root = str(tmp_path / "cdcref")
    pipeline.run_batch(spark, tx, root)
    before = {
        t: _tier_rows(pipeline.read_tier(spark, root, t))
        for t in pipeline.TIER_ORDER
    }

    one = tx.limit(1)
    # (a) op outside {+1,-1}
    with pytest.raises(ValueError, match="op outside"):
        pipeline.refresh_cdc(
            spark, one.withColumn("op", F.lit(2)), root
        )
    # (b) delete+insert of the same row nets zero in its epoch
    zero_net = one.withColumn("op", F.lit(-1)).unionByName(
        one.withColumn("op", F.lit(1))
    )
    with pytest.raises(ValueError, match="ZERO net"):
        pipeline.refresh_cdc(spark, zero_net, root)
    # (c) deleting a turn the store does not hold drives a bucket
    # negative
    ghost = (
        one.withColumn("conv_id", F.lit("no-such-conversation"))
        .withColumn("op", F.lit(-1))
    )
    with pytest.raises(ValueError, match="negative or inconsistent"):
        pipeline.refresh_cdc(spark, ghost, root)

    for t in pipeline.TIER_ORDER:
        assert _tier_rows(pipeline.read_tier(spark, root, t)) == before[t]


def test_cdc_crash_before_commit_rolls_forward(
    spark, tx, tmp_path, monkeypatch
):
    """A crash after publishing tier partitions but before the lineage
    commit must roll FORWARD on the next call — the signed delta is
    never applied twice (negative fingerprints classify the same way
    positive ones do)."""
    root = str(tmp_path / "cdccrash")
    pipeline.run_batch(spark, tx, root)
    deletes = tx.where(
        F.abs(F.hash("conv_id", "turn_idx")) % 7 == 0
    ).withColumn("op", F.lit(-1))
    assert deletes.count() > 0

    real_commit = pipeline._commit_refresh_lineage

    def boom(*a, **k):
        raise RuntimeError("injected crash before lineage commit")

    monkeypatch.setattr(pipeline, "_commit_refresh_lineage", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        pipeline.refresh_cdc(spark, deletes, root, marker="cdcm")
    monkeypatch.setattr(pipeline, "_commit_refresh_lineage", real_commit)

    points = pipeline.refresh_cdc(spark, deletes, root, marker="cdcm")
    assert all(points[t] == 0 for t in pipeline.TIER_ORDER)

    direct = rollup.all_tiers(
        tx.where(F.abs(F.hash("conv_id", "turn_idx")) % 7 != 0)
    )
    for tier in pipeline.TIER_ORDER:
        got = _tier_rows(pipeline.read_tier(spark, root, tier))
        want = _tier_rows(direct[tier])
        assert got == want, tier


def test_cdc_batched_matches_sequential(spark, tx, tmp_path):
    """Two CDC delete batches applied via refresh_cdc_batched must
    equal the same batches applied sequentially with refresh_cdc,
    bit-for-bit at every tier; the batched call writes ONE lineage
    commit carrying BOTH markers, each of which then replays as a
    no-op, and the store audit stays clean (the zero-point sentinel
    rows add nothing to per-epoch point sums)."""
    b1 = tx.where(F.abs(F.hash("conv_id", "turn_idx")) % 7 == 0).withColumn(
        "op", F.lit(-1)
    )
    b2 = tx.where(F.abs(F.hash("conv_id", "turn_idx")) % 7 == 1).withColumn(
        "op", F.lit(-1)
    )
    assert b1.count() > 0 and b2.count() > 0

    seq_root = str(tmp_path / "cdcseq")
    pipeline.run_batch(spark, tx, seq_root)
    pipeline.refresh_cdc(spark, b1, seq_root, marker="m1")
    pipeline.refresh_cdc(spark, b2, seq_root, marker="m2")

    bat_root = str(tmp_path / "cdcbat")
    pipeline.run_batch(spark, tx, bat_root)
    points = pipeline.refresh_cdc_batched(
        spark, [("m1", b1), ("m2", b2)], bat_root
    )
    assert any(points[t] != 0 for t in pipeline.TIER_ORDER)

    for tier in pipeline.TIER_ORDER:
        got = _tier_rows(pipeline.read_tier(spark, bat_root, tier))
        want = _tier_rows(pipeline.read_tier(spark, seq_root, tier))
        assert got == want, tier

    # ONE commit: both markers share a single commit_seq
    lin = pipeline.lineage(spark, bat_root)
    seqs = (
        lin.where(F.col("refresh_marker").isin("m1", "m2"))
        .select("commit_seq")
        .distinct()
        .collect()
    )
    assert len(seqs) == 1
    assert pipeline.applied_refresh_markers(spark, bat_root) >= {"m1", "m2"}

    # each individual marker now replays as a no-op
    for mk, b in (("m1", b1), ("m2", b2)):
        again = pipeline.refresh_cdc(spark, b, bat_root, marker=mk)
        assert all(again[t] == 0 for t in pipeline.TIER_ORDER)
    again = pipeline.refresh_cdc_batched(
        spark, [("m1", b1), ("m2", b2)], bat_root
    )
    assert all(again[t] == 0 for t in pipeline.TIER_ORDER)

    audit = pipeline.verify_store(spark, bat_root).collect()
    assert {r["status"] for r in audit} == {"ok"}


def test_cdc_batched_skips_applied_and_rails(spark, tx, tmp_path):
    """A marker already in the ledger is skipped (only the remainder
    applies); duplicate markers and a combined zero-net epoch refuse
    up front with the live store untouched."""
    root = str(tmp_path / "cdcskip")
    pipeline.run_batch(spark, tx, root)
    b1 = tx.where(F.abs(F.hash("conv_id", "turn_idx")) % 7 == 0).withColumn(
        "op", F.lit(-1)
    )
    b2 = tx.where(F.abs(F.hash("conv_id", "turn_idx")) % 7 == 1).withColumn(
        "op", F.lit(-1)
    )
    pipeline.refresh_cdc(spark, b1, root, marker="m1")

    # batched with one already-applied: only m2's delta lands
    pipeline.refresh_cdc_batched(spark, [("m1", b1), ("m2", b2)], root)
    direct = rollup.all_tiers(
        tx.where(F.abs(F.hash("conv_id", "turn_idx")) % 7 >= 2)
    )
    for tier in pipeline.TIER_ORDER:
        got = _tier_rows(pipeline.read_tier(spark, root, tier))
        assert got == _tier_rows(direct[tier]), tier

    before = {
        t: _tier_rows(pipeline.read_tier(spark, root, t))
        for t in pipeline.TIER_ORDER
    }
    one = tx.limit(1)
    with pytest.raises(ValueError, match="duplicate markers"):
        pipeline.refresh_cdc_batched(
            spark,
            [("d", one.withColumn("op", F.lit(1))),
             ("d", one.withColumn("op", F.lit(1)))],
            root,
        )
    with pytest.raises(ValueError, match="COMBINED batch nets ZERO"):
        pipeline.refresh_cdc_batched(
            spark,
            [("za", one.withColumn("op", F.lit(-1))),
             ("zb", one.withColumn("op", F.lit(1)))],
            root,
        )
    with pytest.raises(ValueError, match="batch 'bad'"):
        pipeline.refresh_cdc_batched(
            spark, [("bad", one.withColumn("op", F.lit(2)))], root
        )
    for t in pipeline.TIER_ORDER:
        assert _tier_rows(pipeline.read_tier(spark, root, t)) == before[t]


def test_cdc_batched_crash_rolls_forward_all_markers(
    spark, tx, tmp_path, monkeypatch
):
    """A crash between publish and the (single) lineage commit must
    roll forward so that EVERY batched marker is recorded — a retry of
    any individual member afterwards is a no-op and the tiers equal
    the full recompute."""
    root = str(tmp_path / "cdcbatcrash")
    pipeline.run_batch(spark, tx, root)
    b1 = tx.where(F.abs(F.hash("conv_id", "turn_idx")) % 7 == 0).withColumn(
        "op", F.lit(-1)
    )
    b2 = tx.where(F.abs(F.hash("conv_id", "turn_idx")) % 7 == 1).withColumn(
        "op", F.lit(-1)
    )

    real_commit = pipeline._commit_refresh_lineage

    def boom(*a, **k):
        raise RuntimeError("injected crash before lineage commit")

    monkeypatch.setattr(pipeline, "_commit_refresh_lineage", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        pipeline.refresh_cdc_batched(spark, [("m1", b1), ("m2", b2)], root)
    monkeypatch.setattr(pipeline, "_commit_refresh_lineage", real_commit)

    # recovery happens on the next refresh entry; individual replays
    # must then no-op for BOTH markers
    again = pipeline.refresh_cdc(spark, b2, root, marker="m2")
    assert all(again[t] == 0 for t in pipeline.TIER_ORDER)
    again = pipeline.refresh_cdc(spark, b1, root, marker="m1")
    assert all(again[t] == 0 for t in pipeline.TIER_ORDER)

    direct = rollup.all_tiers(
        tx.where(F.abs(F.hash("conv_id", "turn_idx")) % 7 >= 2)
    )
    for tier in pipeline.TIER_ORDER:
        got = _tier_rows(pipeline.read_tier(spark, root, tier))
        assert got == _tier_rows(direct[tier]), tier
    audit = pipeline.verify_store(spark, root).collect()
    assert {r["status"] for r in audit} == {"ok"}


def _epoch_of():
    return (
        F.col("ts").cast("timestamp").cast("long") / pipeline.EPOCH_SECONDS
    ).cast("long")


def test_cdc_full_epoch_purge(spark, tx, tmp_path):
    """Deleting EVERY turn of one epoch (the GDPR full-day purge) must
    publish the epoch's REMOVAL: no partition dir at any tier, a
    zero-point tombstone generation in lineage (so verify_store reads
    the store as clean, not 'missing'), tiers equal to the recompute
    without that day, and marker replay a no-op."""
    root = str(tmp_path / "purge")
    pipeline.run_batch(spark, tx, root)
    epochs = sorted(pipeline.committed_epochs(spark, root))
    assert len(epochs) >= 2
    victim = epochs[0]

    deletes = tx.where(_epoch_of() == victim).withColumn("op", F.lit(-1))
    assert deletes.count() > 0
    points = pipeline.refresh_cdc(spark, deletes, root, marker="purge-1")
    assert isinstance(points, dict)

    direct = rollup.all_tiers(tx.where(_epoch_of() != victim))
    for tier in pipeline.TIER_ORDER:
        got = _tier_rows(pipeline.read_tier(spark, root, tier))
        assert got == _tier_rows(direct[tier]), tier
        assert not os.path.isdir(
            pipeline._tier_path(root, tier, victim)
        ), tier

    audit = pipeline.verify_store(spark, root).collect()
    assert {r["status"] for r in audit} == {"ok"}
    tomb = [
        r for r in audit
        if r["epoch"] == victim and r["expected_points"] == 0
    ]
    assert len(tomb) == len(pipeline.TIER_ORDER)

    again = pipeline.refresh_cdc(spark, deletes, root, marker="purge-1")
    assert all(v == 0 for v in again.values())


def test_cdc_full_epoch_purge_crash_rolls_forward(
    spark, tx, tmp_path, monkeypatch
):
    """Crash between the purge's publish (partition dirs removed) and
    its lineage commit: recovery must classify the GONE dir as
    post-purge (fingerprint 0 == no data), finish the commit with the
    tombstone generation, and never resurrect the day."""
    root = str(tmp_path / "purgecrash")
    pipeline.run_batch(spark, tx, root)
    victim = sorted(pipeline.committed_epochs(spark, root))[0]
    deletes = tx.where(_epoch_of() == victim).withColumn("op", F.lit(-1))

    real_commit = pipeline._commit_refresh_lineage

    def boom(*a, **k):
        raise RuntimeError("injected crash before lineage commit")

    monkeypatch.setattr(pipeline, "_commit_refresh_lineage", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        pipeline.refresh_cdc(spark, deletes, root, marker="purge-c")
    monkeypatch.setattr(pipeline, "_commit_refresh_lineage", real_commit)

    again = pipeline.refresh_cdc(spark, deletes, root, marker="purge-c")
    assert all(v == 0 for v in again.values())

    direct = rollup.all_tiers(tx.where(_epoch_of() != victim))
    for tier in pipeline.TIER_ORDER:
        assert _tier_rows(pipeline.read_tier(spark, root, tier)) == _tier_rows(
            direct[tier]
        ), tier
    audit = pipeline.verify_store(spark, root).collect()
    assert {r["status"] for r in audit} == {"ok"}


def test_purge_conversations_end_to_end(spark, tx, tmp_path):
    """Right-to-be-forgotten: after purge_conversations, the victim
    conversations exist in NEITHER the raw day partitions NOR any
    tier; tiers equal the recompute without them; the audit stays
    clean; a re-run removes nothing and replays the marker as a
    no-op."""
    root = str(tmp_path / "gdpr")
    pipeline.run_batch(spark, tx, root)
    pipeline.ingest_raw(tx, root)
    victims = [
        r["conv_id"]
        for r in tx.select("conv_id").distinct().limit(2).collect()
    ]

    out = pipeline.purge_conversations(spark, root, victims)
    assert out["raw_rows_removed"] > 0 and out["raw_days"] > 0
    assert any(v != 0 for v in out["tier_points"].values())

    raw_after = pipeline.read_raw(spark, root)
    assert raw_after.where(F.col("conv_id").isin(victims)).count() == 0
    direct = rollup.all_tiers(tx.where(~F.col("conv_id").isin(victims)))
    for tier in pipeline.TIER_ORDER:
        got = pipeline.read_tier(spark, root, tier)
        assert got.where(F.col("conv_id").isin(victims)).count() == 0
        assert _tier_rows(got) == _tier_rows(direct[tier]), tier
    audit = pipeline.verify_store(spark, root).collect()
    assert {r["status"] for r in audit} == {"ok"}

    again = pipeline.purge_conversations(spark, root, victims)
    assert again["raw_rows_removed"] == 0 and again["raw_days"] == 0
    assert all(v == 0 for v in again["tier_points"].values())
    # total row conservation: raw lost exactly the victim turns
    assert raw_after.count() == tx.count() - out["raw_rows_removed"]


def test_purge_conversations_crash_mid_raw_rewrite(
    spark, tx, tmp_path, monkeypatch
):
    """Crash while swapping raw day partitions (after the tier CDC
    committed): the re-run must converge — remaining dirty days get
    cleaned, the committed marker short-circuits the tier side, and
    the final state equals a clean one-shot purge."""
    root = str(tmp_path / "gdprcrash")
    pipeline.run_batch(spark, tx, root)
    pipeline.ingest_raw(tx, root)
    victims = [
        r["conv_id"]
        for r in tx.select("conv_id").distinct().limit(2).collect()
    ]

    real_swap = pipeline._swap_in
    calls = {"n": 0}

    def flaky_swap(staged, live, trash, **kw):
        # only count RAW day-partition swaps; tier publishes (the CDC
        # inside the purge) pass through untouched
        if "epoch_day=" in staged:
            calls["n"] += 1
            if calls["n"] == 2:
                raise RuntimeError("injected crash mid raw rewrite")
        return real_swap(staged, live, trash, **kw)

    monkeypatch.setattr(pipeline, "_swap_in", flaky_swap)
    try:
        pipeline.purge_conversations(spark, root, victims)
        crashed = False
    except RuntimeError:
        crashed = True
    monkeypatch.setattr(pipeline, "_swap_in", real_swap)
    assert crashed  # the victim set must span >= 2 raw days

    out2 = pipeline.purge_conversations(spark, root, victims)
    assert all(v == 0 for v in out2["tier_points"].values())  # marker held

    raw_after = pipeline.read_raw(spark, root)
    assert raw_after.where(F.col("conv_id").isin(victims)).count() == 0
    direct = rollup.all_tiers(tx.where(~F.col("conv_id").isin(victims)))
    for tier in pipeline.TIER_ORDER:
        assert _tier_rows(pipeline.read_tier(spark, root, tier)) == _tier_rows(
            direct[tier]
        ), tier
    audit = pipeline.verify_store(spark, root).collect()
    assert {r["status"] for r in audit} == {"ok"}


def test_read_tier_changes_incremental_cursor(spark, tx, tmp_path):
    """Incremental consumer protocol: after the initial batch every
    epoch is 'changed'; after saving the cursor, a late-data refresh
    touching ONE epoch surfaces exactly that epoch (with its merged
    rows); a full-epoch purge surfaces the epoch as a tombstone (in
    the changed list, no rows); an idle store surfaces nothing."""
    root = str(tmp_path / "incr")
    pipeline.run_batch(spark, tx, root)
    epochs = sorted(pipeline.committed_epochs(spark, root))
    assert len(epochs) >= 2

    df0, ch0 = pipeline.read_tier_changes(spark, root, "1h", -1)
    assert ch0 == epochs and df0 is not None
    cur = pipeline.latest_commit_seq(spark, root)

    # idle: nothing changed past the cursor
    dfi, chi = pipeline.read_tier_changes(spark, root, "1h", cur)
    assert dfi is None and chi == []

    # late refresh into the FIRST epoch only
    late = tx.where(
        (F.col("ts").cast("timestamp").cast("long") / pipeline.EPOCH_SECONDS)
        .cast("long") == epochs[0]
    ).withColumn("turn_idx", F.col("turn_idx") + 500000)
    assert late.count() > 0
    pipeline.refresh_late(spark, late, root, marker="late-incr")
    df1, ch1 = pipeline.read_tier_changes(spark, root, "1h", cur)
    assert ch1 == [epochs[0]]
    # the changed rows ARE the merged current partition
    want = spark.read.parquet(pipeline._tier_path(root, "1h", epochs[0]))
    assert _tier_rows(df1.select(*want.columns)) == _tier_rows(want)
    cur = pipeline.latest_commit_seq(spark, root)

    # purge the SECOND epoch entirely -> tombstone: listed, no rows
    deletes = tx.where(
        (F.col("ts").cast("timestamp").cast("long") / pipeline.EPOCH_SECONDS)
        .cast("long") == epochs[1]
    ).withColumn("op", F.lit(-1))
    pipeline.refresh_cdc(spark, deletes, root, marker="purge-incr")
    df2, ch2 = pipeline.read_tier_changes(spark, root, "1h", cur)
    assert ch2 == [epochs[1]]
    assert df2 is None


def test_purge_requests_backlog_single_commit(spark, tx, tmp_path):
    """A two-ticket deletion backlog erased in one pass: tiers equal
    the recompute without EITHER subject, both request markers ride
    ONE lineage commit, raw holds no victim rows, the audit stays
    clean, and a replayed backlog no-ops per request id."""
    root = str(tmp_path / "dsar")
    pipeline.run_batch(spark, tx, root)
    pipeline.ingest_raw(tx, root)
    convs = [
        r["conv_id"]
        for r in tx.select("conv_id").distinct().limit(4).collect()
    ]
    requests = [("t1", convs[:2]), ("t2", convs[2:])]

    out = pipeline.purge_requests(spark, root, requests)
    assert out["requests"] == 2 and out["raw_rows_removed"] > 0
    assert any(v != 0 for v in out["tier_points"].values())

    raw_after = pipeline.read_raw(spark, root)
    assert raw_after.where(F.col("conv_id").isin(convs)).count() == 0
    direct = rollup.all_tiers(tx.where(~F.col("conv_id").isin(convs)))
    for tier in pipeline.TIER_ORDER:
        assert _tier_rows(pipeline.read_tier(spark, root, tier)) == _tier_rows(
            direct[tier]
        ), tier

    lin = pipeline.lineage(spark, root)
    seqs = (
        lin.where(
            F.col("refresh_marker").isin("purge-req-t1", "purge-req-t2")
        )
        .select("commit_seq")
        .distinct()
        .collect()
    )
    assert len(seqs) == 1
    audit = pipeline.verify_store(spark, root).collect()
    assert {r["status"] for r in audit} == {"ok"}

    again = pipeline.purge_requests(spark, root, requests)
    assert again["raw_rows_removed"] == 0
    assert all(v == 0 for v in again["tier_points"].values())


def test_cdc_purge_every_epoch_commits_pure_tombstones(spark, tx, tmp_path):
    """Deleting EVERY turn of EVERY epoch (the whole-store purge) must
    not wedge: all tier partitions are removed, the lineage commit is
    pure tombstones (the back-read guard must not try to infer a
    schema from an epoch-less tier dir), the audit is clean, and the
    marker replays as a no-op."""
    root = str(tmp_path / "purgeall")
    pipeline.run_batch(spark, tx, root)
    deletes = tx.withColumn("op", F.lit(-1))
    points = pipeline.refresh_cdc(spark, deletes, root, marker="wipe-1")
    assert all(v == 0 for v in points.values())  # nothing left on disk

    for tier in pipeline.TIER_ORDER:
        base = os.path.join(root, "tiers", tier)
        assert not any(
            d.startswith("epoch=") for d in os.listdir(base)
        ), tier
    audit = pipeline.verify_store(spark, root).collect()
    assert {r["status"] for r in audit} == {"ok"}
    assert all(r["expected_points"] == 0 for r in audit)

    again = pipeline.refresh_cdc(spark, deletes, root, marker="wipe-1")
    assert all(v == 0 for v in again.values())


def test_purge_requests_overlapping_tickets(spark, tx, tmp_path):
    """Duplicate DSAR submissions: two tickets naming the SAME
    conversation must not double-retract its turns — the backlog
    applies cleanly, the conversation is erased once, and both
    tickets' markers are recorded."""
    root = str(tmp_path / "dsardup")
    pipeline.run_batch(spark, tx, root)
    pipeline.ingest_raw(tx, root)
    convs = [
        r["conv_id"]
        for r in tx.select("conv_id").distinct().limit(3).collect()
    ]
    requests = [("dup-a", convs[:2]), ("dup-b", [convs[1], convs[2]])]

    out = pipeline.purge_requests(spark, root, requests)
    assert out["raw_rows_removed"] > 0

    raw_after = pipeline.read_raw(spark, root)
    assert raw_after.where(F.col("conv_id").isin(convs)).count() == 0
    direct = rollup.all_tiers(tx.where(~F.col("conv_id").isin(convs)))
    for tier in pipeline.TIER_ORDER:
        assert _tier_rows(pipeline.read_tier(spark, root, tier)) == _tier_rows(
            direct[tier]
        ), tier
    applied = pipeline.applied_refresh_markers(spark, root)
    assert {"purge-req-dup-a", "purge-req-dup-b"} <= applied
    audit = pipeline.verify_store(spark, root).collect()
    assert {r["status"] for r in audit} == {"ok"}


def test_latest_commit_seq_floor_and_missing_staged_refusal(
    spark, tx, tmp_path
):
    """Two rails from the review pass: latest_commit_seq never returns
    below 0 (a legacy/empty ledger yields the documented 0), and
    _swap_in refuses a missing staged dir unless the caller declared
    an empty publish."""
    root = str(tmp_path / "rails")
    assert pipeline.latest_commit_seq(spark, root) == 0

    with pytest.raises(RuntimeError, match="did not declare an empty"):
        pipeline._swap_in(
            str(tmp_path / "nope"), str(tmp_path / "live"), str(tmp_path / "t")
        )


def test_purge_after_retention_expired_fine_tier(spark, tx, tmp_path):
    """GDPR erasure on a retention-enabled store: a conversation whose
    oldest epoch the 1m tier already EXPIRED must still purge cleanly.
    The expired 1m partition is treated as already-zero (the CDC delta
    is restricted per tier to non-retired epochs) while the 1h/1d
    tiers that still hold the data get real deletes — before the fix,
    the negative-bucket rail refused the whole erasure."""
    from pyconform_spark import retention

    root = str(tmp_path / "gdpr-ret")
    pipeline.run_batch(spark, tx, root)
    pipeline.ingest_raw(tx, root)
    epochs = sorted(pipeline.committed_epochs(spark, root))
    assert len(epochs) >= 3
    oldest, now = epochs[0], epochs[-1]
    policy = retention.RetentionPolicy(
        {"1m": now - oldest - 1, "1h": None, "1d": None}
    )
    expired = retention.apply_retention(spark, root, policy)
    assert expired["1m"] == [oldest] and expired["1h"] == []

    victims = [
        r["conv_id"]
        for r in tx.where(_epoch_of() == oldest)
        .select("conv_id")
        .distinct()
        .limit(2)
        .collect()
    ]
    out = pipeline.purge_conversations(spark, root, victims)
    assert out["raw_rows_removed"] > 0

    raw_after = pipeline.read_raw(spark, root)
    assert raw_after.where(F.col("conv_id").isin(victims)).count() == 0
    direct = rollup.all_tiers(tx.where(~F.col("conv_id").isin(victims)))
    for tier in ("1h", "1d"):
        assert _tier_rows(pipeline.read_tier(spark, root, tier)) == _tier_rows(
            direct[tier]
        ), tier
    # 1m equals the recompute restricted to its LIVE (non-expired) epochs
    b_epoch = (
        F.col("bucket_start").cast("timestamp").cast("long")
        / pipeline.EPOCH_SECONDS
    ).cast("long")
    assert _tier_rows(pipeline.read_tier(spark, root, "1m")) == _tier_rows(
        direct["1m"].where(b_epoch != oldest)
    )
    # replay is a no-op
    again = pipeline.purge_conversations(spark, root, victims)
    assert again["raw_rows_removed"] == 0
    assert all(v == 0 for v in again["tier_points"].values())


def test_full_purge_on_legacy_ledger_without_commit_seq(spark, tx, tmp_path):
    """A pure-tombstone commit (full-store purge) on a ledger written
    BEFORE the commit_seq column existed must still commit: the
    tombstone rows are built against the explicit 8-column lineage
    schema, not the on-disk 7-column one (which would fail AFTER the
    partitions were published — the post-publish wedge)."""
    root = str(tmp_path / "legacy")
    pipeline.run_batch(spark, tx, root)
    lp = pipeline._lineage_path(root)
    legacy = spark.read.parquet(lp).drop("commit_seq")
    tmp = lp + "-legacy"
    legacy.coalesce(1).write.parquet(tmp)
    shutil.rmtree(lp)
    os.rename(tmp, lp)
    assert "commit_seq" not in spark.read.parquet(lp).columns

    deletes = tx.withColumn("op", F.lit(-1))
    pipeline.refresh_cdc(spark, deletes, root, marker="wipe-all")
    for tier in pipeline.TIER_ORDER:
        with pytest.raises(FileNotFoundError):
            pipeline.read_tier(spark, root, tier)
    assert "wipe-all" in pipeline.applied_refresh_markers(spark, root)
    # replay is marker-skipped
    again = pipeline.refresh_cdc(spark, deletes, root, marker="wipe-all")
    assert all(v == 0 for v in again.values())


def test_point_read_opens_only_matching_epochs(spark, tx, tmp_path):
    """Ledger-stats file skipping: a key-predicate read consults the
    per-epoch (conv_id, bucket_start) ranges the commit recorded and
    prunes epoch dirs BEFORE Spark lists them — the Iceberg
    manifest-pruning analog.  Conv ids here are prefixed per day so
    the per-epoch conv ranges are disjoint and pruning is provable;
    results must equal the unpruned read plus the same WHERE."""
    import datetime as dt

    root = str(tmp_path / "prune")
    day = (
        F.col("ts").cast("timestamp").cast("long") / pipeline.EPOCH_SECONDS
    ).cast("long")
    tx2 = tx.withColumn(
        "conv_id",
        F.concat(F.lit("d"), day.cast("string"), F.lit("_"), "conv_id"),
    )
    pipeline.run_batch(spark, tx2, root)
    epochs = sorted(pipeline.committed_epochs(spark, root))
    assert len(epochs) >= 3
    stats = pipeline._tier_epoch_stats(spark, root, "1h")
    assert set(stats) == set(epochs)

    target = epochs[1]
    conv = (
        tx2.where(day == target).select("conv_id").first()["conv_id"]
    )
    # conv predicate prunes to exactly the one epoch that can hold it
    assert pipeline._prune_epochs_by_stats(
        epochs, stats, conv, None
    ) == [target]
    got = pipeline.read_tier(spark, root, "1h", conv_id=conv)
    want = pipeline.read_tier(spark, root, "1h").where(
        F.col("conv_id") == conv
    )
    assert got.count() > 0
    assert _tier_rows(got) == _tier_rows(want)

    # a one-day bucket range prunes to that day's epoch
    lo = dt.datetime(1970, 1, 1) + dt.timedelta(
        seconds=target * pipeline.EPOCH_SECONDS
    )
    hi = lo + dt.timedelta(seconds=pipeline.EPOCH_SECONDS - 1)
    assert pipeline._prune_epochs_by_stats(
        epochs, stats, None, (lo, hi)
    ) == [target]
    got_r = pipeline.read_tier(spark, root, "1m", bucket_range=(lo, hi))
    want_r = pipeline.read_tier(spark, root, "1m").where(
        (F.col("bucket_start") >= F.lit(lo))
        & (F.col("bucket_start") <= F.lit(hi))
    )
    assert _tier_rows(got_r) == _tier_rows(want_r)

    # a key beyond every epoch's range: all pruned, empty frame, no error
    assert (
        pipeline.read_tier(spark, root, "1h", conv_id="zzz_nowhere").count()
        == 0
    )

    # incremental read honors the same predicates
    chg, eps_chg = pipeline.read_tier_changes(
        spark, root, "1h", since_seq=-1, conv_id=conv
    )
    assert eps_chg == epochs  # change list is NOT narrowed
    assert _tier_rows(chg) == _tier_rows(want)


def test_point_read_on_legacy_ledger_without_stats(spark, tx, tmp_path):
    """A ledger written before the conv_id_min/max stats columns
    existed yields no pruning stats — key-predicate reads fall back to
    scanning every committed epoch with a plain WHERE (correctness
    never depends on the stats)."""
    root = str(tmp_path / "legacy-stats")
    pipeline.run_batch(spark, tx, root)
    lp = pipeline._lineage_path(root)
    legacy = spark.read.parquet(lp).drop("conv_id_min", "conv_id_max")
    tmp = lp + "-legacy"
    legacy.coalesce(1).write.parquet(tmp)
    shutil.rmtree(lp)
    os.rename(tmp, lp)

    assert pipeline._tier_epoch_stats(spark, root, "1h") == {}
    conv = tx.select("conv_id").first()["conv_id"]
    got = pipeline.read_tier(spark, root, "1h", conv_id=conv)
    want = pipeline.read_tier(spark, root, "1h").where(
        F.col("conv_id") == conv
    )
    assert got.count() > 0
    assert _tier_rows(got) == _tier_rows(want)


def test_autoparse_filename_date_range(spark, tmp_path):
    """{fmt1-fmt2} segments resolve from the frame's min/max time
    values, spaces pad to '0' like the reference, multiple segments
    resolve left to right, unbalanced braces raise."""
    import datetime as dt

    df = spark.createDataFrame(
        [
            (dt.datetime(2024, 1, 5, 3, 0, 0),),
            (dt.datetime(2024, 3, 9, 12, 30, 0),),
        ],
        "ts timestamp",
    )
    assert (
        pipeline.autoparse_filename("tier_{%Y%m%d-%Y%m%d}.parquet", df)
        == "tier_20240105-20240309.parquet"
    )
    # %e renders space-padded day-of-month; the reference replaces
    # spaces with zeros
    assert (
        pipeline.autoparse_filename("d{%e-%e}.parquet", df)
        == "d05-09.parquet"
    )
    assert (
        pipeline.autoparse_filename(
            "a_{%Y-%Y}_b_{%m%d-%m%d}.parquet", df
        )
        == "a_2024-2024_b_0105-0309.parquet"
    )
    assert pipeline.autoparse_filename("plain.parquet", df) == "plain.parquet"
    with pytest.raises(ValueError, match="unbalanced"):
        pipeline.autoparse_filename("x_{%Y-%Y.parquet", df)

    name = pipeline.export_named(
        df, str(tmp_path), "export_{%Y%m%d-%Y%m%d}"
    )
    assert name == "export_20240105-20240309"
    back = spark.read.parquet(str(tmp_path / name))
    assert back.count() == 2


def test_prune_epochs_never_drops_a_matching_epoch():
    """Property (hypothesis): for random per-epoch key ranges and
    random point/range predicates, _prune_epochs_by_stats never drops
    an epoch whose range could hold a matching key — pruning is an
    OPTIMIZATION, the result set after the WHERE must be identical.
    Epochs with unknown (None) bounds are always kept."""
    import datetime as dt

    from hypothesis import given, settings, strategies as st

    t0 = dt.datetime(2024, 1, 1)

    def ts(h):
        return t0 + dt.timedelta(hours=int(h))

    epoch_stats = st.dictionaries(
        st.integers(0, 20),
        st.one_of(
            st.just((None, None, None, None)),
            st.tuples(
                st.integers(0, 500),
                st.integers(0, 500),
                st.integers(0, 100),
                st.integers(0, 100),
            ).map(
                lambda t: (
                    ts(min(t[0], t[1])),
                    ts(max(t[0], t[1])),
                    f"c{min(t[2], t[3]):03d}",
                    f"c{max(t[2], t[3]):03d}",
                )
            ),
        ),
        max_size=12,
    )

    @settings(max_examples=300, deadline=None)
    @given(
        stats=epoch_stats,
        conv=st.one_of(st.none(), st.integers(0, 100).map(lambda i: f"c{i:03d}")),
        lo=st.one_of(st.none(), st.integers(0, 500).map(ts)),
        hi=st.one_of(st.none(), st.integers(0, 500).map(ts)),
        use_range=st.booleans(),
    )
    def check(stats, conv, lo, hi, use_range):
        epochs = sorted(stats)
        rng = (lo, hi) if use_range else None
        kept = set(
            pipeline._prune_epochs_by_stats(epochs, stats, conv, rng)
        )
        for e in epochs:
            bs_min, bs_max, cv_min, cv_max = stats[e]
            # an epoch MAY hold a matching row iff every known bound
            # admits the predicate
            may_match = True
            if conv is not None and cv_min is not None:
                may_match &= cv_min <= conv <= cv_max
            if rng is not None and bs_min is not None:
                if lo is not None and bs_max < lo:
                    may_match = False
                if hi is not None and bs_min > hi:
                    may_match = False
            if may_match:
                assert e in kept, (e, stats[e], conv, rng)

    check()
