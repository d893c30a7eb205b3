"""North-rule packaging gate: the engine must ship as a spark-submit
--py-files package.  This test builds dist/pyconform_spark.zip and runs
the real ``spark-submit`` binary from a directory OUTSIDE the repo with
an emptied PYTHONPATH, so the only way the job can import
pyconform_spark is through the --py-files zip — exactly the cluster
deployment path.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not on this host"
)
def test_spark_submit_pyfiles_rollup(tmp_path):
    subprocess.run(
        ["bash", str(REPO / "scripts" / "make_pyfiles.sh")],
        check=True,
        capture_output=True,
    )
    out = tmp_path / "ckpt"
    env = {**os.environ, "PYTHONPATH": ""}
    r = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master",
            "local[2]",
            "--conf",
            "spark.ui.enabled=false",
            "--conf",
            "spark.sql.shuffle.partitions=4",
            "--py-files",
            str(REPO / "dist" / "pyconform_spark.zip"),
            str(REPO / "jobs" / "rollup_job.py"),
            "--synth",
            "5000",
            "--output",
            str(out),
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["computed"] > 0 and summary["skipped"] == 0
    assert all(v > 0 for v in summary["points"].values()), summary

    # resume contract across processes: a second submit over the same
    # checkpoint root must skip every committed epoch and recompute none
    r2 = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master",
            "local[2]",
            "--conf",
            "spark.ui.enabled=false",
            "--conf",
            "spark.sql.shuffle.partitions=4",
            "--py-files",
            str(REPO / "dist" / "pyconform_spark.zip"),
            str(REPO / "jobs" / "rollup_job.py"),
            "--synth",
            "5000",
            "--output",
            str(out),
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert r2.returncode == 0, r2.stderr[-3000:]
    summary2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert summary2["computed"] == 0
    assert summary2["skipped"] == summary["computed"]


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not on this host"
)
def test_spark_submit_cdc_job(tmp_path, spark):
    """cdc_job.py end-to-end through --py-files: build a store with
    rollup_job, delete a deterministic slice via the CDC job, verify
    the tiers equal the rollup of the edited synth set, and re-submit
    the same marker as a no-op."""
    from pyspark.sql import functions as F

    from pyconform_spark import pipeline, synth
    from pyconform_spark.operators import rollup

    subprocess.run(
        ["bash", str(REPO / "scripts" / "make_pyfiles.sh")],
        check=True,
        capture_output=True,
    )
    root = tmp_path / "ckpt"
    env = {**os.environ, "PYTHONPATH": ""}
    base_cmd = [
        SPARK_SUBMIT,
        "--master", "local[2]",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.sql.shuffle.partitions=4",
        "--py-files", str(REPO / "dist" / "pyconform_spark.zip"),
    ]
    r = subprocess.run(
        base_cmd + [
            str(REPO / "jobs" / "rollup_job.py"),
            "--synth", "5000", "--output", str(root),
        ],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=420,
    )
    assert r.returncode == 0, r.stderr[-3000:]

    # synth is hash-deterministic: regenerate the job's exact rows
    tx = synth.transcripts(spark, 5000)
    is_del = F.abs(F.hash("conv_id", "turn_idx")) % 4 == 0
    changes = tx.where(is_del).withColumn("op", F.lit(-1))
    ch_path = tmp_path / "changes.parquet"
    changes.coalesce(1).write.parquet(str(ch_path))

    r2 = subprocess.run(
        base_cmd + [
            str(REPO / "jobs" / "cdc_job.py"),
            "--changes", str(ch_path), "--root", str(root),
            "--marker", "redact-1",
        ],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=420,
    )
    assert r2.returncode == 0, r2.stderr[-3000:]
    summary = json.loads(r2.stdout.strip().splitlines()[-1])
    assert any(v != 0 for v in summary["points_deleted_side"].values())

    direct = rollup.all_tiers(tx.where(~is_del))
    for tier in pipeline.TIER_ORDER:
        got = sorted(
            map(tuple, pipeline.read_tier(spark, str(root), tier).collect()),
            key=lambda t: tuple((x is None, x) for x in t),
        )
        want = sorted(
            map(tuple, direct[tier].collect()),
            key=lambda t: tuple((x is None, x) for x in t),
        )
        assert got == want, tier

    r3 = subprocess.run(
        base_cmd + [
            str(REPO / "jobs" / "cdc_job.py"),
            "--changes", str(ch_path), "--root", str(root),
            "--marker", "redact-1",
        ],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=420,
    )
    assert r3.returncode == 0, r3.stderr[-3000:]
    summary3 = json.loads(r3.stdout.strip().splitlines()[-1])
    assert all(v == 0 for v in summary3["points_deleted_side"].values())
    assert all(v == 0 for v in summary3["points_inserted_side"].values())


def test_spark_submit_cdc_job_batched(tmp_path, spark):
    """cdc_job.py --batched through --py-files: two delete-only change
    files squash into ONE staged publish (single commit_seq carrying
    both per-file markers), the tiers equal the rollup of the edited
    synth set, and a re-submit is a no-op for every marker."""
    from pyspark.sql import functions as F

    from pyconform_spark import pipeline, synth
    from pyconform_spark.operators import rollup

    subprocess.run(
        ["bash", str(REPO / "scripts" / "make_pyfiles.sh")],
        check=True,
        capture_output=True,
    )
    root = tmp_path / "ckpt"
    env = {**os.environ, "PYTHONPATH": ""}
    base_cmd = [
        SPARK_SUBMIT,
        "--master", "local[2]",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.sql.shuffle.partitions=4",
        "--py-files", str(REPO / "dist" / "pyconform_spark.zip"),
    ]
    r = subprocess.run(
        base_cmd + [
            str(REPO / "jobs" / "rollup_job.py"),
            "--synth", "5000", "--output", str(root),
        ],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=420,
    )
    assert r.returncode == 0, r.stderr[-3000:]

    tx = synth.transcripts(spark, 5000)
    sel = F.abs(F.hash("conv_id", "turn_idx")) % 8
    paths = []
    for i in range(2):
        ch = tx.where(sel == i).withColumn("op", F.lit(-1))
        p = tmp_path / f"changes{i}.parquet"
        ch.coalesce(1).write.parquet(str(p))
        paths.append(str(p))

    r2 = subprocess.run(
        base_cmd + [
            str(REPO / "jobs" / "cdc_job.py"),
            "--batched", "--changes", *paths,
            "--root", str(root), "--marker", "replay-1",
        ],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=420,
    )
    assert r2.returncode == 0, r2.stderr[-3000:]
    summary = json.loads(r2.stdout.strip().splitlines()[-1])
    assert summary["batched"] and summary["n_files"] == 2
    assert any(v != 0 for v in summary["points_deleted_side"].values())
    assert all(v == 0 for v in summary["points_inserted_side"].values())

    direct = rollup.all_tiers(tx.where(sel >= 2))
    for tier in pipeline.TIER_ORDER:
        got = sorted(
            map(tuple, pipeline.read_tier(spark, str(root), tier).collect()),
            key=lambda t: tuple((x is None, x) for x in t),
        )
        want = sorted(
            map(tuple, direct[tier].collect()),
            key=lambda t: tuple((x is None, x) for x in t),
        )
        assert got == want, tier

    # both per-file markers rode ONE lineage commit
    lin = pipeline.lineage(spark, str(root))
    seqs = (
        lin.where(
            F.col("refresh_marker").isin("replay-1-b0-d", "replay-1-b1-d")
        )
        .select("commit_seq")
        .distinct()
        .collect()
    )
    assert len(seqs) == 1

    r3 = subprocess.run(
        base_cmd + [
            str(REPO / "jobs" / "cdc_job.py"),
            "--batched", "--changes", *paths,
            "--root", str(root), "--marker", "replay-1",
        ],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=420,
    )
    assert r3.returncode == 0, r3.stderr[-3000:]
    summary3 = json.loads(r3.stdout.strip().splitlines()[-1])
    assert all(v == 0 for v in summary3["points_deleted_side"].values())


def test_spark_submit_cdc_batched_falls_back_on_dependency(tmp_path, spark):
    """--batched with a cross-file dependency (file 2 deletes turns
    file 1 inserts): the combined delete side is refused before any
    write and the job falls back to sequential per-file application —
    reported via sequential_fallback — landing the same final store a
    per-file run would."""
    from pyspark.sql import functions as F

    from pyconform_spark import pipeline, synth
    from pyconform_spark.operators import rollup

    subprocess.run(
        ["bash", str(REPO / "scripts" / "make_pyfiles.sh")],
        check=True, capture_output=True,
    )
    root = tmp_path / "ckpt"
    env = {**os.environ, "PYTHONPATH": ""}
    base_cmd = [
        SPARK_SUBMIT,
        "--master", "local[2]",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.sql.shuffle.partitions=4",
        "--py-files", str(REPO / "dist" / "pyconform_spark.zip"),
    ]
    r = subprocess.run(
        base_cmd + [
            str(REPO / "jobs" / "rollup_job.py"),
            "--synth", "4000", "--output", str(root),
        ],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=420,
    )
    assert r.returncode == 0, r.stderr[-3000:]

    tx = synth.transcripts(spark, 4000)
    # a BRAND-NEW conversation: its buckets do not exist in the store,
    # so the combined delete side (which retracts it before the insert
    # side runs) drives them negative and the rail refuses
    inserted = (
        tx.limit(50)
        .withColumn("conv_id", F.concat(F.lit("dep-conv-"), F.col("conv_id")))
        .withColumn("turn_idx", F.col("turn_idx") + 900000)
    )
    # file 1 inserts new turns; file 2 deletes those same turns
    f1 = inserted.withColumn("op", F.lit(1))
    f2 = inserted.withColumn("op", F.lit(-1))
    p1, p2 = tmp_path / "c1.parquet", tmp_path / "c2.parquet"
    f1.coalesce(1).write.parquet(str(p1))
    f2.coalesce(1).write.parquet(str(p2))

    r2 = subprocess.run(
        base_cmd + [
            str(REPO / "jobs" / "cdc_job.py"),
            "--batched", "--changes", str(p1), str(p2),
            "--root", str(root), "--marker", "dep-1",
        ],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=420,
    )
    assert r2.returncode == 0, r2.stderr[-3000:]
    summary = json.loads(r2.stdout.strip().splitlines()[-1])
    assert summary["sequential_fallback"] is True

    # net effect: inserted then deleted -> the original store
    direct = rollup.all_tiers(tx)
    for tier in pipeline.TIER_ORDER:
        got = sorted(
            map(tuple, pipeline.read_tier(spark, str(root), tier).collect()),
            key=lambda t: tuple((x is None, x) for x in t),
        )
        want = sorted(
            map(tuple, direct[tier].collect()),
            key=lambda t: tuple((x is None, x) for x in t),
        )
        assert got == want, tier
