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
