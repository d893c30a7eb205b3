"""Two-parallelism scaling evidence for the TILED matrix profile
(BASELINE.md north rule, applied to the round-4 long-series operator).

The single-group matrix profile runs a whole series' O(n^2) recurrence
in ONE task — adding cores cannot help it.  The SCAMP tiling exists
exactly to break that: (n/chunk)^2/2 independent tiles.  This script
is the evidence that the tiling actually converts cores into
throughput: the IDENTICAL tiled job — one deterministic 131072-point
int series, m=24, chunk=4096 (528 tiles) — runs CPU-pinned at
``local[N]`` and ``local[4N]`` (N=4), and reports million
window-pairs/sec at both plus efficiency = thr(4N) / (4 * thr(N)).

Each level runs in its own subprocess/JVM (no warm caches crossing
levels); a small warm-up run triggers codegen before the timed
visits; best-of-2 per level.  Both levels must agree on
sum(mp_dist) — the cheap bit-exactness guard.

Usage:  python scripts/mp_scaling.py [n_points]   (default 131072)
Writes BENCH_MP_SCALING.json at the repo root and prints it.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from pyconform_spark.session import get_spark
from pyconform_spark.operators import matrixprofile as mp

cores = int(sys.argv[1]); path = sys.argv[2]
m = 24; chunk = 4096
spark = get_spark(master=f"local[{{cores}}]", shuffle_partitions=2*cores,
                  app_name=f"mp-scaling-{{cores}}",
                  extra_conf={{"spark.ui.enabled": "false",
                              "spark.ui.showConsoleProgress": "false",
                              "spark.driver.memory": "16g"}})
spark.sparkContext.setLogLevel("ERROR")
pts = spark.read.parquet(path).persist()
n = pts.count()

def run():
    t0 = time.monotonic()
    s = mp.matrix_profile_tiled(pts, m, chunk=chunk).agg(
        F.sum("mp_dist")).first()[0]
    return time.monotonic() - t0, int(s)

# warm-up on a slice: codegen + Arrow paths, a fraction of the work
mp.matrix_profile_tiled(pts.where(F.col("pos") < 16384), m, chunk=chunk
    ).agg(F.sum("mp_dist")).first()
times, sums = [], set()
for _ in range(2):
    dt, s = run()
    times.append(round(dt, 3)); sums.add(s)
assert len(sums) == 1, sums
nw = n - m + 1
best = min(times)
print(json.dumps({{"cores": cores, "n_points": n, "times": times,
                  "best_sec": best, "sum_mp_dist": sums.pop(),
                  "mpairs_per_sec": round(nw * (nw - 1) / 2 / best / 1e6, 1)}}))
spark.stop()
"""


def run_level(cores: int, path: str) -> dict:
    script = WORKER.format(repo=REPO)
    cmd = [sys.executable, "-c", script, str(cores), path]
    if os.system("command -v taskset > /dev/null 2>&1") == 0:
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    out = subprocess.run(cmd, capture_output=True, text=True,
                         timeout=1800, cwd=REPO)
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-2000:])
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(7)
    pdf = pd.DataFrame(
        {
            "series": ["long"] * n,
            "pos": np.arange(n, dtype=np.int32),
            "h_s": np.arange(n, dtype=np.int64) * 3600,
            "v": rng.randint(-1000, 1000, n).astype(np.int64),
        }
    )
    work = tempfile.mkdtemp(prefix="mp_scaling_")
    path = os.path.join(work, "series")
    # one deterministic parquet input shared by both levels
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    pq.write_table(pa.Table.from_pandas(pdf), os.path.join(path, "p.parquet"))

    lo = run_level(4, path)
    hi = run_level(16, path)
    assert lo["sum_mp_dist"] == hi["sum_mp_dist"]
    eff = hi["mpairs_per_sec"] / (4 * lo["mpairs_per_sec"])
    out = {
        "operator": "matrix_profile_tiled(m=24, chunk=4096)",
        "n_points": n,
        "levelN": lo,
        "level4N": hi,
        "scaling_efficiency_N_to_4N": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    with open(os.path.join(REPO, "BENCH_MP_SCALING.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
