"""100M-turn sustained run (BASELINE.md round-4 item 5): one local[32]
visit pair of the flagship 1m rollup and the full 1m→1h→1d cascade with
persisted intermediates over a 100M-turn zstd-parquet input, with
spill/memory evidence pulled from Spark's own REST metrics (the same
numbers the UI shows) instead of eyeballed logs.

    python scripts/sustained_run.py [n_turns]

Prints one JSON line: generation wall, per-visit flagship/cascade
walls, turns/sec (best visit), total shuffle read/write, memory+disk
spill bytes across all stages, and executor peak memory.  Run ALONE —
co-tenant load swings absolute walls ~2x (BASELINE.md caveat).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyconform_spark import synth
from pyconform_spark.operators import rollup
from pyconform_spark.session import get_spark


def run_noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def rest(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}{path}") as r:
        return json.load(r)


def main() -> None:
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
    spark = get_spark(
        master="local[32]",
        app_name="sustained-run",
        shuffle_partitions=64,
        extra_conf={
            "spark.ui.enabled": "true",  # REST metrics source
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.parquet.compression.codec": "zstd",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    tx_path = os.path.join(tempfile.mkdtemp(prefix="sustained_"), "transcripts")
    t0 = time.monotonic()
    synth.transcripts(spark, n_turns).write.mode("overwrite").parquet(tx_path)
    gen_sec = time.monotonic() - t0
    size_b = sum(
        os.path.getsize(os.path.join(tx_path, f))
        for f in os.listdir(tx_path)
        if f.endswith(".parquet")
    )
    tx = spark.read.parquet(tx_path)

    flagship, cascade = [], []
    for _visit in range(2):
        t0 = time.monotonic()
        run_noop(rollup.tier_rollup(tx, "1m"))
        flagship.append(round(time.monotonic() - t0, 1))

        t0 = time.monotonic()
        t1m = rollup.tier_rollup(tx, "1m")
        t1m.persist()
        run_noop(t1m)
        t1h = rollup.cascade_rollup(t1m, "1h")
        t1h.persist()
        run_noop(t1h)
        run_noop(rollup.cascade_rollup(t1h, "1d"))
        cascade.append(round(time.monotonic() - t0, 1))
        t1h.unpersist()
        t1m.unpersist()

    stages = rest(spark, "/stages?status=complete")
    execs = rest(spark, "/executors")
    mem_spill = sum(s.get("memoryBytesSpilled", 0) for s in stages)
    disk_spill = sum(s.get("diskBytesSpilled", 0) for s in stages)
    shuffle_w = sum(s.get("shuffleWriteBytes", 0) for s in stages)
    peak_mem = max(
        (e.get("memoryMetrics", {}) or {}).get("usedOnHeapStorageMemory", 0)
        + (e.get("memoryMetrics", {}) or {}).get("usedOffHeapStorageMemory", 0)
        for e in execs
    )
    print(
        json.dumps(
            {
                "n_turns": n_turns,
                "input_gb": round(size_b / 2**30, 2),
                "gen_sec": round(gen_sec, 1),
                "flagship_sec_visits": flagship,
                "cascade_sec_visits": cascade,
                "flagship_turns_per_sec": round(n_turns / min(flagship)),
                "cascade_turns_per_sec": round(n_turns / min(cascade)),
                "memory_bytes_spilled": mem_spill,
                "disk_bytes_spilled": disk_spill,
                "shuffle_write_gb": round(shuffle_w / 2**30, 2),
                "executor_peak_storage_mem_gb": round(peak_mem / 2**30, 2),
                "n_stages": len(stages),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
