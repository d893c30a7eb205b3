"""100M-turn sustained run (BASELINE.md round-4 item 5): one local[32]
visit pair of the flagship 1m rollup and the full 1m→1h→1d cascade with
persisted intermediates over a 100M-turn zstd-parquet input, with
spill/memory evidence pulled from Spark's own REST metrics (the same
numbers the UI shows) instead of eyeballed logs.

    python scripts/sustained_run.py [n_turns] [shuffle_partitions] [max_part_mb]

Prints one JSON line: generation wall, per-visit flagship/cascade
walls, turns/sec (best visit), total shuffle read/write, memory+disk
spill bytes across all stages, executor peak memory, and a PER-PHASE
spill attribution (gen / flagship / cascade, with the top spilling
stage names) so a nonzero spill total names its stage instead of
smearing over the whole run.  Run ALONE — co-tenant load swings
absolute walls ~2x (BASELINE.md caveat).
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


def phase_delta(spark, seen: set[int], label: str, report: list) -> None:
    """Attribute stage metrics accrued since the last call to `label`."""
    stages = rest(spark, "/stages?status=complete")
    new = [s for s in stages if s["stageId"] not in seen]
    seen.update(s["stageId"] for s in new)
    spillers = sorted(
        new, key=lambda s: -s.get("memoryBytesSpilled", 0)
    )[:3]
    report.append(
        {
            "phase": label,
            "mem_spill_gb": round(
                sum(s.get("memoryBytesSpilled", 0) for s in new) / 2**30, 2
            ),
            "disk_spill_gb": round(
                sum(s.get("diskBytesSpilled", 0) for s in new) / 2**30, 2
            ),
            "shuffle_write_gb": round(
                sum(s.get("shuffleWriteBytes", 0) for s in new) / 2**30, 2
            ),
            "top_spill_stages": [
                {
                    "name": s.get("name", "?")[:60],
                    "mem_gb": round(s.get("memoryBytesSpilled", 0) / 2**30, 2),
                    "disk_gb": round(s.get("diskBytesSpilled", 0) / 2**30, 2),
                }
                for s in spillers
                if s.get("memoryBytesSpilled", 0) > 0
            ],
        }
    )


def main() -> None:
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
    shuffle_partitions = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    max_part_mb = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    spark = get_spark(
        master="local[32]",
        app_name="sustained-run",
        shuffle_partitions=shuffle_partitions,
        extra_conf={
            "spark.ui.enabled": "true",  # REST metrics source
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.parquet.compression.codec": "zstd",
            # smaller scan splits bound the PARTIAL agg's per-task hash
            # map (group cardinality ∝ split rows); more shuffle
            # partitions bound the FINAL agg's per-task state
            "spark.sql.files.maxPartitionBytes": str(max_part_mb * 1024 * 1024),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    seen_stages: set[int] = set()
    phases: list = []

    tx_path = os.path.join(tempfile.mkdtemp(prefix="sustained_"), "transcripts")
    t0 = time.monotonic()
    synth.transcripts(spark, n_turns).write.mode("overwrite").parquet(tx_path)
    gen_sec = time.monotonic() - t0
    phase_delta(spark, seen_stages, "generate", phases)
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
        phase_delta(spark, seen_stages, f"flagship_v{_visit}", phases)

        t0 = time.monotonic()
        t1m = rollup.tier_rollup(tx, "1m")
        t1m.persist()
        run_noop(t1m)
        t1h = rollup.cascade_rollup(t1m, "1h")
        t1h.persist()
        run_noop(t1h)
        run_noop(rollup.cascade_rollup(t1h, "1d"))
        cascade.append(round(time.monotonic() - t0, 1))
        phase_delta(spark, seen_stages, f"cascade_v{_visit}", phases)
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
                "shuffle_partitions": shuffle_partitions,
                "phases": phases,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
