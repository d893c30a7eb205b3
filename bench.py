"""Benchmark harness — one JSON line to stdout.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` plus the
flagship synthetic-transcripts tier cascade, and prints::

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": ..., ...}

Each query executes its FULL physical plan into the ``noop`` sink
(no driver collect, no disk write cost) so the number measured is
scan + shuffle + aggregate, exactly what scales with the cluster.

Scaling evidence (BASELINE.md two-parallelism rule) lives in
``scripts/scaling_bench.py`` — this file is the per-round driver hook
and stays single-parallelism.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyconform_spark import synth
from pyconform_spark.operators import rollup
from pyconform_spark.session import get_spark

# Queries benchmarked per round (subset of __spark_entry__.queries()
# chosen to cover scan+agg, cascade, window, gap-fill join, and joins).
BENCH_QUERIES = [
    "rollup_1m",
    "rollup_1h_cascade",
    "rollup_1d_cascade",
    "gapfill_locf_1h",
    "gapfill_linear_1h",
    "sessionize",
    "weighted_downsample_1d",
    "compress_roundtrip",
    "dedup_exact",
    "dedup_minhash_lsh",
    "knn_bruteforce",
    "ann_ivf_topk",
    "hll_distinct_users",
    "tpch_q1",
    "top_revenue_orders",
]

# Synthetic transcripts rows for the flagship pipeline, per sf of the
# bench dir (sf0.1 -> 1.2M turns).
TURNS_PER_SF = 12_000_000


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def run_noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = _sf_of(sf_dir)
    spark = get_spark(
        master=f"local[{cpus}]",
        app_name="pyconform_spark-bench",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qmap = entrymod.queries()
    times: dict[str, float] = {}

    # -- flagship: transcripts parquet -> 1m tier -> 1h -> 1d cascade.
    # Input is materialized first (generation excluded from the timing)
    # so throughput measures the rollup engine, matching scaling_bench.
    n_turns = max(100_000, int(TURNS_PER_SF * sf))
    import tempfile

    tx_path = os.path.join(tempfile.mkdtemp(prefix="bench_tx_"), "transcripts")
    synth.transcripts(spark, n_turns).write.mode("overwrite").parquet(tx_path)
    tx = spark.read.parquet(tx_path)

    def cascade_once() -> float:
        t0 = time.monotonic()
        t1m = rollup.tier_rollup(tx, "1m")
        t1m.persist()
        run_noop(t1m)
        run_noop(rollup.cascade_rollup(t1m, "1h"))
        run_noop(rollup.cascade_rollup(rollup.cascade_rollup(t1m, "1h"), "1d"))
        dt = time.monotonic() - t0
        t1m.unpersist()
        return dt

    cascade_once()  # warm-up (codegen + file listing)
    cascade_sec = min(cascade_once() for _ in range(2))
    times["transcripts_cascade"] = round(cascade_sec, 3)
    throughput = n_turns / cascade_sec

    for name in BENCH_QUERIES:
        fn = qmap.get(name)
        if fn is None:
            continue
        t0 = time.monotonic()
        run_noop(fn(spark, sf_dir))
        times[name] = round(time.monotonic() - t0, 3)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline query wall time (incl. transcripts tier cascade)",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
                "transcripts_turns": n_turns,
                "transcripts_throughput_turns_per_sec": round(throughput, 1),
                "cpus": cpus,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
