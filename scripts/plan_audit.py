"""Whole-catalog physical-plan audit: explain EVERY registered driver
query and machine-check plan hygiene — the ".explain and iterate"
discipline as a per-round artifact instead of a per-query habit.

    python scripts/plan_audit.py [sf_dir] [out_json]

For each query: counts of physical nodes (scans, exchanges, sorts,
windows, joins by strategy, aggregates) plus anti-pattern flags:

* ``cartesian``        — CartesianProduct anywhere (always wrong here);
* ``row_python``       — BatchEvalPython: row-at-a-time Python UDF in
                         the plan (the repo's rule: Arrow-batched
                         mapInPandas/applyInPandas only);
* ``single_partition`` — Exchange SinglePartition NOT under a
                         TakeOrderedAndProject/limit/1-row aggregate
                         context is a global-sort smell (reported as a
                         count; known-legit cases are the scalar-agg
                         broadcasts, which plan as 1-row exchanges).

Exit code 1 if any query has ``cartesian`` or ``row_python`` — the two
flags with no legitimate use in this codebase.
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NODE_KEYS = {
    "scans": "Scan parquet",
    "exchanges": "Exchange",
    "sorts": "Sort",
    "windows": "Window",
    "hash_aggs": "HashAggregate",
    "broadcast_joins": "BroadcastHashJoin",
    "sortmerge_joins": "SortMergeJoin",
    "bnl_joins": "BroadcastNestedLoopJoin",
    "take_ordered": "TakeOrderedAndProject",
    "map_in_pandas": "MapInPandas",
    "grouped_pandas": "FlatMapGroupsInPandas",
}


def count_nodes(plan: str, name: str) -> int:
    return len(re.findall(rf"^\(\d+\) {name}", plan, re.M))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_path = sys.argv[2] if len(sys.argv) > 2 else None

    from pyconform_spark.session import get_spark

    import __spark_entry__ as entry

    spark = get_spark(
        master="local[4]",
        app_name="plan-audit",
        shuffle_partitions=8,
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    report: dict = {}
    n_bad = 0
    for name, fn in entry.queries().items():
        row: dict = {}
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
            for key, node in NODE_KEYS.items():
                c = count_nodes(plan, node)
                if c:
                    row[key] = c
            row["cartesian"] = count_nodes(plan, "CartesianProduct")
            row["row_python"] = count_nodes(plan, "BatchEvalPython")
            row["single_partition"] = plan.count("SinglePartition")
            if row["cartesian"] or row["row_python"]:
                n_bad += 1
                row["status"] = "BAD"
            else:
                row["status"] = "ok"
        except Exception as exc:  # noqa: BLE001 — audit must finish
            row = {"status": "error", "err": str(exc)[:200]}
            n_bad += 1
        report[name] = row

    out = {
        "sf_dir": sf_dir,
        "n_queries": len(report),
        "n_bad": n_bad,
        "totals": {
            "cartesian": sum(r.get("cartesian", 0) for r in report.values()),
            "row_python": sum(r.get("row_python", 0) for r in report.values()),
        },
        "queries": report,
    }
    line = json.dumps(out)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            json.dump(out, f, indent=1)
    spark.stop()
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
