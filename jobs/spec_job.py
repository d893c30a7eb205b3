"""spark-submit spec-pipeline entry point — the xconform CLI analog
(``/root/reference/scripts/xconform:100-165``): JSON output spec +
input table → validated, epoch-committed declared outputs.

    spark-submit --py-files dist/pyconform_spark.zip \
        jobs/spec_job.py --spec spec.json --input /path/events.parquet \
        --root /path/out_root [--ts-col ts] [--validate-only] \
        [--module my_funcs.py ...]

``--validate-only`` mirrors xconform's no-input mode: the spec is
parsed and planned against the input schema (every definition compiled,
every unit checked) and the job exits before any data moves.
``--module`` mirrors ``xconform -m`` (scripts/xconform:152-155): each
path is imported before planning, and any functions it registers via
``pyconform_spark.defs.register_function`` become callable from spec
definitions.  Variables with missing/unparseable definitions or unknown
inputs are skipped with warnings, never failing the whole spec.
Re-running resumes past committed epochs (the lineage append is the
commit point).
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import sys


def load_user_modules(paths: list[str]) -> list[str]:
    """Import user function-plugin modules (xconform -m analog); their
    import side effect is defs.register_function calls."""
    loaded = []
    for i, path in enumerate(paths):
        spec = importlib.util.spec_from_file_location(f"user{i}", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        loaded.append(path)
    return loaded


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--spec", required=True, help="JSON output spec")
    ap.add_argument("--input", required=True, help="input parquet path")
    ap.add_argument("--root", required=True, help="output root")
    ap.add_argument("--ts-col", default="ts", help="epoch-slicing timestamp column")
    ap.add_argument("--validate-only", action="store_true")
    ap.add_argument(
        "--module", action="append", default=[],
        help="user function-plugin module path (repeatable; xconform -m analog)",
    )
    ap.add_argument(
        "--mode", choices=["batch", "per-epoch"], default="batch",
        help="batch = one input scan per commit batch (backfills); "
        "per-epoch = finest resume granularity + observed metrics "
        "(incremental ingest)",
    )
    ap.add_argument("--epochs-per-commit", type=int, default=64)
    args = ap.parse_args()
    load_user_modules(args.module)

    from pyspark.sql import SparkSession

    from pyconform_spark import specs

    spark = (
        SparkSession.builder.appName("pyconform_spark-spec")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )

    df = spark.read.parquet(args.input)
    spec = specs.load_spec(args.spec)

    if args.validate_only:
        planned, warns = specs.plan_spec(df, spec)
        print(
            json.dumps(
                {
                    "validated": True,
                    "variables": [v.name for v, _ in planned],
                    "declared_schema": specs.declared_schema(spec).simpleString(),
                    "warnings": warns,
                }
            )
        )
        spark.stop()
        return

    if args.mode == "batch":
        result = specs.run_spec_batch(
            spark, df, spec, args.root, ts_col=args.ts_col,
            epochs_per_commit=args.epochs_per_commit,
        )
    else:
        result = specs.run_spec(spark, df, spec, args.root, ts_col=args.ts_col)
    print(json.dumps(result, default=str))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
