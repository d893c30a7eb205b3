"""Spot-check named catalog queries against their DuckDB oracles.

    python scripts/subset_check.py <query> [<query> ...]

Same compare as correctness_sweep, restricted to the named entries —
the fast loop while developing one operator.
"""
import json, os, sys
sys.path.insert(0, "/root/repo")
import duckdb
from scripts.correctness_sweep import TABLES, compare
from pyconform_spark.session import get_spark

sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
names = sys.argv[1:]
spark = get_spark(master="local[8]", app_name="subset", shuffle_partitions=16,
                  extra_conf={"spark.ui.enabled": "false", "spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as entry
con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
qmap, omap = entry.queries(), entry.oracle_sql()
bad = 0
for name in names:
    try:
        got = qmap[name](spark, sf_dir).toPandas()
        sql = omap.get(name)
        if sql is None:
            print(name, "rows_only", len(got)); continue
        exp = con.sql(sql).df()
        err = compare(got, exp)
        print(name, "MATCH" if err is None else f"MISMATCH: {err}", len(got))
        bad += bool(err)
    except Exception as e:
        print(name, "ERROR", str(e)[:300]); bad += 1
spark.stop()
sys.exit(1 if bad else 0)
