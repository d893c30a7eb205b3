"""Local replica of the driver's correctness gate: every queries()
entry is executed on Spark AND its oracle_sql() twin on DuckDB over the
same sf0.01 parquet; row count, schema shape, and VALUES must agree —
floats bit-for-bit (predicting the driver's order-insensitive
value-hash compare).
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    out = {}
    for c in sorted(pdf.columns):
        s = pdf[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            s = pd.to_datetime(s).dt.tz_localize(None)
        elif pd.api.types.is_integer_dtype(s):
            s = s.astype("int64")
        elif pd.api.types.is_bool_dtype(s):
            s = s.astype(bool)
        out[c] = s
    n = pd.DataFrame(out)
    return n.sort_values(list(n.columns), kind="mergesort").reset_index(drop=True)


def _assert_equal(name: str, got: pd.DataFrame, exp: pd.DataFrame):
    assert len(got) == len(exp), f"{name}: rows {len(got)} != {len(exp)}"
    assert sorted(got.columns) == sorted(exp.columns), f"{name}: columns"
    g, e = _normalize(got), _normalize(exp)
    for c in g.columns:
        gv, ev = g[c], e[c]
        if pd.api.types.is_float_dtype(gv):
            ga = gv.to_numpy(dtype=np.float64)
            ea = ev.to_numpy(dtype=np.float64)
            both_nan = np.isnan(ga) & np.isnan(ea)
            same = (ga.view(np.uint64) == ea.view(np.uint64)) | both_nan
            assert same.all(), (
                f"{name}.{c}: {int((~same).sum())} float mismatches, first: "
                f"{ga[~same][:3]} vs {ea[~same][:3]}"
            )
        else:
            same = (gv.values == ev.values) | (gv.isna().values & ev.isna().values)
            assert same.all(), f"{name}.{c}: first diff {gv[~same][:3]} vs {ev[~same][:3]}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.schema) == 7


@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_query_vs_oracle(spark, ddb, name):
    q = entrymod.queries()[name]
    got = q(spark, SF_DIR).toPandas()
    sql = entrymod.oracle_sql().get(name)
    if sql is None:
        assert len(got) >= 0  # rows-only contract
        return
    exp = ddb.sql(sql).df()
    _assert_equal(name, got, exp)


def test_oracle_float_literals_parse_identically_in_duckdb():
    """DuckDB 1.0.0 parses UNQUOTED numeric literals through DECIMAL
    and can land 1 ulp off the correctly-rounded double (measured on
    the 17-digit HLL alpha constant — the r5 sf0.1 sweep's catch);
    '...'::DOUBLE string casts parse exactly.  Gate: every unquoted
    float literal in every oracle must parse to the same bits as
    Python's strtod, else it must be quoted."""
    import re

    import duckdb
    import numpy as np

    con = duckdb.connect()
    seen: dict[str, bool] = {}
    offenders = []
    for name, sql in entrymod.oracle_sql().items():
        stripped = re.sub(r"'[^']*'", "", sql)
        for mm in re.finditer(r"\b\d+\.\d+(?:[eE][+-]?\d+)?\b", stripped):
            lit = mm.group(0)
            if lit not in seen:
                py = np.float64(float(lit))
                dk = np.float64(
                    con.execute(f"SELECT {lit}::DOUBLE").fetchone()[0]
                )
                seen[lit] = bool(
                    py.view(np.uint64) != dk.view(np.uint64)
                )
            if seen[lit]:
                offenders.append((name, lit))
    assert not offenders, offenders
