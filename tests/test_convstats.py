"""Transcript analytics (operators/convstats.py): Markov transitions and
assistant response latency, cross-checked bit-for-bit against DuckDB
recomputing the same definition from the SAME Spark-written parquet —
an independent engine, not the in-repo oracle.
"""

from __future__ import annotations

import duckdb
import numpy as np

from pyconform_spark import synth
from pyconform_spark.operators import convstats

N = 8000


def _cmp(got, exp, keys):
    got = got.sort_values(keys, kind="mergesort").reset_index(drop=True)
    exp = exp.sort_values(keys, kind="mergesort").reset_index(drop=True)
    assert len(got) == len(exp)
    for c in sorted(got.columns):
        g, e = got[c], exp[c]
        if g.dtype.kind == "f":
            gb = g.to_numpy(dtype=np.float64).view(np.uint64)
            eb = e.to_numpy(dtype=np.float64).view(np.uint64)
            assert (gb == eb).all(), c
        else:
            assert list(g.fillna("~N")) == list(e.fillna("~N")), c


def test_response_latency_matches_duckdb(spark, tmp_path):
    path = str(tmp_path / "tx")
    synth.transcripts(spark, N).write.parquet(path)
    got = convstats.response_latency(spark.read.parquet(path)).toPandas()
    exp = duckdb.sql(
        f"""
        WITH q AS (
          SELECT conv_id, turn_idx, role, tool, epoch_us(ts) AS us
          FROM read_parquet('{path}/*.parquet')),
        l AS (
          SELECT tool, role AS curr_role,
                 lag(role) OVER w AS prev_role,
                 us - lag(us) OVER w AS lat_us
          FROM q WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx))
        SELECT tool, count(*)::BIGINT AS n_responses,
               sum(lat_us)::BIGINT AS latency_us_sum,
               CAST(sum(lat_us) AS DOUBLE) / count(*) AS latency_us_mean,
               max(lat_us)::BIGINT AS latency_us_max
        FROM l WHERE curr_role = 'assistant' AND prev_role = 'user'
        GROUP BY 1
        """
    ).df()
    assert len(got) > 1 and got["n_responses"].sum() > 100
    _cmp(got, exp, ["tool"])


def test_transition_matrix_matches_duckdb(spark, tmp_path):
    path = str(tmp_path / "tx2")
    synth.transcripts(spark, N).write.parquet(path)
    got = convstats.transition_matrix(
        spark.read.parquet(path),
        key_cols=["conv_id"],
        state_col="role",
        ts_col="ts",
        order_cols=["turn_idx"],
    ).toPandas()
    exp = duckdb.sql(
        f"""
        WITH q AS (
          SELECT conv_id, turn_idx, role, epoch_us(ts) AS us
          FROM read_parquet('{path}/*.parquet')),
        l AS (
          SELECT lag(role) OVER w AS prev_state, role AS curr_state,
                 us - lag(us) OVER w AS lat_us
          FROM q WINDOW w AS (PARTITION BY conv_id ORDER BY us, turn_idx))
        SELECT prev_state, curr_state, count(*)::BIGINT AS n_transitions,
               sum(lat_us)::BIGINT AS latency_us_sum,
               CAST(sum(lat_us) AS DOUBLE) / count(*) AS latency_us_mean
        FROM l WHERE prev_state IS NOT NULL GROUP BY 1, 2
        """
    ).df()
    # the synth role cycle is deterministic: every pair observed
    assert len(got) >= 4
    _cmp(got, exp, ["prev_state", "curr_state"])
