"""Conversation-transcript analytics: turn-transition structure and
response latency.

Reference analog: PyConform's per-variable derived diagnostics
(``commonfunctions.py``) — here the "variables" are the transcript's
role/tool streams and the diagnostics are Markov transition counts and
inter-turn latency, the stock questions asked of agent transcripts
("how long does the assistant take after a user turn, per tool?").

Scale shape: both operators are ONE window sort per conversation
partition (lead/lag only) followed by a hash aggregate on the
transition pair — no join, no global sort, hot conversations bounded
by the same chunking story as every other per-series window here.

Cross-engine exactness: latencies are exact epoch-microsecond BIGINT
differences; sums are exact integer aggregates; the mean is ONE double
division.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def transition_matrix(
    df: DataFrame,
    key_cols: list,
    state_col: str,
    ts_col: str = "ts",
    order_cols: list | None = None,
) -> DataFrame:
    """Markov transition counts + latency stats between consecutive
    states of each keyed stream.

    Output: (prev_state, curr_state, n_transitions, latency_us_sum,
    latency_us_mean) — one row per observed ordered state pair.
    """
    order_by = [ts_col] + list(order_cols or [])
    w = Window.partitionBy(*key_cols).orderBy(*order_by)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    staged = df.select(
        F.lag(F.col(state_col)).over(w).alias("prev_state"),
        F.col(state_col).alias("curr_state"),
        (us - F.lag(us).over(w)).alias("lat_us"),
    ).where(F.col("prev_state").isNotNull())
    return staged.groupBy("prev_state", "curr_state").agg(
        F.count(F.lit(1)).alias("n_transitions"),
        F.sum("lat_us").alias("latency_us_sum"),
        (
            F.sum("lat_us").cast("double") / F.count(F.lit(1))
        ).alias("latency_us_mean"),
    )


def response_latency(transcripts: DataFrame) -> DataFrame:
    """Assistant response latency per tool: for every assistant turn
    that directly follows a user turn in its conversation (stable
    (conv_id, turn_idx) order — the north-rule per-turn ordering), the
    time since that user turn, aggregated per tool.

    Output: (tool, n_responses, latency_us_sum, latency_us_mean,
    latency_us_max); NULL tool groups the untooled responses.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    staged = transcripts.select(
        "tool",
        F.col("role").alias("curr_role"),
        F.lag("role").over(w).alias("prev_role"),
        (us - F.lag(us).over(w)).alias("lat_us"),
    ).where(
        (F.col("curr_role") == "assistant") & (F.col("prev_role") == "user")
    )
    return staged.groupBy("tool").agg(
        F.count(F.lit(1)).alias("n_responses"),
        F.sum("lat_us").alias("latency_us_sum"),
        (
            F.sum("lat_us").cast("double") / F.count(F.lit(1))
        ).alias("latency_us_mean"),
        F.max("lat_us").alias("latency_us_max"),
    )
