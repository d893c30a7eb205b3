"""Token-bucket rate limiting as a replayable per-series recurrence.

The resource-accounting operator an agent-transcripts pipeline runs to
answer "which tool calls WOULD the quota have throttled?" — a token
bucket per conversation/user (capacity C, refill rate r, cost per
event), replayed deterministically over the historical stream.

Like Holt smoothing, the clamp in ``level = min(C, level + r*dt)``
couples every step to the last, so no window-frame form exists; the
host is a per-key ``applyInPandas`` recurrence (one shuffle on the
key, two integers of state).  Unlike the smoothers the state is PURE
INTEGER — micro-tokens, refill = dt_us // divisor — so the DuckDB
recursive-CTE oracle is exact with no IEEE-ordering care at all.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def token_bucket(
    df: DataFrame,
    keys: list[str],
    order: list[str],
    ts_us: str,
    capacity: int,
    cost: int,
    refill_divisor: int,
) -> DataFrame:
    """Replay a token bucket per key group, ordered by ``order``.

    ``ts_us``: integer epoch-microsecond column.  Refill between
    consecutive events is ``(t_i - t_{i-1}) // refill_divisor``
    micro-tokens (integer floor — deterministic).  The first event of
    a key sees a full bucket.  Adds ``allowed`` (1/0) and
    ``tokens_after`` (bucket level after the attempt)."""
    out_schema = T.StructType(
        list(df.schema)
        + [
            T.StructField("allowed", T.IntegerType(), False),
            T.StructField("tokens_after", T.LongType(), False),
        ]
    )

    def _replay(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="mergesort").reset_index(drop=True)
        ts = pdf[ts_us].astype("int64").tolist()
        allowed, after = [], []
        lvl = capacity
        prev = None
        for t in ts:
            if prev is not None:
                lvl = min(capacity, lvl + (t - prev) // refill_divisor)
            if lvl >= cost:
                lvl -= cost
                allowed.append(1)
            else:
                allowed.append(0)
            after.append(lvl)
            prev = t
        pdf["allowed"] = pd.array(allowed, dtype="int32")
        pdf["tokens_after"] = pd.array(after, dtype="int64")
        return pdf

    return df.groupBy(*keys).applyInPandas(_replay, schema=out_schema)
