"""Single-process numpy/pandas reference pipeline (the "PyConform role").

The north rule requires rolled-up points at every retention tier to
match a reference pipeline bit-for-bit.  This module IS that reference:
it regenerates the synthetic transcripts with the same closed-form
arithmetic as ``pyconform_spark.synth`` (numpy int64, no Spark) and
computes tier rollups with a deterministic single-threaded groupby —
the same role PyConform's golden-value unit tests play against IDL
numerics (``/root/reference/source/test/modules/idlTests.py:16-57``).

Bit-for-bit is achievable because every tier statistic is either an
integer aggregate (counts, int sums — order-independent and exact) or
a single double division of two exactly-agreed numbers (rate, avg);
no floating-point sum whose value could depend on partitioning.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyconform_spark.synth import (
    BASE_EPOCH,
    REP_MOD,
    CHUNK,  # noqa: F401  (documented parity constant)
    MAX_JITTER,
    ROLES,
    STEP_SECONDS,
    TOOLS,
    _A,
    _C,
    _M32,
)

TIER_SECONDS = {"1m": 60, "1h": 3600, "1d": 86400}


def _mix_np(x: np.ndarray, salt: int) -> np.ndarray:
    x = (x.astype(np.uint64) % _M32 + np.uint64(salt)) % np.uint64(_M32)
    x = (x * np.uint64(_A) + np.uint64(_C)) % np.uint64(_M32)
    x = (x * np.uint64(_A) + np.uint64(_C)) % np.uint64(_M32)
    return x


def transcripts_pdf(n_turns: int = 60_000) -> pd.DataFrame:
    """Numpy twin of ``synth.transcripts`` — identical rows."""
    avg = 24
    n_convs = max(1, n_turns // avg)
    s0 = n_turns * 0.3 / max(n_convs, 2) ** 0.3
    conv = np.arange(n_convs, dtype=np.int64)
    size = np.maximum(4, np.floor(s0 / np.power(conv + 1, 0.7)).astype(np.int64))
    size = np.minimum(size, 1 << 20)

    start_off = (_mix_np(conv, 101) % np.uint64(86400)).astype(np.int64)
    gap_every = (20 + _mix_np(conv, 202) % np.uint64(30)).astype(np.int64)
    gap_len = (1800 + _mix_np(conv, 303) % np.uint64(7200)).astype(np.int64)

    conv_r = np.repeat(conv, size)
    i = np.concatenate([np.arange(s, dtype=np.int64) for s in size])
    start_r = np.repeat(start_off, size)
    ge_r = np.repeat(gap_every, size)
    gl_r = np.repeat(gap_len, size)

    tkey = conv_r * 1048576 + i
    h_text = _mix_np(tkey, 7).astype(np.int64)
    h_tool = _mix_np(tkey, 11).astype(np.int64)
    h_jit = _mix_np(tkey, 13).astype(np.int64)

    ts_sec = (
        BASE_EPOCH + start_r + i * STEP_SECONDS + (i // ge_r) * gl_r + h_jit % MAX_JITTER
    )

    n_rep = (h_text % REP_MOD) * (h_text % 7)
    filler = "lorem ipsum dolor sit amet "
    text = np.where(
        h_text % 17 == 0,
        "",
        np.char.add(
            np.char.add(np.char.add("t", h_text.astype(str)), " "),
            # np.char.multiply replicates the filler n times (== F.repeat)
            np.char.multiply(filler, n_rep),
        ),
    )

    tool_pick = h_tool % 10
    tools_arr = np.array(TOOLS, dtype=object)
    tool = tools_arr[(tool_pick % 8)].copy()
    tool = np.where(tool_pick == 9, "", tool)
    tool = np.where(tool_pick == 8, None, tool)

    roles_arr = np.array(ROLES, dtype=object)
    role = roles_arr[(i % 4)]

    return pd.DataFrame(
        {
            "conv_id": np.char.add("conv-", np.char.zfill(conv_r.astype(str), 8)),
            "turn_idx": i.astype(np.int32),
            "role": role,
            "text": text,
            "tool": tool,
            "ts": pd.to_datetime(ts_sec, unit="s"),
        }
    )


def tier_rollup_pdf(tr: pd.DataFrame, tier: str) -> pd.DataFrame:
    """Reference tier rollup: per (conv_id, tool, role, bucket) —
    turn_count, turn_rate, text_len_sum, text_len_avg, gap_filled=False.

    Rows are first sorted by the stable (conv_id, turn_idx) order
    (north-rule invariant) so any order-sensitive reduction would still
    be pinned; the aggregates used are order-independent anyway.
    """
    secs = TIER_SECONDS[tier]
    df = tr.sort_values(["conv_id", "turn_idx"], kind="mergesort").copy()
    epoch = df["ts"].astype("int64") // 10**9
    df["bucket_start"] = pd.to_datetime((epoch // secs) * secs, unit="s")
    df["text_len"] = df["text"].str.len().fillna(0).astype(np.int64)
    # tool is a grouping key that may be null — keep null groups (Spark does).
    g = df.groupby(["conv_id", "tool", "role", "bucket_start"], dropna=False, sort=True)
    out = g.agg(
        turn_count=("turn_idx", "size"),
        text_len_sum=("text_len", "sum"),
    ).reset_index()
    out["turn_count"] = out["turn_count"].astype(np.int64)
    out["turn_rate"] = out["turn_count"] / np.float64(secs)
    out["text_len_avg"] = out["text_len_sum"] / out["turn_count"]
    out["gap_filled"] = False
    return out[
        [
            "conv_id",
            "tool",
            "role",
            "bucket_start",
            "turn_count",
            "turn_rate",
            "text_len_sum",
            "text_len_avg",
            "gap_filled",
        ]
    ]


def cascade_rollup_pdf(tier_pdf: pd.DataFrame, child: str, parent: str) -> pd.DataFrame:
    """Roll a finer tier up to a coarser one (1m→1h, 1h→1d)."""
    secs = TIER_SECONDS[parent]
    df = tier_pdf.copy()
    epoch = df["bucket_start"].astype("int64") // 10**9
    df["bucket_start"] = pd.to_datetime((epoch // secs) * secs, unit="s")
    g = df.groupby(["conv_id", "tool", "role", "bucket_start"], dropna=False, sort=True)
    out = g.agg(
        turn_count=("turn_count", "sum"),
        text_len_sum=("text_len_sum", "sum"),
    ).reset_index()
    out["turn_rate"] = out["turn_count"] / np.float64(secs)
    out["text_len_avg"] = out["text_len_sum"] / out["turn_count"]
    out["gap_filled"] = False
    return out[
        [
            "conv_id",
            "tool",
            "role",
            "bucket_start",
            "turn_count",
            "turn_rate",
            "text_len_sum",
            "text_len_avg",
            "gap_filled",
        ]
    ]
