"""KLL-style mergeable rank sketch (Karnin, Lang, Liberty, FOCS'16 —
public paper), deterministic-compactor variant.

The tier store's histogram sketch (queries.quantile_sketch_tier_merge)
answers quantiles exactly but its size follows the DISTINCT-value
count; a KLL compactor bounds the sketch at O(k log(n/k)) items for
ANY value distribution — the right tool when a conversation-latency
column has millions of distinct micro-second values and the rollup
only needs p50/p95/p99 to ~n/k rank error.

Determinism in place of coin flips: the classic KLL compactor drops
odd- or even-indexed items by a random bit; this variant alternates
the bit per (level, compaction-count), so the same input partition
yields the same sketch every run (reproducible pipelines beat the
2x-constant randomized bound; the deterministic compactor's rank
error is still O(n/k) — each level-l compaction displaces ranks by at
most 2^l, and level l compacts at most n/(k 2^l) times, giving
error <= n*H/k for H levels).

Why no DuckDB oracle: the sketch content depends on the ORDER values
meet the compactor (per input partition), which SQL cannot replay —
the gates are pytest invariants instead (rank-error bound against
exact ranks, merge bound, size bound, small-n exactness), the same
treatment as the stateful streaming operators.

Scale shape: stage 1 builds one sketch per (group, input partition)
inside ``mapInPandas`` (numpy sort per buffer, Arrow-batched); stage
2 merges the per-partition sketches — a few hundred rows each — with
one ``applyInPandas`` per group.  No raw row ever leaves its
partition unsorted; the shuffle moves only sketch rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

__all__ = ["build_group_sketches", "merge_pdf", "rank_of", "quantile_of"]


def _compact_level(levels: list[list], counters: list[int], lvl: int, k: int):
    """Sort level ``lvl``, keep alternating items (offset flips per
    compaction), push survivors one level up."""
    buf = np.sort(np.asarray(levels[lvl], dtype=np.int64), kind="stable")
    off = counters[lvl] & 1
    counters[lvl] += 1
    # compact an EVEN count only — an odd buffer leaves its largest
    # item at this level, so total weight is conserved exactly
    # (len(kept) * 2 == len(compacted))
    if len(buf) & 1:
        levels[lvl] = [int(buf[-1])]
        buf = buf[:-1]
    else:
        levels[lvl] = []
    keep = buf[off::2]
    if lvl + 1 == len(levels):
        levels.append([])
        counters.append(0)
    levels[lvl + 1].extend(keep.tolist())
    if len(levels[lvl + 1]) > max(k, 2):
        _compact_level(levels, counters, lvl + 1, k)


def _feed(levels: list[list], counters: list[int], vals, k: int) -> None:
    cap0 = max(k, 2)
    for v in vals:
        levels[0].append(int(v))
        if len(levels[0]) > cap0:
            _compact_level(levels, counters, 0, k)


def _sketch_rows(levels: list[list]) -> list[tuple[int, int]]:
    out = []
    for lvl, items in enumerate(levels):
        w = 1 << lvl
        out.extend((int(v), w) for v in items)
    return out


def build_group_sketches(
    df: DataFrame, keys: list[str], value: str = "vq", k: int = 200
) -> DataFrame:
    """Two-stage distributed build: per-(group, partition) compactor
    sketches, then one merge per group.  ``value`` must be an integer
    column (quantize floats first — the engine's centi-unit
    convention).  Returns (keys..., item long, weight long)."""
    part_schema = T.StructType(
        [df.schema[c] for c in keys]
        + [
            T.StructField("item", T.LongType(), False),
            T.StructField("weight", T.LongType(), False),
        ]
    )

    def _partition_sketch(it):
        # ONE compactor per group per Spark partition, fed ACROSS the
        # partition's Arrow batches: a group larger than one Arrow
        # batch (~10k rows) continues its own feed instead of spawning
        # per-batch sketches that would re-merge later — this is what
        # makes a cell-keyed repartition + sortWithinPartitions a
        # genuine single ascending run per cell at ANY cell size
        # (the min/max-survival guarantee kll_range_sketch_readouts
        # relies on; pinned by test_cross_batch_feed_is_one_run).
        states: dict[tuple, tuple[list, list]] = {}

        def _norm(gk: tuple) -> tuple:
            # pandas surfaces null group keys as NaN/NaT under
            # dropna=False, and NaN != NaN would make the dict lookup
            # miss across Arrow batches — null-keyed groups would
            # silently fall back to per-batch sketches, voiding the
            # single-ascending-run min/max-survival guarantee.  Map
            # every null-ish element to None so the key is stable.
            return tuple(None if pd.isna(v) else v for v in gk)

        for pdf in it:
            for gk, sub in pdf.groupby(keys, sort=False, dropna=False):
                if not isinstance(gk, tuple):
                    gk = (gk,)
                gk = _norm(gk)
                st = states.get(gk)
                if st is None:
                    st = ([[]], [0])
                    states[gk] = st
                _feed(st[0], st[1], sub[value].to_numpy(), k)
        frames = []
        for gk, (levels, _counters) in states.items():
            rows = _sketch_rows(levels)
            if not rows:
                continue
            g = pd.DataFrame(rows, columns=["item", "weight"])
            for c, v in zip(keys, gk):
                g[c] = v
            frames.append(g[keys + ["item", "weight"]])
        if frames:
            yield pd.concat(frames, ignore_index=True)

    parts = df.select(*keys, value).mapInPandas(
        _partition_sketch, schema=part_schema
    )

    def _merge(pdf: pd.DataFrame) -> pd.DataFrame:
        merged = merge_pdf(pdf, k)
        for c in keys:
            merged[c] = pdf[c].iloc[0]
        return merged[keys + ["item", "weight"]]

    return parts.groupBy(*keys).applyInPandas(_merge, schema=part_schema)


def merge_pdf(pdf: pd.DataFrame, k: int = 200) -> pd.DataFrame:
    """Merge sketch rows (item, weight) into one bounded sketch: items
    re-enter a fresh compactor at their weight's level (weight 2^l ->
    level l), which preserves every item's weight and re-establishes
    the per-level size caps."""
    levels: list[list] = [[]]
    counters = [0]
    by_level = sorted(
        zip(pdf["weight"].tolist(), pdf["item"].tolist()),
        key=lambda t: (t[0], t[1]),
    )
    for w, v in by_level:
        lvl = int(w).bit_length() - 1
        while lvl >= len(levels):
            levels.append([])
            counters.append(0)
        levels[lvl].append(int(v))
        if len(levels[lvl]) > max(k, 2):
            _compact_level(levels, counters, lvl, k)
    return pd.DataFrame(_sketch_rows(levels), columns=["item", "weight"])


def rank_of(sketch: pd.DataFrame, x: int) -> int:
    """Estimated number of stream items <= x."""
    m = sketch["item"] <= x
    return int(sketch.loc[m, "weight"].sum())


def quantile_of(sketch: pd.DataFrame, q: float) -> int:
    """Estimated q-quantile (smallest item whose estimated rank covers
    q of the total weight)."""
    s = sketch.sort_values("item", kind="mergesort")
    total = int(s["weight"].sum())
    target = q * total
    run = 0
    for v, w in zip(s["item"], s["weight"]):
        run += int(w)
        if run >= target:
            return int(v)
    return int(s["item"].iloc[-1]) if len(s) else 0
