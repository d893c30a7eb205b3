"""Matrix profile: for EVERY length-``m`` subsequence of a series,
the distance to (and index of) its nearest non-trivial neighbor — the
modern time-series primitive behind motif discovery, discord
(anomaly) detection, and segmentation (Yeh et al., "Matrix Profile I",
ICDM 2016 — public literature).

``motif_sax_pairs`` finds CLOSE pairs above a similarity bar; the
matrix profile answers the stronger question "what is the nearest
neighbor of every window?" — its minima are motifs, its maxima are
discords, both read off one output.

Exactness: distances are UNNORMALIZED squared Euclidean over integer
(centi-quantized) points, so the whole computation is int64 and the
DuckDB twin (windows unrolled to (w, k) rows, pair distances via one
equi-join on k, profile via min-by) matches bit-for-bit.  The trivial
-match exclusion zone is |i - j| >= m; ties break to the SMALLEST
neighbor index.

Scale shape: series are grouped (one applyInPandas group per series),
so 10^6 independent series parallelize embarrassingly across
executors — the raw table is scanned once, reduced by a combiner
-friendly hash agg to |series| x |grid| points, and each group runs
the O(n^2) diagonal recurrence in numpy (cumsum of squared diffs per
offset — the STOMP trick, integer form).  For single series too long
for one task, chunk with tail overlap m-1 and merge (the
skew.chunked_window pattern); the per-group math is unchanged.

Overflow discipline (the ewma_smooth lesson): the per-offset cumsum
accumulates up to n * (2 * max|v|)^2, so the group guard requires
``n * (2 * max|v|)**2 < 2^62`` and raises loudly instead of letting
numpy wrap silently.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

_SENTINEL = np.int64(1) << 62


def _profile_one(v: np.ndarray, m: int) -> tuple[np.ndarray, np.ndarray]:
    """Exact integer matrix profile of one series: (min dist^2,
    argmin neighbor) per window, exclusion |i-j| >= m, ties to the
    smallest neighbor index."""
    n = len(v)
    nw = n - m + 1
    peak = int(np.abs(v).max(initial=0))
    if n * (2 * peak) ** 2 >= 2**62:
        raise ValueError(
            f"matrix_profile int64 overflow risk: n={n}, max|v|={peak}; "
            "rescale the series (the guard bounds n*(2*max)^2 < 2^62)"
        )
    best = np.full(nw, _SENTINEL, dtype=np.int64)
    bj = np.full(nw, -1, dtype=np.int64)
    for d in range(m, nw):  # offset j - i; both windows must fit
        diff = v[d:] - v[:-d]
        sq = diff * diff
        c = np.concatenate((np.zeros(1, dtype=np.int64), np.cumsum(sq)))
        wins = c[m:] - c[:-m]  # dist^2(i, i+d) for i in 0..n-d-m
        ln = len(wins)
        i_idx = np.arange(ln, dtype=np.int64)
        j_idx = i_idx + d
        # i side: neighbor j = i+d (ascending d => first hit is the
        # smallest j, so strict < keeps the tie rule)
        upd = wins < best[:ln]
        best[:ln] = np.where(upd, wins, best[:ln])
        bj[:ln] = np.where(upd, j_idx, bj[:ln])
        # j side: neighbor i = j-d (later d => SMALLER neighbor, so an
        # equal distance must win the tie)
        cur_b, cur_j = best[d : d + ln], bj[d : d + ln]
        upd2 = (wins < cur_b) | ((wins == cur_b) & (i_idx < cur_j))
        best[d : d + ln] = np.where(upd2, wins, cur_b)
        bj[d : d + ln] = np.where(upd2, i_idx, cur_j)
    return best, bj


def matrix_profile(points: DataFrame, m: int) -> DataFrame:
    """Per-series matrix profile over dense integer series.

    ``points``: (series string, pos int, h_s long, v long) — one row
    per grid position (dense: absent buckets pre-filled with 0).
    Returns (series, pos, ws_s, mp_dist, nn_pos) for every window
    with at least one non-trivial neighbor."""
    schema = (
        "series string, pos int, ws_s long, mp_dist long, nn_pos int"
    )

    def prof(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("pos")
        v = pdf["v"].to_numpy(np.int64)
        h = pdf["h_s"].to_numpy(np.int64)
        n = len(v)
        nw = n - m + 1
        if nw < m + 1:  # no pair can clear the exclusion zone
            return pd.DataFrame(
                {c: [] for c in ["series", "pos", "ws_s", "mp_dist", "nn_pos"]}
            )
        best, bj = _profile_one(v, m)
        mask = bj >= 0
        idx = np.arange(nw, dtype=np.int64)[mask]
        return pd.DataFrame(
            {
                "series": pdf["series"].iloc[0],
                "pos": idx.astype(np.int32),
                "ws_s": h[idx],
                "mp_dist": best[mask],
                "nn_pos": bj[mask].astype(np.int32),
            }
        )

    return points.groupBy("series").applyInPandas(prof, schema)


def _tile_candidates(
    va: np.ndarray, pa0: int, vb: np.ndarray, pb0: int, m: int,
    same: bool = False,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Best (dist, neighbor) per window for all pairs (i-window in
    ``va``, j-window in ``vb``) with global exclusion |i - j| >= m.
    Arrays carry GLOBAL start offsets; returns (pos, dist, nb) for
    every window of either side that saw at least one pair.

    Kernel: the per-diagonal cumsum recurrence (the STOMP trick) —
    each diagonal's sliding dist^2 costs O(len) regardless of m, so a
    tile is O(chunk^2) total vs O(chunk^2 * m) for the naive
    windows-matmul form.  Ties break to the SMALLEST neighbor index
    via an explicit (dist, nb) lexicographic update, so update order
    never matters.  Overflow guard: a diagonal's cumsum accumulates at
    most (len+m) squares of 2*peak."""
    nwa = len(va) - m + 1
    nwb = len(vb) - m + 1
    if nwa <= 0 or nwb <= 0:
        return (np.empty(0, np.int64),) * 3
    peak = max(int(np.abs(va).max(initial=0)), int(np.abs(vb).max(initial=0)))
    if (max(len(va), len(vb)) + m) * (2 * peak) ** 2 >= 2**62:
        raise ValueError(
            f"matrix_profile tile int64 overflow risk: m={m}, "
            f"max|v|={peak}; rescale the series"
        )
    far = np.iinfo(np.int64).max
    best_a = np.full(nwa, _SENTINEL, dtype=np.int64)
    nb_a = np.full(nwa, far, dtype=np.int64)
    if same:
        best_b, nb_b = best_a, nb_a  # one profile: updates share it
    else:
        best_b = np.full(nwb, _SENTINEL, dtype=np.int64)
        nb_b = np.full(nwb, far, dtype=np.int64)
    off = pb0 - pa0  # global diag d = gj - gi; local lj = li + (d - off)
    d_lo = off - (nwa - 1)
    d_hi = off + nwb - 1
    if same:
        d_lo = max(d_lo, m)  # symmetric: (i, i+d) updates both ends
    for d in range(d_lo, d_hi + 1):
        if abs(d) < m:
            continue
        dl = d - off
        i0 = max(0, -dl)
        i1 = min(nwa - 1, nwb - 1 - dl)
        if i1 < i0:
            continue
        ln = i1 - i0 + 1
        j0 = i0 + dl
        diff = va[i0 : i0 + ln + m - 1] - vb[j0 : j0 + ln + m - 1]
        sq = diff * diff
        c = np.cumsum(sq)
        wins = np.empty(ln, dtype=np.int64)
        wins[0] = c[m - 1]
        if ln > 1:
            wins[1:] = c[m : m + ln - 1] - c[: ln - 1]
        gi = pa0 + np.arange(i0, i0 + ln, dtype=np.int64)
        gj = gi + d
        sa = slice(i0, i0 + ln)
        upd = (wins < best_a[sa]) | ((wins == best_a[sa]) & (gj < nb_a[sa]))
        best_a[sa] = np.where(upd, wins, best_a[sa])
        nb_a[sa] = np.where(upd, gj, nb_a[sa])
        sb = slice(j0, j0 + ln)
        upd2 = (wins < best_b[sb]) | ((wins == best_b[sb]) & (gi < nb_b[sb]))
        best_b[sb] = np.where(upd2, wins, best_b[sb])
        nb_b[sb] = np.where(upd2, gi, nb_b[sb])
    gia = pa0 + np.arange(nwa, dtype=np.int64)
    ok_a = best_a < _SENTINEL
    if same:
        return gia[ok_a], best_a[ok_a], nb_a[ok_a]
    gjb = pb0 + np.arange(nwb, dtype=np.int64)
    ok_b = best_b < _SENTINEL
    pos = np.concatenate((gia[ok_a], gjb[ok_b]))
    dist = np.concatenate((best_a[ok_a], best_b[ok_b]))
    nb = np.concatenate((nb_a[ok_a], nb_b[ok_b]))
    return pos, dist, nb


def matrix_profile_tiled(
    points: DataFrame, m: int, chunk: int
) -> DataFrame:
    """Distributed matrix profile for series too LONG for one task —
    the SCAMP tiling (Zimmerman et al., SoCC'19, public literature):
    the (window x window) distance matrix is cut into chunk x chunk
    tiles, every tile (a, b) is an INDEPENDENT Arrow group seeing only
    the two extended chunks it needs (each chunk ships with its m-1
    tail points), and per-window candidates merge with one
    ``min(struct(dist, neighbor))`` hash aggregate — associative, so
    the merge preserves the exact tie rule (smallest neighbor).

    Row-identical to :func:`matrix_profile` (pytest-gated).  Scale
    shape: an n-point series becomes (n/chunk)^2 / 2 tasks of
    O(chunk^2) work each — a 10^9-point series no single executor
    could hold runs as bounded tiles; data duplication is one copy of
    each chunk per tile row (the standard SCAMP trade).  Overlapping
    tile coverage near chunk boundaries emits duplicate candidates;
    the min-merge makes them harmless by construction.

    ``chunk`` must be >= m so a window's tail never spans two chunks.
    Same (series, pos, h_s, v) input and (series, pos, ws_s, mp_dist,
    nn_pos) output as the single-group form."""
    if chunk < m:
        raise ValueError(f"chunk ({chunk}) must be >= m ({m})")

    tagged = points.withColumn(
        "_c", (F.col("pos") / chunk).cast("int")
    ).withColumn(
        "_e",
        F.explode(
            F.when(
                (F.col("pos") % chunk <= m - 2) & (F.col("_c") >= 1),
                F.array(F.col("_c"), F.col("_c") - 1),
            ).otherwise(F.array(F.col("_c")))
        ),
    )
    chunks = tagged.select("series", F.col("_c").alias("e")).distinct()
    a = chunks.select("series", F.col("e").alias("ta"))
    b = chunks.select("series", F.col("e").alias("tb"))
    tiles = a.join(b, "series").where(F.col("tb") >= F.col("ta"))
    rows_a = tiles.join(
        tagged.select("series", F.col("_e").alias("ta"), "pos", "h_s", "v"),
        ["series", "ta"],
    ).select("series", "ta", "tb", "pos", "h_s", "v", F.lit("a").alias("side"))
    rows_b = (
        tiles.where(F.col("tb") > F.col("ta"))
        .join(
            tagged.select("series", F.col("_e").alias("tb"), "pos", "h_s", "v"),
            ["series", "tb"],
        )
        .select("series", "ta", "tb", "pos", "h_s", "v", F.lit("b").alias("side"))
    )
    tile_rows = rows_a.unionByName(rows_b)

    schema = "series string, pos long, mp_dist long, nn_pos long"

    def tile_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        same = (pdf["ta"].iloc[0] == pdf["tb"].iloc[0])
        sa = pdf[pdf["side"] == "a"].sort_values("pos")
        va = sa["v"].to_numpy(np.int64)
        pa0 = int(sa["pos"].iloc[0]) if len(sa) else 0
        if same:
            pos, dist, nb = _tile_candidates(va, pa0, va, pa0, m, same=True)
        else:
            sb = pdf[pdf["side"] == "b"].sort_values("pos")
            vb = sb["v"].to_numpy(np.int64)
            pb0 = int(sb["pos"].iloc[0]) if len(sb) else 0
            pos, dist, nb = _tile_candidates(va, pa0, vb, pb0, m)
        return pd.DataFrame(
            {
                "series": pdf["series"].iloc[0],
                "pos": pos,
                "mp_dist": dist,
                "nn_pos": nb,
            }
        )

    # Tile rows are KILOBYTES but tiles are compute-heavy: AQE's
    # partition coalescing sees a tiny shuffle and would squeeze the
    # Arrow stage into 1-2 tasks, serializing the O(chunk^2) kernels.
    # A user repartition on the group keys pins the parallelism (AQE
    # honors explicit numPartitions) and already satisfies the
    # groupBy's ClusteredDistribution, so no second shuffle appears.
    par = points.sparkSession.sparkContext.defaultParallelism
    cands = (
        tile_rows.repartition(par, "series", "ta", "tb")
        .groupBy("series", "ta", "tb")
        .applyInPandas(tile_fn, schema)
    )
    merged = cands.groupBy("series", "pos").agg(
        F.min(F.struct("mp_dist", "nn_pos")).alias("best")
    )
    starts = points.select(
        "series", F.col("pos").cast("long").alias("pos"), "h_s"
    )
    return (
        merged.join(starts, ["series", "pos"])
        .select(
            "series",
            F.col("pos").cast("int").alias("pos"),
            F.col("h_s").alias("ws_s"),
            F.col("best.mp_dist").alias("mp_dist"),
            F.col("best.nn_pos").cast("int").alias("nn_pos"),
        )
    )
