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
from pyspark.sql import DataFrame

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
