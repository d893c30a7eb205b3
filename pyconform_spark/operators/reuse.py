"""Exact LRU stack-distance (reuse-distance) computation.

Mattson et al. (IBM Systems Journal, 1970) stack analysis: the access
at position ``p`` whose same-key previous access was at ``q`` has
stack distance ``1 + (# distinct OTHER keys touched in (q, p))``.

The naive in-between count is Θ(Σ gap lengths) — measured 280 s at
sf0.1 and super-linear beyond (the r5 bench-scale sweep's finding).
This module computes it in O(n log² n) with fully VECTORIZED numpy via
the interval decomposition

    d(target) = cover(p) − span(target)

over the per-key REUSE INTERVALS (q, nq) (nq = next same-key access,
or the n+1 sentinel for a key's final access):

* ``cover(p)``   = #{intervals with q < p <= nq} — every key with a
  pending reuse crossing ``p``; two sorted-rank lookups
  (``searchsorted`` on the q and nq arrays);
* ``span(T)``    = #{intervals with q_I <= q_T and nq_I >= nq_T} —
  keys whose pending reuse BRACKETS the whole target gap (they cross
  ``p`` without being touched inside the gap, so cover over-counts
  them; the target's own interval brackets itself, giving the +1).
  Positions are distinct, so after sorting intervals by q this is
  "count of previous elements with nq >= mine" — inversion counting,
  done bottom-up mergesort-style with per-level vectorized
  ``argsort`` + offset-``searchsorted`` (no per-element Python loop).

The global (ts, event_id) total order is the operation's input
contract, so the counting host is one Arrow partition — reuse
distance against a SINGLE shared LRU is inherently a sequential-order
problem.  At 100 TB you shard by cache instance (tenant / cache node)
and run this per shard; each shard's log is exactly this routine.
"""

from __future__ import annotations

import numpy as np


def count_prev_geq(a: np.ndarray) -> np.ndarray:
    """For each t: #{i < t : a[i] >= a[t]} — mergesort inversion
    counting, vectorized per level (O(n log^2 n), no element loop)."""
    n = len(a)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    p = 1
    while p < n:
        p *= 2
    # pad with a value smaller than everything (positions are >= 1)
    vals = np.full(p, -1, dtype=np.int64)
    vals[:n] = a
    perm = np.full(p, -1, dtype=np.int64)
    perm[:n] = np.arange(n)
    cnt = np.zeros(n, dtype=np.int64)
    big = np.int64(1) << 42  # > any position value
    w = 1
    while w < p:
        rows = p // (2 * w)
        bv = vals.reshape(rows, 2 * w)
        bp = perm.reshape(rows, 2 * w)
        left_v, right_v = bv[:, :w], bv[:, w:]
        right_p = bp[:, w:]
        # per-row searchsorted via the row-offset flattening trick:
        # each left row is sorted; offsetting row r by r*big keeps the
        # flattened array globally sorted
        offs = (np.arange(rows, dtype=np.int64) * big)[:, None]
        flat_left = (left_v + offs).ravel()
        flat_q = (right_v + offs).ravel()
        pos = np.searchsorted(flat_left, flat_q, side="left")
        lt = pos - (np.arange(rows, dtype=np.int64) * w).repeat(w)
        geq = (w - lt).reshape(rows, w)
        # padding on the left counts nothing (-1 < everything real);
        # padded right slots are masked out by perm == -1
        tgt = right_p.ravel()
        ok = tgt >= 0
        np.add.at(cnt, tgt[ok], geq.ravel()[ok])
        # merge: keep each 2w block sorted by value, perm in tow
        order = np.argsort(bv, axis=1, kind="stable")
        vals = np.take_along_axis(bv, order, axis=1).ravel()
        perm = np.take_along_axis(bp, order, axis=1).ravel()
        w *= 2
    return cnt


def stack_distances(q: np.ndarray, nq: np.ndarray, n_pos: int) -> np.ndarray:
    """Stack distance for every FINITE-nq interval (one per non-first
    access, the access AT position nq), in the given interval order.
    ``q``/``nq`` cover ALL accesses (finals carry nq = n_pos + 1)."""
    order = np.argsort(q, kind="stable")
    qs = q[order]
    nqs = nq[order]
    span_sorted = 1 + count_prev_geq(nqs)
    # cover(p) = #{q < p} - #{nq < p}; q is sorted already
    nq_sorted = np.sort(nq)
    fin = nqs <= n_pos
    p = nqs[fin]
    cover = np.searchsorted(qs, p, side="left") - np.searchsorted(
        nq_sorted, p, side="left"
    )
    d = cover - span_sorted[fin]
    # back to input order of the finite intervals
    out = np.empty(len(q), dtype=np.int64)
    out.fill(-1)
    idx_fin = order[fin]
    out[idx_fin] = d + 1  # stack distance = distinct-in-between + 1
    return out  # -1 marks a key's final access (no target at its nq)
