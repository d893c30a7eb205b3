"""Iterative graph analytics over event streams: integer-exact
PageRank on the user "handoff" interaction graph.

The graph is derived from the events table itself — an edge
``u -> v`` for every pair of CONSECUTIVE events (by ``ts``, tie-broken
by ``event_id``) within one calendar day, weighted by occurrence
count.  Day-partitioning keeps graph construction shuffle-local (one
window sort per day partition, never a global sort) and drops only
the single cross-midnight handoff per day.

PageRank runs a FIXED number of power iterations in pure BIGINT
arithmetic: ranks are scaled by 1e9 and every mass transfer is a
floor division

    rank'(v) = (15 * SCALE) div 100
             + sum over in-edges (rank(u) * 85 * w_uv) div (100 * W_u)

so the result is bit-reproducible across engines, partitionings and
re-runs (IEEE summation order can never matter — there are no
floats).  Dangling mass (users whose events are always last-of-day)
is deliberately dropped, the standard "sink mass leaks" simplification;
the ORDERING of ranks is unaffected for fixed iteration count.

Scale shape: each iteration is one shuffle equi-join (ranks x edges
on src, both pre-partitionable on the join key) plus one hash-agg by
dst — the textbook distributed PageRank step.  Edges are computed
once and reused; at 10^12-edge scale persist them and
``localCheckpoint`` the rank frame every few iterations exactly like
``textops.lsh_components`` does for label propagation (rank * 85 * w
rides DECIMAL(38,0) there; BIGINT headroom here is ample:
rank <= |V| * 1e9, * 85 * w stays well under 2^63 at test scales).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

SCALE = 1_000_000_000
TELEPORT = 15 * SCALE // 100  # 0.15 * SCALE, exact


def handoff_edges(events: DataFrame) -> DataFrame:
    """(src, dst, w) weighted edges from same-day consecutive events."""
    w = Window.partitionBy("d").orderBy("ts", "event_id")
    ordered = events.select(
        "event_id", "ts", "user_id", F.to_date("ts").alias("d")
    )
    raw = ordered.select(
        F.lag("user_id").over(w).alias("src"), F.col("user_id").alias("dst")
    ).where(F.col("src").isNotNull())
    return raw.groupBy("src", "dst").agg(
        F.count(F.lit(1)).cast("long").alias("w")
    )


def pagerank_integer(
    nodes: DataFrame, edges: DataFrame, iters: int = 5
) -> DataFrame:
    """Fixed-``iters`` integer power iteration; returns
    (user_id, rank) with rank on the 1e9 scale."""
    # edges feeds both sides of the out-degree join; persist so the
    # day-window construction subtree materializes exactly once
    edges = edges.persist()
    outdeg = edges.groupBy("src").agg(F.sum("w").cast("long").alias("wtot"))
    # every iteration re-references the edge and node frames; without a
    # persist Catalyst inlines the whole construction subtree (raw scan
    # + window + aggs) once PER iteration — 10 rescans for K=5.  Persist
    # is lazy (no action here); at 10^12-edge scale use StorageLevel
    # DISK_ONLY + localCheckpoint of the rank frame every few rounds.
    e = edges.join(outdeg, "src").persist()
    nodes = nodes.persist()
    ranks = nodes.select("user_id", F.lit(SCALE).cast("long").alias("rank"))
    for _ in range(iters):
        contrib = (
            e.join(ranks, e["src"] == ranks["user_id"])
            .select(
                F.col("dst"),
                F.expr("(rank * 85 * w) div (100 * wtot)").alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").cast("long").alias("s"))
        )
        ranks = nodes.join(
            contrib, nodes["user_id"] == contrib["dst"], "left"
        ).select(
            "user_id",
            (F.lit(TELEPORT) + F.coalesce(F.col("s"), F.lit(0)))
            .cast("long")
            .alias("rank"),
        )
    return ranks


def pagerank_handoff_sql(iters: int = 5) -> str:
    """DuckDB twin: the same integer iteration as chained CTEs."""
    steps = []
    for i in range(iters):
        steps.append(
            f"""r{i + 1} AS (
  SELECT n.user_id,
         ({TELEPORT} + coalesce(c.s, 0))::BIGINT AS pr
  FROM nodes n LEFT JOIN (
    SELECT e.dst, sum((r.pr * 85 * e.w) // (100 * e.wtot))::BIGINT AS s
    FROM e JOIN r{i} r ON r.user_id = e.src GROUP BY e.dst
  ) c ON c.dst = n.user_id)"""
        )
    chain = ",\n".join(steps)
    return f"""
WITH ordered AS (
  SELECT event_id, ts, user_id, date_trunc('day', ts) AS d FROM events),
raw AS (
  SELECT lag(user_id) OVER (PARTITION BY d ORDER BY ts, event_id) AS src,
         user_id AS dst
  FROM ordered),
edges AS (SELECT src, dst, count(*)::BIGINT AS w
          FROM raw WHERE src IS NOT NULL GROUP BY 1, 2),
outdeg AS (SELECT src, sum(w)::BIGINT AS wtot FROM edges GROUP BY 1),
e AS (SELECT edges.src, edges.dst, edges.w, o.wtot
      FROM edges JOIN outdeg o USING (src)),
nodes AS (SELECT DISTINCT user_id FROM events),
r0 AS (SELECT user_id, {SCALE}::BIGINT AS pr FROM nodes),
{chain}
SELECT user_id, pr AS rank_scaled FROM r{iters}
"""
