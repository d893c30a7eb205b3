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


def undirected_edges(edges: DataFrame) -> DataFrame:
    """Distinct undirected (u < v) edges from the weighted digraph."""
    u = F.least("src", "dst").alias("u")
    v = F.greatest("src", "dst").alias("v")
    return (
        edges.where(F.col("src") != F.col("dst")).select(u, v).distinct()
    )


def triangle_count(edges_uv: DataFrame) -> DataFrame:
    """Exact triangle counting by DEGREE-ORDERED wedge join — the
    standard shuffle-bounded formulation: orient every undirected edge
    from its lower-(degree, id) endpoint to the higher one, build
    wedges only at each vertex's oriented out-neighbors (so a vertex
    of degree d contributes at most C(d_out, 2) wedges with d_out
    bounded by orientation — the hub that breaks the naive algorithm
    generates almost none), and close each wedge with one hash
    semi-join against the oriented edge set.

    Returns one row: (n_triangles, n_vertices, n_edges) — all BIGINT,
    trivially bit-exact.  Scale shape: two hash-aggs (degrees), one
    self equi-join keyed on the wedge apex, one closure equi-join on
    the (lo, hi) edge key; no cartesian stage anywhere."""
    both = edges_uv.select(
        F.col("u").alias("a"), F.col("v").alias("b")
    ).union(edges_uv.select(F.col("v").alias("a"), F.col("u").alias("b")))
    deg = both.groupBy("a").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    d1 = deg.select(F.col("a").alias("u"), F.col("deg").alias("du"))
    d2 = deg.select(F.col("a").alias("v"), F.col("deg").alias("dv"))
    ranked = edges_uv.join(d1, "u").join(d2, "v")
    oriented = ranked.select(
        F.when(
            (F.col("du") < F.col("dv"))
            | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
            F.struct(F.col("u").alias("lo"), F.col("v").alias("hi")),
        )
        .otherwise(F.struct(F.col("v").alias("lo"), F.col("u").alias("hi")))
        .alias("e")
    ).select(F.col("e.lo").alias("lo"), F.col("e.hi").alias("hi"))
    w1 = oriented.select(F.col("lo").alias("apex"), F.col("hi").alias("x"))
    w2 = oriented.select(F.col("lo").alias("apex"), F.col("hi").alias("y"))
    wedges = w1.join(w2, "apex").where(F.col("x") < F.col("y"))
    closed = wedges.join(
        edges_uv.select(
            F.col("u").alias("x2"), F.col("v").alias("y2")
        ),
        (F.col("x") == F.col("x2")) & (F.col("y") == F.col("y2")),
    )
    tri = closed.agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    nv = both.select("a").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("n_vertices")
    )
    ne = edges_uv.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    return tri.crossJoin(F.broadcast(nv)).crossJoin(F.broadcast(ne))


def triangle_count_sql() -> str:
    return """
WITH ordered AS (
  SELECT event_id, ts, user_id, date_trunc('day', ts) AS d FROM events),
raw AS (
  SELECT lag(user_id) OVER (PARTITION BY d ORDER BY ts, event_id) AS src,
         user_id AS dst
  FROM ordered),
euv AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
        FROM raw WHERE src IS NOT NULL AND src <> dst),
both_dir AS (SELECT u AS a, v AS b FROM euv
             UNION ALL SELECT v AS a, u AS b FROM euv),
deg AS (SELECT a, count(*)::BIGINT AS deg FROM both_dir GROUP BY a),
oriented AS (
  SELECT CASE WHEN d1.deg < d2.deg OR (d1.deg = d2.deg AND e.u < e.v)
              THEN e.u ELSE e.v END AS lo,
         CASE WHEN d1.deg < d2.deg OR (d1.deg = d2.deg AND e.u < e.v)
              THEN e.v ELSE e.u END AS hi
  FROM euv e JOIN deg d1 ON d1.a = e.u JOIN deg d2 ON d2.a = e.v),
wedges AS (
  SELECT w1.hi AS x, w2.hi AS y
  FROM oriented w1 JOIN oriented w2 ON w1.lo = w2.lo AND w1.hi < w2.hi),
closed AS (
  SELECT 1 FROM wedges JOIN euv ON euv.u = wedges.x AND euv.v = wedges.y)
SELECT (SELECT count(*)::BIGINT FROM closed) AS n_triangles,
       (SELECT count(DISTINCT a)::BIGINT FROM both_dir) AS n_vertices,
       (SELECT count(*)::BIGINT FROM euv) AS n_edges
"""


def khop_distances(
    nodes: DataFrame, edges_uv: DataFrame, k: int = 3, seed_mod: int = 50
) -> DataFrame:
    """Multi-source BFS: minimum hop distance (0..k) from the seed set
    {user_id % seed_mod == 0} over the undirected graph; users beyond
    k hops are absent.  The blast-radius / influence-reach primitive.

    Pure frontier expansion: round i joins ONLY the dist == i-1
    frontier against the adjacency list (never the full visited set),
    then folds with min — each round is one shuffle equi-join + one
    hash-agg, and rounds are FIXED at k, so the whole query is k
    equi-joins deep with the adjacency frame persisted once.  All
    values BIGINT; bit-exact by construction."""
    # the union references edges_uv twice; persist it first so the
    # window-based construction subtree materializes exactly once
    edges_uv = edges_uv.persist()
    adj = (
        edges_uv.select(F.col("u").alias("a"), F.col("v").alias("b"))
        .union(edges_uv.select(F.col("v").alias("a"), F.col("u").alias("b")))
        .persist()
    )
    dist = nodes.where((F.col("user_id") % seed_mod) == 0).select(
        "user_id", F.lit(0).cast("long").alias("dist")
    )
    for i in range(1, k + 1):
        frontier = dist.where(F.col("dist") == i - 1)
        step = frontier.join(
            adj, frontier["user_id"] == adj["a"]
        ).select(F.col("b").alias("user_id"), F.lit(i).cast("long").alias("dist"))
        dist = (
            dist.unionByName(step)
            .groupBy("user_id")
            .agg(F.min("dist").cast("long").alias("dist"))
            # persist per round: without it round i re-derives rounds
            # 1..i-1 inside its own plan (quadratic join blow-up); at
            # real scale swap for localCheckpoint every few rounds to
            # also truncate lineage
            .persist()
        )
    return dist


def khop_distances_sql(k: int = 3, seed_mod: int = 50) -> str:
    steps = []
    for i in range(1, k + 1):
        steps.append(
            f"""d{i} AS (
  SELECT user_id, min(dist)::BIGINT AS dist FROM (
    SELECT user_id, dist FROM d{i - 1}
    UNION ALL
    SELECT adj.b AS user_id, r.dist + 1 AS dist
    FROM d{i - 1} r JOIN adj ON adj.a = r.user_id
    WHERE r.dist = {i - 1}
  ) GROUP BY user_id)"""
        )
    chain = ",\n".join(steps)
    return f"""
WITH ordered AS (
  SELECT event_id, ts, user_id, date_trunc('day', ts) AS d FROM events),
raw AS (
  SELECT lag(user_id) OVER (PARTITION BY d ORDER BY ts, event_id) AS src,
         user_id AS dst
  FROM ordered),
euv AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
        FROM raw WHERE src IS NOT NULL AND src <> dst),
adj AS (SELECT u AS a, v AS b FROM euv UNION ALL SELECT v AS a, u AS b FROM euv),
nodes AS (SELECT DISTINCT user_id FROM events),
d0 AS (SELECT user_id, 0::BIGINT AS dist FROM nodes
       WHERE user_id % {seed_mod} = 0),
{chain}
SELECT user_id, dist FROM d{k}
"""


def kcore(edges_uv: DataFrame, k: int = 2) -> DataFrame:
    """k-core (Seidman 1983) by CONVERGENT peeling: repeatedly drop
    nodes of degree < k until NO edge is removed, returning the
    surviving undirected (u, v) edge frame.  The production variant of
    the fixed-round peel in ``queries.kcore_membership``'s oracle —
    a fixed count silently returns a SUPERSET of the core on any graph
    whose peel is deeper than the count (a pendant chain peels one
    node per round), so the engine API loops to the fixpoint.

    Convergence is detected by the edge COUNT reaching a fixed point:
    a peeling round removes edges iff it removes a node, so equal
    counts <=> no node dropped <=> every remaining degree >= k.  The
    count is an O(1)-per-round action on the just-checkpointed frame.

    Scale shape: per round one hash agg (degrees) + two hash
    semi-joins, with the edge frame ``localCheckpoint``-ed every round
    (the ``textops.connected_components`` pattern) — each round
    references the previous frame five times, so without truncation
    the logical plan grows ~5x per round (a measured analyzer hang by
    round 8).  Total rounds are bounded by the peel depth (<= |V|;
    O(sqrt(|E|)) on real graphs), each round strictly shrinking the
    frame."""
    e = edges_uv
    prev: int | None = None
    while True:
        e = e.localCheckpoint()
        n = e.count()
        if n == 0 or n == prev:
            return e
        prev = n
        bidir = e.unionByName(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        keep = (
            bidir.groupBy("u")
            .agg(F.count(F.lit(1)).alias("d"))
            .where(F.col("d") >= k)
            .select("u")
        )
        e = e.join(keep, "u", "left_semi").join(
            keep.select(F.col("u").alias("v")), "v", "left_semi"
        )
