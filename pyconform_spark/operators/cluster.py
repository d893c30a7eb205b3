"""Iterative clustering over the embeddings table: integer-exact
Lloyd's k-means.

Why integer: like ``operators.graph.pagerank_integer``, the iteration
runs entirely in BIGINT so the result is bit-reproducible across
engines, partitionings and re-runs — float centroid means depend on
IEEE summation order, which no distributed engine pins.  Embedding
components are quantized to ``floor(x * 1e6)`` (the same lattice
``simsearch`` uses), distances are exact squared-L2 sums, and centroid
updates are TRUNCATED integer means ``sum div count`` (Spark ``div``
and DuckDB ``//`` share truncate-toward-zero semantics — verified).

Algorithm per iteration (fixed ``iters``, no convergence action):

1. **Assign** — zero-shuffle: the k centroids collapse to ONE row
   holding ``array<struct<cid,c>>`` (k is tiny), broadcast-crossed
   into the corpus scan; each vector picks
   ``array_min(transform(cents, s -> struct(l2sq(q, s.c), s.cid)))``
   — lexicographic struct min = nearest centroid, ties to the lowest
   cid, order-independent.  The corpus is scanned once per iteration
   with NO shuffle and no per-row Python.
2. **Update** — one map-side-combinable shuffle: ``posexplode`` the
   assigned vectors to (cid, pos, v) and hash-aggregate sum/count by
   (cid, pos) — at most ``k * dim`` groups leave the combiners, so
   the shuffle payload is O(partitions * k * dim) regardless of
   corpus size.  Clusters that lose every member keep their previous
   centroid (left-join + coalesce), so the centroid frame stays
   exactly k rows.

Seeds are stride-spread (``vec_id % stride == 0``, first k) — spread
through the id space without a plan-time ``count()`` action, the same
trick ``simsearch.ivf_topk`` uses for its cell seeds.

Scale shape at 10^12 rows: per iteration = one broadcast (k rows) +
one corpus scan + one combiner-bounded agg; centroid frames are k
rows and never grow.  Persist the quantized corpus once; k-means++
style seeding would add one pass, not change the loop.

Reference parity note: the reference has no clustering operator —
this extends the engine for LLM-corpus curation (cluster-balanced
sampling, embedding-space diagnostics), same motivation as
``textops``/``simsearch`` (cf. reference's per-variable pipeline
scope, ``source/pyconform/dataflow.py:42-98``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# same quantization lattice as simsearch (kept local: simsearch
# registers this module's oracle, so importing it back would cycle)
QUANT = 1_000_000
QUANT_SQL = "list_transform({c}, x -> floor(x::DOUBLE * 1000000)::BIGINT)"

STRIDE = 61  # seed spread; k*STRIDE must stay under the corpus size


def quantized(c: Column) -> Column:
    """array<float> -> array<long>: floor(x*1e6) per component."""
    return F.transform(
        c, lambda x: F.floor(x.cast("double") * QUANT).cast("long")
    )


def _l2sq(a: Column, b: Column) -> Column:
    """Exact squared L2 distance between two array<long> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def _assign(codes: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest-centroid assignment, zero shuffle on the corpus side."""
    cents_row = cents.agg(
        F.collect_list(F.struct("cid", "c")).alias("cents")
    )
    m = F.array_min(
        F.transform(
            "cents",
            lambda s: F.struct(
                _l2sq(F.col("q"), s["c"]).alias("dist"),
                s["cid"].alias("cid"),
            ),
        )
    )
    return codes.crossJoin(F.broadcast(cents_row)).select(
        "vec_id",
        "q",
        m["cid"].alias("cid"),
        m["dist"].alias("dist"),
    )


def kmeans_centroids(
    emb: DataFrame, k: int = 8, iters: int = 3, stride: int = STRIDE
) -> tuple[DataFrame, DataFrame]:
    """The Lloyd iteration shared by kmeans_integer and
    silhouette_kmeans: returns (codes, final centroid frame)."""
    codes = emb.select(
        "vec_id", quantized(F.col("embedding")).alias("q")
    )
    cents = codes.where(
        (F.col("vec_id") % stride == 0) & (F.col("vec_id") < k * stride)
    ).select(
        (F.col("vec_id") / stride).cast("int").alias("cid"),
        F.col("q").alias("c"),
    )
    for _ in range(iters):
        assigned = _assign(codes, cents)
        sums = (
            assigned.select(
                "cid", F.posexplode("q").alias("pos", "v")
            )
            .groupBy("cid", "pos")
            .agg(
                F.sum("v").cast("long").alias("s"),
                F.count(F.lit(1)).cast("long").alias("cnt"),
            )
        )
        newc = (
            sums.select(
                "cid", "pos", F.expr("s div cnt").alias("v")
            )
            .groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "v"))),
                    lambda s: s["v"],
                ).alias("c_new")
            )
        )
        # the k-row centroid frame is referenced twice next round (as
        # the assignment broadcast and as the empty-cluster fallback);
        # a lazy persist stops the lineage subtree doubling per round
        # — exactly graph.pagerank_integer's edge-frame discipline
        cents = (
            cents.join(newc, "cid", "left")
            .select(
                "cid",
                F.coalesce("c_new", "c").alias("c"),
            )
            .persist()
        )
    return codes, cents


def kmeans_integer(
    emb: DataFrame, k: int = 8, iters: int = 3, stride: int = STRIDE
) -> DataFrame:
    """Fixed-``iters`` integer Lloyd's k-means over the ``embedding``
    column; returns (vec_id, cluster, dist_sq) for every vector."""
    codes, cents = kmeans_centroids(emb, k, iters, stride)
    final = _assign(codes, cents)
    return final.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("cid").cast("int").alias("cluster"),
        F.col("dist").cast("long").alias("dist_sq"),
    )


def silhouette_kmeans(
    emb: DataFrame, k: int = 8, iters: int = 3, stride: int = STRIDE
) -> DataFrame:
    """Per-cluster SIMPLIFIED silhouette (Rousseeuw 1987 silhouette
    with centroid distances standing in for mean pairwise distances —
    the standard large-n variant, public literature) over the same
    deterministic integer k-means: a = distance to the OWN centroid,
    b = distance to the nearest OTHER centroid,
    s = (b - a)/max(a, b) in [-1, 1]; s near 1 = tight cluster, near
    0 = boundary points, negative = misassigned.

    EXACT cross-engine: centroid distances are exact BIGINT squared
    L2 on the quantized grid; sqrt is IEEE-correctly-rounded; each
    vector's score quantizes to the integer floor(10000*s) BEFORE
    aggregation, so the per-cluster mean is an ORDER-FREE BIGINT sum
    divided once — no pinned fold needed even at corpus scale.  Ties
    in the nearest/second-nearest pick break on (dist, cid) in both
    engines.

    Scale shape: the k-row centroid frame broadcasts; each vector
    computes its k distances in one projection; one hash aggregate to
    k result rows.  The corpus never shuffles."""
    codes, cents = kmeans_centroids(emb, k, iters, stride)
    cents_row = cents.agg(
        F.collect_list(F.struct("cid", "c")).alias("cents")
    )
    dists = F.transform(
        "cents",
        lambda s: F.struct(
            _l2sq(F.col("q"), s["c"]).alias("dist"),
            s["cid"].alias("cid"),
        ),
    )
    st1 = codes.crossJoin(F.broadcast(cents_row)).select(
        "vec_id", "q", dists.alias("dists")
    )
    st2 = st1.select(
        "vec_id",
        F.array_min("dists").alias("own"),
        "dists",
    )
    b = F.array_min(
        F.filter("dists", lambda s: s["cid"] != F.col("own.cid"))
    )["dist"]
    sa = F.sqrt(F.col("own.dist").cast("double"))
    sb = F.sqrt(b.cast("double"))
    s_q = F.when(F.greatest(sa, sb) == 0.0, F.lit(0).cast("long")).otherwise(
        F.floor(F.lit(10000.0) * (sb - sa) / F.greatest(sa, sb)).cast("long")
    )
    st3 = st2.select(
        F.col("own.cid").alias("cluster"),
        s_q.alias("s_q"),
    )
    agg = st3.groupBy("cluster").agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        F.sum("s_q").cast("long").alias("s_sum"),
        F.min("s_q").cast("long").alias("s_min_q"),
    )
    return agg.select(
        F.col("cluster").cast("int").alias("cluster"),
        "n_vectors",
        (
            F.col("s_sum").cast("double")
            / (F.lit(10000.0) * F.col("n_vectors").cast("double"))
        ).alias("mean_silhouette"),
        (F.col("s_min_q").cast("double") / 10000.0).alias("worst_silhouette"),
    )


def silhouette_kmeans_sql(k: int = 8, iters: int = 3) -> str:
    """DuckDB twin of silhouette_kmeans: the same centroid chain, then
    per-vector nearest/second-nearest by (dist, cid) and the quantized
    score."""
    q = QUANT_SQL.format(c="embedding")
    dist = (
        "list_sum(list_transform(generate_series(1, len(a.q)), "
        "j -> (a.q[j] - c.c[j]) * (a.q[j] - c.c[j])))"
    )
    steps = []
    for i in range(iters):
        steps.append(
            f"""a{i} AS (
  SELECT vec_id, q, cid, dist FROM (
    SELECT a.vec_id, a.q, c.cid, {dist} AS dist,
           row_number() OVER (PARTITION BY a.vec_id
                              ORDER BY {dist}, c.cid) AS rn
    FROM codes a, c{i} c) WHERE rn = 1),
s{i} AS (
  SELECT cid, generate_subscripts(q, 1) AS pos, unnest(q) AS v
  FROM a{i}),
m{i} AS (
  SELECT cid, list(s // cnt ORDER BY pos) AS c_new FROM (
    SELECT cid, pos, sum(v)::BIGINT AS s, count(*)::BIGINT AS cnt
    FROM s{i} GROUP BY 1, 2) GROUP BY cid),
c{i + 1} AS (
  SELECT p.cid, coalesce(n.c_new, p.c) AS c
  FROM c{i} p LEFT JOIN m{i} n USING (cid))"""
        )
    chain = ",\n".join(steps)
    return f"""
WITH codes AS (SELECT vec_id, {q} AS q FROM embeddings),
c0 AS (
  SELECT (vec_id // {STRIDE})::INT AS cid, q AS c FROM codes
  WHERE vec_id % {STRIDE} = 0 AND vec_id < {k * STRIDE}),
{chain},
ranked AS (
  SELECT a.vec_id, c.cid, {dist} AS dist,
         row_number() OVER (PARTITION BY a.vec_id
                            ORDER BY {dist}, c.cid) AS rn
  FROM codes a, c{iters} c),
ab AS (
  SELECT vec_id,
         max(CASE WHEN rn = 1 THEN cid END) AS cluster,
         max(CASE WHEN rn = 1 THEN dist END)::BIGINT AS a,
         max(CASE WHEN rn = 2 THEN dist END)::BIGINT AS b
  FROM ranked WHERE rn <= 2 GROUP BY 1),
scored AS (
  SELECT cluster,
         CASE WHEN greatest(sqrt(a::DOUBLE), sqrt(b::DOUBLE)) = 0.0
              THEN 0::BIGINT
              ELSE floor(10000.0 * (sqrt(b::DOUBLE) - sqrt(a::DOUBLE))
                         / greatest(sqrt(a::DOUBLE), sqrt(b::DOUBLE)))
                   ::BIGINT END AS s_q
  FROM ab)
SELECT cluster::INT AS cluster, count(*)::BIGINT AS n_vectors,
       sum(s_q)::BIGINT::DOUBLE / (10000.0 * count(*)::DOUBLE)
         AS mean_silhouette,
       min(s_q)::DOUBLE / 10000.0 AS worst_silhouette
FROM scored GROUP BY 1
"""


def kmeans_embeddings_sql(k: int = 8, iters: int = 3) -> str:
    """DuckDB twin: the same integer iteration as chained CTEs."""
    q = QUANT_SQL.format(c="embedding")
    dist = (
        "list_sum(list_transform(generate_series(1, len(a.q)), "
        "j -> (a.q[j] - c.c[j]) * (a.q[j] - c.c[j])))"
    )
    steps = []
    for i in range(iters):
        steps.append(
            f"""a{i} AS (
  SELECT vec_id, q, cid, dist FROM (
    SELECT a.vec_id, a.q, c.cid, {dist} AS dist,
           row_number() OVER (PARTITION BY a.vec_id
                              ORDER BY {dist}, c.cid) AS rn
    FROM codes a, c{i} c) WHERE rn = 1),
s{i} AS (
  SELECT cid, generate_subscripts(q, 1) AS pos, unnest(q) AS v
  FROM a{i}),
m{i} AS (
  SELECT cid, list(s // cnt ORDER BY pos) AS c_new FROM (
    SELECT cid, pos, sum(v)::BIGINT AS s, count(*)::BIGINT AS cnt
    FROM s{i} GROUP BY 1, 2) GROUP BY cid),
c{i + 1} AS (
  SELECT p.cid, coalesce(n.c_new, p.c) AS c
  FROM c{i} p LEFT JOIN m{i} n USING (cid))"""
        )
    chain = ",\n".join(steps)
    return f"""
WITH codes AS (SELECT vec_id, {q} AS q FROM embeddings),
c0 AS (
  SELECT (vec_id // {STRIDE})::INT AS cid, q AS c FROM codes
  WHERE vec_id % {STRIDE} = 0 AND vec_id < {k * STRIDE}),
{chain},
afin AS (
  SELECT vec_id, cid, dist FROM (
    SELECT a.vec_id, c.cid, {dist} AS dist,
           row_number() OVER (PARTITION BY a.vec_id
                              ORDER BY {dist}, c.cid) AS rn
    FROM codes a, c{iters} c) WHERE rn = 1)
SELECT vec_id::BIGINT AS vec_id, cid::INT AS cluster,
       dist::BIGINT AS dist_sq
FROM afin
"""


def calinski_harabasz(
    emb: DataFrame, k: int = 8, iters: int = 3, stride: int = STRIDE
) -> DataFrame:
    """Calinski-Harabasz variance-ratio index (Calinski & Harabasz
    1974, public literature) over the same deterministic integer
    k-means: CH = (B/(k_used-1)) / (W/(n-k_used)) with W the total
    within-cluster squared distance and B = sum_i n_i * ||c_i -
    c_bar||^2 — higher = tighter, better-separated clusters.  The
    entirely-integer companion of silhouette_kmeans: no sqrt anywhere.

    EXACT cross-engine: W sums the exact BIGINT squared distances the
    assignment already computes; the grand centroid c_bar uses the
    same element-wise integer division (s div n) as the Lloyd update;
    B is BIGINT; CH is one fixed double expression with NULLIF guards
    for the degenerate one-cluster / n==k cases.

    Scale shape: one assignment pass (centroids broadcast), two hash
    aggregates (per-cluster, global), a k-row frame for B."""
    codes, cents = kmeans_centroids(emb, k, iters, stride)
    assigned = _assign(codes, cents)
    per_cluster = assigned.groupBy("cid").agg(
        F.count(F.lit(1)).cast("long").alias("n_i"),
        F.sum("dist").cast("long").alias("w_i"),
    )
    gmean = (
        codes.select(F.posexplode("q").alias("pos", "v"))
        .groupBy("pos")
        .agg(
            F.sum("v").cast("long").alias("s"),
            F.count(F.lit(1)).cast("long").alias("cnt"),
        )
        .select("pos", F.expr("s div cnt").alias("v"))
        .groupBy()
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "v"))),
                lambda t: t["v"],
            )
            .cast("array<long>")
            .alias("cbar"),
        )
    )
    withb = (
        per_cluster.join(cents, "cid")
        .crossJoin(F.broadcast(gmean))
        .select(
            "cid",
            "n_i",
            "w_i",
            (F.col("n_i") * _l2sq(F.col("c"), F.col("cbar")))
            .cast("long")
            .alias("b_i"),
        )
    )
    gall = withb.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("k_used"),
        F.sum("n_i").cast("long").alias("n"),
        F.sum("w_i").cast("long").alias("w"),
        F.sum("b_i").cast("long").alias("b"),
    )
    kd = F.col("k_used").cast("double")
    nd = F.col("n").cast("double")
    return gall.filter(F.col("k_used") >= 2).select(
        "k_used",
        "n",
        "w",
        "b",
        (
            (F.col("b").cast("double") / (kd - F.lit(1.0)))
            / F.nullif(F.col("w").cast("double") / (nd - kd), F.lit(0.0))
        ).alias("ch_index"),
    )


def calinski_harabasz_sql(k: int = 8, iters: int = 3) -> str:
    """DuckDB twin of calinski_harabasz: same centroid chain, same
    integer grand centroid (s // n matches Spark's `div` truncation),
    same BIGINT W/B."""
    q = QUANT_SQL.format(c="embedding")
    dist = (
        "list_sum(list_transform(generate_series(1, len(a.q)), "
        "j -> (a.q[j] - c.c[j]) * (a.q[j] - c.c[j])))"
    )
    steps = []
    for i in range(iters):
        steps.append(
            f"""a{i} AS (
  SELECT vec_id, q, cid, dist FROM (
    SELECT a.vec_id, a.q, c.cid, {dist} AS dist,
           row_number() OVER (PARTITION BY a.vec_id
                              ORDER BY {dist}, c.cid) AS rn
    FROM codes a, c{i} c) WHERE rn = 1),
s{i} AS (
  SELECT cid, generate_subscripts(q, 1) AS pos, unnest(q) AS v
  FROM a{i}),
m{i} AS (
  SELECT cid, list(s // cnt ORDER BY pos) AS c_new FROM (
    SELECT cid, pos, sum(v)::BIGINT AS s, count(*)::BIGINT AS cnt
    FROM s{i} GROUP BY 1, 2) GROUP BY cid),
c{i + 1} AS (
  SELECT p.cid, coalesce(n.c_new, p.c) AS c
  FROM c{i} p LEFT JOIN m{i} n USING (cid))"""
        )
    chain = ",\n".join(steps)
    return f"""
WITH codes AS (SELECT vec_id, {q} AS q FROM embeddings),
c0 AS (
  SELECT (vec_id // {STRIDE})::INT AS cid, q AS c FROM codes
  WHERE vec_id % {STRIDE} = 0 AND vec_id < {k * STRIDE}),
{chain},
afin AS (
  SELECT vec_id, cid, dist FROM (
    SELECT a.vec_id, c.cid, {dist} AS dist,
           row_number() OVER (PARTITION BY a.vec_id
                              ORDER BY {dist}, c.cid) AS rn
    FROM codes a, c{iters} c) WHERE rn = 1),
per_cluster AS (
  SELECT cid, count(*)::BIGINT AS n_i, sum(dist)::BIGINT AS w_i
  FROM afin GROUP BY 1),
gmean AS (
  SELECT list(s // cnt ORDER BY pos) AS cbar FROM (
    SELECT pos, sum(v)::BIGINT AS s, count(*)::BIGINT AS cnt FROM (
      SELECT generate_subscripts(q, 1) AS pos, unnest(q) AS v
      FROM codes)
    GROUP BY 1)),
withb AS (
  SELECT p.cid, p.n_i, p.w_i,
         (p.n_i * list_sum(list_transform(
            generate_series(1, len(c.c)),
            j -> (c.c[j] - g.cbar[j]) * (c.c[j] - g.cbar[j]))))::BIGINT
           AS b_i
  FROM per_cluster p
  JOIN c{iters} c USING (cid)
  CROSS JOIN gmean g),
gall AS (
  SELECT count(*)::BIGINT AS k_used, sum(n_i)::BIGINT AS n,
         sum(w_i)::BIGINT AS w, sum(b_i)::BIGINT AS b
  FROM withb)
SELECT k_used, n, w, b,
       (b::DOUBLE / (k_used::DOUBLE - 1.0))
         / nullif(w::DOUBLE / (n::DOUBLE - k_used::DOUBLE), 0.0)
         AS ch_index
FROM gall WHERE k_used >= 2
"""
