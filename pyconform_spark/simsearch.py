"""Similarity search over the ``embeddings`` table
(``vec_id:bigint, embedding:array<float>, label:int``).

Operators:

* brute-force cosine top-k  — the exactness baseline: broadcast the
  (small) query set against the full table; one scan, no shuffle of
  the big side.
* blocked near-dup pairs    — all-pairs cosine WITHIN a blocking key
  (label ≈ an IVF cell): the quadratic cost is bounded per block.
* LSH-bucketed near-dup pairs — the unlabeled-corpus variant: pairs
  sharing a bucket in any of T independent plane families, verified
  by exact cosine (precision 1.0, multi-table-amplified recall).
* random-hyperplane LSH ANN — the scale path: signed projections
  bucket each vector; candidates = same bucket; top-k within bucket.
  At 10^12 vectors the bucket join replaces the full scan.  Recall
  recovery at fine bucketing: multi-PROBE (query bucket + Hamming-1
  neighbors, Lv et al. VLDB'07) and multi-TABLE (independent plane
  families, union of candidates — Indyk-Motwani amplification).
* IVF ANN — stride-seeded coarse quantizer; cell count grows with the
  corpus, zero plan-time actions.

Cross-engine exactness (DuckDB oracle): floats are quantized to
integers — ``floor(x * 1e6)`` per component (float→double is exact,
the multiply and floor are identical IEEE ops in both engines) — so
dot products and norms are exact BIGINT sums; cosine is then the
double expression ``dot / sqrt(na) / sqrt(nb)`` evaluated in the same
order in both engines.  LSH plane weights are fixed integer constants
derived from md5 in *Python* and embedded as literals in both the
Spark plan and the oracle SQL.

Everything is built-in higher-order functions (``transform`` /
``zip_with`` / ``aggregate``) — JVM-side, no Python in the hot path.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, SparkSession, Window, functions as F

QUANT = 1_000_000  # component quantization scale
DIM = 64
N_PLANES = 8


def _md5_int(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[8:16], "little")


# deterministic integer hyperplanes, identical in Spark and SQL literals.
# MAX_PLANES bounds the pool; callers pick n_planes ≈ log2(N / B) for a
# target bucket size B — a table-design-time constant (like an Iceberg
# bucket count), NOT derived from a runtime count() of the corpus.
# Multi-table LSH slices disjoint plane families from the same pool.
# 128 planes supports up to 8 independent 16-plane tables.
MAX_PLANES = 128
PLANES: list[list[int]] = [
    [(_md5_int(f"plane-{p}-{d}") % 2001) - 1000 for d in range(DIM)]
    for p in range(MAX_PLANES)
]


# ------------------------------------------------------------ primitives
def quantized(c: Column) -> Column:
    """array<float> -> array<long>: floor(x*1e6) per component."""
    return F.transform(c, lambda x: F.floor(x.cast("double") * QUANT).cast("long"))


QUANT_SQL = "list_transform({c}, x -> floor(x::DOUBLE * 1000000)::BIGINT)"


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def sqnorm(a: Column) -> Column:
    return dot(a, a)


def _cosine(dot_c: Column, na: Column, nb: Column) -> Column:
    return (
        dot_c.cast("double")
        / F.sqrt(na.cast("double"))
        / F.sqrt(nb.cast("double"))
    )


COSINE_SQL = "({dot}::DOUBLE / sqrt(({na})::DOUBLE) / sqrt(({nb})::DOUBLE))"
DOT_SQL = (
    "list_sum(list_transform(generate_series(1, len({a})), i -> {a}[i]*{b}[i]))"
)


def _with_q(emb: DataFrame) -> DataFrame:
    q = quantized(F.col("embedding"))
    return emb.select(
        "vec_id", "label", q.alias("q"), sqnorm(q).alias("nq")
    )


# ------------------------------------------------------- brute force knn
def knn_bruteforce(
    emb: DataFrame, n_queries: int = 5, k: int = 10
) -> DataFrame:
    """Exact top-k cosine neighbors for query vectors (vec_id <
    n_queries): broadcast queries x full scan, window top-k.

    Scale: the big side is scanned once with no shuffle; the per-query
    top-k is a rank over a (tiny) n_queries-way partitioned window
    AFTER a pre-filter could cut candidates (none needed here).
    """
    base = _with_q(emb)
    queries = base.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("q").alias("qq"),
        F.col("nq").alias("qn"),
    )
    scored = (
        base.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            _cosine(dot(F.col("q"), F.col("qq")), F.col("nq"), F.col("qn")).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "vec_id",
            F.col("cosine").cast("double").alias("cosine"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def knn_bruteforce_sql(n_queries: int = 5, k: int = 10) -> str:
    q = QUANT_SQL.format(c="embedding")
    return f"""
WITH base AS (
  SELECT vec_id, label, {q} AS q,
         {DOT_SQL.format(a=q, b=q)} AS nq
  FROM embeddings
),
scored AS (
  SELECT b.vec_id AS query_id, a.vec_id AS vec_id,
         {COSINE_SQL.format(dot=DOT_SQL.format(a='a.q', b='b.q'),
                            na='a.nq', nb='b.nq')} AS cosine
  FROM base a, base b
  WHERE b.vec_id < {n_queries} AND a.vec_id <> b.vec_id
),
ranked AS (
  SELECT query_id, vec_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, vec_id, cosine::DOUBLE AS cosine, rank::INT AS rank
FROM ranked WHERE rank <= {k}
"""


# ------------------------------------------------- blocked near-dup pairs
def cosine_dup_pairs(
    emb: DataFrame, threshold: float = 0.8, max_id: int = 100_000
) -> DataFrame:
    """Near-duplicate vector pairs within each label block (label as
    the IVF-cell blocking key): all-pairs cost is bounded per block,
    the join is a hash join on label, and skewed blocks split under
    AQE."""
    base = _with_q(emb).where(F.col("vec_id") < max_id)
    a = base.select(
        F.col("label").alias("l"),
        F.col("vec_id").alias("id_a"),
        F.col("q").alias("qa"),
        F.col("nq").alias("na"),
    )
    b = base.select(
        F.col("label").alias("l"),
        F.col("vec_id").alias("id_b"),
        F.col("q").alias("qb"),
        F.col("nq").alias("nb"),
    )
    return (
        a.join(b, "l")
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            F.col("id_a"),
            F.col("id_b"),
            _cosine(dot(F.col("qa"), F.col("qb")), F.col("na"), F.col("nb")).alias(
                "cosine"
            ),
        )
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.col("cosine").cast("double").alias("cosine"))
    )


def cosine_dup_pairs_sql(threshold: float = 0.8, max_id: int = 100_000) -> str:
    q = QUANT_SQL.format(c="embedding")
    return f"""
WITH base AS (
  SELECT vec_id, label, {q} AS q, {DOT_SQL.format(a=q, b=q)} AS nq
  FROM embeddings WHERE vec_id < {max_id}
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       {COSINE_SQL.format(dot=DOT_SQL.format(a='a.q', b='b.q'),
                          na='a.nq', nb='b.nq')}::DOUBLE AS cosine
FROM base a JOIN base b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE {COSINE_SQL.format(dot=DOT_SQL.format(a='a.q', b='b.q'),
                         na='a.nq', nb='b.nq')} >= {threshold}
"""


# -------------------------------------------- LSH-bucketed near-dup pairs
def lsh_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.8,
    n_planes: int = 4,
    n_tables: int = 2,
) -> DataFrame:
    """Near-duplicate pairs via LSH bucketing — the UNLABELED-corpus
    scale path (:func:`cosine_dup_pairs` needs a label/IVF-cell
    blocking key; a raw crawl has none).  Candidates = pairs sharing a
    bucket in ANY of ``n_tables`` independent hyperplane families;
    every candidate is verified by exact quantized cosine, so
    precision is 1.0 and recall follows the multi-table amplification
    1-(1-r)^T.

    Scale shape: one explode (T rows per vector), one shuffle
    equi-join on (table, bucket) — never all-pairs, corpus never
    broadcast; skewed buckets split under AQE.  Cosine is computed
    inside the join (≤T× duplicated for pairs caught by several
    tables — T is small) and deduplicated AFTER the threshold filter,
    which beats re-joining vectors onto a pair-id dedup: the distinct
    input is only true near-dups, not all candidates."""
    base = _with_q(emb)
    ex = (
        base.select(
            "vec_id",
            "q",
            "nq",
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(t).alias("t"),
                        _bucket_expr(
                            F.col("q"), n_planes, offset=t * n_planes
                        ).alias("b"),
                    )
                    for t in range(n_tables)
                ])
            ).alias("tb"),
        )
        .select("vec_id", "q", "nq", F.col("tb.t").alias("t"), F.col("tb.b").alias("b"))
    )
    a = ex.select(
        "t",
        "b",
        F.col("vec_id").alias("id_a"),
        F.col("q").alias("qa"),
        F.col("nq").alias("na"),
    )
    b = ex.select(
        "t",
        "b",
        F.col("vec_id").alias("id_b"),
        F.col("q").alias("qb"),
        F.col("nq").alias("nb"),
    )
    return (
        a.join(b, ["t", "b"])
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            _cosine(dot(F.col("qa"), F.col("qb")), F.col("na"), F.col("nb"))
            .cast("double")
            .alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
        .distinct()
    )


def lsh_dup_pairs_sql(
    threshold: float = 0.8, n_planes: int = 4, n_tables: int = 2
) -> str:
    q = QUANT_SQL.format(c="embedding")
    bcols = ", ".join(
        f"{_bucket_sql(q, n_planes, offset=t * n_planes)} AS b{t}"
        for t in range(n_tables)
    )
    struct_list = ", ".join(f"{{'t': {t}, 'b': b{t}}}" for t in range(n_tables))
    cos = COSINE_SQL.format(
        dot=DOT_SQL.format(a="a.q", b="b.q"), na="a.nq", nb="b.nq"
    )
    return f"""
WITH base AS (
  SELECT vec_id, {q} AS q, {DOT_SQL.format(a=q, b=q)} AS nq, {bcols}
  FROM embeddings
),
ex AS (
  SELECT vec_id, q, nq, tb.t AS t, tb.b AS b
  FROM base, unnest([{struct_list}]) AS u(tb)
)
SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b, {cos}::DOUBLE AS cosine
FROM ex a JOIN ex b ON a.t = b.t AND a.b = b.b AND a.vec_id < b.vec_id
WHERE {cos} >= {threshold}
"""


# ------------------------------------------------ semantic (embedding) dedup
def semantic_dedup_docs(
    docs: DataFrame, emb: DataFrame, threshold: float = 0.3
) -> DataFrame:
    """EMBEDDING-space near-duplicate dedup of the DOCUMENTS table —
    the semantic layer over the text pipeline's lexical dedup stack:
    docs whose embeddings share an LSH bucket and verify above the
    cosine threshold (:func:`lsh_dup_pairs` — precision 1.0) cluster
    by connected components (textops' checkpointed label propagation),
    and each cluster keeps its smallest doc_id.

    Output: (doc_id, cluster_id, keep, source, n_chars) — the standard
    curation keep/drop decision keyed semantically rather than
    lexically.  Scale shape: banded LSH equi-join for pairs (never
    all-pairs), O(diameter) CC rounds of join+agg, one left join onto
    the corpus; the corpus never broadcasts."""
    from pyconform_spark import textops

    pairs = lsh_dup_pairs(emb, threshold).select(
        F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b")
    )
    comp = textops.connected_components(pairs)
    cluster = F.coalesce(F.col("component_id"), F.col("doc_id"))
    return docs.join(comp, "doc_id", "left_outer").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        cluster.cast("long").alias("cluster_id"),
        (cluster == F.col("doc_id")).alias("keep"),
        "source",
        F.col("n_chars").cast("long").alias("n_chars"),
    )


def semantic_dedup_docs_sql(threshold: float = 0.3) -> str:
    return f"""
WITH RECURSIVE pairs AS ({lsh_dup_pairs_sql(threshold)}),
edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION ALL SELECT id_b, id_a FROM pairs
),
reach (src, dst) AS (
  SELECT a, a FROM edges
  UNION
  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
),
comp AS (SELECT src AS doc_id, min(dst) AS component_id FROM reach GROUP BY src)
SELECT d.doc_id::BIGINT AS doc_id,
       COALESCE(c.component_id, d.doc_id)::BIGINT AS cluster_id,
       (COALESCE(c.component_id, d.doc_id) = d.doc_id) AS keep,
       d.source, d.n_chars::BIGINT AS n_chars
FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
"""


# --------------------------------------------------------------- LSH ANN
def _bucket_expr(
    q: Column, n_planes: int = N_PLANES, offset: int = 0
) -> Column:
    """n-bit random-hyperplane bucket of a quantized vector; ``offset``
    selects a disjoint plane family from the pool (multi-table LSH)."""
    out = None
    for p in range(n_planes):
        plane = F.array(*[F.lit(w) for w in PLANES[offset + p]])
        s = dot(q, plane)
        bit = F.when(s >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        out = bit if out is None else out + bit
    return out.cast("int")


def _bucket_sql(q_expr: str, n_planes: int = N_PLANES, offset: int = 0) -> str:
    terms = []
    for p in range(n_planes):
        lits = ", ".join(str(w) for w in PLANES[offset + p])
        s = (
            f"list_sum(list_transform(generate_series(1, {DIM}), "
            f"i -> ({q_expr})[i] * ([{lits}])[i]))"
        )
        terms.append(f"(CASE WHEN {s} >= 0 THEN {1 << p} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")::INT"


def _lsh_scored(
    base: DataFrame, n_queries: int, k: int, probes_of_bucket
) -> DataFrame:
    """Shared LSH scaffold: broadcast the (tiny) exploded query-probe
    table against the bucketed corpus on a bucket equi-join, score,
    window top-k.  ``probes_of_bucket(qbucket) -> Column[array<int>]``
    decides which buckets each query inspects."""
    queries = base.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("q").alias("qq"),
        F.col("nq").alias("qn"),
        F.explode(probes_of_bucket(F.col("bucket"))).alias("probe"),
    )
    scored = base.join(
        F.broadcast(queries),
        (F.col("bucket") == F.col("probe"))
        & (F.col("vec_id") != F.col("query_id")),
    ).select(
        "query_id",
        "vec_id",
        _cosine(dot(F.col("q"), F.col("qq")), F.col("nq"), F.col("qn")).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "vec_id",
            F.col("cosine").cast("double").alias("cosine"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def ann_lsh_topk(
    emb: DataFrame, n_queries: int = 5, k: int = 5, n_planes: int = N_PLANES
) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket.

    The bucket column is what you'd persist (Iceberg partition /
    bucket transform) at 10^12 vectors; the query then prunes to one
    bucket instead of scanning the table.  ``n_planes`` is the
    table-design knob: pick ≈ log2(N / B) for target bucket size B
    (24 planes keeps buckets ≈ 60k vectors at 10^12) — finer buckets
    cost recall, which :func:`ann_lsh_multiprobe` buys back.
    """
    base = _with_q(emb).withColumn(
        "bucket", _bucket_expr(F.col("q"), n_planes)
    )
    return _lsh_scored(base, n_queries, k, lambda b: F.array(b))


def ann_lsh_multiprobe(
    emb: DataFrame, n_queries: int = 5, k: int = 5, n_planes: int = 10
) -> DataFrame:
    """Multi-probe LSH: each query inspects its own bucket plus every
    Hamming-1 neighbor (one sign-bit flip) — n_planes+1 probes.

    This is the standard recall-recovery move for fine bucketing
    (Lv et al., VLDB'07): the nearest neighbor most often lands in a
    bucket differing by the single weakest hyperplane decision.  The
    probe list stays an equi-join fan-out of the tiny query side — the
    corpus is still touched only at (n_planes+1)/2^n_planes of its
    rows, never rescanned."""
    base = _with_q(emb).withColumn(
        "bucket", _bucket_expr(F.col("q"), n_planes)
    )

    def probes(b: Column) -> Column:
        return F.array(b, *[b.bitwiseXOR(F.lit(1 << p)) for p in range(n_planes)])

    return _lsh_scored(base, n_queries, k, probes)


def ann_lsh_multitable(
    emb: DataFrame,
    n_queries: int = 5,
    k: int = 5,
    n_planes: int = 10,
    n_tables: int = 2,
) -> DataFrame:
    """Multi-TABLE LSH: ``n_tables`` independent hyperplane families
    (disjoint slices of the plane pool); candidates = union of
    same-bucket matches across tables, deduplicated before ranking.

    The standard complement to multi-probe (Indyk-Motwani style
    amplification): independent tables decorrelate the misses, so
    recall ≈ 1-(1-r)^T for single-table recall r.  Plan shape: the
    corpus carries one bucket column per table; the (tiny) query side
    explodes into (table, bucket) probes; one equi-join on
    (table, bucket) — same single-join shape as one table, T× the
    probe fan-out, corpus never rescanned."""
    base = _with_q(emb)
    for t in range(n_tables):
        base = base.withColumn(
            f"b{t}", _bucket_expr(F.col("q"), n_planes, offset=t * n_planes)
        )
    corpus = base.select(
        "vec_id", "q", "nq",
        F.explode(
            F.array(*[
                F.struct(F.lit(t).alias("t"), F.col(f"b{t}").alias("b"))
                for t in range(n_tables)
            ])
        ).alias("tb"),
    ).select("vec_id", "q", "nq", F.col("tb.t").alias("t"), F.col("tb.b").alias("b"))
    queries = base.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("q").alias("qq"),
        F.col("nq").alias("qn"),
        F.explode(
            F.array(*[
                F.struct(F.lit(t).alias("t"), F.col(f"b{t}").alias("b"))
                for t in range(n_tables)
            ])
        ).alias("tb"),
    ).select("query_id", "qq", "qn", F.col("tb.t").alias("t"), F.col("tb.b").alias("b"))
    cand = (
        corpus.join(
            F.broadcast(queries),
            ["t", "b"],
        )
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            _cosine(dot(F.col("q"), F.col("qq")), F.col("nq"), F.col("qn")).alias(
                "cosine"
            ),
        )
        .distinct()  # a pair found by several tables counts once
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "vec_id",
            F.col("cosine").cast("double").alias("cosine"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def ann_lsh_multitable_sql(
    n_queries: int = 5, k: int = 5, n_planes: int = 10, n_tables: int = 2
) -> str:
    q = QUANT_SQL.format(c="embedding")
    bcols = ", ".join(
        f"{_bucket_sql(q, n_planes, offset=t * n_planes)} AS b{t}"
        for t in range(n_tables)
    )
    struct_list = ", ".join(
        f"{{'t': {t}, 'b': b{t}}}" for t in range(n_tables)
    )
    return f"""
WITH base AS (
  SELECT vec_id, {q} AS q, {DOT_SQL.format(a=q, b=q)} AS nq, {bcols}
  FROM embeddings
),
corpus AS (
  SELECT vec_id, q, nq, tb.t AS t, tb.b AS b
  FROM base, unnest([{struct_list}]) AS u(tb)
),
probes AS (
  SELECT vec_id AS query_id, q AS qq, nq AS qn, tb.t AS t, tb.b AS b
  FROM base, unnest([{struct_list}]) AS u(tb)
  WHERE vec_id < {n_queries}
),
cand AS (
  SELECT DISTINCT b.query_id, a.vec_id AS vec_id,
         {COSINE_SQL.format(dot=DOT_SQL.format(a='a.q', b='b.qq'),
                            na='a.nq', nb='b.qn')} AS cosine
  FROM corpus a JOIN probes b
    ON a.t = b.t AND a.b = b.b AND a.vec_id <> b.query_id
),
ranked AS (
  SELECT query_id, vec_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM cand
)
SELECT query_id, vec_id, cosine::DOUBLE AS cosine, rank::INT AS rank
FROM ranked WHERE rank <= {k}
"""


def _lsh_sql(n_queries: int, k: int, n_planes: int, probes_sql: str) -> str:
    q = QUANT_SQL.format(c="embedding")
    return f"""
WITH base AS (
  SELECT vec_id, {q} AS q, {DOT_SQL.format(a=q, b=q)} AS nq,
         {_bucket_sql(q, n_planes)} AS bucket
  FROM embeddings
),
probes AS (
  SELECT vec_id AS query_id, q AS qq, nq AS qn,
         unnest({probes_sql}) AS probe
  FROM base WHERE vec_id < {n_queries}
),
scored AS (
  SELECT b.query_id, a.vec_id AS vec_id,
         {COSINE_SQL.format(dot=DOT_SQL.format(a='a.q', b='b.qq'),
                            na='a.nq', nb='b.qn')} AS cosine
  FROM base a JOIN probes b
    ON a.bucket = b.probe AND a.vec_id <> b.query_id
),
ranked AS (
  SELECT query_id, vec_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, vec_id, cosine::DOUBLE AS cosine, rank::INT AS rank
FROM ranked WHERE rank <= {k}
"""


def ann_lsh_topk_sql(
    n_queries: int = 5, k: int = 5, n_planes: int = N_PLANES
) -> str:
    return _lsh_sql(n_queries, k, n_planes, "[bucket]")


def ann_lsh_multiprobe_sql(
    n_queries: int = 5, k: int = 5, n_planes: int = 10
) -> str:
    flips = ", ".join(f"xor(bucket, {1 << p})" for p in range(n_planes))
    return _lsh_sql(n_queries, k, n_planes, f"[bucket, {flips}]")


# ------------------------------------------------- tuned (graded) LSH ANN
def _probe_masks(n_planes: int, radius: int) -> list[int]:
    """XOR masks for Hamming-ball probing: the query's own bucket, every
    1-bit flip (radius >= 1), every 2-bit flip (radius >= 2)."""
    masks = [0]
    if radius >= 1:
        masks += [1 << i for i in range(n_planes)]
    if radius >= 2:
        masks += [
            (1 << i) | (1 << j)
            for i in range(n_planes)
            for j in range(i + 1, n_planes)
        ]
    return masks


def predict_recall(
    n_planes: int, n_tables: int, radius: int, neighbor_cos: float
) -> float:
    """Analytic recall of multi-table + Hamming-``radius`` probed
    random-hyperplane LSH for a neighbor at the given cosine
    (Goemans-Williamson collision probability ``1 - theta/pi`` per
    plane; per-table hit = P(<= radius sign bits differ); tables
    amplify as 1-(1-h)^T, Indyk-Motwani)."""
    from math import acos, comb, pi

    s = 1.0 - acos(max(-1.0, min(1.0, neighbor_cos))) / pi
    h = sum(
        comb(n_planes, i) * s ** (n_planes - i) * (1 - s) ** i
        for i in range(radius + 1)
    )
    return 1.0 - (1.0 - h) ** n_tables


def recommend_lsh(
    n_vectors: int,
    neighbor_cos: float = 0.25,
    target_recall: float = 0.9,
    max_tables: int = 8,
    max_radius: int = 2,
    max_planes_per_table: int = 16,
) -> tuple[int, int, int]:
    """Design-time parameter chooser: (n_planes, n_tables, radius).

    Picks the FINEST bucketing (max planes, i.e. max pruning) whose
    predicted recall at full amplification still clears the target,
    then the cheapest (tables, radius) combo — cost modeled as probed
    corpus volume T * |probes| * N / 2^p — that keeps it.  Inputs are
    table-design-time facts (corpus row count from table metadata, the
    neighbor-distance regime the application cares about), so the
    query plan stays free of runtime actions.  ``neighbor_cos`` is the
    WEAKEST neighbor that must still be found: near-dup pipelines pass
    ~0.9 (planes scale to ~log2 N); the synthetic test corpus's true
    top-10 sit near 0.25, the hard regime, which is what the shipped
    default grades against."""
    p_cap = min(
        max_planes_per_table,
        max(2, int(n_vectors).bit_length() - 1),
        MAX_PLANES // max(1, max_tables),
    )
    n_planes = 2
    for p in range(p_cap, 1, -1):
        if predict_recall(p, max_tables, max_radius, neighbor_cos) >= target_recall:
            n_planes = p
            break
    best = None
    for radius in range(max_radius + 1):
        n_probes = len(_probe_masks(n_planes, radius))
        for tables in range(1, max_tables + 1):
            if predict_recall(n_planes, tables, radius, neighbor_cos) < target_recall:
                continue
            cost = tables * n_probes * n_vectors / (1 << n_planes)
            if best is None or cost < best[0]:
                best = (cost, tables, radius)
    if best is None:  # target unreachable even at full amplification
        return n_planes, max_tables, max_radius
    return n_planes, best[1], best[2]


def parquet_row_count(path: str) -> int:
    """Row count from parquet FOOTER metadata (pyarrow) — the
    plain-parquet analog of Iceberg table statistics: plan-time table
    metadata, not a Spark action (action-gated in tests/test_plans.py)."""
    import os

    import pyarrow.parquet as pq

    if os.path.isdir(path):
        return sum(
            pq.ParquetFile(os.path.join(path, f)).metadata.num_rows
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
    return pq.ParquetFile(path).metadata.num_rows


def _tuned_candidates(
    emb: DataFrame, n_queries: int, n_planes: int, n_tables: int, radius: int
) -> DataFrame:
    """(query_id, vec_id, cosine) candidate set of the tuned index:
    corpus exploded once per table, query side exploded into every
    (table, Hamming-ball bucket) probe, ONE equi-join on (t, b)."""
    base = _with_q(emb)
    for t in range(n_tables):
        base = base.withColumn(
            f"b{t}", _bucket_expr(F.col("q"), n_planes, offset=t * n_planes)
        )
    corpus = base.select(
        "vec_id",
        "q",
        "nq",
        F.explode(
            F.array(*[
                F.struct(F.lit(t).alias("t"), F.col(f"b{t}").alias("b"))
                for t in range(n_tables)
            ])
        ).alias("tb"),
    ).select("vec_id", "q", "nq", F.col("tb.t").alias("t"), F.col("tb.b").alias("b"))
    masks = _probe_masks(n_planes, radius)
    queries = base.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("q").alias("qq"),
        F.col("nq").alias("qn"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(t).alias("t"),
                    F.col(f"b{t}").bitwiseXOR(F.lit(m)).alias("b"),
                )
                for t in range(n_tables)
                for m in masks
            ])
        ).alias("tb"),
    ).select(
        "query_id", "qq", "qn", F.col("tb.t").alias("t"), F.col("tb.b").alias("b")
    )
    return (
        corpus.join(F.broadcast(queries), ["t", "b"])
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            _cosine(dot(F.col("q"), F.col("qq")), F.col("nq"), F.col("qn")).alias(
                "cosine"
            ),
        )
        .distinct()  # found via several tables/probes => count once
    )


def ann_lsh_tuned(
    emb: DataFrame,
    n_queries: int = 5,
    k: int = 10,
    n_planes: int | None = None,
    n_tables: int | None = None,
    radius: int | None = None,
    corpus_size: int | None = None,
    neighbor_cos: float = 0.25,
    target_recall: float = 0.9,
) -> DataFrame:
    """Production-graded LSH ANN: multi-table AND Hamming-2 multi-probe,
    parameters designed by :func:`recommend_lsh` from the corpus row
    count (table metadata) and the neighbor-distance regime — gated in
    pytest at recall@10 >= 0.9 vs :func:`knn_bruteforce`.

    Plan shape is the multitable one (corpus exploded T times, probes
    broadcast, one (t, b) equi-join, never all-pairs, zero plan-time
    actions); only the knob VALUES move with corpus size.  On the
    synthetic 500-vector corpus whose true neighbors sit at cosine
    ~0.25 (near-random — the adversarial regime for any locality
    hash), the designer lands on (8 planes, 8 tables, radius 2):
    measured recall 0.94 at candidate fraction ~0.70.  With real
    near-dup neighbors (cos >= 0.9) the same designer picks ~log2 N
    planes and the candidate fraction collapses by orders of
    magnitude — pass ``neighbor_cos`` for the regime the application
    needs."""
    if n_planes is None or n_tables is None or radius is None:
        if corpus_size is None:
            raise ValueError(
                "ann_lsh_tuned: pass (n_planes, n_tables, radius) or "
                "corpus_size for the designer"
            )
        n_planes, n_tables, radius = recommend_lsh(
            corpus_size,
            neighbor_cos=neighbor_cos,
            target_recall=target_recall,
        )
    cand = _tuned_candidates(emb, n_queries, n_planes, n_tables, radius)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "vec_id",
            F.col("cosine").cast("double").alias("cosine"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def ann_lsh_tuned_candidate_counts(
    emb: DataFrame,
    n_queries: int = 5,
    n_planes: int | None = None,
    n_tables: int | None = None,
    radius: int | None = None,
    corpus_size: int | None = None,
    neighbor_cos: float = 0.25,
) -> DataFrame:
    """(query_id, n_candidates): how much of the corpus each query's
    probes actually touched — the honesty metric reported next to
    recall in the bench (candidate_fraction = n_candidates / (N-1))."""
    if n_planes is None or n_tables is None or radius is None:
        n_planes, n_tables, radius = recommend_lsh(
            corpus_size, neighbor_cos=neighbor_cos
        )
    cand = _tuned_candidates(emb, n_queries, n_planes, n_tables, radius)
    return cand.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_candidates")
    )


def ann_lsh_tuned_sql(
    n_queries: int = 5,
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 8,
    radius: int = 2,
    source: str = "embeddings",
    prelude: str = "",
) -> str:
    q = QUANT_SQL.format(c="embedding")
    bcols = ", ".join(
        f"{_bucket_sql(q, n_planes, offset=t * n_planes)} AS b{t}"
        for t in range(n_tables)
    )
    corpus_structs = ", ".join(
        f"{{'t': {t}, 'b': b{t}}}" for t in range(n_tables)
    )
    masks = _probe_masks(n_planes, radius)
    probe_structs = ", ".join(
        f"{{'t': {t}, 'b': xor(b{t}, {m})}}"
        for t in range(n_tables)
        for m in masks
    )
    return f"""
WITH {prelude}base AS (
  SELECT vec_id, {q} AS q, {DOT_SQL.format(a=q, b=q)} AS nq, {bcols}
  FROM {source}
),
corpus AS (
  SELECT vec_id, q, nq, tb.t AS t, tb.b AS b
  FROM base, unnest([{corpus_structs}]) AS u(tb)
),
probes AS (
  SELECT vec_id AS query_id, q AS qq, nq AS qn, tb.t AS t, tb.b AS b
  FROM base, unnest([{probe_structs}]) AS u(tb)
  WHERE vec_id < {n_queries}
),
cand AS (
  SELECT DISTINCT b.query_id, a.vec_id AS vec_id,
         {COSINE_SQL.format(dot=DOT_SQL.format(a='a.q', b='b.qq'),
                            na='a.nq', nb='b.qn')} AS cosine
  FROM corpus a JOIN probes b
    ON a.t = b.t AND a.b = b.b AND a.vec_id <> b.query_id
),
ranked AS (
  SELECT query_id, vec_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM cand
)
SELECT query_id, vec_id, cosine::DOUBLE AS cosine, rank::INT AS rank
FROM ranked WHERE rank <= {k}
"""


# ------------------------------------------------------------- IVF ANN
IVF_STRIDE = 32


def _assigned(emb: DataFrame, stride: int = IVF_STRIDE) -> DataFrame:
    """Assign every vector to its nearest seed centroid (IVF cell).

    Centroids are the vectors with ``vec_id % stride == 0`` —
    deterministic seeding whose cell count GROWS WITH THE CORPUS
    (≈ N/stride cells), the behavior a fixed n_cells lacks at 10^12
    vectors; and, unlike deriving a stride from ``count()``, it
    triggers NO action / extra scan of the table at plan time
    (action-gated in tests/test_plans.py).  A real deployment would
    Lloyd-iterate, which only changes the centroid table, not the plan
    shape.  Assignment = argmax quantized cosine against the broadcast
    centroid table with a (cosine, centroid_id) total order, so it is
    exact integer/double math with a DuckDB twin.
    """
    base = _with_q(emb)
    cents = base.where(F.col("vec_id") % stride == 0).select(
        F.col("vec_id").alias("cent_id"),
        F.col("q").alias("cq"),
        F.col("nq").alias("cn"),
    )
    scored = base.join(F.broadcast(cents)).select(
        "vec_id",
        "q",
        "nq",
        "cent_id",
        _cosine(dot(F.col("q"), F.col("cq")), F.col("nq"), F.col("cn")).alias(
            "ccos"
        ),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("ccos"), F.asc("cent_id"))
    return (
        scored.withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") == 1)
        .select("vec_id", "q", "nq", "cent_id")
    )


def ivf_topk(
    emb: DataFrame, n_queries: int = 5, k: int = 5, stride: int = IVF_STRIDE
) -> DataFrame:
    """IVF-style ANN: search only the query's cell (≈ stride vectors
    on average, INDEPENDENT of corpus size — the inverted-file pruning
    that replaces the full scan at 10^12 vectors; cell id doubles as
    the Iceberg partition/bucket key for the vector table)."""
    assigned = _assigned(emb, stride)
    queries = assigned.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("q").alias("qq"),
        F.col("nq").alias("qn"),
        F.col("cent_id").alias("qcell"),
    )
    scored = assigned.join(
        F.broadcast(queries),
        (F.col("cent_id") == F.col("qcell")) & (F.col("vec_id") != F.col("query_id")),
    ).select(
        "query_id",
        "vec_id",
        _cosine(dot(F.col("q"), F.col("qq")), F.col("nq"), F.col("qn")).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "vec_id",
            F.col("cosine").cast("double").alias("cosine"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def ivf_topk_sql(
    n_queries: int = 5, k: int = 5, stride: int = IVF_STRIDE
) -> str:
    q = QUANT_SQL.format(c="embedding")
    return f"""
WITH base AS (
  SELECT vec_id, {q} AS q, {DOT_SQL.format(a=q, b=q)} AS nq
  FROM embeddings
),
cents AS (
  SELECT vec_id AS cent_id, q AS cq, nq AS cn FROM base
  WHERE vec_id % {stride} = 0
),
cscore AS (
  SELECT b.vec_id, b.q, b.nq, c.cent_id,
         {COSINE_SQL.format(dot=DOT_SQL.format(a='b.q', b='c.cq'),
                            na='b.nq', nb='c.cn')} AS ccos
  FROM base b CROSS JOIN cents c
),
assigned AS (
  SELECT vec_id, q, nq, cent_id FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY ccos DESC, cent_id ASC) AS r
    FROM cscore) WHERE r = 1
),
scored AS (
  SELECT b.vec_id AS query_id, a.vec_id AS vec_id,
         {COSINE_SQL.format(dot=DOT_SQL.format(a='a.q', b='b.q'),
                            na='a.nq', nb='b.nq')} AS cosine
  FROM assigned a JOIN assigned b
    ON a.cent_id = b.cent_id AND b.vec_id < {n_queries}
   AND a.vec_id <> b.vec_id
),
ranked AS (
  SELECT query_id, vec_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, vec_id, cosine::DOUBLE AS cosine, rank::INT AS rank
FROM ranked WHERE rank <= {k}
"""


# ---------------------------------------------------------------- catalog
def register_sim_queries() -> dict[str, callable]:
    def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
        df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        return df.repartition(spark.sparkContext.defaultParallelism)

    return {
        "knn_bruteforce": lambda s, d: knn_bruteforce(_emb(s, d)),
        "knn_int8": lambda s, d: knn_int8(_emb(s, d)),
        "cosine_dup_pairs": lambda s, d: cosine_dup_pairs(_emb(s, d), 0.3, 3000),
        "lsh_dup_pairs": lambda s, d: lsh_dup_pairs(_emb(s, d), 0.3),
        "ann_lsh_topk": lambda s, d: ann_lsh_topk(_emb(s, d)),
        "ann_lsh_multiprobe": lambda s, d: ann_lsh_multiprobe(_emb(s, d)),
        "ann_lsh_multitable": lambda s, d: ann_lsh_multitable(_emb(s, d)),
        "ann_lsh_tuned": lambda s, d: ann_lsh_tuned(
            _emb(s, d),
            corpus_size=parquet_row_count(f"{d}/embeddings.parquet"),
        ),
        "ann_ivf_topk": lambda s, d: ivf_topk(_emb(s, d)),
        "ann_neardup_top1": lambda s, d: ann_neardup_top1(
            _emb(s, d),
            n_corpus=parquet_row_count(f"{d}/embeddings.parquet"),
        ),
        "semantic_dedup_docs": lambda s, d: semantic_dedup_docs(
            s.read.parquet(f"{d}/documents.parquet"), _emb(s, d)
        ),
        "kmeans_embeddings": lambda s, d: _kmeans(_emb(s, d)),
        "silhouette_kmeans": lambda s, d: _silhouette(_emb(s, d)),
        "calinski_harabasz_kmeans": lambda s, d: _calinski(_emb(s, d)),
    }


def _calinski(emb: DataFrame) -> DataFrame:
    from pyconform_spark.operators.cluster import calinski_harabasz

    return calinski_harabasz(emb)


def _silhouette(emb: DataFrame) -> DataFrame:
    from pyconform_spark.operators.cluster import silhouette_kmeans

    return silhouette_kmeans(emb)


def _kmeans(emb: DataFrame) -> DataFrame:
    from pyconform_spark.operators.cluster import kmeans_integer

    return kmeans_integer(emb)


SIM_ORACLES: dict[str, str] = {
    "knn_bruteforce": knn_bruteforce_sql(),
    "cosine_dup_pairs": cosine_dup_pairs_sql(0.3, 3000),
    "lsh_dup_pairs": lsh_dup_pairs_sql(0.3),
    "ann_lsh_topk": ann_lsh_topk_sql(),
    "ann_lsh_multiprobe": ann_lsh_multiprobe_sql(),
    "ann_lsh_multitable": ann_lsh_multitable_sql(),
    # designed params for the 500-vector correctness corpus (sf0.01 /
    # sf0.001): recommend_lsh(500) == (8, 8, 2).  The pytest gate
    # asserts the Spark side's metadata-driven designer agrees, so the
    # two can't drift.
    "ann_lsh_tuned": ann_lsh_tuned_sql(n_planes=8, n_tables=8, radius=2),
    "ann_ivf_topk": ivf_topk_sql(),
    "semantic_dedup_docs": semantic_dedup_docs_sql(),
}


NEARDUP_EPS = 0.05
# designer output for the 1000-vector augmented corpus in the near-dup
# regime: recommend_lsh(1000, neighbor_cos=0.95) == (9, 5, 0) — finer
# buckets, NO Hamming probing (near-dups share buckets with high
# probability, so single-bucket lookups suffice).  pytest asserts the
# designer agrees so the oracle can't drift.
NEARDUP_DESIGN = (9, 5, 0)

_NEARDUP_AUG_SQL = f"""aug AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + (SELECT count(*) FROM embeddings) AS vec_id,
         list_transform(
           generate_series(1, len(embedding)),
           i -> (embedding[i]::DOUBLE
                 + {NEARDUP_EPS}::DOUBLE
                   * embedding[len(embedding) - i + 1]::DOUBLE)::FLOAT
         ) AS embedding
  FROM embeddings
), """


SIM_ORACLES["ann_neardup_top1"] = ann_lsh_tuned_sql(
    n_queries=20,
    k=1,
    n_planes=NEARDUP_DESIGN[0],
    n_tables=NEARDUP_DESIGN[1],
    radius=NEARDUP_DESIGN[2],
    source="aug",
    prelude=_NEARDUP_AUG_SQL,
)


def ann_neardup_top1(
    emb: DataFrame, n_corpus: int, n_queries: int = 20
) -> DataFrame:
    """Driver query for the near-dup ANN regime: augment the corpus
    with planted near-duplicates and return each query's top-1 via the
    designer's (9 planes, 5 tables, radius 0) index.  The DuckDB twin
    re-derives the augmentation AND the index from the same closed
    forms — a hash-exact row proves the whole pipeline (perturbation,
    quantization, bucketing, probing, ranking) is engine-independent;
    the recall/fraction claims are gated separately in pytest+bench."""
    p, t, r = NEARDUP_DESIGN
    return ann_lsh_tuned(
        with_near_dups(emb, n_corpus, eps=NEARDUP_EPS),
        n_queries=n_queries,
        k=1,
        n_planes=p,
        n_tables=t,
        radius=r,
    )


def with_near_dups(
    emb: DataFrame, n_corpus: int, eps: float = 0.05
) -> DataFrame:
    """Append one DETERMINISTIC near-duplicate per vector: dup(v) =
    v + eps·reverse(v), vec_id shifted by ``n_corpus``.  For v with
    near-orthogonal v·reverse(v) (true of random embeddings),
    cos(v, dup) ≈ 1/sqrt(1+eps²) ≈ 0.999 — far above the ~0.25
    background — so each original's TRUE nearest neighbor is its
    planted dup.  This is the controlled near-dup regime (the regime a
    100 TB dedup pipeline actually runs in) for measuring recall@1 and
    candidate fraction; fully columnar, no Python row loop."""
    dup = emb.select(
        (F.col("vec_id") + F.lit(n_corpus)).alias("vec_id"),
        F.zip_with(
            "embedding",
            F.reverse("embedding"),
            lambda x, y: (x + F.lit(eps) * y).cast("float"),
        ).alias("embedding"),
        "label",
    )
    return emb.unionByName(dup)


# ------------------------------------------------ int8-quantized kNN
def int8_codes(emb: DataFrame) -> DataFrame:
    """Scalar int8 quantization, per vector: code_i =
    floor(q_i * 127 / max|q|) in [-127, 127] — the 4x memory
    compression a 10^12-vector index actually ships (float32 ->
    int8), with the scale riding alongside.  All arithmetic from the
    micro-quantized integers, so codes are bit-stable cross-engine
    (one exact product, one correctly-rounded division, one floor)."""
    q = quantized(F.col("embedding"))
    m = F.aggregate(
        q, F.lit(0).cast("long"), lambda acc, v: F.greatest(acc, F.abs(v))
    )
    base = emb.select("vec_id", "label", q.alias("q"), m.alias("m"))
    code = F.transform(
        F.col("q"),
        lambda x: F.floor((x * 127).cast("double") / F.col("m")).cast("long"),
    )
    return base.where(F.col("m") > 0).select(
        "vec_id", "label", code.alias("c"), "m"
    ).withColumn("nc", sqnorm(F.col("c")))


def knn_int8(emb: DataFrame, n_queries: int = 5, k: int = 10) -> DataFrame:
    """Top-k by INT8 cosine: the brute-force scan every quantized
    vector store runs as its cheap first pass (int8 dot products are
    the SIMD fast path; 4x less memory traffic than float32).  Same
    shape as ``knn_bruteforce`` — queries broadcast, corpus scanned
    once, per-query window top-k — but scoring uses the int8 codes;
    a pytest gates recall@10 >= 0.9 against the exact ranking."""
    base = int8_codes(emb)
    queries = base.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("c").alias("cq"),
        F.col("nc").alias("ncq"),
    )
    scored = base.join(
        F.broadcast(queries), F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        "vec_id",
        _cosine(dot(F.col("c"), F.col("cq")), F.col("nc"), F.col("ncq")).alias(
            "cosine_q8"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_q8"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "vec_id",
            F.col("cosine_q8").cast("double").alias("cosine_q8"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def knn_int8_sql(n_queries: int = 5, k: int = 10) -> str:
    q = QUANT_SQL.format(c="embedding")
    return f"""
WITH qv AS (
  SELECT vec_id, label, {q} AS q FROM embeddings),
mv AS (
  SELECT vec_id, label, q,
         list_aggregate(list_transform(q, x -> abs(x)), 'max') AS m
  FROM qv),
codes AS (
  SELECT vec_id, label,
         list_transform(q, x -> floor((x * 127)::DOUBLE / m)::BIGINT) AS c
  FROM mv WHERE m > 0),
base AS (
  SELECT vec_id, label, c, {DOT_SQL.format(a='c', b='c')} AS nc FROM codes),
scored AS (
  SELECT b.vec_id AS query_id, a.vec_id AS vec_id,
         {COSINE_SQL.format(dot=DOT_SQL.format(a='a.c', b='b.c'),
                            na='a.nc', nb='b.nc')} AS cosine_q8
  FROM base a, base b
  WHERE b.vec_id < {n_queries} AND a.vec_id <> b.vec_id),
ranked AS (
  SELECT query_id, vec_id, cosine_q8,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine_q8 DESC, vec_id ASC) AS rank
  FROM scored)
SELECT query_id, vec_id, cosine_q8::DOUBLE AS cosine_q8, rank::INT AS rank
FROM ranked WHERE rank <= {k}
"""


SIM_ORACLES["knn_int8"] = knn_int8_sql()

from pyconform_spark.operators.cluster import (  # noqa: E402
    calinski_harabasz_sql,
    kmeans_embeddings_sql,
    silhouette_kmeans_sql,
)

SIM_ORACLES["kmeans_embeddings"] = kmeans_embeddings_sql()
SIM_ORACLES["silhouette_kmeans"] = silhouette_kmeans_sql()
SIM_ORACLES["calinski_harabasz_kmeans"] = calinski_harabasz_sql()
