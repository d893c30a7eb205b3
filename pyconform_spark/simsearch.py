"""Similarity search over the ``embeddings`` table
(``vec_id:bigint, embedding:array<float>, label:int``).

Operators:

* brute-force cosine top-k  — the exactness baseline: broadcast the
  (small) query set against the full table; one scan, no shuffle of
  the big side.
* blocked near-dup pairs    — all-pairs cosine WITHIN a blocking key
  (label ≈ an IVF cell): the quadratic cost is bounded per block.
* random-hyperplane LSH ANN — the scale path: 8 signed projections
  bucket each vector; candidates = same bucket; top-k within bucket.
  At 10^12 vectors the bucket join replaces the full scan.

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


# deterministic integer hyperplanes, identical in Spark and SQL literals
PLANES: list[list[int]] = [
    [(_md5_int(f"plane-{p}-{d}") % 2001) - 1000 for d in range(DIM)]
    for p in range(N_PLANES)
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


# --------------------------------------------------------------- LSH ANN
def _bucket_expr(q: Column) -> Column:
    """8-bit random-hyperplane bucket of a quantized vector."""
    out = None
    for p in range(N_PLANES):
        plane = F.array(*[F.lit(w) for w in PLANES[p]])
        s = dot(q, plane)
        bit = F.when(s >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        out = bit if out is None else out + bit
    return out.cast("int")


def _bucket_sql(q_expr: str) -> str:
    terms = []
    for p in range(N_PLANES):
        lits = ", ".join(str(w) for w in PLANES[p])
        s = (
            f"list_sum(list_transform(generate_series(1, {DIM}), "
            f"i -> ({q_expr})[i] * ([{lits}])[i]))"
        )
        terms.append(f"(CASE WHEN {s} >= 0 THEN {1 << p} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")::INT"


def ann_lsh_topk(emb: DataFrame, n_queries: int = 5, k: int = 5) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket.

    The bucket column is what you'd persist (Iceberg partition /
    bucket transform) at 10^12 vectors; the query then prunes to one
    bucket instead of scanning the table.
    """
    base = _with_q(emb).withColumn("bucket", _bucket_expr(F.col("q")))
    queries = base.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("q").alias("qq"),
        F.col("nq").alias("qn"),
        F.col("bucket").alias("qbucket"),
    )
    scored = (
        base.join(
            F.broadcast(queries),
            (F.col("bucket") == F.col("qbucket"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select(
            "query_id",
            "vec_id",
            _cosine(dot(F.col("q"), F.col("qq")), F.col("nq"), F.col("qn")).alias(
                "cosine"
            ),
        )
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


def ann_lsh_topk_sql(n_queries: int = 5, k: int = 5) -> str:
    q = QUANT_SQL.format(c="embedding")
    return f"""
WITH base AS (
  SELECT vec_id, {q} AS q, {DOT_SQL.format(a=q, b=q)} AS nq,
         {_bucket_sql(q)} AS bucket
  FROM embeddings
),
scored AS (
  SELECT b.vec_id AS query_id, a.vec_id AS vec_id,
         {COSINE_SQL.format(dot=DOT_SQL.format(a='a.q', b='b.q'),
                            na='a.nq', nb='b.nq')} AS cosine
  FROM base a JOIN base b
    ON a.bucket = b.bucket AND b.vec_id < {n_queries}
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


# ------------------------------------------------------------- IVF ANN
IVF_CELLS = 16


def _assigned(emb: DataFrame, n_cells: int = IVF_CELLS) -> DataFrame:
    """Assign every vector to its nearest seed centroid (IVF cell).

    Centroids are the vectors with ``vec_id % floor(N/cells) == 0``
    (deterministic seeding — the 'k-means-lite' coarse quantizer; a
    real deployment would Lloyd-iterate, which only changes the
    centroid table, not the plan shape).  Assignment = argmax quantized
    cosine against the broadcast centroid table with a (cosine,
    centroid_id) total order, so it is exact integer/double math with
    a DuckDB twin.
    """
    base = _with_q(emb)
    n = emb.count()
    stride = max(n // n_cells, 1)
    cents = base.where(
        (F.col("vec_id") % stride == 0) & (F.col("vec_id") < stride * n_cells)
    ).select(
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
    emb: DataFrame, n_queries: int = 5, k: int = 5, n_cells: int = IVF_CELLS
) -> DataFrame:
    """IVF-style ANN: search only the query's cell (1/n_cells of the
    corpus on average — the inverted-file pruning that replaces the
    full scan at 10^12 vectors; cell id doubles as the Iceberg
    partition/bucket key for the vector table)."""
    assigned = _assigned(emb, n_cells)
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
    n_queries: int = 5, k: int = 5, n_cells: int = IVF_CELLS
) -> str:
    q = QUANT_SQL.format(c="embedding")
    return f"""
WITH base AS (
  SELECT vec_id, {q} AS q, {DOT_SQL.format(a=q, b=q)} AS nq
  FROM embeddings
),
params AS (
  SELECT greatest((SELECT count(*) FROM embeddings) // {n_cells}, 1) AS stride
),
cents AS (
  SELECT vec_id AS cent_id, q AS cq, nq AS cn FROM base, params
  WHERE vec_id % stride = 0 AND vec_id < stride * {n_cells}
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
        "cosine_dup_pairs": lambda s, d: cosine_dup_pairs(_emb(s, d), 0.3, 3000),
        "ann_lsh_topk": lambda s, d: ann_lsh_topk(_emb(s, d)),
        "ann_ivf_topk": lambda s, d: ivf_topk(_emb(s, d)),
    }


SIM_ORACLES: dict[str, str] = {
    "knn_bruteforce": knn_bruteforce_sql(),
    "cosine_dup_pairs": cosine_dup_pairs_sql(0.3, 3000),
    "ann_lsh_topk": ann_lsh_topk_sql(),
    "ann_ivf_topk": ivf_topk_sql(),
}
