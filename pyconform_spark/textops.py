"""Text-analysis and deduplication operators over the ``documents``
table — the training-data-pipeline half of the engine.

Everything here is expressed in built-in ``pyspark.sql.functions``
(whole-stage codegen, zero Python in the hot path) and has an exact
ANSI-SQL twin for DuckDB.  Cross-engine exactness is achieved by
building every hash from ``md5`` (identical in both engines):
DuckDB's ``md5_number_lower(s)`` — the little-endian uint64 of md5
bytes 8..16 — is reproduced in Spark by reversing the final 8 hex
byte-pairs and ``conv(hex, 16, 10)``.  All derived arithmetic stays in
exact integer domains (mod 2^31-1), so value hashes match bit-for-bit.

Operators:

* exact dedup             — hash-groupBy on text (one shuffle); plus
                            dedup MODULO normalization (reformatted copies)
* MinHash + LSH banding   — shingle → k minhashes → band buckets →
                            candidate pairs via bucket self-join; the
                            scale path for near-dup at 10^12 docs
                            (band join is linear, never all-pairs)
* n-gram Jaccard          — exact similarity; the scale path COMPOSES
                            LSH candidates → Jaccard verify
                            (ngram_jaccard_lsh); the all-pairs variant
                            is the small-corpus recall-audit twin
* SimHash                 — 32-bit signatures, plus dual-lane 64-bit
                            near-dup pairs (4×16-bit bands, exact
                            recall ≤3 Hamming, XOR+popcount verify)
* connected components    — checkpointed min-label propagation over
                            the LSH pair graph (near-dup clusters)
* token stats / quality   — length, token count, stopword ratio
* language ID             — stopword-vote heuristic
* fingerprint             — rolling polynomial hash over token hashes
* normalization           — ASCII-safe case/punct/whitespace canon
* stratified sampling     — deterministic content-hash keep decision
                            with per-language rates
* curation_pipeline       — the end-to-end composition: exact dedup →
                            LSH components → representatives → sample
* repetition signals      — Gopher-style duplicate-token / top-bigram /
                            duplicate-trigram fractions per doc
* PII detect / redact     — regex email/IPv4/phone counts + scrub in
                            the Java∩RE2 pattern subset (one scan)
* chunk-level dedup       — fixed-token-window passage dedup, global
                            first-occurrence wins (hash-partitioned)
* tf/df term scoring      — top-k characteristic terms per doc by
                            tf/df (cross-engine-exact tf·idf analog)

Reference tie-in: the reference's only string machinery is CharArray
padding (``physarray.py:623-657``); these operators are the
transcript-scale capabilities the north rule adds on top.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window, functions as F

P31 = 2147483647  # 2^31 - 1 (prime); all hash arithmetic is mod P31
MINHASH_K = 16
MINHASH_BANDS = 4  # 4 rows/band
SHINGLE_N = 3

# per-hash-function affine constants (a odd, b from Knuth's multiplier)
MINHASH_A = [2 * i + 3 for i in range(MINHASH_K)]
MINHASH_B = [(i * 2654435761) % P31 for i in range(MINHASH_K)]

STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "it", "that", "for", "on"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "por", "con"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den", "im", "zu"],
    "fr": ["le", "la", "et", "les", "des", "en", "un", "du", "que", "pour"],
}
LANGS = sorted(STOPWORDS)  # deterministic vote order


# ---------------------------------------------------------------- hashing
def md5_lower64(c: Column) -> Column:
    """DuckDB ``md5_number_lower`` as a Spark column (decimal(20,0))."""
    h = F.md5(c)
    le_hex = F.concat(*[F.substring(h, 33 - 2 * i, 2) for i in range(1, 9)])
    return F.conv(le_hex, 16, 10).cast("decimal(20,0)")


def md5_lower64_sql(expr: str) -> str:
    return f"md5_number_lower({expr})"


def md5_upper64(c: Column) -> Column:
    """DuckDB ``md5_number_upper`` as a Spark column (decimal(20,0)) —
    the digest's OTHER 64 bits, letting one md5 feed twice the salted
    entropy (bootstrap replicate lanes draw four ~uniform base-1e6
    fields per digest instead of paying one md5 per draw)."""
    h = F.md5(c)
    le_hex = F.concat(*[F.substring(h, 17 - 2 * i, 2) for i in range(1, 9)])
    return F.conv(le_hex, 16, 10).cast("decimal(20,0)")


def md5_upper64_sql(expr: str) -> str:
    return f"md5_number_upper({expr})"


def hash31(c: Column) -> Column:
    """md5-derived token hash in [0, P31)."""
    return (md5_lower64(c) % P31).cast("long")


def hash31_sql(expr: str) -> str:
    return f"(md5_number_lower({expr}) % {P31})::BIGINT"


# ----------------------------------------------------------------- tokens
def tokens(c: Column) -> Column:
    """Whitespace tokenization (empty text -> empty array)."""
    t = F.trim(c)
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


TOKENS_SQL = (
    "CASE WHEN trim(text) = '' THEN []::VARCHAR[] "
    "ELSE regexp_split_to_array(trim(text), '\\s+') END"
)


def index_seq(upper: Column) -> Column:
    """``[1..upper]`` as an int array, EMPTY when ``upper < 1``.

    Spark's ``sequence(1, 0)`` counts DOWN (yields ``[1, 0]``) while
    DuckDB's ``generate_series(1, 0)`` is empty — an unguarded
    sliding-window builder therefore crashes (slice start 0) or
    silently diverges from its oracle on docs shorter than the window.
    Every window/chunk enumeration goes through this guard."""
    return F.when(upper >= 1, F.sequence(F.lit(1), upper)).otherwise(
        F.array().cast("array<int>")
    )


def shingles(c: Column, n: int = SHINGLE_N) -> Column:
    """Distinct word n-gram shingles of a text column."""
    w = tokens(c)
    return F.array_distinct(
        F.transform(
            index_seq(F.size(w) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(w, i, n)),
        )
    )


def shingles_sql(n: int = SHINGLE_N) -> str:
    return (
        f"list_distinct(list_transform(generate_series(1, "
        f"greatest(len({TOKENS_SQL}) - {n - 1}, 0)), "
        f"i -> array_to_string(list_slice({TOKENS_SQL}, i, i + {n - 1}), ' ')))"
    )


# ------------------------------------------------------------ exact dedup
def exact_dedup(docs: DataFrame) -> DataFrame:
    """One row per distinct text: the kept doc (min id) + copy count.

    Scale: a single hash-shuffle on text.  At 10^12 docs, group on
    ``md5(text)`` instead so shuffle keys are 16 bytes, and verify the
    (vanishingly rare) md5 collisions in the reduce.
    """
    return (
        docs.groupBy("text")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select(
            "keep_id",
            F.col("n_copies").cast("long").alias("n_copies"),
            F.length("text").alias("n_chars"),
        )
    )


EXACT_DEDUP_SQL = """
SELECT min(doc_id) AS keep_id, count(*)::BIGINT AS n_copies,
       length(text)::INT AS n_chars
FROM documents GROUP BY text
"""


# ------------------------------------------------------------ MinHash/LSH
def _exploded_shingle_hashes(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id", F.explode(shingles(F.col("text"))).alias("sh")
    ).select("doc_id", hash31(F.col("sh")).alias("h"))


def minhash_signatures(docs: DataFrame, k: int = MINHASH_K) -> DataFrame:
    """(doc_id, mh_0..mh_{k-1}): min over shingles of (a_i*h+b_i) % P.

    One explode + one hash-agg; every minhash is a MIN aggregate so the
    map-side partial combine keeps shuffle volume at k longs per doc.
    """
    ex = _exploded_shingle_hashes(docs)
    aggs = [
        F.min((F.col("h") * MINHASH_A[i] + MINHASH_B[i]) % P31).alias(f"mh_{i}")
        for i in range(k)
    ]
    return ex.groupBy("doc_id").agg(*aggs)


def minhash_signatures_sql(k: int = MINHASH_K) -> str:
    cols = ", ".join(
        f"min((h * {MINHASH_A[i]} + {MINHASH_B[i]}) % {P31}) AS mh_{i}"
        for i in range(k)
    )
    return f"""
WITH ex AS (
  SELECT doc_id, {hash31_sql('sh')} AS h
  FROM (SELECT doc_id, unnest({shingles_sql()}) AS sh FROM documents)
)
SELECT doc_id, {cols} FROM ex GROUP BY doc_id
"""


def minhash_lsh_pairs(
    docs: DataFrame, k: int = MINHASH_K, bands: int = MINHASH_BANDS
) -> DataFrame:
    """Candidate near-dup pairs: docs sharing at least one LSH band.

    Unpivot signatures to (doc_id, band, band_sig) and self-join on
    (band, band_sig) — linear in docs + bucket sizes, never all-pairs.
    """
    sig = minhash_signatures(docs, k)
    rows = k // bands
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws(
                "_", *[F.col(f"mh_{b * rows + r}") for r in range(rows)]
            ).alias("band_sig"),
        )
        for b in range(bands)
    ]
    banded = sig.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("bb")
    ).select("doc_id", "bb.band", "bb.band_sig")
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


# DuckDB struct-unnest syntax is awkward; build the banded relation as a
# UNION ALL instead (same plan shape, trivially portable).
def minhash_lsh_pairs_sql(k: int = MINHASH_K, bands: int = MINHASH_BANDS) -> str:
    rows = k // bands
    unions = "\nUNION ALL\n".join(
        f"SELECT doc_id, {b} AS band, concat_ws('_', "
        + ", ".join(f"mh_{b * rows + r}" for r in range(rows))
        + ") AS band_sig FROM sig"
        for b in range(bands)
    )
    return f"""
WITH sig AS ({minhash_signatures_sql(k)}),
banded AS ({unions})
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM banded a JOIN banded b
  ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
"""


# --------------------------------------------------------- n-gram Jaccard
def ngram_jaccard_pairs(docs: DataFrame, threshold: float = 0.2) -> DataFrame:
    """Exact Jaccard over distinct shingles for ALL co-shingled pairs.

    jaccard = |A∩B| / (|A|+|B|-|A∩B|) — one double division of exact
    ints.  The candidate stage is the full co-shingled self-join, so
    this is the EXHAUSTIVE (small-corpus / recall-audit) variant; the
    scale path is :func:`ngram_jaccard_lsh`, which feeds the same
    verify math only the MinHash-LSH candidate pairs.  All joins are
    plain shuffle equi-joins — the per-doc sizes table is one row per
    document (unbounded at corpus scale), so it must never be
    broadcast."""
    sh = docs.select(
        "doc_id", F.explode(shingles(F.col("text"))).alias("sh")
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return _jaccard_from_inter(inter, sizes, threshold)


def _jaccard_from_inter(
    inter: DataFrame, sizes: DataFrame, threshold: float
) -> DataFrame:
    """(doc_a, doc_b, n_inter) × per-doc sizes -> thresholded Jaccard.
    Shuffle joins only: sizes is one row per doc (never broadcast)."""
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    out = (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("n_inter")
                / (F.col("na") + F.col("nb") - F.col("n_inter"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return out.select(
        "doc_a", "doc_b", F.col("jaccard").cast("double").alias("jaccard")
    )


def ngram_jaccard_verify(
    pairs: DataFrame, docs: DataFrame, threshold: float = 0.2
) -> DataFrame:
    """Exact Jaccard for a GIVEN candidate-pair set only — the verify
    stage of the dedup pipeline.  At 10^12 docs the LSH candidate set
    is orders of magnitude smaller than the co-shingled self-join, so
    the intersection count is computed by walking each pair's doc_a
    shingles (bounded per doc) into an equi-join on (doc_b, shingle).

    Every join is a shuffle equi-join; nothing unbounded is broadcast.
    Pairs with an empty intersection fall out of the inner join — with
    any ``threshold > 0`` they could never pass anyway."""
    cand = pairs.select("doc_a", "doc_b")
    sh = docs.select(
        "doc_id", F.explode(shingles(F.col("text"))).alias("sh")
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a_sh = cand.join(sh.withColumnRenamed("doc_id", "doc_a"), "doc_a")
    inter = (
        a_sh.join(
            sh.select(F.col("doc_id").alias("doc_b"), "sh"),
            ["doc_b", "sh"],
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return _jaccard_from_inter(inter, sizes, threshold)


def ngram_jaccard_lsh(docs: DataFrame, threshold: float = 0.2) -> DataFrame:
    """The composed scale path: MinHash-LSH banding proposes candidate
    pairs, exact n-gram Jaccard verifies them.  This is the operator a
    10^12-doc dedup job runs; ngram_jaccard_pairs is its exhaustive
    audit twin."""
    return ngram_jaccard_verify(minhash_lsh_pairs(docs), docs, threshold)


def ngram_jaccard_lsh_sql(threshold: float = 0.2) -> str:
    """DuckDB twin of the composed LSH→verify path."""
    return f"""
WITH cand AS ({minhash_lsh_pairs_sql()}),
sh AS (
  SELECT doc_id, unnest({shingles_sql()}) AS sh FROM documents
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS n_inter
  FROM cand c
  JOIN sh a ON a.doc_id = c.doc_a
  JOIN sh b ON b.doc_id = c.doc_b AND b.sh = a.sh
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       (n_inter / (sa.n_sh + sb.n_sh - n_inter))::DOUBLE AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE (n_inter / (sa.n_sh + sb.n_sh - n_inter)) >= {threshold}
"""


def ngram_jaccard_pairs_sql(threshold: float = 0.2) -> str:
    return f"""
WITH sh AS (
  SELECT doc_id, unnest({shingles_sql()}) AS sh FROM documents
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       (n_inter / (sa.n_sh + sb.n_sh - n_inter))::DOUBLE AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE (n_inter / (sa.n_sh + sb.n_sh - n_inter)) >= {threshold}
"""


# ----------------------------------------------------------------- SimHash
SIMHASH_BITS = 32


def simhash32(docs: DataFrame) -> DataFrame:
    """32-bit SimHash over distinct-token hashes: bit j set iff the
    +1/-1 votes of token-hash bit j sum positive.  One explode + one
    agg (32 SUMs, map-side combined)."""
    tok = docs.select(
        "doc_id", F.explode(F.array_distinct(tokens(F.col("text")))).alias("w")
    ).select("doc_id", hash31(F.col("w")).alias("h"))
    votes = [
        F.sum(
            (F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) * 2 - 1)
        ).alias(f"v_{j}")
        for j in range(SIMHASH_BITS)
    ]
    agg = tok.groupBy("doc_id").agg(*votes)
    sim = None
    for j in range(SIMHASH_BITS):
        bit = F.when(F.col(f"v_{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        sim = bit if sim is None else sim + bit
    return agg.select("doc_id", sim.cast("long").alias("simhash"))


def simhash32_sql() -> str:
    votes = ", ".join(
        f"sum(((h >> {j}) & 1) * 2 - 1) AS v_{j}" for j in range(SIMHASH_BITS)
    )
    bits = " + ".join(
        f"(CASE WHEN v_{j} > 0 THEN {1 << j} ELSE 0 END)"
        for j in range(SIMHASH_BITS)
    )
    return f"""
WITH tok AS (
  SELECT doc_id, {hash31_sql('w')} AS h
  FROM (SELECT doc_id, unnest(list_distinct({TOKENS_SQL})) AS w FROM documents)
),
agg AS (SELECT doc_id, {votes} FROM tok GROUP BY doc_id)
SELECT doc_id, ({bits})::BIGINT AS simhash FROM agg
"""


# ----------------------------------------------------- stats / quality / lang
def token_stats(docs: DataFrame) -> DataFrame:
    w = tokens(F.col("text"))
    n_tok = F.size(w)
    n_chars = F.length("text")
    stop_all = sorted({s for v in STOPWORDS.values() for s in v})
    stop_arr = F.array(*[F.lit(s) for s in stop_all])
    n_stop = F.size(F.filter(w, lambda x: F.array_contains(stop_arr, x)))
    return docs.select(
        "doc_id",
        n_tok.cast("long").alias("n_tokens"),
        n_chars.cast("long").alias("n_chars"),
        F.when(n_tok > 0, n_chars / n_tok).otherwise(F.lit(0.0)).alias(
            "chars_per_token"
        ),
        F.when(n_tok > 0, n_stop / n_tok).otherwise(F.lit(0.0)).alias(
            "stopword_ratio"
        ),
        F.size(F.array_distinct(w)).cast("long").alias("n_distinct_tokens"),
    )


def token_stats_sql() -> str:
    stop_all = sorted({s for v in STOPWORDS.values() for s in v})
    lits = ", ".join(f"'{s}'" for s in stop_all)
    return f"""
SELECT doc_id,
  len({TOKENS_SQL})::BIGINT AS n_tokens,
  length(text)::BIGINT AS n_chars,
  CASE WHEN len({TOKENS_SQL}) > 0
       THEN length(text) / len({TOKENS_SQL}) ELSE 0.0 END AS chars_per_token,
  CASE WHEN len({TOKENS_SQL}) > 0
       THEN len(list_filter({TOKENS_SQL}, x -> list_contains([{lits}], x)))
            / len({TOKENS_SQL})
       ELSE 0.0 END AS stopword_ratio,
  len(list_distinct({TOKENS_SQL}))::BIGINT AS n_distinct_tokens
FROM documents
"""


def _pred_lang_cols() -> tuple[Column, Column]:
    """The stopword-vote argmax as reusable (pred_lang, n_votes)
    column expressions (first language in sorted order wins ties)."""
    w = tokens(F.col("text"))

    def _vote(lang: str) -> Column:
        arr = F.array(*[F.lit(s) for s in STOPWORDS[lang]])
        return F.size(F.filter(w, lambda x: F.array_contains(arr, x)))

    votes = {lang: _vote(lang) for lang in LANGS}
    best = None
    best_n = None
    for lang in LANGS:
        if best is None:
            best, best_n = F.lit(lang), votes[lang]
        else:
            cond = votes[lang] > best_n
            best = F.when(cond, F.lit(lang)).otherwise(best)
            best_n = F.when(cond, votes[lang]).otherwise(best_n)
    return best, best_n


def lang_id(docs: DataFrame) -> DataFrame:
    """Stopword-vote language ID with deterministic tie-break (first
    language in sorted order wins ties)."""
    best, best_n = _pred_lang_cols()
    return docs.select(
        "doc_id",
        best.alias("pred_lang"),
        best_n.cast("long").alias("n_votes"),
    )


def lang_id_kappa(docs: DataFrame) -> DataFrame:
    """Cohen's kappa agreement (Cohen 1960, public literature) between
    the corpus `lang` label and the stopword-vote detector — the
    chance-corrected accuracy that tells a curation pipeline whether
    its language router beats majority-class guessing: kappa =
    (po - pe)/(1 - pe) with po the diagonal rate and pe the margin
    product rate.

    EXACT cross-engine: with contingency counts o (truth x pred),
    n = sum(o), diag = sum of agreeing counts, and
    pe_num = sum_i r_i*c_i computed as a NESTED integer fold over the
    <= |langs|^2 cell array (for each cell a, its truth-row total
    r crossed with the pred-column total of the same label — absent
    diagonal cells need no special case because the identity runs
    over truth labels), kappa = (n*diag - pe_num)/(n^2 - pe_num) is
    ONE division of exact BIGINTs (NULL when pred and truth are both
    single-label via NULLIF).  No floats until that division.

    Scale shape: ONE scan to the <= |langs|^2 contingency, one global
    array; zero joins, zero windows."""
    best, _ = _pred_lang_cols()
    cells = (
        docs.select(F.col("lang").alias("l"), best.alias("p"))
        .groupBy("l", "p")
        .agg(F.count(F.lit(1)).cast("long").alias("o"))
    )
    glob = cells.groupBy().agg(
        F.sum("o").cast("long").alias("n"),
        F.sum(F.when(F.col("l") == F.col("p"), F.col("o")).otherwise(0))
        .cast("long")
        .alias("diag"),
        F.collect_list(F.struct("l", "p", "o")).alias("arr"),
    )
    pe_num = F.aggregate(
        F.col("arr"),
        F.lit(0).cast("long"),
        lambda acc, a: acc
        + a["o"]
        * F.aggregate(
            F.col("arr"),
            F.lit(0).cast("long"),
            lambda acc2, b: acc2
            + F.when(b["p"] == a["l"], b["o"]).otherwise(F.lit(0).cast("long")),
        ),
    )
    nd = F.col("n").cast("double")
    st = glob.select(
        "n",
        "diag",
        pe_num.alias("pe_num"),
    )
    return st.filter(F.col("n") >= 1).select(
        "n",
        "diag",
        (F.col("diag").cast("double") / nd).alias("po"),
        (F.col("pe_num").cast("double") / (nd * nd)).alias("pe"),
        (
            (F.col("n") * F.col("diag") - F.col("pe_num")).cast("double")
            / F.nullif(F.col("n") * F.col("n") - F.col("pe_num"), F.lit(0))
            .cast("double")
        ).alias("kappa"),
        F.when(
            F.col("n") * F.col("diag") - F.col("pe_num") <= 0, F.lit("chance")
        )
        .when(
            5 * (F.col("n") * F.col("diag") - F.col("pe_num"))
            >= 4 * (F.col("n") * F.col("n") - F.col("pe_num")),
            F.lit("near_perfect"),
        )
        .when(
            5 * (F.col("n") * F.col("diag") - F.col("pe_num"))
            >= 3 * (F.col("n") * F.col("n") - F.col("pe_num")),
            F.lit("substantial"),
        )
        .otherwise(F.lit("moderate_or_less"))
        .alias("agreement"),
    )


def lang_id_sql() -> str:
    def vote(lang: str) -> str:
        lits = ", ".join(f"'{s}'" for s in STOPWORDS[lang])
        return f"len(list_filter({TOKENS_SQL}, x -> list_contains([{lits}], x)))"

    cases_lang = []
    cases_n = []
    # mirror the sequential argmax: later langs win only on strict >
    expr_lang = f"'{LANGS[0]}'"
    expr_n = vote(LANGS[0])
    for lang in LANGS[1:]:
        v = vote(lang)
        expr_lang = f"CASE WHEN {v} > ({expr_n}) THEN '{lang}' ELSE {expr_lang} END"
        expr_n = f"CASE WHEN {v} > ({expr_n}) THEN {v} ELSE {expr_n} END"
    return f"""
SELECT doc_id, {expr_lang} AS pred_lang, ({expr_n})::BIGINT AS n_votes
FROM documents
"""


def lang_id_kappa_sql() -> str:
    def vote(lang: str) -> str:
        lits = ", ".join(f"'{s}'" for s in STOPWORDS[lang])
        return f"len(list_filter({TOKENS_SQL}, x -> list_contains([{lits}], x)))"

    expr_lang = f"'{LANGS[0]}'"
    expr_n = vote(LANGS[0])
    for lang in LANGS[1:]:
        v = vote(lang)
        expr_lang = f"CASE WHEN {v} > ({expr_n}) THEN '{lang}' ELSE {expr_lang} END"
        expr_n = f"CASE WHEN {v} > ({expr_n}) THEN {v} ELSE {expr_n} END"
    return f"""
WITH cells AS (
  SELECT lang AS l, {expr_lang} AS p, count(*)::BIGINT AS o
  FROM documents GROUP BY 1, 2),
gall AS (
  SELECT sum(o)::BIGINT AS n,
         sum(CASE WHEN l = p THEN o ELSE 0 END)::BIGINT AS diag,
         list(struct_pack(l := l, p := p, o := o)) AS arr
  FROM cells),
st AS (
  SELECT n, diag,
         list_reduce(list_transform(arr, a -> a.o *
           list_reduce(list_transform(arr, b ->
             CASE WHEN b.p = a.l THEN b.o ELSE 0::BIGINT END),
             (x, y) -> x + y)), (x, y) -> x + y) AS pe_num
  FROM gall)
SELECT n, diag,
       diag::DOUBLE / n::DOUBLE AS po,
       pe_num::DOUBLE / (n::DOUBLE * n::DOUBLE) AS pe,
       (n * diag - pe_num)::DOUBLE
         / nullif(n * n - pe_num, 0)::DOUBLE AS kappa,
       CASE WHEN n * diag - pe_num <= 0 THEN 'chance'
            WHEN 5 * (n * diag - pe_num) >= 4 * (n * n - pe_num)
              THEN 'near_perfect'
            WHEN 5 * (n * diag - pe_num) >= 3 * (n * n - pe_num)
              THEN 'substantial'
            ELSE 'moderate_or_less' END AS agreement
FROM st WHERE n >= 1
"""


def doc_fingerprint(docs: DataFrame) -> DataFrame:
    """Rolling polynomial hash over token hashes:
    acc = (acc*31 + h(w)) % P — order-sensitive, so permuted texts get
    distinct fingerprints (unlike the shingle-set ops)."""
    w = tokens(F.col("text"))
    fp = F.aggregate(
        F.transform(w, lambda x: hash31(x)),
        F.lit(0).cast("long"),
        lambda acc, h: (acc * 31 + h) % P31,
    )
    return docs.select("doc_id", fp.cast("long").alias("fingerprint"))


def doc_fingerprint_sql() -> str:
    return f"""
SELECT doc_id,
  CASE WHEN len({TOKENS_SQL}) = 0 THEN 0
       ELSE list_reduce(
         list_prepend(0::BIGINT,
           list_transform({TOKENS_SQL}, w -> {hash31_sql('w')})),
         (acc, h) -> (acc * 31 + h) % {P31})
  END::BIGINT AS fingerprint
FROM documents
"""


def quality_score(docs: DataFrame) -> DataFrame:
    """Composite document quality score in [0,1]: length band,
    type-token ratio, stopword presence — the heuristic-filter stage of
    a training-data pipeline.  Fixed evaluation order => cross-engine
    deterministic doubles."""
    w = tokens(F.col("text"))
    n_tok = F.size(w)
    n_chars = F.length("text")
    distinct_ratio = F.when(n_tok > 0, F.size(F.array_distinct(w)) / n_tok).otherwise(
        F.lit(0.0)
    )
    stop_all = sorted({s for v in STOPWORDS.values() for s in v})
    arr = F.array(*[F.lit(s) for s in stop_all])
    stop_ratio = F.when(
        n_tok > 0, F.size(F.filter(w, lambda x: F.array_contains(arr, x))) / n_tok
    ).otherwise(F.lit(0.0))
    len_score = F.least(n_chars / F.lit(200.0), F.lit(1.0))
    score = len_score * 0.4 + distinct_ratio * 0.4 + stop_ratio * 0.2
    return docs.select(
        "doc_id",
        len_score.cast("double").alias("len_score"),
        distinct_ratio.cast("double").alias("distinct_ratio"),
        score.cast("double").alias("quality"),
    )


def quality_score_sql() -> str:
    stop_all = sorted({s for v in STOPWORDS.values() for s in v})
    lits = ", ".join(f"'{s}'" for s in stop_all)
    n_tok = f"len({TOKENS_SQL})"
    distinct_ratio = (
        f"CASE WHEN {n_tok} > 0 THEN len(list_distinct({TOKENS_SQL})) / {n_tok}"
        " ELSE 0.0 END"
    )
    stop_ratio = (
        f"CASE WHEN {n_tok} > 0 THEN"
        f" len(list_filter({TOKENS_SQL}, x -> list_contains([{lits}], x))) / {n_tok}"
        " ELSE 0.0 END"
    )
    len_score = "least(length(text) / 200.0, 1.0)"
    return f"""
SELECT doc_id,
       {len_score}::DOUBLE AS len_score,
       ({distinct_ratio})::DOUBLE AS distinct_ratio,
       ({len_score} * 0.4 + ({distinct_ratio}) * 0.4 + ({stop_ratio}) * 0.2)::DOUBLE
         AS quality
FROM documents
"""


def connected_components(
    pairs: DataFrame,
    checkpoint_every: int = 5,
    mode: str = "prop",
    stats: dict | None = None,
) -> DataFrame:
    """Connected components over an undirected edge list
    ``(doc_a, doc_b)``, labeled by the smallest vertex id in each
    component (deterministic).  ``mode="prop"`` (default) is min-label
    propagation — O(component diameter) rounds, ideal for the
    small-diameter near-dup clusters LSH emits; ``mode="star"`` is the
    alternating large-star/small-star algorithm — O(log n)-ish rounds
    regardless of diameter, the safe choice for adversarial chain
    graphs (see :func:`_cc_star`).  Identical output contract either
    way (pinned row-identical on the LSH graph by pytest).  ``stats``,
    when passed, receives ``{"rounds": n}``.

    Distributed algorithm: iterative min-label propagation — each round
    every vertex takes the min of its own label and its neighbors'
    labels; converges in O(component diameter) rounds, each round one
    join + one aggregate (the standard large-graph CC pattern).  The
    driver loop only checks a convergence count — no data is collected.

    Every ``checkpoint_every`` rounds the label frame is
    ``localCheckpoint()``-ed: without it each round extends the lineage
    chain, and on a large-diameter graph the logical plan (and the
    driver's stack when analyzing it) grows without bound.  Checkpoint
    materialization is work the round's ``count()`` was doing anyway,
    so the truncation is effectively free.
    """
    if mode == "star":
        return _cc_star(pairs, stats=stats)
    if mode != "prop":
        raise ValueError(f"connected_components: unknown mode {mode!r}")
    edges = pairs.unionByName(
        pairs.select(
            F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")
        )
    ).persist()
    labels = (
        edges.select(F.col("doc_a").alias("doc_id"))
        .distinct()
        .withColumn("component_id", F.col("doc_id"))
        .persist()
    )
    backing = labels  # the persisted frame behind `labels`
    rounds = 0
    while True:
        rounds += 1
        neigh = (
            edges.join(
                labels.withColumnRenamed("doc_id", "doc_b").withColumnRenamed(
                    "component_id", "nbr_label"
                ),
                "doc_b",
            )
            .groupBy("doc_a")
            .agg(F.min("nbr_label").alias("min_nbr"))
            .withColumnRenamed("doc_a", "doc_id")
        )
        # carry the OLD label through the update so convergence is a
        # filter over the (cached) frame — not a second shuffle join
        # per round against the previous labels
        staged = labels.join(neigh, "doc_id", "left").select(
            "doc_id",
            F.col("component_id").alias("_old"),
            F.least(
                F.col("component_id"),
                F.coalesce(F.col("min_nbr"), F.col("component_id")),
            ).alias("component_id"),
        )
        if rounds % checkpoint_every == 0:
            # truncate lineage: localCheckpoint materializes eagerly and
            # replaces the plan with the checkpointed RDD
            staged = staged.localCheckpoint()
        else:
            staged = staged.persist()
        changed = staged.where(
            F.col("component_id") != F.col("_old")
        ).count()
        backing.unpersist()
        backing = staged
        labels = staged.drop("_old")
        if changed == 0:
            break
    edges.unpersist()
    # truncate lineage before handing the frame to consumers: the
    # per-round InMemoryRelations nest (each round's plan embeds the
    # previous round's), so without this a downstream join's ANALYZED
    # plan grows exponentially in rounds-since-checkpoint — hundreds
    # of phantom scan/join nodes Catalyst must walk on every consumer.
    # localCheckpoint replaces all of it with one materialized leaf;
    # the final cached round is then released.
    final = labels.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("component_id").cast("long").alias("component_id"),
    ).localCheckpoint()
    backing.unpersist()
    if stats is not None:
        stats["rounds"] = rounds
    return final


def _cc_star(pairs: DataFrame, stats: dict | None = None) -> DataFrame:
    """Connected components by ALTERNATING large-star / small-star
    (Kiveris et al. 2014, "Connected Components in MapReduce and
    Beyond" — public paper; independent implementation): per
    alternation every node rewires its larger neighbors to its
    neighborhood minimum (large-star), then every node folds its
    smaller neighbors onto that minimum (small-star).  The edge set
    converges to one star per component rooted at the component's
    MINIMUM id — the same labeling contract as the propagation mode —
    in O(log^2 n) alternations worst-case (~log n observed),
    regardless of graph diameter: a 10k-node path graph converges in
    ~2 log n alternations where propagation needs ~n/2 rounds (pinned
    by test_cc_star_path_graph_round_bound).

    Scale shape per alternation: two hash-agg minimums + two
    equi-joins + two distincts, all on the (shrinking) edge frame; the
    frame is ``localCheckpoint``-ed every alternation (the convergence
    count materializes it anyway) so plans stay constant-size.
    Convergence = edge-set fixpoint (count equal AND left-anti empty —
    exact set equality, not a count heuristic)."""
    norm = (
        pairs.select(
            F.least("doc_a", "doc_b").cast("long").alias("a"),
            F.greatest("doc_a", "doc_b").cast("long").alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    verts = (
        pairs.select(F.col("doc_a").cast("long").alias("doc_id"))
        .unionByName(
            pairs.select(F.col("doc_b").cast("long").alias("doc_id"))
        )
        .distinct()
        .persist()
    )
    e = norm.localCheckpoint()
    prev_n = e.count()
    rounds = 0
    while True:
        rounds += 1
        # -- large-star: every neighbor v > u rewires to m(u) =
        # min(N(u) ∪ {u}); m <= u < v so (m, v) is already ordered
        bidir = e.unionByName(
            e.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        m = (
            bidir.groupBy("a")
            .agg(F.min("b").alias("mn"))
            .select("a", F.least("a", "mn").alias("m"))
        )
        large = (
            bidir.join(m, "a")
            .where(F.col("b") > F.col("a"))
            .select(F.col("m").alias("a"), F.col("b"))
            .where(F.col("a") != F.col("b"))
            .distinct()
        )
        # -- small-star: every node u folds its smaller neighbors
        # (and itself) onto their minimum
        bid2 = large.unionByName(
            large.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        sm = bid2.where(F.col("b") < F.col("a"))
        m2 = sm.groupBy("a").agg(F.min("b").alias("m"))
        emit = (
            sm.join(m2, "a")
            .select(F.col("b").alias("x"), "m")
            .unionByName(m2.select(F.col("a").alias("x"), "m"))
            .where(F.col("x") != F.col("m"))
            .select(F.col("m").alias("a"), F.col("x").alias("b"))
            .distinct()
        )
        e_new = emit.localCheckpoint()
        n = e_new.count()
        diff = (
            e_new.join(e, ["a", "b"], "left_anti").limit(1).count()
        )
        converged = n == prev_n and diff == 0
        e = e_new
        prev_n = n
        if converged:
            break
    if stats is not None:
        stats["rounds"] = rounds
    starmap = e.select(
        F.col("b").alias("doc_id"), F.col("a").alias("component_id")
    )
    final = (
        verts.join(starmap, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("component_id", F.col("doc_id")).alias(
                "component_id"
            ),
        )
        .localCheckpoint()
    )
    verts.unpersist()
    return final


def lsh_components(docs: DataFrame, mode: str = "prop") -> DataFrame:
    """Near-duplicate clusters: connected components over the
    MinHash-LSH candidate-pair graph (see :func:`connected_components`
    for the propagation/checkpoint mechanics; ``mode="star"`` swaps in
    the O(log n)-round large-star/small-star variant)."""
    return connected_components(minhash_lsh_pairs(docs), mode=mode)


def lsh_components_sql() -> str:
    """Recursive-CTE transitive closure (fine at oracle scale; the
    Spark side is the scalable path)."""
    return f"""
WITH RECURSIVE pairs AS ({minhash_lsh_pairs_sql()}),
edges AS (
  SELECT doc_a, doc_b FROM pairs
  UNION ALL SELECT doc_b, doc_a FROM pairs
),
reach (src, dst) AS (
  SELECT doc_a, doc_a FROM edges
  UNION
  SELECT r.src, e.doc_b FROM reach r JOIN edges e ON r.dst = e.doc_a
)
SELECT src::BIGINT AS doc_id, min(dst)::BIGINT AS component_id
FROM reach GROUP BY src
"""


def lang_token_stats(docs: DataFrame) -> DataFrame:
    """Per-(labeled language) corpus stats — the grouped rollup of
    token_stats (training-data curation view)."""
    w = tokens(F.col("text"))
    n_tok = F.size(w)
    return (
        docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(n_tok.cast("long")).alias("n_tokens"),
            F.sum(F.length("text").cast("long")).alias("n_chars"),
            F.min(n_tok).alias("min_tokens"),
            F.max(n_tok).alias("max_tokens"),
        )
        .select(
            "lang",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("n_chars").cast("long").alias("n_chars"),
            (F.col("n_tokens") / F.col("n_docs")).alias("tokens_per_doc"),
            F.col("min_tokens").cast("int").alias("min_tokens"),
            F.col("max_tokens").cast("int").alias("max_tokens"),
        )
    )


LANG_TOKEN_STATS_SQL = f"""
SELECT lang,
       count(*)::BIGINT AS n_docs,
       sum(len({TOKENS_SQL}))::BIGINT AS n_tokens,
       sum(length(text))::BIGINT AS n_chars,
       sum(len({TOKENS_SQL})) / count(*) AS tokens_per_doc,
       min(len({TOKENS_SQL}))::INT AS min_tokens,
       max(len({TOKENS_SQL}))::INT AS max_tokens
FROM documents GROUP BY lang
"""


def top_bigrams(docs: DataFrame, k: int = 50) -> DataFrame:
    """Corpus-wide top-k word bigrams (n-gram frequency table with a
    deterministic total order).

    Scale shape: ``orderBy(...).limit(k)`` plans
    ``TakeOrderedAndProject`` — per-partition top-k heaps merged on the
    driver, NO single-partition exchange of the distinct-bigram table
    (billions of rows at corpus scale).  The rank column is a window
    over the already-reduced k-row result, so the only global sort
    touches k rows.  Plan-gated in tests/test_plans.py."""
    bg = docs.select(
        F.explode(shingles(F.col("text"), n=2)).alias("bigram")
    )
    topk = (
        bg.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy(F.desc("n_docs"), F.asc("bigram"))
        .limit(k)
    )
    w = Window.orderBy(F.desc("n_docs"), F.asc("bigram"))
    return topk.withColumn("rank", F.row_number().over(w)).select(
        "bigram",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("rank").cast("int").alias("rank"),
    )


def top_bigrams_sql(k: int = 50) -> str:
    return f"""
WITH bg AS (
  SELECT unnest({shingles_sql(2)}) AS bigram FROM documents
),
counted AS (SELECT bigram, count(*)::BIGINT AS n_docs FROM bg GROUP BY 1),
ranked AS (
  SELECT bigram, n_docs,
         row_number() OVER (ORDER BY n_docs DESC, bigram ASC) AS rank
  FROM counted
)
SELECT bigram, n_docs, rank::INT AS rank FROM ranked WHERE rank <= {k}
"""


BPEISH_RE = "[a-z0-9]+|[A-Z][a-z0-9]*|[^A-Za-z0-9 ]"


def token_count_bpeish(docs: DataFrame) -> DataFrame:
    """BPE-ish subword-boundary token counting: lowercase runs,
    capitalized runs, digits, and punctuation each count as tokens
    (the cheap stand-in for a real tokenizer's length estimate; ASCII
    regex only, so Java regex and RE2 agree)."""
    toks = F.regexp_extract_all(F.col("text"), F.lit(BPEISH_RE), 0)
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_bpeish_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
    )


TOKEN_COUNT_BPEISH_SQL = f"""
SELECT doc_id,
       len(regexp_extract_all(text, '{BPEISH_RE}'))::BIGINT AS n_bpeish_tokens,
       len(list_distinct(regexp_extract_all(text, '{BPEISH_RE}')))::BIGINT
         AS n_distinct
FROM documents
"""


# ------------------------------------------------- SimHash near-dup pairs
def simhash_dual(docs: DataFrame) -> DataFrame:
    """A 64-bit SimHash signature as TWO 32-bit lanes (independently
    salted token hashes), built in ONE aggregation: one explode, 64 SUM
    votes, one shuffle (map-side combined).  Two lanes avoid signed
    64-bit assembly overflow under ANSI mode while giving the same
    Hamming geometry."""
    tok = docs.select(
        "doc_id", F.explode(F.array_distinct(tokens(F.col("text")))).alias("w")
    ).select(
        "doc_id",
        hash31(F.col("w")).alias("h1"),
        hash31(F.concat(F.lit("s2|"), F.col("w"))).alias("h2"),
    )
    votes = []
    for lane, h in (("1", "h1"), ("2", "h2")):
        votes += [
            F.sum(
                (F.shiftright(F.col(h), j).bitwiseAND(F.lit(1)) * 2 - 1)
            ).alias(f"v{lane}_{j}")
            for j in range(SIMHASH_BITS)
        ]
    agg = tok.groupBy("doc_id").agg(*votes)
    sims = []
    for lane in ("1", "2"):
        sim = None
        for j in range(SIMHASH_BITS):
            bit = F.when(F.col(f"v{lane}_{j}") > 0, F.lit(1 << j)).otherwise(
                F.lit(0)
            )
            sim = bit if sim is None else sim + bit
        sims.append(sim.cast("long").alias(f"sim{lane}"))
    return agg.select("doc_id", *sims)


def simhash_dual_sql() -> str:
    parts = []
    for lane, h in (("1", "h1"), ("2", "h2")):
        parts += [
            f"sum((({h} >> {j}) & 1) * 2 - 1) AS v{lane}_{j}"
            for j in range(SIMHASH_BITS)
        ]
    votes = ", ".join(parts)
    sims = []
    for lane in ("1", "2"):
        bits = " + ".join(
            f"(CASE WHEN v{lane}_{j} > 0 THEN {1 << j} ELSE 0 END)"
            for j in range(SIMHASH_BITS)
        )
        sims.append(f"({bits})::BIGINT AS sim{lane}")
    return f"""
WITH tok AS (
  SELECT doc_id, {hash31_sql('w')} AS h1,
         {hash31_sql("'s2|' || w")} AS h2
  FROM (SELECT doc_id, unnest(list_distinct({TOKENS_SQL})) AS w FROM documents)
),
agg AS (SELECT doc_id, {votes} FROM tok GROUP BY doc_id)
SELECT doc_id, {", ".join(sims)} FROM agg
"""


def simhash_near_pairs(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-duplicate pairs by SimHash Hamming distance, at scale.

    The 64-bit dual-lane signature is banded into 4 bands of 16 bits;
    docs sharing at least one band are candidates, then one XOR +
    popcount per lane verifies the exact Hamming distance.  The
    pigeonhole guarantee is EXACT recall for ``max_hamming <= 3``:
    with 4 bands, any pair differing in at most 3 bits leaves at least
    one band untouched.  Bands are 2^16-ary, so bucket sizes stay tiny
    as the corpus grows (the 8-bit-band variant's 256 buckets per band
    go quadratic at corpus scale — the reason for 16-bit bands), and
    the banded self-join stays linear in docs + bucket sizes."""
    if max_hamming > 3:
        raise ValueError(
            "max_hamming > 3 breaks the 4-band pigeonhole recall "
            "guarantee; add bands (wider signature) instead"
        )
    sig = simhash_dual(docs)
    bands = [
        (F.shiftright(F.col("sim1"), 16).bitwiseAND(F.lit(0xFFFF)), 0),
        (F.col("sim1").bitwiseAND(F.lit(0xFFFF)), 1),
        (F.shiftright(F.col("sim2"), 16).bitwiseAND(F.lit(0xFFFF)), 2),
        (F.col("sim2").bitwiseAND(F.lit(0xFFFF)), 3),
    ]
    band_structs = [
        F.struct(F.lit(b).alias("band"), expr.cast("long").alias("val"))
        for expr, b in bands
    ]
    banded = sig.select(
        "doc_id", "sim1", "sim2", F.explode(F.array(*band_structs)).alias("bb")
    ).select("doc_id", "sim1", "sim2", "bb.band", "bb.val")
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sim1").alias("a1"),
            F.col("a.sim2").alias("a2"),
            F.col("b.sim1").alias("b1"),
            F.col("b.sim2").alias("b2"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("a1").bitwiseXOR(F.col("b1"))) + F.bit_count(
        F.col("a2").bitwiseXOR(F.col("b2"))
    )
    return cand.where(ham <= max_hamming).select(
        "doc_a", "doc_b", ham.cast("int").alias("hamming")
    )


def simhash_near_pairs_sql(max_hamming: int = 3) -> str:
    return f"""
WITH sig AS ({simhash_dual_sql()}),
banded AS (
  SELECT doc_id, sim1, sim2, b.band,
         CASE b.band
           WHEN 0 THEN (sim1 >> 16) & 65535
           WHEN 1 THEN sim1 & 65535
           WHEN 2 THEN (sim2 >> 16) & 65535
           ELSE sim2 & 65535
         END AS val
  FROM sig, (SELECT unnest([0, 1, 2, 3]) AS band) b
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.sim1 AS a1, a.sim2 AS a2, b.sim1 AS b1, b.sim2 AS b2
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.val = b.val AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       (bit_count(xor(a1, b1)) + bit_count(xor(a2, b2)))::INT AS hamming
FROM cand
WHERE bit_count(xor(a1, b1)) + bit_count(xor(a2, b2)) <= {max_hamming}
"""


# ------------------------------------------------ deterministic sampling
SAMPLE_RATES = {"en": 500, "es": 250, "de": 200, "fr": 100}  # per-mille
SAMPLE_DEFAULT = 50


def stratified_sample(docs: DataFrame, rates: dict | None = None,
                      default_permille: int = SAMPLE_DEFAULT) -> DataFrame:
    """Deterministic per-language stratified sampling — the
    data-mixing stage of a training pipeline.  The keep decision is a
    pure function of the CONTENT hash (md5-derived, mod 1000), so the
    sample is reproducible across runs, engines, and cluster sizes —
    no RNG, no seed coordination, and re-sampling a grown corpus keeps
    previously-kept documents (hash stability).  One scan, no shuffle:
    the filter is a per-row expression."""
    rates = rates if rates is not None else SAMPLE_RATES
    bucket = hash31(F.concat(F.lit("sample|"), F.col("text"))) % 1000
    rate = F.lit(default_permille)
    for lang, pm in sorted(rates.items()):
        rate = F.when(F.col("lang") == lang, F.lit(pm)).otherwise(rate)
    return docs.where(bucket < rate).select(
        "doc_id", "lang", bucket.cast("int").alias("sample_bucket")
    )


def stratified_sample_sql(rates: dict | None = None,
                          default_permille: int = SAMPLE_DEFAULT) -> str:
    rates = rates if rates is not None else SAMPLE_RATES
    rate = str(default_permille)
    for lang, pm in sorted(rates.items()):
        rate = f"CASE WHEN lang = \'{lang}\' THEN {pm} ELSE {rate} END"
    inner = hash31_sql("'sample|' || text")
    bucket = f"({inner} % 1000)"
    return f"""
SELECT doc_id, lang, {bucket}::INT AS sample_bucket
FROM documents
WHERE {bucket} < ({rate})
"""


# ----------------------------------------------------- decontamination
def decontaminate(
    docs: DataFrame, eval_docs: DataFrame, n: int = 5
) -> DataFrame:
    """Training-corpus decontamination against an evaluation set — the
    n-gram overlap sweep (industry practice uses 13-grams; the demo
    corpus' short documents use 5): a training document sharing at
    least one word n-gram with ANY eval document is flagged, with its
    count of distinct shared n-grams.

    Scale shape: both sides explode to 31-bit shingle hashes and meet
    in ONE shuffle equi-join on the hash — the eval side is usually
    broadcast-sized but nothing depends on it; per-doc counts are a
    hash aggregate.  At 10^12 training docs this is a banded-join-
    shaped pass, linear in corpus + eval shingles."""
    tr = docs.select(
        "doc_id", F.explode(shingles(F.col("text"), n)).alias("sh")
    ).select("doc_id", hash31(F.col("sh")).alias("h"))
    ev = (
        eval_docs.select(F.explode(shingles(F.col("text"), n)).alias("sh"))
        .select(hash31(F.col("sh")).alias("h"))
        .distinct()
    )
    return (
        tr.join(ev, "h")
        .groupBy("doc_id")
        .agg(F.count_distinct("h").alias("n_shared"))
        .select("doc_id", F.col("n_shared").cast("long").alias("n_shared"))
    )


def decontaminate_sql(n: int = 5, eval_mod: int = 10, eval_rem: int = 7) -> str:
    sh = shingles_sql(n)
    return f"""
WITH tr AS (
  SELECT doc_id, {hash31_sql('sh')} AS h
  FROM (SELECT doc_id, unnest({sh}) AS sh FROM documents
        WHERE doc_id % {eval_mod} <> {eval_rem})
),
ev AS (
  SELECT DISTINCT {hash31_sql('sh')} AS h
  FROM (SELECT unnest({sh}) AS sh FROM documents
        WHERE doc_id % {eval_mod} = {eval_rem})
)
SELECT tr.doc_id, count(DISTINCT tr.h)::BIGINT AS n_shared
FROM tr JOIN ev ON tr.h = ev.h
GROUP BY tr.doc_id
"""


# --------------------------------------------------- curation pipeline
def curation_pipeline(docs: DataFrame) -> DataFrame:
    """The end-to-end training-data curation flow as ONE composed
    query: exact dedup (keep min doc_id per text) -> MinHash-LSH
    near-dup connected components over the survivors (keep each
    component's min-id representative) -> deterministic stratified
    sampling of what remains.  Every stage is the already-gated
    operator; the composition itself is oracle-exact.

    Scale shape: semi/anti joins on doc_id (shuffle equi-joins), the
    banded LSH candidate stage, the checkpointed CC loop, and a
    map-side sample filter — no stage is quadratic in the corpus.

    Oracle equivalence note: the DuckDB twin runs components over the
    FULL corpus while Spark runs them over exact-dedup survivors —
    provably the same outcome, because an exact duplicate shares its
    twin's signature (hence all its LSH neighbors, no unique bridges)
    and always has the larger doc_id (so it is never a component
    label)."""
    keep_exact = docs.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    kept1 = docs.join(keep_exact, "doc_id", "left_semi")
    comp = lsh_components(kept1)
    near_drop = comp.where(F.col("doc_id") != F.col("component_id")).select(
        "doc_id"
    )
    kept2 = kept1.join(near_drop, "doc_id", "left_anti")
    return stratified_sample(kept2)


def curation_pipeline_sql() -> str:
    return f"""
WITH comps AS ({lsh_components_sql()}),
exact_keep AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY text),
near_drop AS (SELECT doc_id FROM comps WHERE doc_id <> component_id),
kept AS (
  SELECT d.doc_id, d.lang, d.text
  FROM documents d
  JOIN exact_keep k ON d.doc_id = k.doc_id
  WHERE d.doc_id NOT IN (SELECT doc_id FROM near_drop)
),
sampled AS (
  SELECT doc_id, lang,
         ({hash31_sql("'sample|' || text")} % 1000) AS bucket
  FROM kept
)
SELECT doc_id, lang, bucket::INT AS sample_bucket
FROM sampled
WHERE bucket < ({_rate_case_sql()})
"""


def _rate_case_sql(rates: dict | None = None,
                   default_permille: int = SAMPLE_DEFAULT) -> str:
    rates = rates if rates is not None else SAMPLE_RATES
    rate = str(default_permille)
    for lang, pm in sorted(rates.items()):
        rate = f"CASE WHEN lang = '{lang}' THEN {pm} ELSE {rate} END"
    return rate


# ------------------------------------------------- text normalization
_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_LOWER = "abcdefghijklmnopqrstuvwxyz"


def normalize_text(c: Column) -> Column:
    """Curation-stage text normalization, ASCII-safe by construction so
    Java and RE2 regex agree byte for byte: strip everything outside
    [A-Za-z0-9 whitespace], lower-case via an explicit translate table
    (no locale-dependent casing), collapse whitespace runs, trim."""
    stripped = F.regexp_replace(c, "[^a-zA-Z0-9 \\t\\n\\r]", "")
    lowered = F.translate(stripped, _UPPER, _LOWER)
    return F.trim(F.regexp_replace(lowered, "[ \\t\\n\\r]+", " "))


def _normalize_sql(expr: str) -> str:
    return (
        "trim(regexp_replace(lower(regexp_replace("
        f"{expr}, '[^a-zA-Z0-9 \\t\\n\\r]', '', 'g')), "
        "'[ \\t\\n\\r]+', ' ', 'g'))"
    )


def text_normalized(docs: DataFrame) -> DataFrame:
    """(doc_id, norm_text): the normalized form itself — input to any
    normalization-insensitive downstream stage."""
    return docs.select(
        "doc_id", normalize_text(F.col("text")).alias("norm_text")
    )


def text_normalized_sql() -> str:
    return f"""
SELECT doc_id, {_normalize_sql('text')} AS norm_text FROM documents
"""


def dedup_normalized(docs: DataFrame) -> DataFrame:
    """Exact dedup MODULO normalization: documents identical after
    case/punctuation/whitespace normalization collapse to the min-id
    representative — catches the near-trivial duplicates (reformatted
    copies) that hash-exact dedup misses and MinHash wastes candidates
    on.  One hash shuffle on the normalized text."""
    return (
        docs.select("doc_id", normalize_text(F.col("text")).alias("norm"))
        .groupBy("norm")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select(
            "keep_id",
            F.col("n_copies").cast("long").alias("n_copies"),
            F.length("norm").cast("int").alias("n_chars"),
        )
    )


def dedup_normalized_sql() -> str:
    return f"""
WITH normed AS (
  SELECT doc_id, {_normalize_sql('text')} AS norm FROM documents
)
SELECT min(doc_id) AS keep_id, count(*)::BIGINT AS n_copies,
       length(norm)::INT AS n_chars
FROM normed GROUP BY norm
"""


# ------------------------------------------ repetition quality signals
def repetition_signals(docs: DataFrame) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021 §A1.1, public):
    duplicate-token fraction, most-frequent-bigram share, and
    duplicate-trigram fraction per document.

    Scale shape: the scalar signals (token/trigram dedup counts) are
    pure array expressions inside one projection — zero shuffle; the
    top-bigram share explodes bigrams and hash-aggregates twice
    ((doc, bigram) then doc), both partial+final — the only shuffles,
    both keyed by doc_id so a later per-doc join is co-partitioned.
    All fractions are single divisions of exactly-agreed integers."""
    w = tokens(F.col("text"))
    n_tok = F.size(w)
    bigrams = F.transform(
        index_seq(n_tok - 1),
        lambda i: F.concat_ws(" ", F.slice(w, i, 2)),
    )
    trigrams = F.transform(
        index_seq(n_tok - 2),
        lambda i: F.concat_ws(" ", F.slice(w, i, 3)),
    )
    per_doc = docs.select(
        "doc_id",
        n_tok.cast("long").alias("n_tokens"),
        F.size(F.array_distinct(w)).cast("long").alias("_ndtok"),
        F.size(trigrams).cast("long").alias("_ntri"),
        F.size(F.array_distinct(trigrams)).cast("long").alias("_ndtri"),
    )
    bg = docs.select("doc_id", F.explode(bigrams).alias("bigram"))
    top = (
        bg.groupBy("doc_id", "bigram")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.max("c").cast("long").alias("_topbg"),
            F.sum("c").cast("long").alias("_nbg"),
        )
    )
    j = per_doc.join(top, "doc_id", "left")
    nbg = F.coalesce(F.col("_nbg"), F.lit(0))
    return j.select(
        "doc_id",
        "n_tokens",
        F.when(
            F.col("n_tokens") > 0,
            (F.col("n_tokens") - F.col("_ndtok")) / F.col("n_tokens"),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_token_frac"),
        F.when(nbg > 0, F.col("_topbg") / nbg)
        .otherwise(F.lit(0.0))
        .alias("top_bigram_frac"),
        F.when(F.col("_ntri") > 0, (F.col("_ntri") - F.col("_ndtri")) / F.col("_ntri"))
        .otherwise(F.lit(0.0))
        .alias("dup_trigram_frac"),
    )


def repetition_signals_sql() -> str:
    bg_sql = (
        f"list_transform(generate_series(1, greatest(len({TOKENS_SQL}) - 1, 0)),"
        f" i -> array_to_string(list_slice({TOKENS_SQL}, i, i + 1), ' '))"
    )
    tri_sql = (
        f"list_transform(generate_series(1, greatest(len({TOKENS_SQL}) - 2, 0)),"
        f" i -> array_to_string(list_slice({TOKENS_SQL}, i, i + 2), ' '))"
    )
    return f"""
WITH per_doc AS (
  SELECT doc_id,
         len({TOKENS_SQL})::BIGINT AS n_tokens,
         len(list_distinct({TOKENS_SQL}))::BIGINT AS ndtok,
         len({tri_sql})::BIGINT AS ntri,
         len(list_distinct({tri_sql}))::BIGINT AS ndtri
  FROM documents),
bgc AS (
  SELECT doc_id, bigram, count(*)::BIGINT AS c
  FROM (SELECT doc_id, unnest({bg_sql}) AS bigram FROM documents)
  GROUP BY 1, 2),
top AS (
  SELECT doc_id, max(c)::BIGINT AS topbg, sum(c)::BIGINT AS nbg
  FROM bgc GROUP BY 1)
SELECT p.doc_id, p.n_tokens,
  CASE WHEN p.n_tokens > 0 THEN (p.n_tokens - p.ndtok) / p.n_tokens
       ELSE 0.0 END AS dup_token_frac,
  CASE WHEN coalesce(t.nbg, 0) > 0 THEN t.topbg / coalesce(t.nbg, 0)
       ELSE 0.0 END AS top_bigram_frac,
  CASE WHEN p.ntri > 0 THEN (p.ntri - p.ndtri) / p.ntri
       ELSE 0.0 END AS dup_trigram_frac
FROM per_doc p LEFT JOIN top t USING (doc_id)
"""


# ------------------------------------------------ PII detect / redact
# Java regex and RE2 agree on these (no backreferences, no lookaround;
# \\b and bounded repetition are common subset).
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE_RE = r"\b\d{3}-\d{4}\b"


def _with_pii(docs: DataFrame) -> Column:
    """Deterministic synthetic PII appended to each doc (the corpus
    itself is PII-free word soup); same expression in the SQL twin."""
    d = F.col("doc_id")
    return F.concat(
        F.col("text"),
        F.lit(" contact u"),
        d.cast("string"),
        F.lit("@mail.example.com ip 10."),
        (d % 200).cast("string"),
        F.lit(".0."),
        (d % 250).cast("string"),
        F.lit(" call 555-"),
        F.lpad((d % 10000).cast("string"), 4, "0"),
    )


_WITH_PII_SQL = (
    "text || ' contact u' || doc_id || '@mail.example.com ip 10.'"
    " || (doc_id % 200) || '.0.' || (doc_id % 250)"
    " || ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
)


def pii_redact(docs: DataFrame) -> DataFrame:
    """Regex PII scrub: count + redact emails, IPv4s, phone-shaped
    numbers.  One projection, zero shuffle — the scan-shaped operator a
    100 TB pre-training scrub pass needs.  Patterns live in the
    Java∩RE2 common subset so the DuckDB twin is bit-identical."""
    full = _with_pii(docs)
    n_em = F.size(F.regexp_extract_all(full, F.lit(PII_EMAIL_RE), F.lit(0)))
    n_ip = F.size(F.regexp_extract_all(full, F.lit(PII_IP_RE), F.lit(0)))
    n_ph = F.size(F.regexp_extract_all(full, F.lit(PII_PHONE_RE), F.lit(0)))
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(full, PII_EMAIL_RE, "<EMAIL>"),
            PII_IP_RE,
            "<IP>",
        ),
        PII_PHONE_RE,
        "<PHONE>",
    )
    return docs.select(
        "doc_id",
        n_em.cast("long").alias("n_emails"),
        n_ip.cast("long").alias("n_ips"),
        n_ph.cast("long").alias("n_phones"),
        red.alias("redacted"),
    )


def pii_redact_sql() -> str:
    return f"""
SELECT doc_id,
  len(regexp_extract_all({_WITH_PII_SQL}, '{PII_EMAIL_RE}'))::BIGINT AS n_emails,
  len(regexp_extract_all({_WITH_PII_SQL}, '{PII_IP_RE}'))::BIGINT AS n_ips,
  len(regexp_extract_all({_WITH_PII_SQL}, '{PII_PHONE_RE}'))::BIGINT AS n_phones,
  regexp_replace(
    regexp_replace(
      regexp_replace({_WITH_PII_SQL}, '{PII_EMAIL_RE}', '<EMAIL>', 'g'),
      '{PII_IP_RE}', '<IP>', 'g'),
    '{PII_PHONE_RE}', '<PHONE>', 'g') AS redacted
FROM documents
"""


# ---------------------------------------- passage (chunk)-level dedup
CHUNK_TOKENS = 8


def chunk_dedup_stats(docs: DataFrame, size: int = CHUNK_TOKENS) -> DataFrame:
    """Passage-level dedup: split each doc into fixed ``size``-token
    chunks, keep the global first occurrence of each chunk text
    (min (doc_id, chunk_idx)), report per-doc survival.

    This is the sub-document dedup a pre-training pipeline runs after
    doc-level dedup (boilerplate headers/footers repeat across distinct
    docs).  Scale shape: explode → one window partitioned by the
    64-bit chunk hash (billions of small partitions, no global sort) →
    hash re-agg by doc_id.  First-occurrence choice is deterministic,
    so reruns and the SQL twin agree bit-for-bit."""
    w = tokens(F.col("text"))
    n_chunks = F.floor((F.size(w) + (size - 1)) / size).cast("int")
    chunks = F.transform(
        index_seq(n_chunks),
        lambda i: F.concat_ws(" ", F.slice(w, (i - 1) * size + 1, size)),
    )
    ex = docs.select(
        "doc_id", F.posexplode(chunks).alias("chunk_idx", "chunk")
    ).select("doc_id", "chunk_idx", md5_lower64(F.col("chunk")).alias("ck"))
    win = Window.partitionBy("ck").orderBy("doc_id", "chunk_idx")
    marked = ex.withColumn("rn", F.row_number().over(win))
    agg = marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_chunks"),
        F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).cast("long").alias("n_kept"),
    )
    return agg.select(
        "doc_id",
        "n_chunks",
        "n_kept",
        (F.col("n_kept") / F.col("n_chunks")).alias("kept_frac"),
    )


def chunk_dedup_stats_sql(size: int = CHUNK_TOKENS) -> str:
    ch = (
        f"list_transform(generate_series(1, greatest((len({TOKENS_SQL}) + {size - 1})"
        f" // {size}, 0)), i -> array_to_string(list_slice({TOKENS_SQL},"
        f" (i - 1) * {size} + 1, i * {size}), ' '))"
    )
    return f"""
WITH ch AS (SELECT doc_id, {ch} AS chunks FROM documents),
ex AS (
  SELECT doc_id, i - 1 AS chunk_idx, {md5_lower64_sql('chunks[i]')} AS ck
  FROM ch CROSS JOIN UNNEST(generate_series(1, len(chunks))) AS t(i)),
marked AS (
  SELECT doc_id,
         row_number() OVER (PARTITION BY ck ORDER BY doc_id, chunk_idx) AS rn
  FROM ex)
SELECT doc_id, count(*)::BIGINT AS n_chunks,
       sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END)::BIGINT AS n_kept,
       sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END)::BIGINT / count(*)::BIGINT
         AS kept_frac
FROM marked GROUP BY doc_id
"""


# ----------------------------------------------- tf·idf term scoring
def tfidf_top_terms(docs: DataFrame, k: int = 3) -> DataFrame:
    """Top-k characteristic terms per document by tf/df (monotone in
    tf·idf for any fixed corpus size, and — unlike ln(N/df) — exactly
    reproducible cross-engine as a single integer division).

    Scale shape: explode → (doc, term) hash-agg → term-keyed df agg →
    shuffle join on term (Zipf-skewed; AQE skew-join splits the
    stop-word keys) → per-doc window top-k (partitioned by doc_id,
    never global)."""
    ex = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    tf = ex.groupBy("doc_id", "term").agg(F.count(F.lit(1)).cast("long").alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    j = tf.join(df_, "term").withColumn("score", F.col("tf") / F.col("df"))
    win = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc("term")
    )
    return (
        j.withColumn("rk", F.row_number().over(win))
        .where(F.col("rk") <= k)
        .select("doc_id", "term", "tf", "df", "score")
    )


def tfidf_top_terms_sql(k: int = 3) -> str:
    return f"""
WITH tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest({TOKENS_SQL}) AS term FROM documents)
  GROUP BY 1, 2),
dfreq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df, tf.tf / dfreq.df AS score,
         row_number() OVER (PARTITION BY tf.doc_id
                            ORDER BY tf.tf / dfreq.df DESC, tf.term ASC) AS rk
  FROM tf JOIN dfreq USING (term))
SELECT doc_id, term, tf, df, score FROM scored WHERE rk <= {k}
"""


# ------------------------------- content-defined chunking (CDC) dedup
CDC_DIVISOR = 8  # expected chunk length in tokens (boundary rate 1/8)


def cdc_chunk_dedup(docs: DataFrame, divisor: int = CDC_DIVISOR) -> DataFrame:
    """Passage dedup over CONTENT-DEFINED chunks: a token ends a chunk
    when ``hash(token) % divisor == 0``, so boundaries are anchored to
    content, not position.  Inserting or deleting a token re-chunks
    only the span it lands in — every other chunk's text (and hash) is
    unchanged — where fixed windows (:func:`chunk_dedup_stats`) shift
    every downstream chunk.  This is rolling-hash CDC (Muthitacharoen
    et al., SOSP'01) at token granularity.

    Scale shape: explode to (doc, pos, token); the chunk id is a
    running sum of boundary flags over a doc_id-partitioned window
    (per-doc, fully parallel — never global); chunk texts re-assemble
    with one doc-keyed hash-agg; first-occurrence-wins dedup then runs
    per chunk-hash partition exactly like the fixed-window variant."""
    w = tokens(F.col("text"))
    ex = docs.select("doc_id", F.posexplode(w).alias("pos", "tok")).withColumn(
        "is_cut", (hash31(F.col("tok")) % divisor == 0).cast("int")
    )
    # chunk id = cuts seen BEFORE this position (cut token closes its
    # chunk): running sum shifted by one position
    dw = Window.partitionBy("doc_id").orderBy("pos")
    ex = ex.withColumn(
        "cid", F.sum("is_cut").over(dw) - F.col("is_cut")
    )
    chunks = ex.groupBy("doc_id", "cid").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s.tok,
            ),
        ).alias("chunk")
    )
    keyed = chunks.select(
        "doc_id", "cid", md5_lower64(F.col("chunk")).alias("ck")
    )
    win = Window.partitionBy("ck").orderBy("doc_id", "cid")
    marked = keyed.withColumn("rn", F.row_number().over(win))
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.sum(F.when(F.col("rn") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_kept"),
        )
        .select(
            "doc_id",
            "n_chunks",
            "n_kept",
            (F.col("n_kept") / F.col("n_chunks")).alias("kept_frac"),
        )
    )


def cdc_chunk_dedup_sql(divisor: int = CDC_DIVISOR) -> str:
    return f"""
WITH ex AS (
  SELECT doc_id, i - 1 AS pos, toks[i] AS tok,
         CASE WHEN {hash31_sql('toks[i]')} % {divisor} = 0 THEN 1 ELSE 0 END
           AS is_cut
  FROM (SELECT doc_id, {TOKENS_SQL} AS toks FROM documents)
  CROSS JOIN UNNEST(generate_series(1, len(toks))) AS t(i)),
cids AS (
  SELECT doc_id, pos, tok,
         sum(is_cut) OVER (PARTITION BY doc_id ORDER BY pos) - is_cut AS cid
  FROM ex),
chunks AS (
  SELECT doc_id, cid, string_agg(tok, ' ' ORDER BY pos) AS chunk
  FROM cids GROUP BY doc_id, cid),
marked AS (
  SELECT doc_id,
         row_number() OVER (PARTITION BY {md5_lower64_sql('chunk')}
                            ORDER BY doc_id, cid) AS rn
  FROM chunks)
SELECT doc_id, count(*)::BIGINT AS n_chunks,
       sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END)::BIGINT AS n_kept,
       sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END)::BIGINT / count(*)::BIGINT
         AS kept_frac
FROM marked GROUP BY doc_id
"""


# ------------------------------------- hashed linear quality classifier
CLS_BUCKETS = 2001  # weight range [-1000, 1000] via md5 hashing trick


def _feat_weight(c: Column, salt: str) -> Column:
    """Deterministic per-feature weight via the hashing trick: the
    feature string is md5-hashed straight to an integer weight (no
    stored table).  Stands in for TRAINED parameters — a learned model
    swaps this expression for a lookup into a broadcast (bucket →
    weight) table or a literal weight array; the featurization,
    pooling, and gating plumbing around it is unchanged."""
    return (
        md5_lower64(F.concat(F.lit(salt + "-"), c)) % CLS_BUCKETS - 1000
    ).cast("long")


def _feat_weight_sql(expr: str, salt: str) -> str:
    # md5_number_lower is UINT64 in DuckDB: cast the (small) modulo to
    # BIGINT BEFORE subtracting or the subtraction underflows unsigned.
    return (
        f"((md5_number_lower('{salt}-' || ({expr})) % {CLS_BUCKETS})::BIGINT"
        f" - 1000)"
    )


def quality_classifier(docs: DataFrame) -> DataFrame:
    """FastText-style linear text classifier (Joulin et al. 2016,
    public): hashed unigram + bigram features, mean-pooled weights,
    sign gate.  The model-based quality filter a pre-training pipeline
    runs after the heuristic signals — here with md5-derived weights
    (see :func:`_feat_weight`) so the score is cross-engine exact.

    Scale shape: pure array expressions in ONE projection — hashing,
    weight lookup, pooling all happen inside whole-stage codegen with
    zero shuffle and zero Python; the classifier adds nothing to a
    scan-shaped pass over 100 TB.  The score is a single division of
    two exactly-agreed integers; the keep gate compares the integer
    sum, not the float."""
    w = tokens(F.col("text"))
    n_uni = F.size(w)
    bigrams = F.transform(
        index_seq(n_uni - 1),
        lambda i: F.concat_ws(" ", F.slice(w, i, 2)),
    )
    sum_uni = F.aggregate(
        F.transform(w, lambda t: _feat_weight(t, "quni")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    sum_bi = F.aggregate(
        F.transform(bigrams, lambda b: _feat_weight(b, "qbi")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    n_feat = (n_uni + F.size(bigrams)).cast("long")
    total = (sum_uni + sum_bi).cast("long")
    return docs.select(
        "doc_id",
        n_feat.alias("n_features"),
        F.when(n_feat > 0, total / n_feat).otherwise(F.lit(0.0)).alias("score"),
        F.when(total >= 0, F.lit("keep")).otherwise(F.lit("drop")).alias("verdict"),
    )


def quality_classifier_sql() -> str:
    bg = (
        f"list_transform(generate_series(1, greatest(len({TOKENS_SQL}) - 1, 0)),"
        f" i -> array_to_string(list_slice({TOKENS_SQL}, i, i + 1), ' '))"
    )
    su = (
        f"coalesce(list_sum(list_transform({TOKENS_SQL},"
        f" t -> {_feat_weight_sql('t', 'quni')})), 0)"
    )
    sb = (
        f"coalesce(list_sum(list_transform({bg},"
        f" b -> {_feat_weight_sql('b', 'qbi')})), 0)"
    )
    return f"""
WITH feat AS (
  SELECT doc_id,
         (len({TOKENS_SQL}) + len({bg}))::BIGINT AS n_features,
         ({su} + {sb})::BIGINT AS total
  FROM documents)
SELECT doc_id, n_features,
       CASE WHEN n_features > 0 THEN total / n_features ELSE 0.0 END AS score,
       CASE WHEN total >= 0 THEN 'keep' ELSE 'drop' END AS verdict
FROM feat
"""


# ------------------------------------------------------------ rouge overlap
def rouge_consecutive(docs: DataFrame) -> DataFrame:
    """ROUGE-1 / ROUGE-2 overlap between each document and its
    predecessor within the same source (Lin 2004, public literature) —
    the n-gram recall/precision/F1 the LLM-eval stack quotes for
    summary-vs-reference similarity, here as a crawl-adjacency audit
    (high ROUGE between consecutive same-source docs = templated or
    near-duplicated content that edit_distance_pairs' strict
    Levenshtein misses on reordered text).

    Clipped-count semantics: overlap = sum over grams of
    min(count_cand(g), count_ref(g)); recall = ov/|ref grams|,
    precision = ov/|cand grams|, F1 = 2*ov/(|ref|+|cand|) (the clipped
    harmonic mean collapses to one exact division).

    EXACT cross-engine: token/bigram counts are integers; each metric
    is ONE double division of exact BIGINTs (NULL when a side is
    empty).

    Scale shape: gram frames are (doc, gram) hash aggregates; each
    pair's overlap is an equi-join on (doc pair, gram) — work is
    proportional to shared vocabulary, never |docs|^2 (pairs are the
    lag-adjacency, one window sort by (source, doc_id))."""
    w = Window.partitionBy("source").orderBy("doc_id")
    pairs = (
        docs.select(
            "source",
            F.col("doc_id").alias("cand_id"),
            F.lag("doc_id").over(w).alias("ref_id"),
        )
        .filter(F.col("ref_id").isNotNull())
    )
    toks = tokens(F.col("text"))
    bi = F.transform(
        index_seq(F.size(toks) - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i, 2)),
    )
    totals = docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n1"),
        F.greatest(F.size(toks) - 1, F.lit(0)).cast("long").alias("n2"),
    )
    out = pairs
    for n, grams in ((1, toks), (2, bi)):
        ex = (
            docs.select("doc_id", F.explode(grams).alias("g"))
            .groupBy("doc_id", "g")
            .agg(F.count(F.lit(1)).cast("long").alias("c"))
        )
        cand = ex.select(
            F.col("doc_id").alias("cand_id"), "g", F.col("c").alias("cc")
        )
        ref = ex.select(
            F.col("doc_id").alias("ref_id"), "g", F.col("c").alias("rc")
        )
        ov = (
            pairs.join(cand, "cand_id")
            .join(ref, ["ref_id", "g"])
            .groupBy("cand_id", "ref_id")
            .agg(F.sum(F.least("cc", "rc")).cast("long").alias(f"ov{n}"))
        )
        out = out.join(ov, ["cand_id", "ref_id"], "left")
    ct = totals.select(
        F.col("doc_id").alias("cand_id"),
        F.col("n1").alias("cn1"),
        F.col("n2").alias("cn2"),
    )
    rt = totals.select(
        F.col("doc_id").alias("ref_id"),
        F.col("n1").alias("rn1"),
        F.col("n2").alias("rn2"),
    )
    j = (
        out.join(ct, "cand_id")
        .join(rt, "ref_id")
        .select(
            "source",
            "cand_id",
            "ref_id",
            "cn1",
            "rn1",
            F.coalesce("ov1", F.lit(0)).cast("long").alias("ov1"),
            "cn2",
            "rn2",
            F.coalesce("ov2", F.lit(0)).cast("long").alias("ov2"),
        )
    )
    dd = lambda a, b: F.try_divide(  # noqa: E731
        F.col(a).cast("double"), b.cast("double")
    )
    return j.select(
        "source",
        "cand_id",
        "ref_id",
        "cn1",
        "rn1",
        "ov1",
        dd("ov1", F.col("rn1")).alias("rouge1_r"),
        dd("ov1", F.col("cn1")).alias("rouge1_p"),
        F.try_divide(
            (F.lit(2) * F.col("ov1")).cast("double"),
            (F.col("rn1") + F.col("cn1")).cast("double"),
        ).alias("rouge1_f"),
        "cn2",
        "rn2",
        "ov2",
        dd("ov2", F.col("rn2")).alias("rouge2_r"),
        dd("ov2", F.col("cn2")).alias("rouge2_p"),
        F.try_divide(
            (F.lit(2) * F.col("ov2")).cast("double"),
            (F.col("rn2") + F.col("cn2")).cast("double"),
        ).alias("rouge2_f"),
    )


BIGRAMS_SQL = (
    f"list_transform(generate_series(1, greatest(len({TOKENS_SQL}) - 1, 0)),"
    f" i -> array_to_string(list_slice({TOKENS_SQL}, i, i + 1), ' '))"
)

ROUGE_CONSECUTIVE_SQL = f"""
WITH pairs AS (
  SELECT source, doc_id AS cand_id,
         lag(doc_id) OVER (PARTITION BY source ORDER BY doc_id) AS ref_id
  FROM documents),
p AS (SELECT * FROM pairs WHERE ref_id IS NOT NULL),
uni AS (
  SELECT doc_id, g, count(*)::BIGINT AS c
  FROM (SELECT doc_id, unnest({TOKENS_SQL}) AS g FROM documents)
  GROUP BY 1, 2),
bi AS (
  SELECT doc_id, g, count(*)::BIGINT AS c
  FROM (SELECT doc_id, unnest({BIGRAMS_SQL}) AS g FROM documents)
  GROUP BY 1, 2),
tot AS (
  SELECT doc_id, len({TOKENS_SQL})::BIGINT AS n1,
         greatest(len({TOKENS_SQL}) - 1, 0)::BIGINT AS n2
  FROM documents),
ov1 AS (
  SELECT p.cand_id, p.ref_id, sum(least(c1.c, c2.c))::BIGINT AS ov1
  FROM p
  JOIN uni c1 ON c1.doc_id = p.cand_id
  JOIN uni c2 ON c2.doc_id = p.ref_id AND c2.g = c1.g
  GROUP BY 1, 2),
ov2 AS (
  SELECT p.cand_id, p.ref_id, sum(least(c1.c, c2.c))::BIGINT AS ov2
  FROM p
  JOIN bi c1 ON c1.doc_id = p.cand_id
  JOIN bi c2 ON c2.doc_id = p.ref_id AND c2.g = c1.g
  GROUP BY 1, 2)
SELECT p.source, p.cand_id, p.ref_id,
       ct.n1 AS cn1, rt.n1 AS rn1,
       coalesce(ov1.ov1, 0)::BIGINT AS ov1,
       CASE WHEN rt.n1 = 0 THEN NULL
            ELSE coalesce(ov1.ov1, 0)::DOUBLE / rt.n1::DOUBLE END AS rouge1_r,
       CASE WHEN ct.n1 = 0 THEN NULL
            ELSE coalesce(ov1.ov1, 0)::DOUBLE / ct.n1::DOUBLE END AS rouge1_p,
       CASE WHEN rt.n1 + ct.n1 = 0 THEN NULL
            ELSE (2 * coalesce(ov1.ov1, 0))::DOUBLE
                 / (rt.n1 + ct.n1)::DOUBLE END AS rouge1_f,
       ct.n2 AS cn2, rt.n2 AS rn2,
       coalesce(ov2.ov2, 0)::BIGINT AS ov2,
       CASE WHEN rt.n2 = 0 THEN NULL
            ELSE coalesce(ov2.ov2, 0)::DOUBLE / rt.n2::DOUBLE END AS rouge2_r,
       CASE WHEN ct.n2 = 0 THEN NULL
            ELSE coalesce(ov2.ov2, 0)::DOUBLE / ct.n2::DOUBLE END AS rouge2_p,
       CASE WHEN rt.n2 + ct.n2 = 0 THEN NULL
            ELSE (2 * coalesce(ov2.ov2, 0))::DOUBLE
                 / (rt.n2 + ct.n2)::DOUBLE END AS rouge2_f
FROM p
LEFT JOIN ov1 ON ov1.cand_id = p.cand_id AND ov1.ref_id = p.ref_id
LEFT JOIN ov2 ON ov2.cand_id = p.cand_id AND ov2.ref_id = p.ref_id
JOIN tot ct ON ct.doc_id = p.cand_id
JOIN tot rt ON rt.doc_id = p.ref_id
"""


# ----------------------------------------------------- corpus accounting
def corpus_token_budget(docs: DataFrame) -> DataFrame:
    """Training-token budget accounting per (source, lang): docs,
    chars, bytes, whitespace tokens, BPE-ish subword tokens, and the
    tokens/doc, bytes/token, tokens/char ratios — the first query every
    LLM data pipeline runs ("how many tokens do we actually have, and
    what is this corpus's tokenizer fertility per slice").

    EXACT cross-engine: all counts are integers (char length, byte
    length, array lengths of the shared-regex token extraction); each
    ratio is ONE double division (NULL on empty slices via try_divide).

    Scale shape: a single scan + one hash aggregate to the
    |sources| x |langs| frame; the BPE-ish regex is the same Java/RE2-
    compatible pattern text_token_bpeish already cross-validates."""
    toks = tokens(F.col("text"))
    bpe = F.regexp_extract_all(F.col("text"), F.lit(BPEISH_RE), 0)
    staged = docs.select(
        "source",
        "lang",
        F.length("text").cast("long").alias("chars"),
        F.octet_length("text").cast("long").alias("bytes"),
        F.size(toks).cast("long").alias("ws_toks"),
        F.size(bpe).cast("long").alias("bpe_toks"),
    )
    g = staged.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("chars").cast("long").alias("n_chars"),
        F.sum("bytes").cast("long").alias("n_bytes"),
        F.sum("ws_toks").cast("long").alias("n_ws_tokens"),
        F.sum("bpe_toks").cast("long").alias("n_bpe_tokens"),
    )
    return g.select(
        "source",
        "lang",
        "n_docs",
        "n_chars",
        "n_bytes",
        "n_ws_tokens",
        "n_bpe_tokens",
        F.try_divide(
            F.col("n_bpe_tokens").cast("double"),
            F.col("n_docs").cast("double"),
        ).alias("tokens_per_doc"),
        F.try_divide(
            F.col("n_bytes").cast("double"),
            F.col("n_bpe_tokens").cast("double"),
        ).alias("bytes_per_token"),
        F.try_divide(
            F.col("n_bpe_tokens").cast("double"),
            F.col("n_chars").cast("double"),
        ).alias("tokens_per_char"),
    )


CORPUS_TOKEN_BUDGET_SQL = f"""
WITH staged AS (
  SELECT source, lang,
         length(text)::BIGINT AS chars,
         strlen(text)::BIGINT AS bytes,
         len({TOKENS_SQL})::BIGINT AS ws_toks,
         len(regexp_extract_all(text, '{BPEISH_RE}'))::BIGINT AS bpe_toks
  FROM documents),
g AS (
  SELECT source, lang, count(*)::BIGINT AS n_docs,
         sum(chars)::BIGINT AS n_chars, sum(bytes)::BIGINT AS n_bytes,
         sum(ws_toks)::BIGINT AS n_ws_tokens,
         sum(bpe_toks)::BIGINT AS n_bpe_tokens
  FROM staged GROUP BY 1, 2)
SELECT source, lang, n_docs, n_chars, n_bytes, n_ws_tokens, n_bpe_tokens,
       CASE WHEN n_docs = 0 THEN NULL
            ELSE n_bpe_tokens::DOUBLE / n_docs::DOUBLE END AS tokens_per_doc,
       CASE WHEN n_bpe_tokens = 0 THEN NULL
            ELSE n_bytes::DOUBLE / n_bpe_tokens::DOUBLE END AS bytes_per_token,
       CASE WHEN n_chars = 0 THEN NULL
            ELSE n_bpe_tokens::DOUBLE / n_chars::DOUBLE END AS tokens_per_char
FROM g
"""


def dedup_savings_histogram(docs: DataFrame) -> DataFrame:
    """Duplicate-cluster size histogram + the dedup savings ledger: for
    each exact-duplicate cluster size c, how many clusters exist, how
    many documents and characters they hold, and how many of those an
    exact dedup pass deletes ((c-1) per cluster) — the economics
    readout that justifies (or kills) a dedup stage before it runs at
    100 TB.

    EXACT cross-engine: pure integer counts through two hash
    aggregates.

    Scale shape: group-by text (at 10^12 docs: by md5(text), as
    exact_dedup documents) then group-by cluster size — output is the
    tiny |distinct sizes| frame."""
    clusters = docs.groupBy("text").agg(
        F.count(F.lit(1)).cast("long").alias("copies"),
        F.length(F.first("text")).cast("long").alias("chars"),
    )
    return (
        clusters.groupBy("copies")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_clusters"),
            F.sum(F.col("copies") * F.col("chars"))
            .cast("long")
            .alias("chars_total"),
            F.sum((F.col("copies") - 1) * F.col("chars"))
            .cast("long")
            .alias("chars_saved"),
        )
        .select(
            "copies",
            "n_clusters",
            (F.col("copies") * F.col("n_clusters")).alias("n_docs"),
            ((F.col("copies") - 1) * F.col("n_clusters")).alias("docs_removed"),
            "chars_total",
            "chars_saved",
        )
    )


DEDUP_SAVINGS_SQL = """
WITH clusters AS (
  SELECT text, count(*)::BIGINT AS copies,
         length(text)::BIGINT AS chars
  FROM documents GROUP BY text)
SELECT copies, count(*)::BIGINT AS n_clusters,
       (copies * count(*))::BIGINT AS n_docs,
       ((copies - 1) * count(*))::BIGINT AS docs_removed,
       sum(copies * chars)::BIGINT AS chars_total,
       sum((copies - 1) * chars)::BIGINT AS chars_saved
FROM clusters GROUP BY copies
"""


def kfold_balance_audit(docs: DataFrame, k: int = 5) -> DataFrame:
    """Hash-based k-fold split assignment + balance audit: every doc
    is deterministically assigned fold = md5(doc_id) % k (the
    leakage-free split split_leakage_audit polices), and the audit
    reports, per (fold, lang), the doc/char mass and each fold's share
    of its language — the pre-training sanity check that a 1/k split
    did not starve a low-resource language slice.

    EXACT cross-engine: the fold hash is the shared md5_number_lower
    convention; counts are integers; shares are ONE double division
    each.

    Scale shape: one scan, one hash aggregate to the k x |langs|
    frame; the per-lang totals ride a window over that reduced frame."""
    fold = (md5_lower64(F.col("doc_id").cast("string")) % k).cast("long")
    cells = (
        docs.select(
            fold.alias("fold"),
            "lang",
            F.length("text").cast("long").alias("chars"),
        )
        .groupBy("fold", "lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("chars").cast("long").alias("n_chars"),
        )
    )
    wl = Window.partitionBy("lang")
    return cells.select(
        "fold",
        "lang",
        "n_docs",
        "n_chars",
        F.try_divide(
            F.col("n_docs").cast("double"),
            F.sum("n_docs").over(wl).cast("double"),
        ).alias("doc_share_of_lang"),
        F.try_divide(
            F.col("n_chars").cast("double"),
            F.sum("n_chars").over(wl).cast("double"),
        ).alias("char_share_of_lang"),
    )


KFOLD_BALANCE_SQL = """
WITH cells AS (
  SELECT (md5_number_lower(doc_id::VARCHAR) % 5)::BIGINT AS fold, lang,
         count(*)::BIGINT AS n_docs,
         sum(length(text))::BIGINT AS n_chars
  FROM documents GROUP BY 1, 2)
SELECT fold, lang, n_docs, n_chars,
       n_docs::DOUBLE / (sum(n_docs) OVER (PARTITION BY lang))::DOUBLE
         AS doc_share_of_lang,
       n_chars::DOUBLE / (sum(n_chars) OVER (PARTITION BY lang))::DOUBLE
         AS char_share_of_lang
FROM cells
"""


def repeated_ngram_fraction(docs: DataFrame, n: int = 5) -> DataFrame:
    """Duplicated-text-fraction audit (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better", public arXiv): per
    document, the fraction of its distinct word 5-gram shingles that
    ALSO occur in at least one other document — the corpus-level
    repeated-span signal that motivates substring dedup, where
    doc-level dedup (exact/minhash/simhash) sees two long documents
    sharing one boilerplate paragraph as "different".

    EXACT: shingles are per-doc DISTINCT, so a shingle's occurrence
    count IS its document frequency; dup_fraction = dup_shingles /
    n_shingles is one division of two BIGINTs.  Docs too short to
    form a 5-gram emit no row (documented).

    Scale shape: explode -> (shingle, doc) frame, one shingle-keyed
    hash agg for df, one shuffle join back on shingle (Zipf-skewed —
    AQE skew-join splits boilerplate keys), one doc-keyed agg.  The
    same shape as tfidf_top_terms; no quadratic stage."""
    sh = docs.select(
        "doc_id", F.explode(shingles(F.col("text"), n)).alias("shingle")
    )
    df_ = sh.groupBy("shingle").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    per_doc = (
        sh.join(df_, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.sum((F.col("df") >= 2).cast("long"))
            .cast("long")
            .alias("dup_shingles"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_shingles",
        "dup_shingles",
        (
            F.col("dup_shingles").cast("double")
            / F.col("n_shingles").cast("double")
        ).alias("dup_fraction"),
    )


def repeated_ngram_fraction_sql(n: int = 5) -> str:
    return f"""
WITH sh AS (
  SELECT doc_id, unnest({shingles_sql(n)}) AS shingle FROM documents),
dfreq AS (
  SELECT shingle, count(*)::BIGINT AS df FROM sh GROUP BY 1),
per_doc AS (
  SELECT sh.doc_id,
         count(*)::BIGINT AS n_shingles,
         sum(CASE WHEN dfreq.df >= 2 THEN 1 ELSE 0 END)::BIGINT
           AS dup_shingles
  FROM sh JOIN dfreq USING (shingle)
  GROUP BY 1)
SELECT doc_id, n_shingles, dup_shingles,
       dup_shingles::DOUBLE / n_shingles::DOUBLE AS dup_fraction
FROM per_doc
"""


def register_text_queries() -> dict[str, callable]:
    """(name -> callable(spark, sf_dir)) for the driver catalog."""

    def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
        # testdata ships one file per table => one scan task; spread the
        # (CPU-heavy) shingle/hash work across the cluster first
        df = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return df.repartition(spark.sparkContext.defaultParallelism)

    return {
        "dedup_exact": lambda s, d: exact_dedup(_docs(s, d)),
        "dedup_minhash_lsh": lambda s, d: minhash_lsh_pairs(_docs(s, d)),
        # the scale path: LSH candidates -> exact-Jaccard verify
        "dedup_ngram_jaccard": lambda s, d: ngram_jaccard_lsh(_docs(s, d)),
        # the exhaustive audit twin (quadratic candidate stage)
        "dedup_jaccard_all_pairs": lambda s, d: ngram_jaccard_pairs(_docs(s, d)),
        # exact-COMPLETE scale path: prefix-filtered candidates
        "dedup_jaccard_prefix": lambda s, d: jaccard_prefix_pairs(_docs(s, d), 0.5),
        "dedup_simhash": lambda s, d: simhash32(_docs(s, d)),
        "dedup_simhash_pairs": lambda s, d: simhash_near_pairs(_docs(s, d)),
        "text_token_stats": lambda s, d: token_stats(_docs(s, d)),
        "text_lang_id": lambda s, d: lang_id(_docs(s, d)),
        "lang_id_kappa": lambda s, d: lang_id_kappa(_docs(s, d)),
        "text_fingerprint": lambda s, d: doc_fingerprint(_docs(s, d)),
        "text_quality_score": lambda s, d: quality_score(_docs(s, d)),
        "dedup_components": lambda s, d: lsh_components(_docs(s, d)),
        "dedup_components_star": lambda s, d: lsh_components(
            _docs(s, d), mode="star"
        ),
        "text_lang_stats": lambda s, d: lang_token_stats(_docs(s, d)),
        "text_top_bigrams": lambda s, d: top_bigrams(_docs(s, d)),
        "text_token_bpeish": lambda s, d: token_count_bpeish(_docs(s, d)),
        "sample_stratified": lambda s, d: stratified_sample(_docs(s, d)),
        "domain_rebalance": lambda s, d: domain_rebalance(_docs(s, d)),
        "curation_pipeline": lambda s, d: curation_pipeline(_docs(s, d)),
        "text_normalize": lambda s, d: text_normalized(_docs(s, d)),
        "dedup_normalized": lambda s, d: dedup_normalized(_docs(s, d)),
        "text_repetition_signals": lambda s, d: repetition_signals(_docs(s, d)),
        "pii_redact": lambda s, d: pii_redact(_docs(s, d)),
        "dedup_chunks": lambda s, d: chunk_dedup_stats(_docs(s, d)),
        "tfidf_top_terms": lambda s, d: tfidf_top_terms(_docs(s, d)),
        "repeated_ngram_fraction": lambda s, d: repeated_ngram_fraction(
            _docs(s, d)
        ),
        "quality_classifier": lambda s, d: quality_classifier(_docs(s, d)),
        "dedup_chunks_cdc": lambda s, d: cdc_chunk_dedup(_docs(s, d)),
        # decontamination demo split: docs with id%10==7 play the eval
        # set, the rest the training corpus
        "decontaminate_corpus": lambda s, d: decontaminate(
            _docs(s, d).where(F.col("doc_id") % 10 != 7),
            _docs(s, d).where(F.col("doc_id") % 10 == 7),
        ),
        "boilerplate_segments": lambda s, d: boilerplate_segments(_docs(s, d)),
        "bm25_term_scores": lambda s, d: bm25_term_scores(_docs(s, d)),
        "phrase_search": lambda s, d: phrase_search(_docs(s, d)),
        "rrf_fusion": lambda s, d: rrf_fusion(_docs(s, d)),
        "sequence_packing": lambda s, d: sequence_packing(_docs(s, d)),
        "split_leakage_audit": lambda s, d: split_leakage_audit(_docs(s, d)),
        "edit_distance_pairs": lambda s, d: edit_distance_consecutive(_docs(s, d)),
        "novelty_curve": lambda s, d: novelty_curve(_docs(s, d)),
        "rouge_overlap_pairs": lambda s, d: rouge_consecutive(_docs(s, d)),
        "corpus_token_budget": lambda s, d: corpus_token_budget(_docs(s, d)),
        "dedup_savings_histogram": lambda s, d: dedup_savings_histogram(_docs(s, d)),
        "kfold_balance_audit": lambda s, d: kfold_balance_audit(_docs(s, d)),
    }


TEXT_ORACLES: dict[str, str] = {
    "dedup_exact": EXACT_DEDUP_SQL,
    "rouge_overlap_pairs": ROUGE_CONSECUTIVE_SQL,
    "corpus_token_budget": CORPUS_TOKEN_BUDGET_SQL,
    "dedup_savings_histogram": DEDUP_SAVINGS_SQL,
    "kfold_balance_audit": KFOLD_BALANCE_SQL,
    "dedup_minhash_lsh": minhash_lsh_pairs_sql(),
    "dedup_ngram_jaccard": ngram_jaccard_lsh_sql(),
    "dedup_jaccard_all_pairs": ngram_jaccard_pairs_sql(),
    # the prefix-filtered join is exact-complete, so its oracle IS the
    # exhaustive all-pairs SQL — agreement proves zero candidate loss.
    # Registered at t=0.5, the near-dup operating point where the
    # prefix actually prunes (t=0.2 keeps ~80% of every prefix).
    "dedup_jaccard_prefix": ngram_jaccard_pairs_sql(0.5),
    "dedup_simhash": simhash32_sql(),
    "dedup_simhash_pairs": simhash_near_pairs_sql(),
    "text_token_stats": token_stats_sql(),
    "text_lang_id": lang_id_sql(),
    "lang_id_kappa": lang_id_kappa_sql(),
    "text_fingerprint": doc_fingerprint_sql(),
    "text_quality_score": quality_score_sql(),
    "dedup_components": lsh_components_sql(),
    # the star-mode variant must produce the IDENTICAL labeling, so it
    # shares the transitive-closure oracle verbatim
    "dedup_components_star": lsh_components_sql(),
    "text_lang_stats": LANG_TOKEN_STATS_SQL,
    "text_top_bigrams": top_bigrams_sql(),
    "text_token_bpeish": TOKEN_COUNT_BPEISH_SQL,
    "sample_stratified": stratified_sample_sql(),
    "curation_pipeline": curation_pipeline_sql(),
    "text_normalize": text_normalized_sql(),
    "dedup_normalized": dedup_normalized_sql(),
    "decontaminate_corpus": decontaminate_sql(),
    "text_repetition_signals": repetition_signals_sql(),
    "pii_redact": pii_redact_sql(),
    "dedup_chunks": chunk_dedup_stats_sql(),
    "tfidf_top_terms": tfidf_top_terms_sql(),
    "repeated_ngram_fraction": repeated_ngram_fraction_sql(),
    "quality_classifier": quality_classifier_sql(),
    "dedup_chunks_cdc": cdc_chunk_dedup_sql(),
}


def domain_rebalance(docs: DataFrame) -> DataFrame:
    """Domain-mixing rebalance: deterministically downsample so every
    source contributes (at most) an equal CHARACTER share — the data
    mixing stage that stops one crawl dump from dominating a training
    run (the source-weighting practice of public LLM data recipes).

    Per source s: weight_s = total_chars / (S * chars_s), capped at 1.
    The keep decision compares a content-hash bucket against the
    weight CROSS-MULTIPLIED into BIGINTs —

        keep  <=>  h * S * chars_s < total_chars * M

    — no float ever, so the sample is bit-stable across engines,
    partitionings, and re-runs (and at 10^12-doc scale the products
    ride DECIMAL(38,0); here BIGINT headroom is ample).  Scale shape:
    one hash-agg to per-source char totals (|S| rows), the grand
    total via an unpartitioned window over those |S| rows, a
    broadcast join back onto docs, and a map-side filter — the corpus
    itself never shuffles."""
    M = 1_000_000
    per_src = docs.groupBy("source").agg(
        F.sum("n_chars").cast("long").alias("chars_s")
    )
    w = Window.partitionBy()
    per_src = per_src.select(
        "source",
        "chars_s",
        F.sum("chars_s").over(w).cast("long").alias("total_chars"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_sources"),
    )
    h = hash31(F.concat(F.lit("rebal|"), F.col("text"))) % M
    joined = docs.join(F.broadcast(per_src), "source")
    keep = (
        h * F.col("n_sources") * F.col("chars_s")
        < F.col("total_chars") * F.lit(M)
    )
    return joined.where(keep).select(
        "doc_id",
        "source",
        h.cast("long").alias("rebal_bucket"),
    )


def domain_rebalance_sql() -> str:
    M = 1_000_000
    inner = hash31_sql("'rebal|' || text")
    h = f"({inner} % {M})"
    return f"""
WITH per_src AS (
  SELECT source, sum(n_chars)::BIGINT AS chars_s FROM documents GROUP BY 1),
tot AS (
  SELECT source, chars_s,
         sum(chars_s) OVER ()::BIGINT AS total_chars,
         count(*) OVER ()::BIGINT AS n_sources
  FROM per_src)
SELECT d.doc_id, d.source, {h}::BIGINT AS rebal_bucket
FROM documents d JOIN tot t ON d.source = t.source
WHERE {h} * t.n_sources * t.chars_s < t.total_chars * {M}
"""


TEXT_ORACLES["domain_rebalance"] = domain_rebalance_sql()


# ------------------------------------------------------- containment dedup
def containment_pairs(
    docs: DataFrame, threshold_pct: int = 80, stop_df: int = 50
) -> DataFrame:
    """ASYMMETRIC near-dup detection: document A is (nearly) CONTAINED
    in document B when >= threshold_pct% of A's shingles also appear
    in B — the quote/subsumption case symmetric Jaccard misses (a
    short doc pasted into a long one scores low Jaccard but 1.0
    containment).  The subsumed side is what a curation pass drops.

    Scale shape: the classic INVERTED-INDEX join — explode to
    (doc, shingle-hash), drop shingles in more than ``stop_df`` docs
    (boilerplate cut: bounds the per-shingle join fan-out, the
    standard df-cap), equi-join on the hash, count shared per pair.
    Never all-pairs; the df-cap makes the worst shingle cost
    stop_df^2, independent of corpus size.  Containment compares in
    integer space (shared * 100 >= pct * |A|); the reported ratio is
    one double division."""
    ex = _exploded_shingle_hashes(docs).distinct()
    keep = (
        ex.groupBy("h")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") <= stop_df)
        .select("h")
    )
    filt = ex.join(keep, "h")
    sizes = filt.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = filt.select(F.col("doc_id").alias("contained_id"), "h")
    b = filt.select(F.col("doc_id").alias("container_id"), "h")
    inter = (
        a.join(b, "h")
        .where(F.col("contained_id") != F.col("container_id"))
        .groupBy("contained_id", "container_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        inter.join(
            sizes.select(
                F.col("doc_id").alias("contained_id"), F.col("sz")
            ),
            "contained_id",
        )
        .where(
            F.col("n_shared") * 100 >= F.lit(threshold_pct) * F.col("sz")
        )
        .select(
            "contained_id",
            "container_id",
            F.col("n_shared").cast("long").alias("n_shared"),
            F.col("sz").cast("long").alias("n_shingles"),
            (
                F.col("n_shared").cast("double") / F.col("sz").cast("double")
            ).alias("containment"),
        )
    )


def containment_pairs_sql(threshold_pct: int = 80, stop_df: int = 50) -> str:
    return f"""
WITH ex AS (
  SELECT DISTINCT doc_id, {hash31_sql('sh')} AS h
  FROM (SELECT doc_id, unnest({shingles_sql()}) AS sh FROM documents)),
keep AS (SELECT h FROM ex GROUP BY h HAVING count(*) <= {stop_df}),
filt AS (SELECT ex.doc_id, ex.h FROM ex JOIN keep USING (h)),
sizes AS (SELECT doc_id, count(*)::BIGINT AS sz FROM filt GROUP BY 1),
inter AS (
  SELECT a.doc_id AS contained_id, b.doc_id AS container_id,
         count(*)::BIGINT AS n_shared
  FROM filt a JOIN filt b USING (h)
  WHERE a.doc_id <> b.doc_id
  GROUP BY 1, 2)
SELECT i.contained_id, i.container_id, i.n_shared,
       s.sz AS n_shingles,
       CAST(i.n_shared AS DOUBLE) / CAST(s.sz AS DOUBLE) AS containment
FROM inter i JOIN sizes s ON s.doc_id = i.contained_id
WHERE i.n_shared * 100 >= {threshold_pct} * s.sz
"""


# -------------------------------------------------- boilerplate removal
def boilerplate_segments(
    docs: DataFrame, size: int = 4, min_docs: int = 3
) -> DataFrame:
    """Cross-document boilerplate filtering (the CCNet / RefinedWeb
    line-dedup stage, adapted to segment granularity): a fixed
    ``size``-token segment that appears in >= ``min_docs`` DISTINCT
    documents is boilerplate (headers, footers, navigation chrome,
    license banners) and is dropped from every document that carries
    it — unlike ``chunk_dedup_stats`` (first occurrence survives),
    boilerplate removal keeps NO copy.

    Per doc: segment counts, token counts before/after, and the kept
    fraction (single integer division — cross-engine exact).

    Scale shape: explode -> hash-agg on the 64-bit segment hash to
    per-segment distinct-doc counts (no window, no global sort) ->
    broadcast-size boilerplate set?  No: the boilerplate set is data-
    dependent, so it flows back by a shuffle equi-join on the hash,
    then one hash re-agg by doc_id.  Three shuffles total, all on
    high-cardinality keys; nothing quadratic, nothing collected.
    """
    w = tokens(F.col("text"))
    n_seg = F.floor((F.size(w) + (size - 1)) / size).cast("int")
    segs = F.transform(
        index_seq(n_seg),
        lambda i: F.concat_ws(" ", F.slice(w, (i - 1) * size + 1, size)),
    )
    ex = (
        docs.select(
            "doc_id",
            F.size(w).alias("total_tokens"),
            F.posexplode(segs).alias("seg_idx", "seg"),
        )
        .select(
            "doc_id",
            "total_tokens",
            "seg_idx",
            md5_lower64(F.col("seg")).alias("sk"),
            F.size(tokens(F.col("seg"))).alias("seg_tokens"),
        )
    )
    per_seg = ex.groupBy("sk").agg(
        F.countDistinct("doc_id").cast("long").alias("n_docs")
    )
    j = ex.join(per_seg, "sk").withColumn(
        "is_boiler", (F.col("n_docs") >= min_docs).cast("int")
    )
    agg = j.groupBy("doc_id").agg(
        F.max("total_tokens").cast("long").alias("total_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_segments"),
        F.sum("is_boiler").cast("long").alias("n_boiler_segments"),
        F.sum(
            F.when(F.col("is_boiler") == 0, F.col("seg_tokens")).otherwise(0)
        )
        .cast("long")
        .alias("kept_tokens"),
    )
    return agg.select(
        "doc_id",
        "total_tokens",
        "n_segments",
        "n_boiler_segments",
        "kept_tokens",
        (F.col("kept_tokens") / F.col("total_tokens")).alias("kept_frac"),
    )


def boilerplate_segments_sql(size: int = 4, min_docs: int = 3) -> str:
    ch = (
        f"list_transform(generate_series(1, greatest((len({TOKENS_SQL}) + {size - 1})"
        f" // {size}, 0)), i -> array_to_string(list_slice({TOKENS_SQL},"
        f" (i - 1) * {size} + 1, i * {size}), ' '))"
    )
    seg_tok = (
        "CASE WHEN trim(seg) = '' THEN 0 "
        "ELSE len(regexp_split_to_array(trim(seg), '\\s+')) END"
    )
    return f"""
WITH ch AS (SELECT doc_id, len({TOKENS_SQL}) AS total_tokens, {ch} AS chunks
            FROM documents),
ex AS (
  SELECT doc_id, total_tokens, chunks[i] AS seg,
         {md5_lower64_sql('chunks[i]')} AS sk
  FROM ch CROSS JOIN UNNEST(generate_series(1, len(chunks))) AS t(i)),
per_seg AS (SELECT sk, count(DISTINCT doc_id)::BIGINT AS n_docs
            FROM ex GROUP BY sk),
j AS (
  SELECT ex.doc_id, ex.total_tokens,
         CASE WHEN p.n_docs >= {min_docs} THEN 1 ELSE 0 END AS is_boiler,
         {seg_tok} AS seg_tokens
  FROM ex JOIN per_seg p USING (sk))
SELECT doc_id,
       max(total_tokens)::BIGINT AS total_tokens,
       count(*)::BIGINT AS n_segments,
       sum(is_boiler)::BIGINT AS n_boiler_segments,
       sum(CASE WHEN is_boiler = 0 THEN seg_tokens ELSE 0 END)::BIGINT
         AS kept_tokens,
       sum(CASE WHEN is_boiler = 0 THEN seg_tokens ELSE 0 END)::BIGINT
         / max(total_tokens)::BIGINT AS kept_frac
FROM j GROUP BY doc_id
"""


# ------------------------------------------------------- BM25 retrieval
BM25_TERMS = ("spark", "merge", "window")


def bm25_term_scores(
    docs: DataFrame, terms: tuple[str, ...] = BM25_TERMS, k: int = 10
) -> DataFrame:
    """BM25 ranked retrieval, per query term: top-``k`` documents by
    the Okapi BM25 term weight with k1 = 6/5, b = 3/4 and the
    rational idf surrogate R = (2N - 2df + 1) / (2df + 1) (strictly
    monotone in the Robertson idf ln((N - df + .5)/(df + .5)), so the
    RANKING is identical while staying transcendental-free).

    Clearing every fraction (k1, b, the .5's, and avgdl = L/N) gives

        score = (2N - 2df + 1) * 44 * tf * L
                / ((2df + 1) * (20*L*tf + 6*L + 18*dl*N))

    — two BIGINT products and ONE division, which IEEE-754 rounds
    identically in every engine, so scores (not just ranks) are
    bit-exact vs the oracle.  At 10^12-doc scale the products ride
    DECIMAL(38,0); at test scale BIGINT headroom is ample (num <=
    ~6e14 at sf0.1).

    Scale shape: one corpus scan for (tf, dl) of matching docs
    (explode -> filter ON the exploded term, so non-query terms never
    reach the aggregate), a |terms|-row df aggregate broadcast back,
    the 2-value corpus scalar (N, L) broadcast, and a per-term top-k
    window partitioned by term — never a global sort.
    """
    w = tokens(F.col("text"))
    term_lits = F.array(*[F.lit(t) for t in terms])
    base = docs.select("doc_id", F.size(w).alias("dl"), w.alias("toks"))
    corpus = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_len"),
    )
    ex = base.select(
        "doc_id", "dl", F.explode("toks").alias("term")
    ).where(F.array_contains(term_lits, F.col("term")))
    tf = ex.groupBy("term", "doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("tf"), F.max("dl").alias("dl")
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    j = (
        tf.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(corpus))
        .withColumn(
            "num",
            (2 * F.col("n_docs") - 2 * F.col("df") + 1)
            * 44
            * F.col("tf")
            * F.col("total_len"),
        )
        .withColumn(
            "den",
            (2 * F.col("df") + 1)
            * (
                20 * F.col("total_len") * F.col("tf")
                + 6 * F.col("total_len")
                + 18 * F.col("dl") * F.col("n_docs")
            ),
        )
        .withColumn("score", F.col("num") / F.col("den"))
    )
    win = Window.partitionBy("term").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        j.withColumn("rk", F.row_number().over(win))
        .where(F.col("rk") <= k)
        .select("term", "doc_id", "tf", "df", "dl", "score")
    )


def bm25_term_scores_sql(
    terms: tuple[str, ...] = BM25_TERMS, k: int = 10
) -> str:
    tlist = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH base AS (SELECT doc_id, len({TOKENS_SQL}) AS dl, {TOKENS_SQL} AS toks
              FROM documents),
corpus AS (SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS total_len
           FROM base),
ex AS (SELECT doc_id, dl, unnest(toks) AS term FROM base),
tf AS (SELECT term, doc_id, count(*)::BIGINT AS tf, max(dl)::BIGINT AS dl
       FROM ex WHERE term IN ({tlist}) GROUP BY term, doc_id),
dfq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
j AS (
  SELECT t.term, t.doc_id, t.tf, d.df, t.dl,
         ((2 * c.n_docs - 2 * d.df + 1) * 44 * t.tf * c.total_len)
           / ((2 * d.df + 1)
              * (20 * c.total_len * t.tf + 6 * c.total_len
                 + 18 * t.dl * c.n_docs)) AS score
  FROM tf t JOIN dfq d USING (term) CROSS JOIN corpus c)
SELECT term, doc_id, tf, df, dl, score
FROM (SELECT *, row_number() OVER (PARTITION BY term
                                   ORDER BY score DESC, doc_id) AS rk
      FROM j)
WHERE rk <= {k}
"""


TEXT_ORACLES["boilerplate_segments"] = boilerplate_segments_sql()
TEXT_ORACLES["bm25_term_scores"] = bm25_term_scores_sql()


# ---------------------------------------------------- phrase retrieval
PHRASE = ("table", "hash", "scan")


def phrase_search(
    docs: DataFrame, phrase: tuple[str, ...] = PHRASE
) -> DataFrame:
    """Exact phrase retrieval via a POSITIONAL inverted index: the
    classic search-engine primitive BM25 can't express (term adjacency
    matters, bags of words don't).

    The index is (doc_id, term, pos) postings for ONLY the phrase's
    terms (the filter sits on the exploded term, so the index join
    never sees the rest of the vocabulary).  A phrase of k terms is a
    chain of k-1 self equi-joins on (doc_id, pos + i) — position
    arithmetic in the join key keeps it a hash join, the adjacency is
    never a residual scan.  Matches may overlap (positions 3 and 4 of
    "a a a" both start "a a"); each start position counts once.

    Scale shape: one corpus scan -> explode -> term filter (pushed to
    the scan for the dictionary-encoded column) -> k-1 shuffle
    equi-joins keyed (doc_id, pos) -> per-doc hash-agg.  Postings are
    Zipf-skewed per term but the join key includes doc_id, so no hot
    single key exists."""
    w = tokens(F.col("text"))
    ex = docs.select(
        "doc_id", F.posexplode(w).alias("pos", "term")
    ).where(F.col("term").isin(*phrase))
    parts = [
        ex.where(F.col("term") == t).select(
            "doc_id", (F.col("pos") - i).alias("start")
        )
        for i, t in enumerate(phrase)
    ]
    j = parts[0]
    for p in parts[1:]:
        j = j.join(p, ["doc_id", "start"])
    return j.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_matches"),
        F.min("start").cast("long").alias("first_pos"),
    )


def phrase_search_sql(phrase: tuple[str, ...] = PHRASE) -> str:
    # DuckDB generate_subscripts is 1-based; Spark posexplode 0-based
    ex = (
        f"SELECT doc_id, unnest({TOKENS_SQL}) AS term, "
        f"generate_subscripts({TOKENS_SQL}, 1) - 1 AS pos FROM documents"
    )
    joins = []
    for i, t in enumerate(phrase):
        joins.append(
            f"p{i} AS (SELECT doc_id, pos - {i} AS start FROM ex "
            f"WHERE term = '{t}')"
        )
    chain = " ".join(
        f"JOIN p{i} USING (doc_id, start)" for i in range(1, len(phrase))
    )
    return f"""
WITH ex AS ({ex}),
{", ".join(joins)}
SELECT doc_id, count(*)::BIGINT AS n_matches,
       min(start)::BIGINT AS first_pos
FROM p0 {chain}
GROUP BY doc_id
"""


TEXT_ORACLES["phrase_search"] = phrase_search_sql()


def rrf_fusion(
    docs: DataFrame, terms: tuple[str, ...] = BM25_TERMS, k: int = 20
) -> DataFrame:
    """Reciprocal-rank fusion (RRF, K = 60) of the per-term BM25
    rankings — the hybrid-search combiner: a document's fused score is
    sum over ranking lanes of 1 / (60 + rank_lane(doc)), which rewards
    documents that rank well EVERYWHERE without comparing raw scores
    across lanes (scales differ; ranks don't).

    Determinism: the fused score is a FIXED three-branch expression
    coalesce(1/(60+r1),0) + coalesce(1/(60+r2),0) + coalesce(1/(60+r3),0)
    — same division, same left-to-right additions on both engines, so
    doubles are bit-equal (no data-order-dependent float aggregation
    anywhere).

    Scale shape: the BM25 (tf, df) pipeline unchanged, per-term rank
    windows partitioned by term, a per-doc hash-agg pivoting the <=
    |terms| ranks into columns, and a TakeOrderedAndProject top-k."""
    w = tokens(F.col("text"))
    term_lits = F.array(*[F.lit(t) for t in terms])
    base = docs.select("doc_id", F.size(w).alias("dl"), w.alias("toks"))
    corpus = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_len"),
    )
    ex = base.select(
        "doc_id", "dl", F.explode("toks").alias("term")
    ).where(F.array_contains(term_lits, F.col("term")))
    tf = ex.groupBy("term", "doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("tf"), F.max("dl").alias("dl")
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    scored = (
        tf.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(corpus))
        .withColumn(
            "score",
            (
                (2 * F.col("n_docs") - 2 * F.col("df") + 1)
                * 44
                * F.col("tf")
                * F.col("total_len")
            )
            / (
                (2 * F.col("df") + 1)
                * (
                    20 * F.col("total_len") * F.col("tf")
                    + 6 * F.col("total_len")
                    + 18 * F.col("dl") * F.col("n_docs")
                )
            ),
        )
    )
    win = Window.partitionBy("term").orderBy(F.desc("score"), F.asc("doc_id"))
    ranked = scored.withColumn("rk", F.row_number().over(win).cast("long"))
    pivoted = ranked.groupBy("doc_id").agg(
        *[
            F.min(F.when(F.col("term") == t, F.col("rk"))).alias(f"r_{t}")
            for t in terms
        ]
    )
    fused = sum(
        (
            F.coalesce(1.0 / (60 + F.col(f"r_{t}")), F.lit(0.0))
            for t in terms[1:]
        ),
        F.coalesce(1.0 / (60 + F.col(f"r_{terms[0]}")), F.lit(0.0)),
    )
    out = pivoted.select(
        "doc_id",
        # 0 = "absent from this lane" (ranks are 1-based): keeps the
        # column NULL-free so int dtypes survive every pandas bridge
        *[
            F.coalesce(F.col(f"r_{t}"), F.lit(0)).cast("long").alias(f"r_{t}")
            for t in terms
        ],
        fused.alias("rrf_score"),
    )
    return out.orderBy(F.desc("rrf_score"), F.asc("doc_id")).limit(k)


def rrf_fusion_sql(terms: tuple[str, ...] = BM25_TERMS, k: int = 20) -> str:
    tlist = ", ".join(f"'{t}'" for t in terms)
    rcols = ",\n         ".join(
        f"coalesce(min(CASE WHEN term = '{t}' THEN rk END), 0)::BIGINT"
        f" AS r_{t}"
        for t in terms
    )
    fuse = " + ".join(
        f"CASE WHEN r_{t} > 0 THEN 1.0::DOUBLE / (60 + r_{t})"
        f" ELSE 0.0::DOUBLE END"
        for t in terms
    )
    return f"""
WITH base AS (SELECT doc_id, len({TOKENS_SQL}) AS dl, {TOKENS_SQL} AS toks
              FROM documents),
corpus AS (SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS total_len
           FROM base),
ex AS (SELECT doc_id, dl, unnest(toks) AS term FROM base),
tf AS (SELECT term, doc_id, count(*)::BIGINT AS tf, max(dl)::BIGINT AS dl
       FROM ex WHERE term IN ({tlist}) GROUP BY term, doc_id),
dfq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
scored AS (
  SELECT t.term, t.doc_id,
         ((2 * c.n_docs - 2 * d.df + 1) * 44 * t.tf * c.total_len)
           / ((2 * d.df + 1)
              * (20 * c.total_len * t.tf + 6 * c.total_len
                 + 18 * t.dl * c.n_docs)) AS score
  FROM tf t JOIN dfq d USING (term) CROSS JOIN corpus c),
ranked AS (
  SELECT term, doc_id,
         row_number() OVER (PARTITION BY term
                            ORDER BY score DESC, doc_id)::BIGINT AS rk
  FROM scored),
pivoted AS (
  SELECT doc_id,
         {rcols}
  FROM ranked GROUP BY doc_id)
SELECT doc_id, {", ".join(f"r_{t}" for t in terms)},
       {fuse} AS rrf_score
FROM pivoted
ORDER BY rrf_score DESC, doc_id
LIMIT {k}
"""


TEXT_ORACLES["rrf_fusion"] = rrf_fusion_sql()


# ---------------------------------------------------- sequence packing
PACK_CAP = 256


def sequence_packing(docs: DataFrame, cap: int = PACK_CAP) -> DataFrame:
    """Training-sequence packing: greedily pack documents into
    fixed-capacity token bins per source, in deterministic doc_id
    order — the pre-training batching step that turns a variable-
    length corpus into fixed-length training sequences with minimal
    padding.  A document longer than ``cap`` occupies a bin alone
    (never split, matching packers that over-length-truncate later).

    The greedy fill is a reset-on-overflow recurrence (like the token
    bucket, no window-frame form exists), hosted per source group in
    one ``applyInPandas`` — PURE INTEGER state (bin id, tokens used),
    so the recursive-CTE oracle is exact.  Scale shape: one shuffle
    on source; each group streams through Arrow once.  At 10^12 docs
    the order key becomes (shard, doc_id) so groups stay bounded."""
    from pyspark.sql import types as T
    import pandas as pd

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("source", T.StringType(), False),
            T.StructField("n_tokens", T.LongType(), False),
            T.StructField("bin_id", T.LongType(), False),
            T.StructField("used_after", T.LongType(), False),
        ]
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id", kind="mergesort").reset_index(
            drop=True
        )
        lens = pdf["n_tokens"].astype("int64").tolist()
        bins, used_out = [], []
        bin_id, used = 1, 0
        for ln in lens:
            if used > 0 and used + ln > cap:
                bin_id += 1
                used = 0
            used += ln
            bins.append(bin_id)
            used_out.append(used)
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "source": pdf["source"],
                "n_tokens": lens,
                "bin_id": bins,
                "used_after": used_out,
            }
        )

    w = tokens(F.col("text"))
    base = docs.select(
        "doc_id", "source", F.size(w).cast("long").alias("n_tokens")
    )
    return base.groupBy("source").applyInPandas(_pack, schema=out_schema)


def sequence_packing_sql(cap: int = PACK_CAP) -> str:
    return f"""
WITH RECURSIVE base AS (
  SELECT doc_id::BIGINT AS doc_id, source,
         len({TOKENS_SQL})::BIGINT AS n_tokens,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM documents),
pk AS (
  SELECT doc_id, source, n_tokens, rn,
         1::BIGINT AS bin_id, n_tokens AS used_after
  FROM base WHERE rn = 1
  UNION ALL
  SELECT n.doc_id, n.source, n.n_tokens, n.rn,
         CASE WHEN p.used_after > 0 AND p.used_after + n.n_tokens > {cap}
              THEN p.bin_id + 1 ELSE p.bin_id END,
         CASE WHEN p.used_after > 0 AND p.used_after + n.n_tokens > {cap}
              THEN n.n_tokens ELSE p.used_after + n.n_tokens END
  FROM pk p JOIN base n ON n.source = p.source AND n.rn = p.rn + 1)
SELECT doc_id, source, n_tokens, bin_id, used_after FROM pk
"""


TEXT_ORACLES["sequence_packing"] = sequence_packing_sql()


# ----------------------------------------------- split leakage audit
def split_leakage_audit(docs: DataFrame) -> DataFrame:
    """Train/val/test split with a LEAKAGE audit: documents are
    assigned to splits by content-free hash (doc_id md5 mod 10 ->
    8/1/1), then every MinHash-LSH near-dup candidate pair that
    STRADDLES two different splits is reported — the eval-integrity
    check an LLM data pipeline must run, because a random split sends
    one copy of a near-duplicate to train and its twin to test and
    silently inflates eval scores.

    Output: one row per straddling pair with both splits named, plus
    per-pair band evidence count.  Scale shape: the banded LSH
    self-join unchanged (linear in bucket sizes), two broadcast-free
    equi-joins to attach split labels (the label frame is the corpus
    itself — never broadcast), one hash-agg."""
    split = F.element_at(
        F.array(F.lit("train"), F.lit("val"), F.lit("test")),
        F.when(md5_lower64(F.col("doc_id").cast("string")) % 10 < 8, 1)
        .when(md5_lower64(F.col("doc_id").cast("string")) % 10 == 8, 2)
        .otherwise(3),
    )
    labels = docs.select("doc_id", split.alias("split"))
    pairs = minhash_lsh_pairs(docs)
    la = labels.select(
        F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a")
    )
    lb = labels.select(
        F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b")
    )
    return (
        pairs.join(la, "doc_a")
        .join(lb, "doc_b")
        .where(F.col("split_a") != F.col("split_b"))
        .select("doc_a", "doc_b", "split_a", "split_b")
    )


def split_leakage_audit_sql() -> str:
    lsh = minhash_lsh_pairs_sql()
    h = md5_lower64_sql("doc_id::VARCHAR")
    return f"""
WITH pairs AS ({lsh}),
labels AS (
  SELECT doc_id,
         CASE WHEN {h} % 10 < 8 THEN 'train'
              WHEN {h} % 10 = 8 THEN 'val'
              ELSE 'test' END AS split
  FROM documents)
SELECT p.doc_a, p.doc_b, la.split AS split_a, lb.split AS split_b
FROM pairs p
JOIN labels la ON la.doc_id = p.doc_a
JOIN labels lb ON lb.doc_id = p.doc_b
WHERE la.split <> lb.split
"""


TEXT_ORACLES["split_leakage_audit"] = split_leakage_audit_sql()


# ----------------------------------------------- prefix-filtered ssjoin
def jaccard_prefix_pairs(
    docs: DataFrame, threshold: float = 0.2
) -> DataFrame:
    """EXACT-COMPLETE similarity self-join via prefix filtering — the
    ppjoin-family candidate generation (Chaudhuri/Ganti/Kaushik 2006,
    Xiao et al. 2008, both public): order each document's shingles by
    GLOBAL rarity (document frequency asc, shingle asc) and emit only
    the first ``n - ceil(t*n) + 1`` as join keys.  If two sets have
    Jaccard >= t they MUST share a prefix shingle under the shared
    order, so unlike the MinHash-LSH lane (probabilistic recall) this
    candidate set provably contains every qualifying pair — while a
    frequent shingle contributes candidates only from the few docs
    where it lands inside the rare-first prefix, not from its whole
    posting list (the quadratic blowup ``ngram_jaccard_pairs`` hits).

    Scale shape: df counts = one hash agg over exploded shingles;
    rarity order needs NO global ordinal — each doc sorts its own
    shingles by (df, sh) in a doc_id-partitioned window; candidates =
    one shuffle equi-join on the prefix shingle; verify walks exactly
    the candidate pairs (``ngram_jaccard_verify``).  Nothing unbounded
    is broadcast, no window is unpartitioned.

    The completeness invariant (result == the exhaustive all-pairs
    join, bit-for-bit) is pytest-gated, and the registered driver
    query's oracle IS the exhaustive all-pairs SQL."""
    # the exploded shingle frame feeds df counts, per-doc sizes AND
    # the ranked prefix — one lazy persist, one raw scan (at 10^12
    # docs use DISK_ONLY; the frame is corpus x ~shingles wide)
    sh = docs.select(
        "doc_id", F.explode(shingles(F.col("text"))).alias("sh")
    ).persist()
    dfreq = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    ranked = sh.join(dfreq, "sh").withColumn(
        "pos",
        F.row_number().over(
            Window.partitionBy("doc_id").orderBy("df", "sh")
        ),
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    pref = (
        ranked.join(sizes, "doc_id")
        .where(
            F.col("pos")
            <= F.col("n_sh") - F.ceil(F.lit(threshold) * F.col("n_sh")) + 1
        )
        .select("doc_id", "sh", "n_sh")
    )
    a, b = pref.alias("a"), pref.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            # size filter: J >= t forces t*max(na, nb) <= min(na, nb)
            & (F.col("b.n_sh") >= threshold * F.col("a.n_sh"))
            & (F.col("a.n_sh") >= threshold * F.col("b.n_sh")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    return ngram_jaccard_verify(cand, docs, threshold)


# ---------------------------------------------------------- edit distance
def edit_distance_consecutive(docs: DataFrame) -> DataFrame:
    """Levenshtein distance between consecutive documents of each
    source (doc_id order) — the revision-delta / near-rewrite signal
    a crawl-curation pipeline inspects between neighboring snapshots.

    Entirely JVM-side: ``F.levenshtein`` is a built-in codegen
    expression, the only shuffle is the source-partitioned window
    sort.  Exactness caveat, pinned by test: Spark computes edit
    distance over CODEPOINTS while DuckDB's ``levenshtein`` is
    byte-oriented — identical on this ASCII corpus (asserted in the
    suite); normalize/transliterate first if the corpus ever grows
    non-ASCII text.

    Scale: one window sort per source partition; the quadratic
    per-pair DP cost is bounded by document length, not corpus size,
    and rows never leave their executor after the shuffle."""
    w = Window.partitionBy("source").orderBy("doc_id")
    prev_text = F.lag("text").over(w)
    prev_id = F.lag("doc_id").over(w)
    return (
        docs.select(
            "source",
            prev_id.alias("prev_id"),
            F.col("doc_id"),
            F.levenshtein(prev_text, F.col("text")).alias("edit_dist"),
        )
        .where(F.col("prev_id").isNotNull())
        .select(
            "source",
            F.col("prev_id").cast("long").alias("prev_id"),
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("edit_dist").cast("int").alias("edit_dist"),
        )
    )


EDIT_DIST_SQL = """
WITH lagged AS (
  SELECT source,
         lag(doc_id) OVER (PARTITION BY source ORDER BY doc_id) AS prev_id,
         lag(text) OVER (PARTITION BY source ORDER BY doc_id) AS prev_text,
         doc_id, text
  FROM documents)
SELECT source, prev_id::BIGINT AS prev_id, doc_id::BIGINT AS doc_id,
       levenshtein(prev_text, text)::INT AS edit_dist
FROM lagged WHERE prev_id IS NOT NULL
"""

TEXT_ORACLES["edit_distance_pairs"] = EDIT_DIST_SQL


# ------------------------------------------------------------- novelty
def novelty_curve(docs: DataFrame) -> DataFrame:
    """Per-document novelty: the fraction of a doc's distinct shingles
    whose FIRST occurrence (min doc_id over the corpus) is this doc —
    the diminishing-returns curve a crawl dedup pipeline watches to
    decide when more of a source stops adding information.

    Exact: counts are integers, novelty is one double division.
    Scale: one exploded-shingle agg for first-owners (combiner-bound
    on shingle), one per-doc agg, one equi-join — no windows, nothing
    broadcast that grows with the corpus."""
    sh = docs.select(
        "doc_id", F.explode(shingles(F.col("text"))).alias("sh")
    )
    first = sh.groupBy("sh").agg(F.min("doc_id").alias("first_doc"))
    per_doc = (
        sh.join(first, "sh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_novel"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_shingles",
        "n_novel",
        (F.col("n_novel") / F.col("n_shingles")).alias("novelty"),
    )


TEXT_ORACLES["novelty_curve"] = f"""
WITH sh AS (
  SELECT doc_id, unnest({{sh}}) AS sh FROM documents),
first AS (SELECT sh, min(doc_id) AS first_doc FROM sh GROUP BY sh)
SELECT s.doc_id,
       count(*)::BIGINT AS n_shingles,
       sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)::BIGINT
         AS n_novel,
       (sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)::BIGINT)
         ::DOUBLE / count(*) AS novelty
FROM sh s JOIN first f USING (sh)
GROUP BY s.doc_id
""".format(sh=shingles_sql())
