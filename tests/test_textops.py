"""Text / dedup / similarity-search operator tests.

Mirrors the driver's correctness gate: every entry from
``textops.register_text_queries`` and ``simsearch.register_sim_queries``
runs against its DuckDB oracle SQL on the same parquet at sf0.001, and
must agree on sorted rows.  Plus an independent pure-Python MinHash
reference check (no Spark, no DuckDB).
"""

from __future__ import annotations

import hashlib

import duckdb
import pytest

from pyconform_spark import simsearch, textops

SF = "/root/testdata/sf0.001"
TABLES = ["documents", "embeddings"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def _key(t):
    return tuple((x is None, x) for x in t)


def _compare(spark, con, fn, sql):
    sdf = fn(spark, SF)
    cols = sorted(sdf.columns)
    srows = sorted(map(tuple, sdf.select(*cols).collect()), key=_key)
    odf = con.execute(sql).fetch_df()
    orows = sorted(
        map(tuple, odf[cols].itertuples(index=False, name=None)), key=_key
    )
    assert srows == orows, f"{len(srows)} vs {len(orows)} rows"
    return len(srows)


@pytest.mark.parametrize("name", sorted(textops.TEXT_ORACLES))
def test_textop_vs_oracle(spark, con, name):
    n = _compare(
        spark, con, textops.register_text_queries()[name], textops.TEXT_ORACLES[name]
    )
    assert n > 0


@pytest.mark.parametrize("name", sorted(simsearch.SIM_ORACLES))
def test_simsearch_vs_oracle(spark, con, name):
    n = _compare(
        spark, con, simsearch.register_sim_queries()[name], simsearch.SIM_ORACLES[name]
    )
    assert n > 0


def test_minhash_matches_pure_python(spark):
    """Independent reference: recompute one doc's signature with
    hashlib + plain Python and compare with the Spark aggregate."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    row = (
        textops.minhash_signatures(docs.where("doc_id = 7"))
        .collect()[0]
        .asDict()
    )
    text = docs.where("doc_id = 7").first()["text"]
    words = text.split()
    sh = {
        " ".join(words[i : i + textops.SHINGLE_N])
        for i in range(len(words) - textops.SHINGLE_N + 1)
    }
    hs = [
        int.from_bytes(hashlib.md5(s.encode()).digest()[8:16], "little")
        % textops.P31
        for s in sh
    ]
    for i in range(textops.MINHASH_K):
        want = min(
            (h * textops.MINHASH_A[i] + textops.MINHASH_B[i]) % textops.P31
            for h in hs
        )
        assert row[f"mh_{i}"] == want


def test_lsh_pairs_are_jaccard_similar(spark):
    """LSH candidates should be enriched for high Jaccard: every pair
    produced at bands=4/k=16 has jaccard above the ambient median."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in textops.minhash_lsh_pairs(docs).collect()
    }
    assert pairs
    jacc = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in textops.ngram_jaccard_pairs(docs, threshold=0.0).collect()
    }
    for p in pairs:
        assert jacc.get(p, 0.0) > 0.3, (p, jacc.get(p))


def test_ann_lsh_subset_of_bruteforce_space(spark):
    """ANN results must be true neighbors: each (query, vec) cosine
    equals the brute-force cosine for that pair."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    bf = {
        (r["query_id"], r["vec_id"]): r["cosine"]
        for r in simsearch.knn_bruteforce(emb, n_queries=5, k=10**6).collect()
    }
    ann = simsearch.ann_lsh_topk(emb, n_queries=5, k=5).collect()
    assert ann
    for r in ann:
        assert bf[(r["query_id"], r["vec_id"])] == r["cosine"]


def test_hll_correction_table_agrees_across_engines(spark, con):
    """The linear-counting correction is a literal lookup table (ln is
    NOT cross-engine ulp-stable — measured 1-ulp diffs on ~7% of
    inputs); verify the embedded literals round-trip identically
    through both engines for ALL 512 possible zero counts."""
    from pyspark.sql import functions as F

    from pyconform_spark.queries import _HLL_CORR

    arr = F.array(*[F.lit(v) for v in _HLL_CORR])
    df = spark.range(1, 513).select(
        F.col("id").alias("z"), F.element_at(arr, F.col("id").cast("int")).alias("v")
    )
    got = {r["z"]: r["v"] for r in df.collect()}
    lits = ", ".join(f"'{v!r}'::DOUBLE" for v in _HLL_CORR)
    want = dict(
        con.execute(
            f"SELECT i, ([{lits}])[i] FROM generate_series(1, 512) t(i)"
        ).fetchall()
    )
    assert got == want


def test_hll_estimate_accuracy(spark):
    from pyconform_spark import queries as Q

    rows = Q.hll_distinct_users(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        err = abs(r["hll_estimate"] - r["exact_distinct"]) / r["exact_distinct"]
        assert err < 0.15, (r, err)  # 512 buckets => ~4.6% typical error


def test_lsh_components_valid_clustering(spark):
    """Every component label is the min doc_id of the component, and
    every LSH pair lands in the same component."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    comp = {
        r["doc_id"]: r["component_id"]
        for r in textops.lsh_components(docs).collect()
    }
    pairs = textops.minhash_lsh_pairs(docs).collect()
    assert pairs and comp
    for r in pairs:
        assert comp[r["doc_a"]] == comp[r["doc_b"]]
    from collections import defaultdict

    members = defaultdict(list)
    for d, c in comp.items():
        members[c].append(d)
    for c, ds in members.items():
        assert c == min(ds)


def test_ivf_results_are_true_neighbors(spark):
    """IVF top-k cosines equal the brute-force cosines for the same
    pairs (pruning may change WHICH neighbors, never their scores)."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    bf = {
        (r["query_id"], r["vec_id"]): r["cosine"]
        for r in simsearch.knn_bruteforce(emb, n_queries=5, k=10**6).collect()
    }
    ivf = simsearch.ivf_topk(emb, n_queries=5, k=5).collect()
    assert ivf
    for r in ivf:
        assert bf[(r["query_id"], r["vec_id"])] == r["cosine"]


def test_minhash_signatures_identical_across_engines(spark, con):
    """Guard against silent hash-family divergence (the LSH PAIR set
    can coincide even when signatures differ — compare the signatures
    themselves)."""
    sdf = textops.minhash_signatures(
        spark.read.parquet(f"{SF}/documents.parquet")
    )
    cols = ["doc_id"] + [f"mh_{i}" for i in range(textops.MINHASH_K)]
    srows = sorted(map(tuple, sdf.select(*cols).collect()))
    orows = sorted(map(tuple, con.execute(textops.minhash_signatures_sql()).fetchall()))
    assert srows == orows


def test_connected_components_long_chain_with_checkpoints(spark):
    """A path graph of diameter 12 forces >10 propagation rounds, so
    the lineage-truncating localCheckpoint path (every 5 rounds) runs
    at least twice — convergence without plan blowup, labels exact
    (r1 verdict fix #6)."""
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(12)] + [(100, 101), (101, 102)],
        ["doc_a", "doc_b"],
    )
    comp = {
        r["doc_id"]: r["component_id"]
        for r in textops.connected_components(edges, checkpoint_every=5).collect()
    }
    assert {d: c for d, c in comp.items() if d <= 12} == {i: 0 for i in range(13)}
    assert {d: c for d, c in comp.items() if d >= 100} == {
        100: 100, 101: 100, 102: 100
    }


def test_jaccard_verify_composition_matches_exhaustive_on_candidates(spark):
    """ngram_jaccard_lsh == exhaustive Jaccard restricted to the LSH
    candidate set: the composed path changes the CANDIDATES, never the
    similarity math."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    cand = {
        (r["doc_a"], r["doc_b"])
        for r in textops.minhash_lsh_pairs(docs).collect()
    }
    exhaustive = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in textops.ngram_jaccard_pairs(docs, threshold=0.0).collect()
    }
    composed = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in textops.ngram_jaccard_lsh(docs, threshold=0.0).collect()
    }
    want = {p: j for p, j in exhaustive.items() if p in cand and j > 0.0}
    # pairs with zero intersection cannot appear in the composed output
    assert composed == want


def test_cms_never_underestimates(spark):
    """Count-Min property: estimate >= exact for every key (the sketch
    only ever collides upward)."""
    from pyconform_spark import queries as Q

    rows = Q.cms_user_counts(spark, SF).collect()
    assert rows
    assert all(r["cms_estimate"] >= r["exact_count"] for r in rows)


def test_multiprobe_recovers_recall_at_finer_buckets(spark):
    """Recall vs brute force at two bucket widths (r2 verdict item):
    at 10 planes (1024 buckets over 500 vectors) the single-bucket
    probe finds almost nothing; probing the Hamming-1 neighborhood
    must strictly improve recall at the SAME bucketing, and every
    multiprobe hit is still a true neighbor (exact cosine)."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    n_q, k, planes = 10, 5, 10
    bf = {
        (r["query_id"], r["vec_id"]): r["cosine"]
        for r in simsearch.knn_bruteforce(emb, n_queries=n_q, k=10**6).collect()
    }
    topk = {}
    for (qid, vid), cos in bf.items():
        topk.setdefault(qid, []).append((-cos, vid))
    truth = {
        q: {v for _, v in sorted(pairs)[:k]} for q, pairs in topk.items()
    }

    def recall(rows):
        hits = sum(
            1 for r in rows if r["vec_id"] in truth[r["query_id"]]
        )
        return hits / (len(truth) * k)

    single = simsearch.ann_lsh_topk(emb, n_queries=n_q, k=k, n_planes=planes).collect()
    multi = simsearch.ann_lsh_multiprobe(emb, n_queries=n_q, k=k, n_planes=planes).collect()
    r_single, r_multi = recall(single), recall(multi)
    assert r_multi > r_single  # probes buy recall back
    assert len(multi) > len(single)  # more candidates surfaced
    for r in multi:  # every hit is a true neighbor with the exact score
        assert bf[(r["query_id"], r["vec_id"])] == r["cosine"]
    # coarse bucketing (8 planes, 256 buckets) needs no probing to see
    # candidates: recall there should already exceed the fine
    # single-bucket recall — the width/recall trade the knob controls
    coarse = simsearch.ann_lsh_topk(emb, n_queries=n_q, k=k, n_planes=8).collect()
    assert recall(coarse) >= r_single


def test_multitable_amplifies_recall(spark):
    """Two independent plane families must find at least every pair a
    single table finds (union of candidate sets), each hit still a
    true neighbor with the exact brute-force cosine."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    n_q, k, planes = 10, 5, 10
    bf = {
        (r["query_id"], r["vec_id"]): r["cosine"]
        for r in simsearch.knn_bruteforce(emb, n_queries=n_q, k=10**6).collect()
    }
    single = {
        (r["query_id"], r["vec_id"])
        for r in simsearch.ann_lsh_topk(
            emb, n_queries=n_q, k=10**6, n_planes=planes
        ).collect()
    }
    multi_rows = simsearch.ann_lsh_multitable(
        emb, n_queries=n_q, k=10**6, n_planes=planes, n_tables=2
    ).collect()
    multi = {(r["query_id"], r["vec_id"]) for r in multi_rows}
    assert single <= multi          # table 0 alone is a subset
    assert len(multi) > len(single)  # table 1 contributes new candidates
    for r in multi_rows:
        assert bf[(r["query_id"], r["vec_id"])] == r["cosine"]


# ------------------------------------------------ round-3 additions
def test_repetition_signals_crafted(spark):
    docs = spark.createDataFrame(
        [(1, "a a a a"), (2, "a b c d"), (3, "x y x y x y")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in textops.repetition_signals(docs).collect()}
    # doc 1: 4 tokens/1 distinct; bigrams 3x "a a"; trigrams 2x "a a a"
    assert rows[1].dup_token_frac == 3 / 4
    assert rows[1].top_bigram_frac == 1.0
    assert rows[1].dup_trigram_frac == 1 / 2
    # doc 2: everything distinct
    assert rows[2].dup_token_frac == 0.0
    assert rows[2].top_bigram_frac == 1 / 3
    assert rows[2].dup_trigram_frac == 0.0
    # doc 3: 6 tokens/2 distinct; bigrams x-y,y-x,x-y,y-x,x-y; trigrams 4/2
    assert rows[3].dup_token_frac == 4 / 6
    assert rows[3].top_bigram_frac == 3 / 5
    assert rows[3].dup_trigram_frac == 2 / 4


def test_pii_redact_counts_and_scrubs(spark):
    docs = spark.createDataFrame([(7, "hello world")], "doc_id long, text string")
    r = textops.pii_redact(docs).collect()[0]
    assert (r.n_emails, r.n_ips, r.n_phones) == (1, 1, 1)
    for tag in ("<EMAIL>", "<IP>", "<PHONE>"):
        assert tag in r.redacted
    assert "@" not in r.redacted
    assert "555-" not in r.redacted
    assert "10.7.0.7" not in r.redacted
    assert r.redacted.startswith("hello world")


def test_chunk_dedup_keeps_global_first_occurrence(spark):
    a = " ".join(f"a{i}" for i in range(8))
    b = " ".join(f"b{i}" for i in range(8))
    c = " ".join(f"c{i}" for i in range(8))
    docs = spark.createDataFrame(
        [(1, f"{a} {b}"), (2, f"{a} {c}")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in textops.chunk_dedup_stats(docs).collect()}
    assert (out[1].n_chunks, out[1].n_kept) == (2, 2)
    assert (out[2].n_chunks, out[2].n_kept) == (2, 1)  # shared chunk lost
    assert out[2].kept_frac == 0.5


def test_chunk_dedup_ragged_tail_chunk(spark):
    # 10 tokens -> chunks of 8 + 2; the 2-token tail is its own chunk
    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10)))], "doc_id long, text string"
    )
    out = textops.chunk_dedup_stats(docs).collect()[0]
    assert out.n_chunks == 2 and out.n_kept == 2


def test_tfidf_ranks_rare_terms_above_common(spark):
    docs = spark.createDataFrame(
        [(1, "common rare1 common"), (2, "common rare2"), (3, "common")],
        "doc_id long, text string",
    )
    top1 = {
        r.doc_id: r for r in textops.tfidf_top_terms(docs, k=1).collect()
    }
    # doc1: common tf2/df3 = 0.67 < rare1 tf1/df1 = 1.0
    assert top1[1].term == "rare1"
    assert top1[2].term == "rare2"
    assert top1[3].term == "common"
    assert top1[1].df == 1 and top1[3].df == 3


def test_lsh_dup_pairs_exact_verify_and_amplification(spark):
    """Every returned pair is a true near-dup with the exact cosine
    (precision 1.0), and adding a second table only ADDS pairs."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    exact = {
        (r.id_a, r.id_b): r.cosine
        for r in simsearch.cosine_dup_pairs(emb, 0.3, 10**9).collect()
    }
    one = {
        (r.id_a, r.id_b): r.cosine
        for r in simsearch.lsh_dup_pairs(emb, 0.3, n_tables=1).collect()
    }
    two = {
        (r.id_a, r.id_b): r.cosine
        for r in simsearch.lsh_dup_pairs(emb, 0.3, n_tables=2).collect()
    }
    # NOTE: cosine_dup_pairs blocks on label, so `exact` is the
    # label-blocked truth; LSH pairs may cross labels.  Verify against
    # a genuinely exhaustive all-pairs set instead.
    allp = {
        (r.id_a, r.id_b): r.cosine
        for r in simsearch.cosine_dup_pairs(
            emb.withColumn("label", emb.label * 0), 0.3, 10**9
        ).collect()
    }
    assert set(one) <= set(two) <= set(allp)
    for p, c in two.items():
        assert allp[p] == c  # exact verified cosine
    assert len(two) > len(one)  # table 1 contributes new pairs
    assert len(two) >= len(allp) // 10  # sane recall at 4 planes x 2


def test_quality_classifier_deterministic_and_gated(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, ""), (3, "alpha beta gamma")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in textops.quality_classifier(docs).collect()}
    # identical text -> identical score and verdict (pure function)
    assert rows[1].score == rows[3].score
    assert rows[1].verdict == rows[3].verdict
    assert rows[1].n_features == 5  # 3 unigrams + 2 bigrams
    # empty doc: no features, neutral score, kept (total = 0 >= 0)
    assert rows[2].n_features == 0
    assert rows[2].score == 0.0 and rows[2].verdict == "keep"
    # score is the mean-pooled integer weight: recompute one by hand
    import hashlib
    def w(salt, f):
        h = hashlib.md5(f"{salt}-{f}".encode()).digest()
        return int.from_bytes(h[8:16], "little") % 2001 - 1000
    total = sum(w("quni", t) for t in ["alpha", "beta", "gamma"]) + sum(
        w("qbi", b) for b in ["alpha beta", "beta gamma"]
    )
    assert rows[1].score == total / 5
    assert rows[1].verdict == ("keep" if total >= 0 else "drop")


def test_short_doc_windows_match_duckdb_empty_list_semantics(spark, con):
    """Spark sequence(1,0) counts DOWN; DuckDB generate_series(1,0) is
    empty.  index_seq pins the empty semantics: every windowed op must
    accept empty / 1-token / window-1-sized docs without error and
    agree with its oracle's short-doc behavior."""
    docs = spark.createDataFrame(
        [(1, ""), (2, "solo"), (3, "two words")], "doc_id long, text string"
    )
    rep = {r.doc_id: r for r in textops.repetition_signals(docs).collect()}
    assert rep[1].n_tokens == 0 and rep[1].top_bigram_frac == 0.0
    assert rep[2].dup_trigram_frac == 0.0  # no trigrams in 1 token
    assert rep[3].top_bigram_frac == 1.0  # exactly one bigram
    ch = {r.doc_id: r for r in textops.chunk_dedup_stats(docs).collect()}
    assert 1 not in ch  # empty doc has zero chunks -> no group row
    assert (ch[2].n_chunks, ch[2].n_kept) == (1, 1)
    qc = {r.doc_id: r for r in textops.quality_classifier(docs).collect()}
    assert qc[1].n_features == 0 and qc[1].verdict == "keep"
    assert qc[2].n_features == 1  # 1 unigram, 0 bigrams


def test_cdc_chunks_survive_insertion_where_fixed_windows_shift(spark):
    """The CDC property: inserting one token near the front re-chunks
    only the affected span; fixed windows shift everything after it."""
    base = " ".join(f"w{i}" for i in range(64))
    edited = "INSERTED " + base
    docs = spark.createDataFrame(
        [(1, base), (2, edited)], "doc_id long, text string"
    )
    cdc = {r.doc_id: r for r in textops.cdc_chunk_dedup(docs).collect()}
    fixed = {r.doc_id: r for r in textops.chunk_dedup_stats(docs).collect()}
    # doc 2 shares almost all CDC chunks with doc 1 (only the first
    # span differs) but shares NO fixed windows (every one shifted)
    assert cdc[2].n_kept <= 2
    assert fixed[2].n_kept == fixed[2].n_chunks  # nothing deduped
    assert cdc[1].n_kept == cdc[1].n_chunks  # first doc keeps all


def test_cdc_chunks_partition_the_token_stream(spark):
    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(40)))], "doc_id long, text string"
    )
    out = textops.cdc_chunk_dedup(docs).collect()[0]
    # chunks tile the doc: token count preserved through the pipeline
    assert out.n_chunks >= 1 and out.n_kept == out.n_chunks


def test_ann_tuned_recall_gate(spark):
    """THE production-grade gate the r3 verdict asked for: the tuned
    index (multi-table + Hamming-2 probes, parameters designed from
    the corpus row count in the parquet footer) must reach
    recall@10 >= 0.9 against exact brute force on the sf0.01
    embeddings — whose true top-10 neighbors sit near cosine 0.25,
    the adversarial regime for any locality hash."""
    sf = "/root/testdata/sf0.01"
    n = simsearch.parquet_row_count(f"{sf}/embeddings.parquet")
    # designer must agree with the static oracle registration
    assert simsearch.recommend_lsh(n) == (8, 8, 2)

    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    truth = {}
    for r in simsearch.knn_bruteforce(emb, n_queries=5, k=10).collect():
        truth.setdefault(r["query_id"], set()).add(r["vec_id"])
    got = simsearch.ann_lsh_tuned(emb, n_queries=5, k=10, corpus_size=n).collect()
    hits = sum(1 for r in got if r["vec_id"] in truth[r["query_id"]])
    recall = hits / (len(truth) * 10)
    assert recall >= 0.9, recall

    # candidate fraction: the honesty metric — strictly less than the
    # whole corpus even in the adversarial regime
    counts = {
        r["query_id"]: r["n_candidates"]
        for r in simsearch.ann_lsh_tuned_candidate_counts(
            emb, n_queries=5, corpus_size=n
        ).collect()
    }
    frac = sum(counts.values()) / (len(counts) * (n - 1))
    assert 0 < frac < 0.85, frac


def test_ann_tuned_designer_regimes():
    """recommend_lsh scales planes with corpus size and collapses the
    probed fraction in the realistic near-dup regime (cos >= 0.9)."""
    p_small, t_small, r_small = simsearch.recommend_lsh(500)
    p_dup, t_dup, r_dup = simsearch.recommend_lsh(10**12, neighbor_cos=0.9)
    assert p_dup > p_small  # finer bucketing on the easier regime
    # predicted recall holds at the chosen params in both regimes
    assert simsearch.predict_recall(p_small, t_small, r_small, 0.25) >= 0.9
    assert simsearch.predict_recall(p_dup, t_dup, r_dup, 0.9) >= 0.9
    # near-dup regime probes a vanishing corpus fraction per table:
    # |probes| / 2^p
    probes = len(simsearch._probe_masks(p_dup, r_dup))
    assert t_dup * probes / (1 << p_dup) < 0.01


def test_ann_tuned_plan_zero_actions_and_broadcast(spark):
    """Same gates as the other ANN paths: building the tuned plan must
    schedule ZERO Spark jobs (the designer reads parquet footers, not
    count()), and the candidate join must broadcast the probe side —
    never the corpus, never a nested loop."""
    sf = "/root/testdata/sf0.01"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    sc = spark.sparkContext
    sc.setJobGroup("ann-tuned-gate", "plan construction only")
    try:
        n = simsearch.parquet_row_count(f"{sf}/embeddings.parquet")
        df = simsearch.ann_lsh_tuned(emb, corpus_size=n)
        _ = df.schema
        jobs = sc.statusTracker().getJobIdsForGroup("ann-tuned-gate")
    finally:
        sc.setJobGroup("", "")
    assert list(jobs) == []
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_ann_tuned_neardup_regime_measured(spark):
    """The designer's near-dup promise, MEASURED (not just predicted):
    on a corpus where every query's true nearest neighbor is a planted
    near-duplicate (cos ≈ 0.999), the neighbor_cos=0.95 design finds
    it for >= 90% of queries while probing under 10% of the corpus —
    the regime where LSH actually pays."""
    sf = "/root/testdata/sf0.01"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    n = simsearch.parquet_row_count(f"{sf}/embeddings.parquet")
    # the driver oracle hardcodes the design for the 2N=1000 corpus;
    # assert the live designer agrees so the SQL twin can't drift
    assert (
        simsearch.recommend_lsh(2 * n, neighbor_cos=0.95)
        == simsearch.NEARDUP_DESIGN
    )
    aug = simsearch.with_near_dups(emb, n_corpus=n)
    n_q = 20
    top1 = {
        r["query_id"]: r["vec_id"]
        for r in simsearch.ann_lsh_tuned(
            aug, n_queries=n_q, k=1,
            corpus_size=2 * n, neighbor_cos=0.95,
        ).collect()
    }
    # truth needs no bruteforce: the planted dup IS the nearest
    hits = sum(1 for q, v in top1.items() if v == q + n)
    assert hits / n_q >= 0.9, (hits, n_q)

    counts = {
        r["query_id"]: r["n_candidates"]
        for r in simsearch.ann_lsh_tuned_candidate_counts(
            aug, n_queries=n_q, corpus_size=2 * n, neighbor_cos=0.95
        ).collect()
    }
    frac = sum(counts.values()) / (max(len(counts), 1) * (2 * n - 1))
    assert frac < 0.10, frac


def test_rrf_rewards_multi_lane_docs(spark):
    """A doc ranked top in ALL lanes must out-score a doc that wins a
    single lane: RRF(1,1,1) = 3/61 > RRF(1, miss, miss) < 2/61."""
    from pyconform_spark import textops

    docs = spark.createDataFrame(
        [
            # doc 1 carries all three terms often; doc 2 only spams one
            (1, "spark merge window spark merge window"),
            (2, "spark spark spark spark spark spark"),
            (3, "merge window merge"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in textops.rrf_fusion(docs).collect()}
    assert out[1].rrf_score > out[2].rrf_score
    assert out[1].rrf_score > out[3].rrf_score
    # lane ranks are 1-based; 0 marks "absent from this lane"
    assert out[2].r_merge == 0 and out[2].r_window == 0


def test_sequence_packing_greedy_semantics(spark):
    """Hand-checked greedy fill at cap=10: lengths 4,4,4 -> bins
    1,1,2; an oversized doc (12) occupies its own bin and the next
    doc starts fresh."""
    from pyconform_spark import textops

    docs = spark.createDataFrame(
        [
            (1, "a b c d", "s"),          # 4 -> bin 1 (used 4)
            (2, "a b c d", "s"),          # 4 -> bin 1 (used 8)
            (3, "a b c d", "s"),          # 4 -> bin 2 (8+4 > 10)
            (4, "a b c d e f g h i j k l", "s"),  # 12 > cap -> bin 3 alone
            (5, "a b", "s"),              # bin 4 (12 > 10 closes bin 3)
            (6, "a b", "t"),              # independent source: bin 1
        ],
        "doc_id long, text string, source string",
    )
    out = {
        r.doc_id: (r.bin_id, r.used_after)
        for r in textops.sequence_packing(docs, cap=10).collect()
    }
    assert out == {
        1: (1, 4), 2: (1, 8), 3: (2, 4), 4: (3, 12), 5: (4, 2), 6: (1, 2)
    }


def test_knn_int8_recall_against_exact(spark):
    """int8 scalar quantization must keep recall@10 >= 0.9 vs the
    exact micro-int cosine ranking on the sf0.01 embeddings, and its
    plan must keep the bruteforce shape (queries broadcast, corpus
    never shuffled)."""
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    exact = {}
    for r in simsearch.knn_bruteforce(emb).collect():
        exact.setdefault(r.query_id, set()).add(r.vec_id)
    q8 = {}
    for r in simsearch.knn_int8(emb).collect():
        q8.setdefault(r.query_id, set()).add(r.vec_id)
    recalls = [
        len(exact[q] & q8.get(q, set())) / len(exact[q]) for q in exact
    ]
    assert sum(recalls) / len(recalls) >= 0.9, recalls


@pytest.mark.parametrize("t", [0.2, 0.5])
def test_prefix_filter_join_is_exact_complete(spark, t):
    """The prefix-filtered candidate set must lose NOTHING: its
    verified output equals the exhaustive all-pairs join exactly, at
    more than one threshold."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in textops.jaccard_prefix_pairs(docs, t).collect()
    }
    exp = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in textops.ngram_jaccard_pairs(docs, t).collect()
    }
    assert got == exp and len(exp) > 0


def test_prefix_filter_actually_prunes_candidates(spark):
    """The point of the prefix: strictly fewer candidate pairs than
    the co-shingled self-join feeds to verification."""
    from pyspark.sql import Window, functions as F

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    t = 0.5
    sh = docs.select(
        "doc_id", F.explode(textops.shingles(F.col("text"))).alias("sh")
    )
    all_cand = (
        sh.alias("a")
        .join(
            sh.alias("b"),
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id"), F.col("b.doc_id"))
        .distinct()
        .count()
    )
    dfreq = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    pref = (
        sh.join(dfreq, "sh")
        .withColumn(
            "pos",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy("df", "sh")
            ),
        )
        .join(sizes, "doc_id")
        .where(F.col("pos") <= F.col("n_sh") - F.ceil(t * F.col("n_sh")) + 1)
    )
    pref_cand = (
        pref.alias("a")
        .join(
            pref.alias("b"),
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id"), F.col("b.doc_id"))
        .distinct()
        .count()
    )
    assert 0 < pref_cand < all_cand


def test_edit_distance_engines_agree_and_ascii_assumption_holds(spark):
    """Spark's levenshtein is codepoint-based, DuckDB's byte-based —
    the oracle pairing is only valid while the corpus is ASCII.  Pin
    both facts: the corpus has no non-ASCII text, and on a known
    non-ASCII example the two engines genuinely differ (so the guard
    is not vacuous)."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_bad = docs.where(F.col("text").rlike("[^\\x00-\\x7F]")).count()
    assert n_bad == 0
    spark_d = (
        spark.range(1)
        .select(F.levenshtein(F.lit("açé"), F.lit("ace")).alias("d"))
        .first()["d"]
    )
    duck_d = duckdb.sql("SELECT levenshtein('açé', 'ace')").fetchone()[0]
    assert spark_d == 2 and duck_d == 4  # codepoints vs bytes


def test_novelty_first_doc_owns_everything(spark):
    """doc 0 sees every shingle first -> novelty 1.0; an exact copy
    later -> novelty 0.0; a half-new doc sits strictly between."""
    rows = [
        (0, "a b c d e f", "en", "s", 11),
        (1, "a b c d e f", "en", "s", 11),
        (2, "a b c x y z", "en", "s", 11),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = {r["doc_id"]: r for r in textops.novelty_curve(docs).collect()}
    assert out[0]["novelty"] == 1.0
    assert out[1]["novelty"] == 0.0
    assert 0.0 < out[2]["novelty"] < 1.0
    assert out[2]["n_novel"] == out[2]["n_shingles"] - 1  # only 'a b c' seen


def test_vocab_growth_heaps_golden(spark, tmp_path):
    """Source s1, docs 1-4 with mid = floor((1+4)/2) = 2, so docs 1-2
    are the prefix: half = 'a b' + 'a c' (4 tokens, vocab {a,b,c}),
    full adds 'a b' + 'd e f' (9 tokens, vocab {a..f}) -> token
    growth 2.25, vocab growth 2.0, TTRs 3/4 and 6/9."""
    rows = [
        (1, "a b", "en", "s1", 3),
        (2, "a c", "en", "s1", 3),
        (3, "a b", "en", "s1", 3),
        (4, "d e f", "en", "s1", 5),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    df.coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet")
    from pyconform_spark import queries as Q
    [r] = Q.vocab_growth_heaps(spark, str(tmp_path)).collect()
    assert (r["n_tokens_half"], r["n_tokens_full"]) == (4, 9)
    assert (r["vocab_half"], r["vocab_full"]) == (3, 6)
    assert r["token_growth"] == 2.25 and r["vocab_growth"] == 2.0
    assert r["ttr_half"] == 0.75 and r["ttr_full"] == 6.0 / 9.0


def test_zipf_decay_profile_golden(spark, tmp_path):
    """Corpus 'a'x8 'b'x4 'c'x2 'd'x1: ranks 1,2,4 are dyadic
    (rank 3 'c' is skipped), rank*freq = 8,8,4 and flatness
    1.0, 1.0, 0.5 — a perfect s=1 Zipf head with a faster tail."""
    text = " ".join(["a"] * 8 + ["b"] * 4 + ["c"] * 2 + ["d"])
    rows = [(1, text, "en", "s1", len(text))]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    df.coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet")
    from pyconform_spark import queries as Q
    out = {r["rank"]: r
           for r in Q.zipf_decay_profile(spark, str(tmp_path)).collect()}
    assert set(out) == {1, 2, 4}
    assert (out[1]["term"], out[1]["freq"], out[1]["rank_x_freq"]) == ("a", 8, 8)
    assert (out[2]["term"], out[2]["rank_x_freq"]) == ("b", 8)
    assert (out[4]["term"], out[4]["rank_x_freq"]) == ("d", 4)
    assert out[1]["zipf_flatness"] == 1.0
    assert out[2]["zipf_flatness"] == 1.0
    assert out[4]["zipf_flatness"] == 0.5
    assert out[4]["decay_from_top"] == 0.125


def test_lang_id_kappa_golden(spark, tmp_path):
    """4 docs: truth en/en/de/de; detector votes en for three ('the'),
    de for the fourth ('der die das'): contingency o = [[en,en]=2,
    [de,en]=1, [de,de]=1], diag = 3, margins r = (2,2),
    c = (3,1), pe_num = 2*3 + 2*1 = 8, so kappa =
    (4*3 - 8)/(16 - 8) = 0.5 and po = 0.75."""
    rows = [
        (1, "the cat", "en", "s", 7),
        (2, "the dog", "en", "s", 7),
        (3, "the haus", "de", "s", 8),
        (4, "der die das", "de", "s", 11),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    df.coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet")
    from pyconform_spark.textops import lang_id_kappa
    docs = spark.read.parquet(f"{tmp_path}/documents.parquet")
    [r] = lang_id_kappa(docs).collect()
    assert (r["n"], r["diag"]) == (4, 3)
    assert r["po"] == 0.75 and r["pe"] == 0.5
    assert r["kappa"] == 0.5
    assert r["agreement"] == "moderate_or_less"


def test_lang_id_kappa_perfect_and_degenerate(spark, tmp_path):
    """All-agree two-label corpus -> kappa = 1.0 / near_perfect;
    a single-label all-agree corpus makes the denominator 0 ->
    kappa NULL and the integer guard labels it 'chance'."""
    rows = [
        (1, "the cat", "en", "s", 7),
        (2, "der die das", "de", "s", 11),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    df.coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet")
    from pyconform_spark.textops import lang_id_kappa
    docs = spark.read.parquet(f"{tmp_path}/documents.parquet")
    [r] = lang_id_kappa(docs).collect()
    assert r["kappa"] == 1.0 and r["agreement"] == "near_perfect"
    df2 = spark.createDataFrame(
        [(1, "the cat", "en", "s", 7), (2, "the dog", "en", "s", 7)],
        "doc_id long, text string, lang string, source string, n_chars long")
    df2.coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet")
    docs2 = spark.read.parquet(f"{tmp_path}/documents.parquet")
    [r2] = lang_id_kappa(docs2).collect()
    assert r2["kappa"] is None and r2["agreement"] == "chance"


def test_rouge_identical_consecutive_docs_f1_one(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d", "s"),
            (2, "a b c d", "s"),
            (3, "a a b", "s"),
        ],
        "doc_id long, text string, source string",
    )
    out = {r["cand_id"]: r
           for r in textops.rouge_consecutive(docs).collect()}
    assert set(out) == {2, 3}
    r2 = out[2]
    assert (r2["ov1"], r2["ov2"]) == (4, 3)
    assert r2["rouge1_f"] == 1.0 and r2["rouge2_f"] == 1.0
    # clipping: cand "a a b" vs ref "a b c d" -> unigram ov = min(2,1)+1 = 2
    r3 = out[3]
    assert r3["ov1"] == 2
    assert r3["rouge1_p"] == 2.0 / 3.0 and r3["rouge1_r"] == 2.0 / 4.0
    # bigrams: cand {"a a","a b"} vs ref {"a b","b c","c d"} -> ov2 = 1
    assert r3["ov2"] == 1


def test_rouge_empty_side_is_null(spark):
    docs = spark.createDataFrame(
        [(1, "x y", "s"), (2, "", "s")],
        "doc_id long, text string, source string",
    )
    [r] = textops.rouge_consecutive(docs).collect()
    assert r["cand_id"] == 2
    assert r["ov1"] == 0 and r["rouge1_p"] is None
    assert r["rouge1_r"] == 0.0  # ref has 2 tokens, zero matched


def test_dedup_savings_histogram_counts(spark):
    docs = spark.createDataFrame(
        [(1, "aaaa"), (2, "aaaa"), (3, "aaaa"), (4, "bb"), (5, "bb"),
         (6, "unique")],
        "doc_id long, text string",
    )
    out = {r["copies"]: r
           for r in textops.dedup_savings_histogram(docs).collect()}
    assert set(out) == {1, 2, 3}
    assert out[3]["n_clusters"] == 1 and out[3]["docs_removed"] == 2
    assert out[3]["chars_saved"] == 8 and out[3]["chars_total"] == 12
    assert out[2]["chars_saved"] == 2
    assert out[1]["docs_removed"] == 0 and out[1]["chars_saved"] == 0


def test_corpus_token_budget_ratios(spark):
    docs = spark.createDataFrame(
        [(1, "Hello world", "en", "web"), (2, "a b c", "en", "web")],
        "doc_id long, text string, lang string, source string",
    )
    [r] = textops.corpus_token_budget(docs).collect()
    # BPE-ish: "Hello" -> H? no: [A-Z][a-z0-9]* matches "Hello"; "world";
    # "a","b","c" -> 5 subword tokens total
    assert r["n_docs"] == 2 and r["n_ws_tokens"] == 5
    assert r["n_bpe_tokens"] == 5
    assert r["n_chars"] == 16 and r["n_bytes"] == 16
    assert r["tokens_per_doc"] == 2.5
    assert r["bytes_per_token"] == 16 / 5


def test_repeated_ngram_fraction_shared_span(spark):
    """doc1 and doc2 share exactly one 5-gram ("a b c d e"); doc3 is
    all-unique; a doc too short for a 5-gram emits no row."""
    docs = spark.createDataFrame(
        [
            (1, "a b c d e x y", "en", "web"),
            (2, "z a b c d e q", "en", "web"),
            (3, "p q r s t", "en", "web"),
            (4, "too short", "en", "web"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    out = {r.doc_id: r for r in
           textops.repeated_ngram_fraction(docs).collect()}
    assert set(out) == {1, 2, 3}
    assert (out[1].n_shingles, out[1].dup_shingles) == (3, 1)
    assert (out[2].n_shingles, out[2].dup_shingles) == (3, 1)
    assert (out[3].n_shingles, out[3].dup_shingles) == (1, 0)
    assert out[1].dup_fraction == 1.0 / 3.0
    assert out[3].dup_fraction == 0.0


def test_cc_star_matches_propagation_on_lsh_graph(spark):
    """mode='star' must produce the IDENTICAL labeling to min-label
    propagation on the real LSH candidate graph — same smallest-id
    component contract, different round complexity."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = sorted(map(tuple, textops.lsh_components(docs).collect()))
    b = sorted(
        map(tuple, textops.lsh_components(docs, mode="star").collect())
    )
    assert len(a) > 0
    assert a == b


def test_cc_star_path_graph_round_bound(spark):
    """A 10k-node PATH graph: propagation needs ~n/2 rounds (diameter
    bound — adversarial for dedup-style CC), the large-star/small-star
    alternation must converge in O(log n): <= 2*log2(n) + 5
    alternations, with exact labels (every node -> 0)."""
    import math

    n = 10_000
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], ["doc_a", "doc_b"]
    ).repartition(8)
    stats: dict = {}
    comp = textops.connected_components(edges, mode="star", stats=stats)
    rows = comp.collect()
    assert len(rows) == n
    assert all(r["component_id"] == 0 for r in rows)
    bound = 2 * math.ceil(math.log2(n)) + 5
    assert stats["rounds"] <= bound, (stats["rounds"], bound)
