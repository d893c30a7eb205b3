"""Benchmark harness — one JSON line to stdout.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` plus the
flagship synthetic-transcripts tier cascade, and prints::

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": ..., ...}

Each query executes its FULL physical plan into the ``noop`` sink
(no driver collect, no disk write cost) so the number measured is
scan + shuffle + aggregate, exactly what scales with the cluster.

Scaling evidence (BASELINE.md two-parallelism rule) lives in
``scripts/scaling_bench.py`` — this file is the per-round driver hook
and stays single-parallelism.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyconform_spark import synth
from pyconform_spark.operators import rollup
from pyconform_spark.session import get_spark

# Queries benchmarked per round (subset of __spark_entry__.queries()
# chosen to cover scan+agg, cascade, window, gap-fill join, and joins).
BENCH_QUERIES = [
    "rollup_1m",
    "rollup_1h_cascade",
    "rollup_1d_cascade",
    "gapfill_locf_1h",
    "gapfill_linear_1h",
    "sessionize",
    "weighted_downsample_1d",
    "compress_roundtrip",
    "dedup_exact",
    "dedup_minhash_lsh",
    "knn_bruteforce",
    "ann_ivf_topk",
    "hll_distinct_users",
    "tpch_q1",
    "top_revenue_orders",
    "derived_defs",
    "tem_diagnostics_series",
    "dedup_simhash_pairs",
    "media_binary_meta",
    # r3 rotation (r2 verdict item 10): the two most expensive text
    # composites, plus the round's new operators
    "curation_pipeline",
    "dedup_components",
    # round-5: the O(log n) large-star/small-star CC twin — the
    # intentional pair against propagation-mode dedup_components
    "dedup_components_star",
    # round-5 scale-fix entry (lru_stack_distance is already listed
    # below): watched per round so regressions show
    "motif_sax_pairs",
    "vertical_interp_linear",
    "media_decoded_props",
    "ann_lsh_multiprobe",
    "ann_lsh_multitable",
    "tpch_q3",
    # round-3 final additions: classic join/scan benchmarks + the new
    # text-pipeline scan ops + unlabeled embedding dedup
    "tpch_q5",
    "tpch_q6",
    "lsh_dup_pairs",
    "pii_redact",
    "dedup_chunks",
    "tfidf_top_terms",
    "text_repetition_signals",
    "quality_classifier",
    "dedup_chunks_cdc",
    "counter_rate",
    "m4_downsample",
    # this round's new operators: TPC-H joins + timeseries analytics
    "tpch_q10",
    "tpch_q18",
    "anomaly_zscore",
    "lttb_downsample",
    "slo_burn_rate",
    # third-session additions: financial/monitoring rollups, event
    # analytics, and the adapted TPC-H tail
    "ohlc_1h",
    "time_weighted_avg_1d",
    "cusum_changepoints",
    "heartbeat_uptime",
    "transition_matrix",
    "realtime_rollup_1h",
    "funnel_conversion",
    "cohort_retention",
    "tpch_q17",
    "tpch_q22",
    # round-4 additions: subquery-shaped TPC-H tail, graded ANN, the
    # PromQL definition surface, the MIP lifecycle, chunked EWMA, and
    # real video decode
    "tpch_q21",
    "tpch_q20",
    "tpch_q15",
    # (ann_lsh_tuned is measured separately in the ANN recall section —
    # a timed entry here would run its heavy index build twice more)
    "promql_rate_increase",
    "cmor_tier_1h",
    "ewma_chunked_frame",
    "media_video_props",
    # round-4 continuation: the TPC-H suite is now complete (all 22);
    # time the five closers — q9 is the heaviest star join in the
    # catalog, q2 the correlated-min window
    "tpch_q2",
    "tpch_q9",
    "tpch_q11",
    "tpch_q12",
    "tpch_q16",
    "tpch_q19",
    # round-4 final session: statistical diagnostics, historian
    # compression recurrences, hysteresis alerting, and the aligned
    # two-series join
    "acf_lags",
    "seasonal_decompose",
    "backtest_models",
    "hw_seasonal",
    "sdt_compress",
    "hysteresis_alerts",
    "series_align_spread",
    # round-4 closing session: sweep-line concurrency (distributed
    # prefix sum), robust trend, burst episodes, ranked instant
    # vectors, routed range reads, MG heavy hitters, sliding distinct,
    # nearest as-of, quota replay
    "concurrency_timeline",
    "theil_sen_slope",
    "burst_detect",
    "promql_topk_bottomk",
    "tier_router_read",
    "heavy_hitters_sketch",
    "sliding_distinct_users",
    "asof_nearest_join",
    "token_bucket_throttle",
    # round-4 final additions: retrieval (positional + BM25), graph
    # analytics (iterative PageRank, degree-ordered triangles),
    # boilerplate filtering, rank correlation, decayed leaderboard
    "boilerplate_segments",
    "bm25_term_scores",
    "phrase_search",
    "pagerank_handoff",
    "triangle_count_handoff",
    "spearman_rank_corr",
    "decayed_leaderboard",
    "rrf_fusion",
    "khop_reach",
    "sequence_packing",
    "knn_int8",
    "split_leakage_audit",
    # round-4 extra session: iterative clustering, DP alignment,
    # exact-complete prefix-filtered ssjoin, isotonic fit, and the
    # codegen edit-distance window
    "kmeans_embeddings",
    "dtw_profile_pairs",
    "dedup_jaccard_prefix",
    "isotonic_trend",
    "edit_distance_pairs",
    "dyadic_rank_sketch",
    "attribution_credit",
    "novelty_curve",
    "record_breaks",
    "sequential_pattern_support",
    # round-4 continuation: lakehouse maintenance (SCD2, CDC apply,
    # incremental view maintenance), VARIANT-typed JSON, and the
    # integer STOMP matrix profile
    "scd2_dim_join",
    "cdc_apply_latest",
    "ivm_join_view",
    "variant_props_rollup",
    "matrix_profile_series",
    # round-4 closing: stability/drift/concentration diagnostics —
    # Allan variance (3-tau fan-out), TVD drift (histogram compare),
    # Gini + Pareto (user concentration), Benford (digit audit),
    # Kendall tau-b (O(days^2) on the reduced frame), drawdown and
    # streaks (single-sort window ops), daily SLA (distinct-minute agg)
    "allan_variance",
    "tvd_drift",
    "availability_sla",
    "ordinal_complexity",
    "max_drawdown",
    "spearman_daily_pairs",
    "kendall_tau_pairs",
    "benford_digit_profile",
    "pareto_concentration",
    "gini_user_concentration",
    "longest_streaks",
    "savgol_smooth",
    "median_filter",
    "hampel_filter",
    "variance_ratio_test",
    "ks_drift",
    "rolling_p90",
    "topk_churn",
    "label_centroid_separation",
    "wavelet_energy",
    "tier_reconstruction_error",
    "turning_points_test",
    "croston_forecast",
    # round-4 wrap session: the exact statistical-test wave (rank,
    # contingency, ECDF-integral, OLS-F, survival) + burstiness +
    # template entropy (per-series quadratic, series are short)
    "chi2_independence",
    "mannwhitney_u",
    "welch_t2_segments",
    "pacf_lag2",
    "sample_entropy_counts",
    "dispersion_index",
    "seasonal_mann_kendall",
    "granger_lag1",
    "cvm_drift",
    "runs_test",
    "kaplan_meier_sessions",
    "qq_shift_profile",
    "transition_latency_quantiles",
    "ljung_box_q",
    "extremal_index",
    "kpss_level_stat",
    "dominant_period_folding",
    "conformal_interval",
    "trimmed_mean",
    # latest-session additions: shape diagnostics + resampling inference
    "jarque_bera_normality",
    "bootstrap_ci_mean",
    "newey_west_lrv",
    "cusumsq_variance_change",
    "kruskal_wallis_contrib",
    "tile_stability_lumpiness",
    # continuation-session additions: indicator family on the shared
    # candle staging, Walsh integer spectrum, exact 2-changepoint pair
    # scan, LB_Keogh-pruned DTW, compression planners, lead-lag join,
    # planner audits, sequential SPRT
    "macd_signal",
    "xmr_western_electric",
    "walsh_band_energy",
    "optimal_two_changepoints",
    "lb_keogh_pairs",
    "xor_meaningful_bits",
    "dod_bucket_profile",
    "seasonal_esd_outliers",
    "lead_lag_argmax",
    "join_size_estimate_audit",
    "watermark_planner",
    "yue_pilon_mk",
    "l_moments_profile",
    "sprt_conversion",
    "rqa_determinism",
    "spike_triggered_average",
    "mmr_diverse_topk",
    "partial_correlation_triples",
    "tail_dependence_pairs",
    # round-4 late continuation: robust estimators, eval-stack metrics,
    # the FDR fleet monitor, compression planner, corpus accounting
    "kz_smooth",
    "ess_autocorr",
    "siegel_repeated_median",
    "rouge_overlap_pairs",
    "roc_youden_threshold",
    "cohen_kappa_detectors",
    "bh_fdr_alerts",
    "corpus_token_budget",
    "dedup_savings_histogram",
    "kfold_balance_audit",
    "tail_expected_shortfall",
    "median_of_means",
    "did_estimator",
    "pfor_pack_profile",
    "age_of_information",
    "abc_classification",
    "markov_stationary",
    # continuation wave 2: dynamics, experimentation, frontier
    "var1_coupling",
    "cuped_adjustment",
    "pareto_skyline",
    "zorder_layout_audit",
    "rendezvous_shard_audit",
    "join_order_planner",
    "fsst_symbol_profile",
    "lru_stack_distance",
    "roaring_container_profile",
    "ewma_time_decay_1h",
    "cow_mor_cost_audit",
    "unseen_vocab_estimate",
    "morans_i_hourweek",
    "shapley_attribution",
    "littles_law_audit",
    "rmst_survival",
    "simpson_paradox_audit",
    "ttl_cache_hit_curve",
    "hierarchy_reconcile",
    "settling_time_estimate",
    "population_estimators",
    "median_polish_dowhour",
    "calibration_bins_audit",
    "lift_gain_curve",
    "qte_deciles",
    "degree_assortativity",
    "edge_reciprocity",
    "weighted_quantile_revenue",
    "rich_club_profile",
    "backoff_pattern_detect",
    "lsm_compaction_planner",
    "kcore_membership",
    "link_prediction_scores",
    "icc_user_repeatability",
    "mann_whitney_u",
    "runs_up_down",
    "phi_association",
    "friedman_test",
    "ansari_bradley",
    "jonckheere_trend",
    "croston_intermittent",
    "promql_over_time",
    "repeated_ngram_fraction",
    "dau_wau_mau_stickiness",
    "apdex_daily",
    "tail_at_scale_fanout",
    # round-4 final-session additions
    "tied_request_planner",
    "hedged_request_planner",
    "kll_range_sketch_readouts",
    "kalman_hourly_rate",
    "erlang_c_staffing",
    "backlog_drain_planner",
    "retry_budget_planner",
    "mg1_wait_audit",
    "mgc_wait_estimate",
    "harmonic_centrality_2hop",
]

# Synthetic transcripts rows for the flagship pipeline, per sf of the
# bench dir (sf0.1 -> 1.2M turns).
TURNS_PER_SF = 12_000_000


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def run_noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = _sf_of(sf_dir)
    spark = get_spark(
        master=f"local[{cpus}]",
        app_name="pyconform_spark-bench",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qmap = entrymod.queries()
    times: dict[str, float] = {}

    # -- flagship: transcripts parquet -> 1m tier -> 1h -> 1d cascade.
    # Input is materialized first (generation excluded from the timing)
    # so throughput measures the rollup engine, matching scaling_bench.
    n_turns = max(100_000, int(TURNS_PER_SF * sf))
    import tempfile

    tx_path = os.path.join(tempfile.mkdtemp(prefix="bench_tx_"), "transcripts")
    synth.transcripts(spark, n_turns).write.mode("overwrite").parquet(tx_path)
    tx = spark.read.parquet(tx_path)

    def cascade_once() -> float:
        t0 = time.monotonic()
        t1m = rollup.tier_rollup(tx, "1m")
        t1m.persist()
        run_noop(t1m)
        run_noop(rollup.cascade_rollup(t1m, "1h"))
        run_noop(rollup.cascade_rollup(rollup.cascade_rollup(t1m, "1h"), "1d"))
        dt = time.monotonic() - t0
        t1m.unpersist()
        return dt

    cascade_once()  # warm-up (codegen + file listing)
    cascade_sec = min(cascade_once() for _ in range(2))
    times["transcripts_cascade"] = round(cascade_sec, 3)
    throughput = n_turns / cascade_sec

    # -- ingest-time bucketing, quantified: the SAME 1m rollup over a
    # hash(conv_id)-bucketed copy of the input plans ZERO exchanges
    # (plan-gated in tests/test_bucketing.py) — this measures what the
    # eliminated shuffle was worth.  Table write (ingest) is untimed:
    # bucketing's cost is paid once at ingest, its benefit on every
    # downstream tier/join.
    from pyconform_spark.operators import bucketing

    bucketing.write_bucketed(tx, "bench_tx_bucketed", n_buckets=cpus)
    btx = bucketing.read_bucketed(spark, "bench_tx_bucketed")
    run_noop(rollup.tier_rollup(btx, "1m"))  # warm both paths
    run_noop(rollup.tier_rollup(tx, "1m"))
    t_bucketed, t_plain_rollup = float("inf"), float("inf")
    for _visit in range(2):  # interleaved keep-best (host noise)
        t0 = time.monotonic()
        run_noop(rollup.tier_rollup(btx, "1m"))
        t_bucketed = min(t_bucketed, time.monotonic() - t0)
        t0 = time.monotonic()
        run_noop(rollup.tier_rollup(tx, "1m"))
        t_plain_rollup = min(t_plain_rollup, time.monotonic() - t0)
    times["rollup_1m_plain_shuffle"] = round(t_plain_rollup, 3)
    times["rollup_1m_bucketed"] = round(t_bucketed, 3)
    spark.sql("DROP TABLE IF EXISTS bench_tx_bucketed")

    # Interleaved two-visit keep-best (r3 verdict item 9): the host's
    # CPU quota swings absolute walls ~1.2-1.4x between rounds; visiting
    # the whole list twice and keeping the per-query minimum makes
    # per-query deltas interpretable without uniform-factor analysis.
    # Visit 1 doubles as the codegen/file-listing warmup.
    visits: dict[str, list[float]] = {}
    for _visit in range(2):
        for name in BENCH_QUERIES:
            fn = qmap.get(name)
            if fn is None:
                continue
            t0 = time.monotonic()
            run_noop(fn(spark, sf_dir))
            visits.setdefault(name, []).append(time.monotonic() - t0)
    for name, ts in visits.items():
        times[name] = round(min(ts), 3)
    # noise marker: median max/min ratio across queries — ~1.0 on a
    # quiet host, large when a co-tenant skewed one visit
    ratios = sorted(max(ts) / min(ts) for ts in visits.values() if min(ts) > 0)
    noise_ratio = ratios[len(ratios) // 2] if ratios else None

    # -- skew win, quantified (ROADMAP item 8): the Zipf head conv joined
    # back to a per-conv dim, plain shuffle join vs explicit hot-key
    # splitting.  AQE's skew-join and size-based broadcasts are disabled
    # for BOTH sides so the measurement isolates the query-declared
    # strategy — the 1000-executor case where one hot conversation
    # exceeds a task.
    from pyspark.sql import functions as F

    from pyconform_spark.operators import skew as skewops

    # A genuinely hot conversation: 90% of turns share one key (the
    # 10^12-turn regime's pathological head, where one conv's rows
    # dwarf a task).  The synthetic Zipf head at bench sf is not yet a
    # straggler, so the hot key is made explicit; the input is floored
    # at 4M turns so the measurement is straggler-bound, not
    # overhead-bound.
    skew_src = (
        tx if n_turns >= 4_000_000 else synth.transcripts(spark, 4_000_000)
    )
    hot = skew_src.withColumn(
        "conv_id",
        F.when(F.col("turn_idx") % 10 < 9, F.lit("conv-HOT")).otherwise(
            F.col("conv_id")
        ),
    )
    hot.persist().count()
    convs = hot.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n_turns"))
    convs.persist().count()
    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.shuffle.partitions",
        )
    }
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    try:
        plain_q = lambda: hot.join(convs, ["conv_id"])
        split_q = lambda: skewops.skew_split_join(
            hot, convs, ["conv_id"], min_share=0.005
        )
        run_noop(plain_q())  # warm both paths (codegen, listing)
        run_noop(split_q())
        t0 = time.monotonic()
        run_noop(plain_q())
        t_plain = time.monotonic() - t0
        t0 = time.monotonic()
        run_noop(split_q())
        t_split = time.monotonic() - t0
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
    convs.unpersist()
    times["skew_join_plain"] = round(t_plain, 3)
    times["skew_join_split"] = round(t_split, 3)

    # -- window-skew win, quantified: a hot conversation under a
    # per-series rolling window.  Plain rolling z-score serializes the
    # hot series through ONE task's sort; the chunked variant spreads it
    # over (series, time-chunk) tasks with exact window borrowing
    # (row-identical output — both run against the same DuckDB oracle in
    # the catalog).  The hot conv's timestamps spread uniformly over 30
    # days — the realistic shape (a conversation's turns are sequential
    # in time; the merged-key `hot` frame above instead piles every
    # conv's first minutes onto the same wall-clock hour, a time
    # concentration no TIME-keyed split can break).
    from pyconform_spark import queries as qmod

    is_hot = F.col("turn_idx") % 10 < 9
    spread = F.timestamp_seconds(
        F.lit(synth.BASE_EPOCH)
        + F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(30 * 86400))
    ).cast("timestamp_ntz")
    zin = skew_src.select(
        F.when(is_hot, F.lit("conv-HOT"))
        .otherwise(F.col("conv_id"))
        .alias("conv_id"),
        F.when(is_hot, spread).otherwise(F.col("ts")).alias("ts"),
        F.xxhash64("conv_id", "turn_idx").alias("event_id"),
        F.length("text").cast("double").alias("value"),
        F.length("text").cast("long").alias("vq"),
    )
    zin.persist().count()
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    try:
        plain_w = lambda: qmod.rolling_zscore_frame(zin, ["conv_id"])
        chunk_w = lambda: qmod.rolling_zscore_chunked_frame(
            zin, ["conv_id"], chunk_seconds=86400
        )
        run_noop(plain_w())  # warm both paths
        run_noop(chunk_w())
        t0 = time.monotonic()
        run_noop(plain_w())
        t_wplain = time.monotonic() - t0
        t0 = time.monotonic()
        run_noop(chunk_w())
        t_wchunk = time.monotonic() - t0
    finally:
        spark.conf.set(
            "spark.sql.shuffle.partitions", saved["spark.sql.shuffle.partitions"]
        )
    zin.unpersist()
    hot.unpersist()
    times["window_skew_plain"] = round(t_wplain, 3)
    times["window_skew_chunked"] = round(t_wchunk, 3)

    # -- batched CDC win, quantified: a 4-marker backlog landing on the
    # same epochs, applied marker-by-marker (each re-reads and rewrites
    # the touched tier partitions) vs refresh_cdc_batched (one staged
    # publish + one lineage commit for all four).  Same final store
    # bit-for-bit (pytest-gated); this measures the saved tier
    # rewrites.
    from pyconform_spark import pipeline as pl

    cdc_tx = synth.transcripts(spark, 200_000)
    cdc_tx.persist().count()
    cdc_batches = [
        (
            f"bench-m{i}",
            cdc_tx.where(
                F.abs(F.hash("conv_id", "turn_idx")) % 16 == i
            ).withColumn("op", F.lit(-1)),
        )
        for i in range(4)
    ]
    seq_root = tempfile.mkdtemp(prefix="bench_cdc_seq_")
    bat_root = tempfile.mkdtemp(prefix="bench_cdc_bat_")
    pl.run_batch(spark, cdc_tx, seq_root)
    pl.run_batch(spark, cdc_tx, bat_root)
    t0 = time.monotonic()
    for mk, b in cdc_batches:
        pl.refresh_cdc(spark, b, seq_root, marker=mk)
    t_cdc_seq = time.monotonic() - t0
    t0 = time.monotonic()
    pl.refresh_cdc_batched(spark, cdc_batches, bat_root)
    t_cdc_bat = time.monotonic() - t0
    cdc_tx.unpersist()
    times["cdc_four_markers_sequential"] = round(t_cdc_seq, 3)
    times["cdc_four_markers_batched"] = round(t_cdc_bat, 3)

    # -- ANN recall, quantified, vs exact brute force at the
    # rule-sized plane count log2(N/B) for target bucket B=64 (5
    # planes over the sf0.1 corpus).  The synthetic embeddings are
    # near-random — the hardest case for ANY locality hash — so the
    # robust claim is the PROBE LIFT (multiprobe / single-bucket
    # recall), stable at 4-7x across widths.
    from pyconform_spark import simsearch

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    n_q, k_r = 10, 5
    bf_rows = simsearch.knn_bruteforce(emb, n_queries=n_q, k=k_r).collect()
    truth = {}
    for r in bf_rows:
        truth.setdefault(r["query_id"], set()).add(r["vec_id"])

    def recall(rows):
        hits = sum(1 for r in rows if r["vec_id"] in truth[r["query_id"]])
        return hits / (len(truth) * k_r)

    n_planes_bench = 5  # log2(2000 / 64)
    rec_single = recall(
        simsearch.ann_lsh_topk(
            emb, n_queries=n_q, k=k_r, n_planes=n_planes_bench
        ).collect()
    )
    rec_probe = recall(
        simsearch.ann_lsh_multiprobe(
            emb, n_queries=n_q, k=k_r, n_planes=n_planes_bench
        ).collect()
    )
    rec_table = recall(
        simsearch.ann_lsh_multitable(
            emb, n_queries=n_q, k=k_r, n_planes=n_planes_bench
        ).collect()
    )

    # -- the graded index: recommend_lsh-designed multi-table +
    # Hamming-2 probing (pytest-gated recall@10 >= 0.9 at sf0.01),
    # reported WITH its candidate fraction (probed/total) so the
    # recall number can't hide a brute-force scan.
    n_corpus = simsearch.parquet_row_count(f"{sf_dir}/embeddings.parquet")
    rec_tuned = recall(
        simsearch.ann_lsh_tuned(
            emb, n_queries=n_q, k=k_r, corpus_size=n_corpus
        ).collect()
    )
    cand_rows = simsearch.ann_lsh_tuned_candidate_counts(
        emb, n_queries=n_q, corpus_size=n_corpus
    ).collect()
    cand_frac = sum(r["n_candidates"] for r in cand_rows) / (
        max(len(cand_rows), 1) * (n_corpus - 1)
    )

    # -- near-dup regime, MEASURED: plant one deterministic
    # near-duplicate per vector (cos ~0.999) and ask the
    # neighbor_cos=0.95 design for each query's top-1.  This is the
    # regime a dedup pipeline runs in — recall stays high while the
    # probed fraction collapses vs the adversarial-regime number above.
    aug = simsearch.with_near_dups(emb, n_corpus=n_corpus)
    nd_q = 20
    nd_top1 = {
        r["query_id"]: r["vec_id"]
        for r in simsearch.ann_lsh_tuned(
            aug, n_queries=nd_q, k=1,
            corpus_size=2 * n_corpus, neighbor_cos=0.95,
        ).collect()
    }
    nd_recall = sum(
        1 for q, v in nd_top1.items() if v == q + n_corpus
    ) / nd_q
    nd_counts = simsearch.ann_lsh_tuned_candidate_counts(
        aug, n_queries=nd_q, corpus_size=2 * n_corpus, neighbor_cos=0.95
    ).collect()
    nd_frac = sum(r["n_candidates"] for r in nd_counts) / (
        max(len(nd_counts), 1) * (2 * n_corpus - 1)
    )

    # -- layout clustering win, quantified: the SAME point query over
    # a hash-shuffled vs a cluster_by(conv_id) copy of the transcripts
    # table.  The pruning fraction comes from parquet footers
    # (deterministic); the scan pair is interleaved keep-best.
    from pyconform_spark import layout as layoutmod

    lay_base = tempfile.mkdtemp(prefix="bench_layout_")
    lay_plain = os.path.join(lay_base, "plain")
    lay_clust = os.path.join(lay_base, "clustered")
    tx.repartition(cpus).write.parquet(lay_plain)
    layoutmod.cluster_by(tx, ["conv_id"], n_files=cpus).write.parquet(
        lay_clust
    )
    probe_conv = tx.select("conv_id").first()["conv_id"]
    prune_plain = layoutmod.pruning_fraction(lay_plain, "conv_id", probe_conv)
    prune_clust = layoutmod.pruning_fraction(lay_clust, "conv_id", probe_conv)

    def point_scan(path):
        run_noop(
            spark.read.parquet(path)
            .where(F.col("conv_id") == probe_conv)
            .groupBy("role")
            .count()
        )

    point_scan(lay_plain)  # warm
    point_scan(lay_clust)
    t_lplain, t_lclust = float("inf"), float("inf")
    for _visit in range(2):
        t0 = time.monotonic()
        point_scan(lay_plain)
        t_lplain = min(t_lplain, time.monotonic() - t0)
        t0 = time.monotonic()
        point_scan(lay_clust)
        t_lclust = min(t_lclust, time.monotonic() - t0)
    times["layout_scan_plain"] = round(t_lplain, 3)
    times["layout_scan_clustered"] = round(t_lclust, 3)

    # -- ledger-stats epoch pruning, quantified: the SAME one-day
    # point read over the committed tier store, full-scan+filter vs
    # the stats-pruned read_tier path (per-epoch key ranges from the
    # lineage ledger skip epoch dirs BEFORE Spark lists them — the
    # Iceberg manifest-pruning analog).  Store build is untimed
    # (ingest cost, paid once); the epochs_scanned/total pair is the
    # deterministic number that scales with store age.
    import datetime as _dt

    from pyconform_spark import pipeline as pipemod

    store_root = os.path.join(lay_base, "tierstore")
    pipemod.run_batch(spark, tx, store_root)
    store_eps = sorted(pipemod.committed_epochs(spark, store_root))
    target_ep = store_eps[len(store_eps) // 2]
    tp_lo = _dt.datetime(1970, 1, 1) + _dt.timedelta(
        seconds=target_ep * pipemod.EPOCH_SECONDS
    )
    tp_hi = tp_lo + _dt.timedelta(seconds=pipemod.EPOCH_SECONDS - 1)
    n_scanned = len(
        pipemod._prune_epochs_by_stats(
            store_eps,
            pipemod._tier_epoch_stats(spark, store_root, "1m"),
            None,
            (tp_lo, tp_hi),
        )
    )

    def tier_point_plain():
        run_noop(
            pipemod.read_tier(spark, store_root, "1m")
            .where(
                (F.col("bucket_start") >= F.lit(tp_lo))
                & (F.col("bucket_start") <= F.lit(tp_hi))
            )
            .groupBy("role")
            .count()
        )

    def tier_point_pruned():
        run_noop(
            pipemod.read_tier(
                spark, store_root, "1m", bucket_range=(tp_lo, tp_hi)
            )
            .groupBy("role")
            .count()
        )

    tier_point_plain()  # warm
    tier_point_pruned()
    t_tplain, t_tpruned = float("inf"), float("inf")
    for _visit in range(2):
        t0 = time.monotonic()
        tier_point_plain()
        t_tplain = min(t_tplain, time.monotonic() - t0)
        t0 = time.monotonic()
        tier_point_pruned()
        t_tpruned = min(t_tpruned, time.monotonic() - t0)
    times["tier_point_read_plain"] = round(t_tplain, 3)
    times["tier_point_read_pruned"] = round(t_tpruned, 3)

    # -- exact-complete ssjoin pruning, quantified DETERMINISTICALLY
    # (like the layout pruning fractions — candidate COUNTS, not
    # timing: at bench scale both joins are stage-overhead-bound, and
    # this corpus's tiny shared vocabulary is the worst case for
    # prefix selectivity; the count ratio is the number that scales).
    # Same verified output rows either way (pytest-gated equality).
    from pyconform_spark import textops as topsmod

    docs_b = spark.read.parquet(f"{sf_dir}/documents.parquet").persist()
    docs_b.count()
    t_ss = 0.5
    sh_b = docs_b.select(
        "doc_id", F.explode(topsmod.shingles(F.col("text"))).alias("sh")
    )
    n_all_cand = (
        sh_b.alias("a")
        .join(
            sh_b.alias("b"),
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id"), F.col("b.doc_id"))
        .distinct()
        .count()
    )
    from pyspark.sql import Window as _W

    dfreq_b = sh_b.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    sizes_b = sh_b.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    pref_b = (
        sh_b.join(dfreq_b, "sh")
        .withColumn(
            "pos",
            F.row_number().over(
                _W.partitionBy("doc_id").orderBy("df", "sh")
            ),
        )
        .join(sizes_b, "doc_id")
        .where(
            F.col("pos")
            <= F.col("n_sh") - F.ceil(t_ss * F.col("n_sh")) + 1
        )
    )
    n_pfx_cand = (
        pref_b.alias("a")
        .join(
            pref_b.alias("b"),
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id"), F.col("b.doc_id"))
        .distinct()
        .count()
    )
    docs_b.unpersist()

    # -- codec decode microbench (no Spark): worst-case random payloads
    # vs the constant-cadence fast path, in M pts/s.
    import numpy as np

    from pyconform_spark.operators import codec

    def best_mpts(fn, blob, n, reps=3):
        # best-of-N: the single-threaded python measurement shares the
        # host with the (still settling) 32-thread JVM — one quiet rep
        # is the steady-state number
        best = float("inf")
        fn(blob)  # warm
        for _ in range(reps):
            t0 = time.monotonic()
            fn(blob)
            best = min(best, time.monotonic() - t0)
        return n / best / 1e6

    rng = np.random.RandomState(1)
    wvals = rng.uniform(-1e9, 1e9, 200_000)
    worst_mpts = best_mpts(codec.gorilla_decode, codec.gorilla_encode(wvals), len(wvals))
    cts = np.arange(0, 86400 * 30, 60, dtype=np.int64)
    const_mpts = best_mpts(codec.dod_decode, codec.dod_encode(cts), len(cts))

    # -- tiled matrix profile on ONE long series: the single-group form
    # runs the whole O(n^2) recurrence in one task; the SCAMP tiling
    # spreads (n/chunk)^2 / 2 tiles across all cores — same rows
    # (pytest-gated), wall-clock is the scale story for long series.
    from pyconform_spark.operators import matrixprofile as _mp

    mp_n = 48_000
    mp_rng = np.random.RandomState(3)
    import pandas as _pd

    mp_pts = spark.createDataFrame(
        _pd.DataFrame(
            {
                "series": ["long"] * mp_n,
                "pos": np.arange(mp_n, dtype=np.int32),
                "h_s": np.arange(mp_n, dtype=np.int64) * 3600,
                "v": mp_rng.randint(-1000, 1000, mp_n).astype(np.int64),
            }
        )
    ).persist()
    mp_pts.count()
    t0 = time.monotonic()
    _mp.matrix_profile(mp_pts, 24).agg(F.sum("mp_dist")).first()
    t_mp_single = time.monotonic() - t0
    t0 = time.monotonic()
    _mp.matrix_profile_tiled(mp_pts, 24, chunk=3000).agg(
        F.sum("mp_dist")
    ).first()
    t_mp_tiled = time.monotonic() - t0
    mp_pts.unpersist()

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline query wall time (incl. transcripts tier cascade)",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
                "transcripts_turns": n_turns,
                "transcripts_throughput_turns_per_sec": round(throughput, 1),
                "skew_split_speedup": round(t_plain / t_split, 2),
                "bucketed_rollup_speedup": round(
                    t_plain_rollup / t_bucketed, 2
                ),
                "window_skew_speedup": round(t_wplain / t_wchunk, 2),
                "layout_scan_speedup": round(t_lplain / t_lclust, 2),
                "ssjoin_allpairs_candidates": n_all_cand,
                "ssjoin_prefix_candidates": n_pfx_cand,
                "ssjoin_candidate_fraction": round(
                    n_pfx_cand / max(n_all_cand, 1), 4
                ),
                "layout_prune_fraction_plain": round(prune_plain, 3),
                "layout_prune_fraction_clustered": round(prune_clust, 3),
                "tier_point_read_speedup": round(
                    t_tplain / max(t_tpruned, 1e-9), 2
                ),
                "tier_point_epochs_total": len(store_eps),
                "tier_point_epochs_scanned": n_scanned,
                "ann_recall_single_bucket": round(rec_single, 3),
                "ann_recall_multiprobe": round(rec_probe, 3),
                "ann_recall_multitable": round(rec_table, 3),
                "ann_probe_lift": round(rec_probe / rec_single, 1)
                if rec_single
                else None,
                "ann_recall_tuned": round(rec_tuned, 3),
                "ann_tuned_candidate_fraction": round(cand_frac, 3),
                "ann_neardup_recall_at1": round(nd_recall, 3),
                "ann_neardup_candidate_fraction": round(nd_frac, 4),
                "bench_protocol": "interleaved two-visit keep-best per query",
                "noise_max_over_min_median": round(noise_ratio, 3)
                if noise_ratio
                else None,
                "codec_decode_worst_mpts": round(worst_mpts, 2),
                "codec_decode_const_mpts": round(const_mpts, 1),
                "mp_single_group_sec": round(t_mp_single, 2),
                "mp_tiled_sec": round(t_mp_tiled, 2),
                "mp_tiled_speedup": round(t_mp_single / t_mp_tiled, 2),
                "cdc_batched_speedup": round(t_cdc_seq / t_cdc_bat, 2),
                "cpus": cpus,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
