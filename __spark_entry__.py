"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship 1-minute tier rollup on sf0.001.
``queries`` / ``oracle_sql`` expose every implemented operator with a
DuckDB twin (see pyconform_spark/queries.py and oracles.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pyconform_spark import queries as Q
from pyconform_spark import simsearch, textops
from pyconform_spark.oracles import ORACLES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the 1-minute retention
    tier over the events series table."""
    return Q.rollup_1m(spark, "/root/testdata/sf0.001")


# The driver's per-round CORRECTNESS file verifies the FIRST 50 entries of
# queries() (dict insertion order).  Rounds 1-3 always presented the same
# prefix, so 47 catalog entries never received a driver-side green row.
# This list rotates them (plus this round's new queries) into the first 50
# slots; everything else -- long-green since r1/r2 -- follows.  The full
# catalog is still swept every round via scripts/correctness_sweep.py.
_DRIVER_FIRST = [
    # round-4 additions (never verified by anyone yet)
    "acf_lags",
    "promql_predict_linear",
    "calendar_profile",
    "sax_symbols",
    "tpch_q21",
    "tpch_q20",
    "tpch_q15",
    "tpch_q19",
    "tpch_q2",
    "tpch_q9",
    "tpch_q11",
    "tpch_q12",
    "tpch_q16",
    "quantile_sketch_tier_merge",
    "cmor_tier_1h",
    "promql_rate_increase",
    "promql_quantile_over_time",
    "sequence_dedup",
    "robust_anomaly_mad",
    "holt_smoothing",
    "promql_slope_trend",
    "promql_over_time_suite",
    "ewma_chunked_frame",
    "media_video_props",
    "media_resize_props",
    "media_frame_sample",
    "ann_lsh_tuned",
    "semantic_dedup_docs",
    # never driver-verified before round 4
    "ann_ivf_topk",
    "ann_neardup_top1",
    "ann_lsh_multiprobe",
    "ann_lsh_multitable",
    "ann_lsh_topk",
    "bloom_join_prune",
    "cohort_retention",
    "curation_pipeline",
    "cusum_changepoints",
    "decontaminate_corpus",
    "dedup_chunks",
    "dedup_chunks_cdc",
    "dedup_normalized",
    "dedup_simhash_pairs",
    "domain_rebalance",
    "flatline_detect",
    "funnel_conversion",
    "heartbeat_uptime",
    "hll_tier_merge",
    "interarrival_stats",
    "lsh_dup_pairs",
    "ohlc_1h",
    "pii_redact",
    "quality_classifier",
    "realtime_rollup_1h",
    "sample_stratified",
    "seasonal_baseline",
    "series_correlation",
    "state_durations",
    "text_normalize",
    "text_repetition_signals",
    "tfidf_top_terms",
    "tiered_read",
    "time_weighted_avg_1d",
    "tpch_q10",
    "tpch_q13",
    "tpch_q14",
    "tpch_q17",
    "tpch_q18",
    "tpch_q22",
    "tpch_q3",
    "tpch_q4",
    "tpch_q5",
    "tpch_q6",
    "tpch_q7",
    "tpch_q8",
    "transition_matrix",
    "window_rank_suite",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    catalog = {
        "rollup_1m": Q.rollup_1m,
        "rollup_1h_cascade": Q.rollup_1h_cascade,
        "rollup_1d_cascade": Q.rollup_1d_cascade,
        "gap_detect": Q.gap_detect,
        "infer_cadence": Q.infer_cadence,
        "json_extract_props": Q.json_extract_props,
        "asof_join_tier": Q.asof_join_tier,
        "range_join_windows": Q.range_join_windows,
        "gapfill_locf_1h": Q.gapfill_locf_1h,
        "gapfill_linear_1h": Q.gapfill_linear_1h,
        "stencil_diff": Q.stencil_diff,
        "stencil_bounds": Q.stencil_bounds,
        "stencil_bounds_locations": Q.stencil_bounds_locations,
        "stencil_bounds_interfaces": Q.stencil_bounds_interfaces,
        "running_sum": Q.running_sum,
        "weighted_downsample_1d": Q.weighted_downsample_1d,
        "sessionize": Q.sessionize,
        "counter_rate": Q.counter_rate,
        "acf_lags": Q.acf_lags,
        "promql_predict_linear": Q.promql_predict_linear,
        "calendar_profile": Q.calendar_profile,
        "sax_symbols": Q.sax_symbols,
        "promql_rate_increase": Q.promql_rate_increase,
        "promql_quantile_over_time": Q.promql_quantile_over_time,
        "sequence_dedup": Q.sequence_dedup,
        "robust_anomaly_mad": Q.robust_anomaly_mad,
        "holt_smoothing": Q.holt_smoothing,
        "promql_slope_trend": Q.promql_slope_trend,
        "promql_over_time_suite": Q.promql_over_time_suite,
        "m4_downsample": Q.m4_downsample,
        "anomaly_zscore": Q.anomaly_zscore,
        "anomaly_zscore_chunked": Q.anomaly_zscore_chunked,
        "ewma_smooth": Q.ewma_smooth,
        "ewma_chunked_frame": Q.ewma_chunked_frame,
        "slo_burn_rate": Q.slo_burn_rate,
        "lttb_downsample": Q.lttb_downsample,
        "histogram_quantile": Q.histogram_quantile,
        "heavy_series": Q.heavy_series,
        "distinct_users_per_day": Q.distinct_users_per_day,
        "percentiles_by_type": Q.percentiles_by_type,
        "set_ops_users": Q.set_ops_users,
        "hll_distinct_users": Q.hll_distinct_users,
        "cms_user_counts": Q.cms_user_counts,
        "compress_roundtrip": Q.compress_roundtrip,
        "limit_clamp": Q.limit_clamp,
        "unit_convert": Q.unit_convert,
        "derived_defs": Q.derived_defs,
        "derived_agg_defs": Q.derived_agg_defs,
        "defs_rollup_1h": Q.defs_rollup_1h,
        "cmor_tier_1h": Q.cmor_tier_1h,
        "climatology_hourly": Q.climatology_hourly,
        "value_algebra": Q.value_algebra,
        "stencil_lead_diff": Q.stencil_lead_diff,
        "stencil_deriv3": Q.stencil_deriv3,
        "int_tabulated_series": Q.int_tabulated_series,
        "tem_diagnostics_series": Q.tem_diagnostics_series,
        "vertical_interp_linear": Q.vertical_interp_linear,
        "media_binary_meta": Q.media_binary_meta,
        "media_decoded_props": Q.media_decoded_props,
        "media_video_props": Q.media_video_props,
        "media_resize_props": Q.media_resize_props,
        "media_frame_sample": Q.media_frame_sample,
        "pivot_event_types": Q.pivot_event_types,
        "unpivot_lineitem": Q.unpivot_lineitem,
        "expand_grid": Q.expand_grid,
        "conditional_select": Q.conditional_select,
        "skew_salted_rollup": Q.skew_salted_rollup,
        "topk_per_group": Q.topk_per_group,
        "orders_without_lineitem": Q.orders_without_lineitem,
        "rollup_grouping_sets": Q.rollup_grouping_sets,
        "gapfill_linear_pandas_1h": Q.gapfill_linear_pandas_1h,
        "tpch_q1": Q.tpch_q1,
        "tpch_q3": Q.tpch_q3,
        "tpch_q5": Q.tpch_q5,
        "tpch_q6": Q.tpch_q6,
        "tpch_q4": Q.tpch_q4,
        "tpch_q10": Q.tpch_q10,
        "tpch_q14": Q.tpch_q14,
        "tpch_q18": Q.tpch_q18,
        "tpch_q7": Q.tpch_q7,
        "tpch_q8": Q.tpch_q8,
        "tpch_q13": Q.tpch_q13,
        "tpch_q17": Q.tpch_q17,
        "tpch_q21": Q.tpch_q21,
        "tpch_q20": Q.tpch_q20,
        "tpch_q15": Q.tpch_q15,
        "tpch_q19": Q.tpch_q19,
        "tpch_q2": Q.tpch_q2,
        "tpch_q9": Q.tpch_q9,
        "tpch_q11": Q.tpch_q11,
        "tpch_q12": Q.tpch_q12,
        "tpch_q16": Q.tpch_q16,
        "tpch_q22": Q.tpch_q22,
        "ohlc_1h": Q.ohlc_1h,
        "time_weighted_avg_1d": Q.time_weighted_avg_1d,
        "state_durations": Q.state_durations,
        "cusum_changepoints": Q.cusum_changepoints,
        "transition_matrix": Q.transition_matrix,
        "heartbeat_uptime": Q.heartbeat_uptime,
        "realtime_rollup_1h": Q.realtime_rollup_1h,
        "funnel_conversion": Q.funnel_conversion,
        "cohort_retention": Q.cohort_retention,
        "flatline_detect": Q.flatline_detect,
        "tiered_read": Q.tiered_read,
        "seasonal_baseline": Q.seasonal_baseline,
        "interarrival_stats": Q.interarrival_stats,
        "window_rank_suite": Q.window_rank_suite,
        "series_correlation": Q.series_correlation,
        "hll_tier_merge": Q.hll_tier_merge,
        "quantile_sketch_tier_merge": Q.quantile_sketch_tier_merge,
        "bloom_join_prune": Q.bloom_join_prune,
        "top_revenue_orders": Q.top_revenue_orders,
        **textops.register_text_queries(),
        **simsearch.register_sim_queries(),
    }
    ordered = {k: catalog[k] for k in _DRIVER_FIRST if k in catalog}
    ordered.update({k: v for k, v in catalog.items() if k not in ordered})
    return ordered


def oracle_sql() -> dict[str, str]:
    all_oracles = {**ORACLES, **textops.TEXT_ORACLES, **simsearch.SIM_ORACLES}
    return {k: all_oracles[k] for k in queries() if k in all_oracles}
