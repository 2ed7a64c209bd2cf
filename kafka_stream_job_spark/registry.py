"""Query registry — single source of truth for the driver contract.

Every operator the engine implements ships here as a :class:`QuerySpec`:
a name, a PySpark callable ``(spark, sf_dir) -> DataFrame``, and (when
SQL-expressible) the equivalent ANSI SQL the DuckDB oracle runs on the same
parquet tables. ``__spark_entry__.py`` re-exports this registry as
``queries()`` / ``oracle_sql()``; ``bench.py`` runs the specs tagged
``bench=True``; tests iterate all of it.

Keeping the Spark program and the oracle side by side in one decorator call
is what keeps column names/aliases in lockstep — the driver's compare sorts
columns by name before hashing, so any alias drift is an instant mismatch.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline run


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query spec to the registry."""

    def wrap(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tags, bench=bench)
        return fn

    return wrap


# Names the external driver has verified across rounds — the union of
# CORRECTNESS_r01.json ∪ r02 ∪ r03 ∪ r04 ∪ r05 ∪ r06 ∪ r07 (50 + 45 + 48 +
# 50 + 47 + 50 + 47 fresh = 337 names = the full r07 registry; r02
# re-checked 5 r1 rows, r03 re-checked q22 + sketch_user_activity, r05
# re-earned the 3 round-5 _RECHECK rows, r07 re-gated the 3 rewritten
# dedup paths). The
# driver enumerates only the FIRST 50 registry entries per round, so
# ``all_specs`` orders the registry never-driver-checked first: a
# truncated first-N pass then spends its whole budget earning NEW
# correctness rows instead of re-verifying green ones. Refresh this set
# each round from the latest CORRECTNESS_r*.json files.
_DRIVER_CHECKED = frozenset({
    # round 1 (CORRECTNESS_r01.json)
    "dedup_exact", "dedup_minhash_lsh", "dedup_ngram_jaccard", "dedup_simhash",
    "dedup_survivors", "dedup_embedding_cosine", "similarity_topk_cosine",
    "similarity_lsh_neardup", "similarity_topk_bucketed", "embedding_norm_stats",
    "similarity_topk_ivf", "cluster_kmeans_embeddings",
    "dedup_connected_components", "multimodal_metadata_scan",
    "multimodal_decode_features", "multimodal_resize", "multimodal_frame_sample",
    "pandas_acctbal_zscore", "pandas_scalar_log_price", "text_token_stats",
    "text_quality_score", "text_language_id", "text_fingerprint",
    "text_tfidf_top_terms", "text_bpe_token_count", "text_rolling_fingerprint",
    "split_train_eval", "text_top_bigrams", "decontaminate_train_shingles",
    "quota_sample_per_lang", "pack_sequences_manifest",
    "q5_local_supplier_volume",
    "top_customers_by_revenue", "customers_without_orders",
    "nations_with_rich_customers", "rollup_returns",
    "cube_order_status_priority", "window_customer_order_rank",
    "window_event_gaps", "setops_customer_segments",
    "scalar_functions_showcase", "datetime_functions_showcase",
    "events_json_extract", "events_hourly_rollup",
    "distinct_parts_per_supplier", "small_quantity_revenue",
    "asof_purchase_attribution", "grouping_sets_revenue",
    # round 2 additions (CORRECTNESS_r02.json minus the 5 r1 re-checks)
    "array_agg_user_profile", "bpe_apply_merges", "bpe_learn_merges",
    "content_defined_chunks", "contrastive_triplets", "corpus_js_divergence",
    "corpus_mix_rebalance", "corpus_token_budget_plan",
    "dedup_span_mask_manifest", "doc_sliding_chunks", "embedding_int8_quantize",
    "embedding_outlier_zscore", "events_multi_rollup", "events_user_retention",
    "multimodal_audio_frame_energy", "multimodal_dedup_content_hash",
    "percentile_order_prices", "pivot_user_event_matrix",
    "q12_priority_by_linestatus", "q14_promo_revenue", "q15_top_supplier",
    "q18_large_volume_customers", "q19_disjunctive_revenue", "q4_order_priority",
    "q6_forecast_revenue", "q7_volume_shipping",
    "range_join_price_bands", "repeated_ngram_spans",
    "salted_join_supplier_volume", "search_hybrid_rrf", "session_window_rollup",
    "shard_manifest_balanced", "text_bm25_search",
    "text_chunk_dedup", "text_pii_redaction", "text_repetition_filter",
    "text_seqlen_histogram", "text_token_entropy", "text_zipf_slope",
    "udtf_word_expand", "unpivot_lineitem_measures", "weighted_sample_docs",
    # round 3 additions (CORRECTNESS_r03.json minus the 2 re-checks)
    "ann_ndcg_truncation", "array_set_functions_showcase",
    "arrow_map_embedding_norm", "asof_next_touch_latency",
    # attribution_multi_touch earned its r03 row, changed behavior in r5
    # (integer-exact micro-unit split), and re-earned a green r05 row —
    # listed in the round-5 block below.
    "benford_digit_audit",
    "bloom_filter_membership", "bronze_decode_errors",
    "bronze_decode_roundtrip", "csv_source_permissive_read",
    "customer_balance_ks_test", "cv_fold_manifest", "events_ab_uplift_test",
    "events_ewma_forecast", "events_funnel_latency",
    "events_funnel_view_click_purchase", "events_holt_forecast",
    "events_interval_overlap_join", "events_props_templates",
    "events_props_variant_decode", "events_psi_value_drift",
    "events_theilsen_trend", "events_transition_matrix",
    "feature_asof_training_matrix", "gdpr_purge_manifest",
    "k_anonymity_audit", "kmv_distinct_users", "lang_balance_weights",
    "lang_temperature_weights", "map_functions_showcase",
    "multimodal_stratified_sample", "null_safe_join_attribution",
    "orc_source_roundtrip", "pandas_grouped_agg_trimmed_mean",
    "parameterized_sql_showcase", "partitioned_source_pruned_read",
    "pipe_sql_priority_stats", "profile_hot_orderkeys",
    "q22_global_sales_opportunity", "revenue_trend_ols",
    "scd2_customer_merge", "schema_evolution_merge_read",
    "similarity_topk_binary_rerank", "sketch_user_activity",
    "stats_qty_price_corr", "supplier_return_wilson_rank",
    "text_sentiment_lexicon", "text_vocab_coverage",
    "try_functions_showcase", "xml_decode_roundtrip",
    # round 4 additions (CORRECTNESS_r04.json — 50 fresh names, all green)
    "abc_customer_classification", "aes_roundtrip_audit", "basket_part_pairs",
    "bitwise_aggregates_showcase", "checkpoint_statestore_table",
    "customer_spend_gini", "decontaminate_by_embedding",
    "events_alarm_verification", "events_changepoint_binseg",
    "events_daily_value_trend", "events_dau_wau_mau",
    "events_holtwinters_forecast", "events_hourly_anomaly",
    "events_hourly_gapfill", "events_hourly_mad_outliers",
    "events_props_schema_profile", "events_seasonal_profile",
    "events_session_window_batch", "events_sessionize_batch",
    "forecast_conformal_intervals", "hive_source_partition_pruned",
    "hll_distinct_users", "hll_merge_event_types",
    "join_skew_planner",
    "lateral_top_customers_per_nation", "lineitem_ship_latency",
    "matryoshka_truncation_recall", "medallion_pipeline_rollup",
    "mlm_masking_manifest", "orders_priority_status_chi2",
    "profile_lineitem_columns", "q13_customer_distribution",
    "q16_supplier_part_buckets", "q21_waiting_supplier", "q2_min_cost_supplier",
    "rag_context_pack", "scd2_point_in_time_join", "skipgram_negative_samples",
    "snapshot_diff_report", "streaming_dedup_events",
    "streaming_heavy_hitter_users", "streaming_kmv_distinct_users",
    "surrogate_key_assignment", "text_rake_keywords",
    "timeseries_znorm_subsequence_search", "trigram_like_search",
    "watermark_sizing_report", "window_range_trailing_hour",
    # round 5 additions (CORRECTNESS_r05.json — 47 fresh names plus the 3
    # re-earned _RECHECK rows merge_full_cdc / incremental_agg_maintenance /
    # attribution_multi_touch, all green)
    "array_hof_showcase", "attribution_multi_touch", "batch_replay_source_slice",
    "bpe_fertility_by_lang", "change_data_feed_report", "collation_group_showcase",
    "compaction_bin_packing_plan", "data_freshness_sla", "decayed_leaderboard",
    "decision_stump_split_scores", "dp_noisy_nation_counts",
    "dpo_preference_pairs", "events_cusum_drift", "events_ohlc_bars",
    "execute_immediate_showcase", "geo_cell_colocation", "heavy_hitter_tokens",
    "incremental_agg_maintenance", "incremental_join_maintenance",
    "jsonl_source_permissive_read", "l_diversity_audit", "linkage_fellegi_sunter",
    "market_concentration_hhi", "merge_full_cdc", "multimodal_silence_segments",
    "orders_cohort_revenue", "orphan_file_audit", "percentile_distributed_exact",
    "price_index_laspeyres", "q11_important_part_value", "q20_heavy_shippers",
    "q8_national_market_share", "q9_product_type_profit",
    "score_calibration_report", "sketch_quantile_bins",
    "snapshot_retention_expiry_plan", "sql_udf_showcase",
    "streaming_csv_source_rollup", "streaming_dedup_within_watermark",
    "streaming_hourly_rollup", "streaming_static_enrich",
    "streaming_union_sources_rollup", "streaming_upsert_latest_state",
    "subject_access_export", "supplier_pareto_frontier", "t_closeness_audit",
    "text_word_pmi", "url_functions_showcase", "vocab_growth_curve",
    "zorder_layout_stats",
    # round 6 additions (CORRECTNESS_r06.json — 50 fresh names, all green)
    "bigram_lm_score", "bradley_terry_strengths", "bucketed_join_colocated",
    "cms_token_counts", "cogroup_asof_pandas", "corpus_epoch_shuffle_manifest",
    "corpus_shingle_novelty", "corpus_source_datasheet",
    "dedup_incremental_delta", "dsir_importance_weights",
    "embedding_cluster_label_purity", "embedding_covariance",
    "embedding_mutual_nn_pairs", "embedding_power_iteration",
    "events_growth_accounting", "events_hourly_autocorr",
    "events_interval_union_coverage", "events_peak_concurrency",
    "file_metadata_columns_read", "fuzzy_join_part_names",
    "gopher_quality_rules", "graph_link_prediction_suppliers",
    "graph_modularity_by_brand", "join_cardinality_audit",
    "k_anonymity_generalize", "linkage_blocking_quality",
    "linkage_em_parameters", "linkage_entity_clusters",
    "multimodal_ahash_neardup", "multimodal_shot_boundaries",
    "orders_survival_km", "padding_waste_report",
    "rate_limiter_backtest", "recursive_month_spine",
    "similarity_maxsim_multivector", "similarity_topk_pq_adc",
    "streaming_available_now_rollup", "streaming_interval_union_coverage",
    "streaming_session_rollup", "streaming_sink_exactly_once_roundtrip",
    "streaming_stateful_totals", "streaming_stateful_type_counts",
    "streaming_topk_types_hourly", "streaming_value_quantiles",
    "surrogate_key_incremental", "text_term_proximity_search",
    "udtf_dynamic_ngrams", "window_functions_showcase",
    "zonemap_skip_simulation",
    # round 7 additions (CORRECTNESS_r07.json — 47 fresh names plus the 3
    # deliberate re-gates dedup_exact / dedup_minhash_lsh /
    # dedup_ngram_jaccard, all green → registry fully driver-verified)
    "association_rules_parts", "batch_replay_pruned_scan",
    "blocklist_phrase_filter", "checkpoint_commitlog_audit",
    "checkpoint_offsetlog_table", "corpus_difficulty_curriculum",
    "corpus_filter_funnel", "custom_sink_audit_roundtrip",
    "data_quality_audit", "dedup_containment", "dedup_edit_distance",
    "dedup_keep_best_quality", "embedding_pq_codes",
    "events_anomaly_persistence", "fd_discovery_profile",
    "fk_inclusion_profile", "graph_bfs_hops", "graph_kcore_peel",
    "graph_pagerank_parts", "graph_triangle_stats",
    "histogram_price_deciles", "hits_authority_hub",
    "hll_intersection_estimate", "ivf_incremental_assign",
    "ivf_recall_report", "kmv_set_ops_event_types",
    "maxmin_fair_allocation", "minhash_bbit_calibration",
    "minhash_jaccard_calibration", "multimodal_wav_stats",
    "naive_bayes_langid", "orders_open_backlog_daily",
    "rfm_customer_segments", "semantic_dedup_semdedup",
    "sql_scripting_showcase", "streaming_chained_windows",
    "streaming_hll_distinct_users", "streaming_join_then_windowed_agg",
    "streaming_late_data_drop", "streaming_purchase_attribution",
    "streaming_rate_limiter", "streaming_replay_source_rollup",
    "streaming_semdedup", "streaming_sliding_rollup",
    "streaming_unattributed_purchases", "streaming_update_mode_rollup",
    "text_kneser_ney_bigram_score",
})

#: Driver-green queries whose BEHAVIOR changed after their last green row:
#: deliberately absent from _DRIVER_CHECKED (the hygiene test enforces
#: they are the only permitted absences) and ordered FIRST so the next
#: driver pass re-earns their row before anything else. Round 8:
#: q1/q3/q10 revenue integerized to per-line half-up cents (closes the
#: half-cent summation-order window the r7 deep review found — published
#: cents can shift by 0.01), and quality_logreg_training's gradient fold
#: distributed (per-row micro-unit gradient terms + order-free integer
#: sums replace the corpus-sized single-row collect_list — trained
#: weights shift slightly).
_RECHECK: tuple[str, ...] = (
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q10_returned_items",
    "quality_logreg_training",
)


def all_specs() -> dict[str, QuerySpec]:
    """Import every operator module (side effect: registration) and return
    the full registry, driver-unverified entries first (see above)."""
    # Imports live here (not module top) so importing the registry alone
    # stays cheap and cycle-free.
    from kafka_stream_job_spark.operators import (  # noqa: F401
        dedup,
        formats,
        linkage,
        multimodal,
        pandas_ops,
        pipeline,
        relational,
        similarity,
        sketches,
        text,
    )
    from kafka_stream_job_spark import bronze  # noqa: F401
    from kafka_stream_job_spark.streaming import pipeline  # noqa: F401

    # Driver-green entries whose behavior CHANGED since their last green
    # row must re-earn it ahead of everything else (see _RECHECK).
    recheck = {n: s for n, s in REGISTRY.items() if n in _RECHECK}
    # Within the never-checked group, order by MEASURED sf0.01 driver-sim
    # cost (tools/verify_oracle.py SIM_PAR=1; re-measured over the FULL
    # 400-query registry at the end of round 8 — the sweep JSON carries
    # per-query secs, so this list regenerates mechanically), cheapest first: if the driver's
    # pass is time-capped rather than count-capped, cheap-first maximizes
    # how many entries earn a correctness row. Names absent from the list
    # (operators added after the measurement) slot in just after the
    # sub-second group.
    cost_order = (
        "text_fingerprint", "url_functions_showcase",
        "bitwise_aggregates_showcase", "text_token_stats",
        "text_bpe_token_count", "data_freshness_sla", "text_quality_score",
        "span_corruption_manifest", "split_train_eval",
        "text_seqlen_histogram", "q6_forecast_revenue", "gdpr_purge_manifest",
        "binary_blob_source_stats", "dedup_exact",
        "scalar_functions_showcase", "datetime_functions_showcase",
        "embedding_norm_stats", "fixed_width_source_read",
        "sft_pair_manifest", "try_functions_showcase", "scd2_customer_merge",
        "grouping_sets_revenue", "lang_balance_weights",
        "embedding_int8_quantize", "execute_immediate_showcase",
        "schema_evolution_merge_read", "bpe_fertility_by_lang",
        "bronze_decode_errors", "collation_group_showcase",
        "text_language_id", "text_sentiment_lexicon",
        "cube_order_status_priority", "nations_with_rich_customers",
        "q4_order_priority", "subject_access_export", "events_json_extract",
        "partitioned_source_pruned_read", "compaction_bin_packing_plan",
        "decayed_leaderboard", "feature_asof_training_matrix",
        "unpivot_lineitem_measures", "jsonl_source_permissive_read",
        "multimodal_resize", "percentile_order_prices",
        "text_mojibake_detect", "csv_source_permissive_read",
        "profile_hot_orderkeys", "text_fano_burstiness",
        "text_unicode_script_profile", "array_set_functions_showcase",
        "events_props_templates", "events_user_lifecycle_stages",
        "map_functions_showcase", "orders_gmv_weekly_wow",
        "q12_priority_by_linestatus", "events_interval_union_coverage",
        "events_multi_rollup", "q22_global_sales_opportunity",
        "text_readability_features", "dedup_prefix_collision",
        "l_diversity_audit", "multimodal_frame_sample", "rollup_returns",
        "attribution_multi_touch", "bronze_decode_roundtrip",
        "dp_noisy_nation_counts", "kmv_distinct_users",
        "multimodal_metadata_scan", "pipe_sql_priority_stats",
        "q15_top_supplier", "sft_loss_masking_spans",
        "similarity_topk_cosine", "stats_qty_price_corr",
        "events_daily_value_trend", "parameterized_sql_showcase",
        "text_hapax_ratio", "trigram_like_search", "rate_limiter_backtest",
        "sql_udf_showcase", "array_agg_user_profile", "events_hourly_rollup",
        "events_transition_matrix", "file_metadata_columns_read",
        "grpo_group_advantage", "q19_disjunctive_revenue",
        "similarity_topk_bucketed", "text_vocab_coverage",
        "events_profile_cosine_pairs", "geo_cell_colocation",
        "lang_temperature_weights", "small_quantity_revenue",
        "text_pii_redaction", "change_data_feed_report", "hll_distinct_users",
        "text_adjacent_repetition", "events_ab_uplift_test",
        "multimodal_png_stats", "similarity_lsh_neardup", "text_zipf_slope",
        "xml_decode_roundtrip", "aes_roundtrip_audit",
        "embedding_pca2_closed_form", "events_ewma_forecast",
        "events_theilsen_trend", "lateral_top_customers_per_nation",
        "web_domain_profile", "discount_elasticity_by_brand",
        "events_burst_hours", "events_funnel_view_click_purchase",
        "events_holt_forecast", "events_session_window_batch",
        "heavy_hitter_tokens", "q14_promo_revenue",
        "score_calibration_report", "incremental_join_maintenance",
        "parts_price_anova_by_size", "text_bm25_search",
        "top_customers_by_revenue", "events_funnel_latency",
        "q9_product_type_profit", "multimodal_bmp_stats",
        "orc_source_roundtrip", "q13_customer_distribution",
        "supplier_return_wilson_rank", "events_seasonality_strength",
        "blocklist_phrase_filter", "embedding_blocking_key_profile",
        "mlm_masking_manifest", "multimodal_magic_sniffer",
        "orders_repeat_purchase_gaps", "price_index_laspeyres",
        "t_closeness_audit", "window_customer_order_rank",
        "corpus_quota_rebalance_delta", "text_feature_hashing",
        "text_rake_keywords", "window_event_gaps",
        "dedup_cluster_size_histogram", "distinct_parts_per_supplier",
        "market_concentration_hhi", "q8_national_market_share",
        "embedding_dim_variance_rank", "mixture_temperature_sweep",
        "orders_priority_status_chi2", "q18_large_volume_customers",
        "salted_join_supplier_volume", "snapshot_retention_expiry_plan",
        "watermark_sizing_report", "events_anomaly_persistence",
        "events_hourly_anomaly", "langid_precision_recall",
        "pivot_user_event_matrix", "q20_heavy_shippers",
        "streaming_dedup_events", "graph_degree_distribution",
        "q7_volume_shipping", "sketch_quantile_bins",
        "bloom_filter_membership", "events_type_audience_overlap",
        "profile_lineitem_columns", "rank_correlation_kendall",
        "events_growth_accounting", "events_holtwinters_forecast",
        "gzip_jsonl_source_read", "hll_merge_event_types",
        "setops_customer_segments", "supplier_scorecard",
        "surrogate_key_assignment", "corpus_dedup_aware_weights",
        "events_user_retention", "kmeans_inertia_elbow", "orphan_file_audit",
        "q11_important_part_value", "range_join_price_bands",
        "cv_fold_manifest", "ols_two_feature_normal_eq",
        "q16_supplier_part_buckets", "text_lexical_diversity",
        "embedding_outlier_zscore", "events_props_variant_decode",
        "null_safe_join_attribution", "q2_min_cost_supplier",
        "session_window_rollup", "customer_spend_gini",
        "decision_stump_split_scores", "events_hill_tail_index",
        "dedup_embedding_cosine", "events_hourly_mad_outliers",
        "multimodal_decode_features", "rag_context_pack",
        "events_hourly_gapfill", "join_skew_planner",
        "customer_balance_ks_test", "events_changepoint_binseg",
        "streaming_heavy_hitter_users", "text_top_bigrams",
        "best_of_n_selection", "streaming_upsert_latest_state",
        "arrow_map_embedding_norm", "streaming_available_now_rollup",
        "text_word_pmi", "events_psi_value_drift",
        "forecast_conformal_intervals", "k_anonymity_audit",
        "multimodal_bmp_ahash", "multimodal_gif_stats",
        "attribution_window_sweep", "linkage_fellegi_sunter",
        "events_alarm_verification", "similarity_topk_ivf",
        "events_dau_wau_mau", "txn_log_time_travel", "benford_digit_audit",
        "ann_ndcg_truncation", "pps_systematic_sample",
        "text_repetition_filter", "ivf_cell_balance_report",
        "timeseries_znorm_subsequence_search", "matryoshka_truncation_recall",
        "orders_open_backlog_daily", "skipgram_negative_samples",
        "streaming_kmv_distinct_users", "streaming_static_enrich",
        "surrogate_key_incremental", "events_sessionize_batch",
        "shard_manifest_balanced", "similarity_topk_binary_rerank",
        "array_hof_showcase", "corpus_token_budget_plan",
        "dedup_frontier_bloom", "events_ohlc_bars",
        "asof_purchase_attribution", "merge_full_cdc",
        "multimodal_stratified_sample", "streaming_gzip_jsonl_rollup",
        "k_anonymity_generalize", "pandas_acctbal_zscore",
        "streaming_dedup_within_watermark", "curriculum_pacing_schedule",
        "streaming_hll_distinct_users", "text_token_entropy",
        "incremental_agg_maintenance", "text_term_proximity_search",
        "fd_discovery_profile", "percentile_distributed_exact",
        "scd2_point_in_time_join", "snapshot_diff_report",
        "streaming_hourly_rollup", "dedup_minhash_lsh", "knn_classifier_eval",
        "basket_part_pairs", "streaming_sliding_rollup", "cms_token_counts",
        "embedding_bitwidth_sweep", "q21_waiting_supplier",
        "q5_local_supplier_volume", "embedding_mutual_nn_pairs",
        "streaming_union_sources_rollup",
        "customer_segment_entropy_by_nation", "window_functions_showcase",
        "dedup_survivors", "events_seasonal_profile", "graph_assortativity",
        "histogram_price_deciles", "q10_returned_items",
        "streaming_csv_source_rollup", "window_range_trailing_hour",
        "bpe_learn_merges", "orders_survival_km", "text_chunk_dedup",
        "lineitem_qty_price_heatmap", "events_interval_overlap_join",
        "search_hybrid_rrf", "graph_link_prediction_suppliers",
        "asof_next_touch_latency", "lineitem_ship_latency",
        "revenue_trend_ols", "streaming_rate_limiter",
        "embedding_cluster_label_purity", "dpo_preference_pairs",
        "streaming_magic_sniffer", "decontaminate_by_embedding",
        "streaming_seasonality_monitor", "quota_sample_per_lang",
        "q1_pricing_summary", "streaming_session_rollup",
        "streaming_topk_types_hourly", "ivf_recall_report",
        "checkpoint_statestore_table", "embedding_covariance",
        "repeated_ngram_spans", "vocab_growth_curve",
        "streaming_sink_exactly_once_roundtrip", "tokenizer_vocab_pressure",
        "similarity_maxsim_multivector", "streaming_interval_union_coverage",
        "bandit_replay_hourly", "bpe_apply_merges", "embedding_pq_codes",
        "quality_logreg_inference", "dedup_edit_distance",
        "gopher_quality_rules", "bradley_terry_strengths",
        "events_markov_stationary", "linkage_blocking_quality",
        "crosslingual_contamination", "supplier_leadtime_percentiles",
        "streaming_fertility_drift", "streaming_psi_drift",
        "streaming_stateful_type_counts", "events_hourly_type_entropy",
        "fuzzy_join_part_names", "corpus_epoch_shuffle_manifest",
        "embedding_jl_projection_audit", "fk_inclusion_profile",
        "weighted_sample_docs", "maxmin_fair_allocation",
        "join_cardinality_audit", "medallion_pipeline_rollup",
        "sketch_user_activity", "text_char_entropy",
        "dedup_incremental_delta", "streaming_ohlc_bars",
        "events_mann_whitney_test", "streaming_value_quantiles",
        "multimodal_audio_frame_energy", "q3_shipping_priority",
        "source_overlap_jaccard", "dedup_exact_substring",
        "multimodal_dedup_content_hash", "streaming_hill_tail_monitor",
        "corpus_source_datasheet", "streaming_stateful_totals",
        "zonemap_skip_simulation", "streaming_update_mode_rollup",
        "kmv_set_ops_event_types", "dsir_importance_weights",
        "hits_authority_hub", "graph_modularity_by_brand",
        "association_rules_parts", "bigram_lm_score",
        "similarity_topk_pq_adc", "batch_replay_source_slice",
        "streaming_late_data_drop", "semantic_dedup_semdedup",
        "text_tfidf_top_terms", "hll_intersection_estimate",
        "dedup_url_canonical", "dedup_simhash", "corpus_shingle_novelty",
        "dedup_span_mask_manifest", "pandas_scalar_log_price",
        "pandas_grouped_agg_trimmed_mean", "corpus_mix_rebalance",
        "ivf_incremental_assign", "ivf_nprobe_sweep",
        "text_rolling_fingerprint", "customers_without_orders",
        "events_props_schema_profile", "embedding_drift_ab_halves",
        "linkage_entity_clusters", "embedding_silhouette_centroid",
        "streaming_chained_windows", "checkpoint_sources_table",
        "events_cusum_drift", "udtf_word_expand", "bucketed_join_colocated",
        "dedup_ngram_jaccard", "pack_sequences_manifest",
        "contrastive_triplets", "abc_customer_classification",
        "orders_cohort_revenue", "multimodal_wav_stats", "doc_sliding_chunks",
        "perplexity_tertile_buckets", "data_quality_audit",
        "rfm_customer_segments", "dedup_pair_provenance",
        "streaming_frontier_bloom", "streaming_txn_log_tail",
        "checkpoint_offsetlog_table", "events_peak_concurrency",
        "embedding_power_iteration", "streaming_quality_monitor",
        "streaming_type_entropy_drift", "graph_label_propagation",
        "dedup_containment", "cluster_kmeans_embeddings",
        "streaming_replay_source_rollup", "hive_source_partition_pruned",
        "streaming_purchase_attribution", "streaming_lsh_candidate_buckets",
        "naive_bayes_langid", "streaming_semdedup", "zorder_layout_stats",
        "streaming_unattributed_purchases", "batch_replay_pruned_scan",
        "checkpoint_commitlog_audit", "minhash_jaccard_calibration",
        "supplier_pareto_frontier", "streaming_ivf_assign", "graph_bfs_hops",
        "corpus_difficulty_curriculum", "streaming_feature_hashing_monitor",
        "graph_pagerank_parts", "minhash_bbit_calibration",
        "multimodal_ahash_neardup", "dedup_band_sweep_calibration",
        "text_entropy_rate_bigram", "events_hourly_autocorr",
        "padding_waste_report", "dedup_connected_components",
        "streaming_join_then_windowed_agg", "text_kneser_ney_bigram_score",
        "recursive_month_spine", "multimodal_silence_segments",
        "custom_sink_audit_roundtrip", "dedup_keep_best_quality",
        "cogroup_asof_pandas", "sql_scripting_showcase",
        "linkage_em_parameters", "content_defined_chunks",
        "udtf_dynamic_ngrams", "corpus_js_divergence", "scan_task_planner",
        "multimodal_shot_boundaries", "graph_kcore_peel",
        "decontaminate_train_shingles", "graph_triangle_stats",
        "quality_logreg_training", "corpus_filter_funnel",
    )
    new_ops_rank = 50.5  # just after the sub-second group (index ~50)
    unchecked = {
        n: s
        for n, s in sorted(
            REGISTRY.items(),
            key=lambda kv: (
                cost_order.index(kv[0]) if kv[0] in cost_order else new_ops_rank
            ),
        )
        if n not in _DRIVER_CHECKED and n not in recheck
    }
    checked = {
        n: s
        for n, s in REGISTRY.items()
        if n in _DRIVER_CHECKED and n not in recheck
    }
    return {**recheck, **unchecked, **checked}
