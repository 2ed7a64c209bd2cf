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
# CORRECTNESS_r01.json ∪ r02 ∪ r03 ∪ r04 ∪ r05 (50 + 45 + 48 + 50 + 47
# fresh = 240 names; r02 re-checked 5 r1 rows, r03 re-checked q22 +
# sketch_user_activity, r05 re-earned the 3 round-5 _RECHECK rows). The
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
    "quota_sample_per_lang", "pack_sequences_manifest", "q1_pricing_summary",
    "q3_shipping_priority", "q5_local_supplier_volume",
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
    "percentile_order_prices", "pivot_user_event_matrix", "q10_returned_items",
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
})

#: Driver-green queries whose BEHAVIOR changed after their last green row:
#: deliberately absent from _DRIVER_CHECKED (the hygiene test enforces
#: they are the only permitted absences) and ordered FIRST so the next
#: driver pass re-earns their row before anything else. Round 6: empty —
#: all three round-5 rechecks (merge_full_cdc, incremental_agg_maintenance,
#: attribution_multi_touch) re-earned green rows in CORRECTNESS_r05.json.
_RECHECK: tuple[str, ...] = ()


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
        "text_fingerprint", "q6_forecast_revenue", "cube_order_status_priority",
        "data_freshness_sla", "scalar_functions_showcase", "text_bpe_token_count",
        "bitwise_aggregates_showcase", "nations_with_rich_customers",
        "customers_without_orders", "datetime_functions_showcase",
        "grouping_sets_revenue", "parameterized_sql_showcase",
        "schema_evolution_merge_read", "pipe_sql_priority_stats",
        "lang_balance_weights", "weighted_sample_docs", "dpo_preference_pairs",
        "gdpr_purge_manifest", "null_safe_join_attribution", "split_train_eval",
        "url_functions_showcase", "arrow_map_embedding_norm",
        "corpus_mix_rebalance", "supplier_return_wilson_rank", "text_token_stats",
        "dedup_exact", "events_daily_value_trend", "multimodal_frame_sample",
        "quota_sample_per_lang", "rollup_returns", "scd2_customer_merge",
        "text_seqlen_histogram", "q14_promo_revenue", "events_json_extract",
        "lateral_top_customers_per_nation", "text_pii_redaction",
        "bronze_decode_errors", "collation_group_showcase",
        "multimodal_metadata_scan", "try_functions_showcase", "events_multi_rollup",
        "pivot_user_event_matrix", "unpivot_lineitem_measures",
        "snapshot_diff_report", "array_agg_user_profile", "profile_hot_orderkeys",
        "text_language_id", "events_hourly_rollup", "lang_temperature_weights",
        "q4_order_priority", "bpe_fertility_by_lang", "events_props_variant_decode",
        "k_anonymity_audit", "kmv_distinct_users", "q12_priority_by_linestatus",
        "window_customer_order_rank", "doc_sliding_chunks", "events_theilsen_trend",
        "file_metadata_columns_read", "multimodal_resize",
        "percentile_order_prices", "stats_qty_price_corr", "text_sentiment_lexicon",
        "benford_digit_audit", "events_funnel_latency", "events_props_templates",
        "q22_global_sales_opportunity", "revenue_trend_ols", "cv_fold_manifest",
        "pack_sequences_manifest", "q1_pricing_summary", "decayed_leaderboard",
        "events_holt_forecast", "events_transition_matrix",
        "compaction_bin_packing_plan", "feature_asof_training_matrix",
        "map_functions_showcase", "small_quantity_revenue", "aes_roundtrip_audit",
        "window_event_gaps", "csv_source_permissive_read", "events_ewma_forecast",
        "events_seasonal_profile", "partitioned_source_pruned_read",
        "setops_customer_segments", "udtf_word_expand",
        "distinct_parts_per_supplier", "events_ab_uplift_test",
        "events_interval_overlap_join", "l_diversity_audit",
        "multimodal_dedup_content_hash", "q13_customer_distribution",
        "array_set_functions_showcase", "events_funnel_view_click_purchase",
        "trigram_like_search", "pandas_scalar_log_price", "text_quality_score",
        "incremental_agg_maintenance", "jsonl_source_permissive_read",
        "pandas_grouped_agg_trimmed_mean", "linkage_blocking_quality",
        "merge_full_cdc", "q19_disjunctive_revenue", "subject_access_export",
        "events_user_retention", "multimodal_decode_features",
        "attribution_multi_touch", "orc_source_roundtrip", "q15_top_supplier",
        "q18_large_volume_customers", "top_customers_by_revenue",
        "asof_next_touch_latency", "bronze_decode_roundtrip",
        "events_sessionize_batch", "lineitem_ship_latency", "pandas_acctbal_zscore",
        "score_calibration_report", "medallion_pipeline_rollup",
        "change_data_feed_report", "events_hourly_anomaly",
        "events_psi_value_drift", "text_vocab_coverage",
        "window_range_trailing_hour", "content_defined_chunks",
        "events_hourly_gapfill", "q16_supplier_part_buckets",
        "events_session_window_batch", "multimodal_audio_frame_energy",
        "blocklist_phrase_filter", "dp_noisy_nation_counts",
        "events_interval_union_coverage", "q2_min_cost_supplier",
        "events_props_schema_profile", "heavy_hitter_tokens", "hll_distinct_users",
        "decontaminate_by_embedding", "mlm_masking_manifest",
        "q3_shipping_priority", "range_join_price_bands", "rate_limiter_backtest",
        "salted_join_supplier_volume", "batch_replay_source_slice",
        "orders_cohort_revenue", "q20_heavy_shippers", "q9_product_type_profit",
        "hll_merge_event_types", "streaming_upsert_latest_state",
        "text_bm25_search", "market_concentration_hhi", "price_index_laspeyres",
        "events_ohlc_bars", "corpus_token_budget_plan", "customer_balance_ks_test",
        "events_holtwinters_forecast", "watermark_sizing_report",
        "sketch_quantile_bins", "text_top_bigrams", "geo_cell_colocation",
        "profile_lineitem_columns", "t_closeness_audit",
        "multimodal_stratified_sample", "text_rake_keywords",
        "incremental_join_maintenance", "embedding_int8_quantize",
        "snapshot_retention_expiry_plan", "session_window_rollup",
        "customer_spend_gini", "orders_priority_status_chi2", "q10_returned_items",
        "similarity_topk_cosine", "timeseries_znorm_subsequence_search",
        "q11_important_part_value", "basket_part_pairs",
        "events_hourly_mad_outliers", "q7_volume_shipping",
        "shard_manifest_balanced", "decision_stump_split_scores",
        "surrogate_key_assignment", "bloom_filter_membership",
        "execute_immediate_showcase", "multimodal_silence_segments",
        "scd2_point_in_time_join", "zorder_layout_stats", "ann_ndcg_truncation",
        "array_hof_showcase", "asof_purchase_attribution", "text_zipf_slope",
        "q21_waiting_supplier", "streaming_heavy_hitter_users",
        "events_changepoint_binseg", "streaming_dedup_events",
        "events_alarm_verification", "events_cusum_drift", "join_skew_planner",
        "rag_context_pack", "similarity_topk_binary_rerank", "text_token_entropy",
        "text_word_pmi", "abc_customer_classification", "xml_decode_roundtrip",
        "matryoshka_truncation_recall", "text_repetition_filter",
        "window_functions_showcase", "embedding_pq_codes",
        "q5_local_supplier_volume", "percentile_distributed_exact",
        "forecast_conformal_intervals", "orphan_file_audit", "data_quality_audit",
        "streaming_union_sources_rollup", "streaming_hll_distinct_users",
        "streaming_sliding_rollup", "events_growth_accounting", "cms_token_counts",
        "events_dau_wau_mau", "histogram_price_deciles",
        "streaming_available_now_rollup", "skipgram_negative_samples",
        "streaming_hourly_rollup", "q8_national_market_share",
        "similarity_maxsim_multivector", "association_rules_parts",
        "events_peak_concurrency", "streaming_kmv_distinct_users",
        "streaming_static_enrich", "orders_survival_km",
        "streaming_dedup_within_watermark", "streaming_rate_limiter",
        "linkage_fellegi_sunter", "search_hybrid_rrf", "padding_waste_report",
        "text_chunk_dedup", "embedding_outlier_zscore",
        "graph_link_prediction_suppliers", "linkage_entity_clusters",
        "embedding_norm_stats", "sql_udf_showcase", "corpus_epoch_shuffle_manifest",
        "repeated_ngram_spans", "streaming_stateful_type_counts",
        "checkpoint_statestore_table", "multimodal_ahash_neardup",
        "embedding_covariance", "k_anonymity_generalize", "bucketed_join_colocated",
        "fuzzy_join_part_names", "join_cardinality_audit",
        "streaming_stateful_totals", "streaming_topk_types_hourly",
        "supplier_pareto_frontier", "surrogate_key_incremental",
        "corpus_source_datasheet", "bigram_lm_score", "semantic_dedup_semdedup",
        "corpus_shingle_novelty", "multimodal_shot_boundaries",
        "sketch_user_activity", "streaming_session_rollup",
        "events_hourly_autocorr", "fd_discovery_profile",
        "hive_source_partition_pruned", "similarity_topk_pq_adc",
        "vocab_growth_curve", "kmv_set_ops_event_types", "quality_logreg_training",
        "decontaminate_train_shingles", "text_term_proximity_search",
        "dedup_edit_distance", "dedup_minhash_lsh", "naive_bayes_langid",
        "ivf_recall_report", "cogroup_asof_pandas", "dedup_incremental_delta",
        "embedding_cluster_label_purity", "udtf_dynamic_ngrams",
        "corpus_js_divergence", "bradley_terry_strengths", "text_tfidf_top_terms",
        "graph_modularity_by_brand", "dedup_span_mask_manifest", "bpe_apply_merges",
        "streaming_value_quantiles", "maxmin_fair_allocation", "bpe_learn_merges",
        "streaming_late_data_drop", "similarity_lsh_neardup",
        "streaming_csv_source_rollup", "hll_intersection_estimate",
        "zonemap_skip_simulation", "recursive_month_spine",
        "streaming_sink_exactly_once_roundtrip", "streaming_chained_windows",
        "embedding_mutual_nn_pairs", "text_rolling_fingerprint",
        "rfm_customer_segments", "hits_authority_hub", "dedup_survivors",
        "contrastive_triplets", "batch_replay_pruned_scan", "fk_inclusion_profile",
        "embedding_power_iteration", "corpus_filter_funnel",
        "streaming_update_mode_rollup", "streaming_replay_source_rollup",
        "dsir_importance_weights", "text_kneser_ney_bigram_score",
        "checkpoint_offsetlog_table", "dedup_containment", "linkage_em_parameters",
        "dedup_simhash", "custom_sink_audit_roundtrip", "dedup_embedding_cosine",
        "minhash_jaccard_calibration", "graph_bfs_hops", "dedup_ngram_jaccard",
        "similarity_topk_ivf", "graph_pagerank_parts", "minhash_bbit_calibration",
        "streaming_purchase_attribution", "streaming_interval_union_coverage",
        "cluster_kmeans_embeddings", "corpus_difficulty_curriculum",
        "streaming_unattributed_purchases", "dedup_keep_best_quality",
        "graph_kcore_peel", "streaming_join_then_windowed_agg",
        "dedup_connected_components", "sql_scripting_showcase",
        "graph_triangle_stats", "checkpoint_commitlog_audit",
        "similarity_topk_bucketed", "gopher_quality_rules",
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
