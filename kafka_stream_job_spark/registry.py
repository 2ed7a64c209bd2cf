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
    # include in bench_extended.py — representatives of the operator
    # families added after the r01 headline set froze (decoders, rank
    # stats, streaming twins, winnowing, distributed GD), so perf
    # regressions in the new families are visible in BENCH_EXTENDED
    # before the driver ever benches them
    bench_ext: bool = False


REGISTRY: dict[str, QuerySpec] = {}

#: Lazy staging hooks for oracle INPUTS that live outside the sf_dir
#: parquet tables (e.g. the scan-task planner's footer fixture). Modules
#: append callables at registration time; ``prepare_oracle_inputs()``
#: runs them when the oracle SQL is actually materialized for execution
#: — never at import, so importing the package does no filesystem I/O.
ORACLE_PREPARE_HOOKS: list[Callable[[], None]] = []


def prepare_oracle_inputs() -> None:
    """Run every staging hook. A hook failure (e.g. read-only /tmp) is
    swallowed here so one unwritable fixture can't take down the whole
    oracle_sql() contract — the affected query then fails alone at
    DuckDB time with a missing-file error naming the stage path."""
    for hook in ORACLE_PREPARE_HOOKS:
        try:
            hook()
        except OSError:
            pass


def register(
    name: str,
    oracle: str | None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
    bench_ext: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query spec to the registry."""

    def wrap(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, tags=tags, bench=bench,
            bench_ext=bench_ext,
        )
        return fn

    return wrap


# Driver verification ledger — the single source of truth for staleness
# rotation. ``_DRIVER_EARNED`` maps every query name the external driver
# has verified to the LATEST round in which it earned a green row
# (rows/schema/hash match in CORRECTNESS_r{N}.json, or a rows-only green
# for the two no-oracle entries). Regenerate after each round by folding
# CORRECTNESS_r{N}.json in: for each green name, set
# ``_DRIVER_EARNED[name] = max(old, N)``; brand-new names simply gain an
# entry. ``tools/fold_correctness.py`` automates this.
#
# STANDING ROTATION POLICY (made explicit in round 12): the driver
# enumerates only the FIRST ~50 registry entries per round, so
# ``all_specs`` orders the registry as
#   1. _RECHECK names (behavior changed since their green row) first,
#   2. never-driver-checked names next (cheapest-first by measured
#      sf0.01 cost, so a time-capped pass earns the most NEW rows),
#   3. driver-checked names last, ordered STALEST ROUND FIRST
#      (ties broken by name for determinism).
# Group 3's ordering is what keeps cumulative verification fresh: every
# driver slot not consumed by a new operator provably lands on the
# oldest-earned green rows (round 12 entry point: the 39 round-2-era
# names follow the 24 remaining round-1 names). Round 11 achieved this
# only by accident of insertion order; the earned-round ledger makes it
# mechanical.
_DRIVER_EARNED: dict[str, int] = {
    # last driver-green row earned in round 2 (24 names)
    "multimodal_metadata_scan": 2, "pack_sequences_manifest": 2,
    "percentile_order_prices": 2, "pivot_user_event_matrix": 2,
    "q12_priority_by_linestatus": 2, "q14_promo_revenue": 2,
    "q15_top_supplier": 2, "q18_large_volume_customers": 2,
    "q19_disjunctive_revenue": 2, "q4_order_priority": 2,
    "q6_forecast_revenue": 2, "q7_volume_shipping": 2,
    "range_join_price_bands": 2, "repeated_ngram_spans": 2,
    "salted_join_supplier_volume": 2, "search_hybrid_rrf": 2,
    "session_window_rollup": 2, "shard_manifest_balanced": 2,
    "text_bm25_search": 2, "text_chunk_dedup": 2, "text_zipf_slope": 2,
    "udtf_word_expand": 2, "unpivot_lineitem_measures": 2,
    "weighted_sample_docs": 2,
    # last driver-green row earned in round 3 (49 names)
    "ann_ndcg_truncation": 3, "array_set_functions_showcase": 3,
    "arrow_map_embedding_norm": 3, "asof_next_touch_latency": 3,
    "benford_digit_audit": 3, "bloom_filter_membership": 3,
    "bronze_decode_errors": 3, "bronze_decode_roundtrip": 3,
    "csv_source_permissive_read": 3, "customer_balance_ks_test": 3,
    "cv_fold_manifest": 3, "events_ab_uplift_test": 3,
    "events_ewma_forecast": 3, "events_funnel_latency": 3,
    "events_funnel_view_click_purchase": 3, "events_holt_forecast": 3,
    "events_interval_overlap_join": 3, "events_props_templates": 3,
    "events_props_variant_decode": 3, "events_psi_value_drift": 3,
    "events_theilsen_trend": 3, "events_transition_matrix": 3,
    "feature_asof_training_matrix": 3, "gdpr_purge_manifest": 3,
    "k_anonymity_audit": 3, "kmv_distinct_users": 3,
    "lang_balance_weights": 3, "lang_temperature_weights": 3,
    "map_functions_showcase": 3, "multimodal_stratified_sample": 3,
    "null_safe_join_attribution": 3, "orc_source_roundtrip": 3,
    "pandas_grouped_agg_trimmed_mean": 3, "parameterized_sql_showcase": 3,
    "partitioned_source_pruned_read": 3, "pipe_sql_priority_stats": 3,
    "profile_hot_orderkeys": 3, "q22_global_sales_opportunity": 3,
    "revenue_trend_ols": 3, "scd2_customer_merge": 3,
    "schema_evolution_merge_read": 3, "similarity_topk_binary_rerank": 3,
    "sketch_user_activity": 3, "stats_qty_price_corr": 3,
    "supplier_return_wilson_rank": 3, "text_sentiment_lexicon": 3,
    "text_vocab_coverage": 3, "try_functions_showcase": 3,
    "xml_decode_roundtrip": 3,
    # last driver-green row earned in round 4 (48 names)
    "abc_customer_classification": 4, "aes_roundtrip_audit": 4,
    "basket_part_pairs": 4, "bitwise_aggregates_showcase": 4,
    "checkpoint_statestore_table": 4, "customer_spend_gini": 4,
    "decontaminate_by_embedding": 4, "events_alarm_verification": 4,
    "events_changepoint_binseg": 4, "events_daily_value_trend": 4,
    "events_dau_wau_mau": 4, "events_holtwinters_forecast": 4,
    "events_hourly_anomaly": 4, "events_hourly_gapfill": 4,
    "events_hourly_mad_outliers": 4, "events_props_schema_profile": 4,
    "events_seasonal_profile": 4, "events_session_window_batch": 4,
    "events_sessionize_batch": 4, "forecast_conformal_intervals": 4,
    "hive_source_partition_pruned": 4, "hll_distinct_users": 4,
    "hll_merge_event_types": 4, "join_skew_planner": 4,
    "lateral_top_customers_per_nation": 4, "lineitem_ship_latency": 4,
    "matryoshka_truncation_recall": 4, "medallion_pipeline_rollup": 4,
    "mlm_masking_manifest": 4, "orders_priority_status_chi2": 4,
    "profile_lineitem_columns": 4, "q13_customer_distribution": 4,
    "q16_supplier_part_buckets": 4, "q21_waiting_supplier": 4,
    "q2_min_cost_supplier": 4, "rag_context_pack": 4,
    "scd2_point_in_time_join": 4, "skipgram_negative_samples": 4,
    "snapshot_diff_report": 4, "streaming_dedup_events": 4,
    "streaming_heavy_hitter_users": 4, "streaming_kmv_distinct_users": 4,
    "surrogate_key_assignment": 4, "text_rake_keywords": 4,
    "timeseries_znorm_subsequence_search": 4, "trigram_like_search": 4,
    "watermark_sizing_report": 4, "window_range_trailing_hour": 4,
    # last driver-green row earned in round 5 (50 names)
    "array_hof_showcase": 5, "attribution_multi_touch": 5,
    "batch_replay_source_slice": 5, "bpe_fertility_by_lang": 5,
    "change_data_feed_report": 5, "collation_group_showcase": 5,
    "compaction_bin_packing_plan": 5, "data_freshness_sla": 5,
    "decayed_leaderboard": 5, "decision_stump_split_scores": 5,
    "dp_noisy_nation_counts": 5, "dpo_preference_pairs": 5,
    "events_cusum_drift": 5, "events_ohlc_bars": 5,
    "execute_immediate_showcase": 5, "geo_cell_colocation": 5,
    "heavy_hitter_tokens": 5, "incremental_agg_maintenance": 5,
    "incremental_join_maintenance": 5, "jsonl_source_permissive_read": 5,
    "l_diversity_audit": 5, "linkage_fellegi_sunter": 5,
    "market_concentration_hhi": 5, "merge_full_cdc": 5,
    "multimodal_silence_segments": 5, "orders_cohort_revenue": 5,
    "orphan_file_audit": 5, "percentile_distributed_exact": 5,
    "price_index_laspeyres": 5, "q11_important_part_value": 5,
    "q20_heavy_shippers": 5, "q8_national_market_share": 5,
    "q9_product_type_profit": 5, "score_calibration_report": 5,
    "sketch_quantile_bins": 5, "snapshot_retention_expiry_plan": 5,
    "sql_udf_showcase": 5, "streaming_csv_source_rollup": 5,
    "streaming_dedup_within_watermark": 5, "streaming_hourly_rollup": 5,
    "streaming_static_enrich": 5, "streaming_union_sources_rollup": 5,
    "streaming_upsert_latest_state": 5, "subject_access_export": 5,
    "supplier_pareto_frontier": 5, "t_closeness_audit": 5,
    "text_word_pmi": 5, "url_functions_showcase": 5, "vocab_growth_curve": 5,
    "zorder_layout_stats": 5,
    # last driver-green row earned in round 6 (48 names)
    "bigram_lm_score": 6, "bradley_terry_strengths": 6,
    "bucketed_join_colocated": 6, "cms_token_counts": 6,
    "cogroup_asof_pandas": 6, "corpus_epoch_shuffle_manifest": 6,
    "corpus_shingle_novelty": 6, "corpus_source_datasheet": 6,
    "dedup_incremental_delta": 6, "dsir_importance_weights": 6,
    "embedding_cluster_label_purity": 6, "embedding_mutual_nn_pairs": 6,
    "embedding_power_iteration": 6, "events_growth_accounting": 6,
    "events_hourly_autocorr": 6, "events_interval_union_coverage": 6,
    "events_peak_concurrency": 6, "file_metadata_columns_read": 6,
    "fuzzy_join_part_names": 6, "gopher_quality_rules": 6,
    "graph_link_prediction_suppliers": 6, "graph_modularity_by_brand": 6,
    "join_cardinality_audit": 6, "k_anonymity_generalize": 6,
    "linkage_blocking_quality": 6, "linkage_em_parameters": 6,
    "linkage_entity_clusters": 6, "multimodal_ahash_neardup": 6,
    "multimodal_shot_boundaries": 6, "orders_survival_km": 6,
    "padding_waste_report": 6, "rate_limiter_backtest": 6,
    "recursive_month_spine": 6, "similarity_maxsim_multivector": 6,
    "similarity_topk_pq_adc": 6, "streaming_available_now_rollup": 6,
    "streaming_interval_union_coverage": 6, "streaming_session_rollup": 6,
    "streaming_sink_exactly_once_roundtrip": 6,
    "streaming_stateful_totals": 6, "streaming_stateful_type_counts": 6,
    "streaming_topk_types_hourly": 6, "streaming_value_quantiles": 6,
    "surrogate_key_incremental": 6, "text_term_proximity_search": 6,
    "udtf_dynamic_ngrams": 6, "window_functions_showcase": 6,
    "zonemap_skip_simulation": 6,
    # last driver-green row earned in round 7 (45 names)
    "association_rules_parts": 7, "batch_replay_pruned_scan": 7,
    "blocklist_phrase_filter": 7, "checkpoint_commitlog_audit": 7,
    "checkpoint_offsetlog_table": 7, "corpus_difficulty_curriculum": 7,
    "corpus_filter_funnel": 7, "custom_sink_audit_roundtrip": 7,
    "data_quality_audit": 7, "dedup_containment": 7,
    "dedup_edit_distance": 7, "dedup_keep_best_quality": 7,
    "embedding_pq_codes": 7, "events_anomaly_persistence": 7,
    "fd_discovery_profile": 7, "fk_inclusion_profile": 7,
    "graph_bfs_hops": 7, "graph_kcore_peel": 7, "graph_pagerank_parts": 7,
    "graph_triangle_stats": 7, "histogram_price_deciles": 7,
    "hits_authority_hub": 7, "hll_intersection_estimate": 7,
    "kmv_set_ops_event_types": 7, "maxmin_fair_allocation": 7,
    "minhash_bbit_calibration": 7, "minhash_jaccard_calibration": 7,
    "multimodal_wav_stats": 7, "naive_bayes_langid": 7,
    "orders_open_backlog_daily": 7, "rfm_customer_segments": 7,
    "semantic_dedup_semdedup": 7, "sql_scripting_showcase": 7,
    "streaming_chained_windows": 7, "streaming_hll_distinct_users": 7,
    "streaming_join_then_windowed_agg": 7, "streaming_late_data_drop": 7,
    "streaming_purchase_attribution": 7, "streaming_rate_limiter": 7,
    "streaming_replay_source_rollup": 7, "streaming_semdedup": 7,
    "streaming_sliding_rollup": 7, "streaming_unattributed_purchases": 7,
    "streaming_update_mode_rollup": 7, "text_kneser_ney_bigram_score": 7,
    # last driver-green row earned in round 8 (49 names)
    "attribution_window_sweep": 8, "best_of_n_selection": 8,
    "binary_blob_source_stats": 8, "corpus_dedup_aware_weights": 8,
    "dedup_cluster_size_histogram": 8, "dedup_prefix_collision": 8,
    "dedup_url_canonical": 8, "discount_cap_counterfactual": 8,
    "discount_elasticity_by_brand": 8, "embedding_blocking_key_profile": 8,
    "embedding_dim_variance_rank": 8, "embedding_isotropy_proxy": 8,
    "embedding_pca2_closed_form": 8, "events_hill_tail_index": 8,
    "events_profile_cosine_pairs": 8, "events_seasonality_strength": 8,
    "events_type_audience_overlap": 8, "events_user_lifecycle_stages": 8,
    "fixed_width_source_read": 8, "gmv_walk_forward_backtest": 8,
    "graph_degree_distribution": 8, "grpo_group_advantage": 8,
    "gzip_jsonl_source_read": 8, "multimodal_bmp_stats": 8,
    "multimodal_gif_stats": 8, "multimodal_magic_sniffer": 8,
    "orders_duplicate_payment_audit": 8, "orders_gmv_weekly_wow": 8,
    "orders_repeat_purchase_gaps": 8, "parts_price_anova_by_size": 8,
    "q10_returned_items": 8, "q1_pricing_summary": 8,
    "q3_shipping_priority": 8, "quality_logreg_training": 8,
    "rank_correlation_kendall": 8, "revenue_waterfall": 8,
    "sft_loss_masking_spans": 8, "sft_pair_manifest": 8,
    "streaming_state_budget_planner": 8, "supplier_scorecard": 8,
    "text_adjacent_repetition": 8, "text_fano_burstiness": 8,
    "text_feature_hashing": 8, "text_hapax_ratio": 8,
    "text_lexical_diversity": 8, "text_mojibake_detect": 8,
    "text_readability_features": 8, "text_unicode_script_profile": 8,
    "web_domain_profile": 8,
    # last driver-green row earned in round 9 (50 names)
    "bandit_replay_hourly": 9, "churn_label_manifest": 9,
    "corpus_weights_ess": 9, "curriculum_pacing_schedule": 9,
    "customer_segment_entropy_by_nation": 9, "dedup_exact_substring": 9,
    "dedup_frontier_bloom": 9, "dedup_pair_provenance": 9,
    "dedup_pipeline_composition": 9, "embedding_bitwidth_sweep": 9,
    "embedding_jl_projection_audit": 9, "events_bounce_rate_by_entry": 9,
    "events_burst_hours": 9, "events_hourly_type_entropy": 9,
    "events_mann_whitney_test": 9, "graph_assortativity": 9,
    "ivf_cell_balance_report": 9, "kmeans_inertia_elbow": 9,
    "knn_classifier_eval": 9, "langid_precision_recall": 9,
    "lineitem_qty_price_heatmap": 9, "mixture_temperature_sweep": 9,
    "multimodal_avi_shot_boundaries": 9, "multimodal_avi_stats": 9,
    "multimodal_bmp_ahash": 9, "neyman_allocation_plan": 9,
    "ols_two_feature_normal_eq": 9, "orders_mean_value_bootstrap_ci": 9,
    "partition_spec_advisor": 9, "pps_systematic_sample": 9,
    "quality_logreg_inference": 9, "quality_rater_agreement_kappa": 9,
    "rater_mcnemar_test": 9, "span_corruption_manifest": 9,
    "streaming_bootstrap_ci": 9, "streaming_brand_mi_drift": 9,
    "streaming_fertility_drift": 9, "streaming_gzip_jsonl_rollup": 9,
    "streaming_hill_tail_monitor": 9, "streaming_magic_sniffer": 9,
    "streaming_psi_drift": 9, "streaming_seasonality_monitor": 9,
    "streaming_self_excitation": 9, "streaming_txn_log_tail": 9,
    "supplier_leadtime_percentiles": 9, "text_char_entropy": 9,
    "text_entropy_rate_bigram": 9, "tokenizer_vocab_pressure": 9,
    "txn_log_time_travel": 9, "user_trigram_paths": 9,
    # last driver-green row earned in round 10 (49 names)
    "ann_method_agreement": 10, "ann_pipeline_composition": 10,
    "basket_size_nbd_fit": 10, "checkpoint_sources_table": 10,
    "corpus_quota_rebalance_delta": 10, "crosslingual_contamination": 10,
    "dedup_band_sweep_calibration": 10, "dedup_transitivity_audit": 10,
    "embedding_drift_ab_halves": 10, "embedding_silhouette_centroid": 10,
    "events_ccf_count_value": 10, "events_haar_wavelet_energy": 10,
    "events_markov_stationary": 10, "events_self_excitation_ratio": 10,
    "events_sprt_monitor": 10, "graph_label_propagation": 10,
    "ivf_nprobe_sweep": 10, "multimodal_png_stats": 10,
    "multimodal_wav_haar_energy": 10, "multimodal_wav_silence_real": 10,
    "orders_cuped_adjustment": 10, "part_name_brand_mi": 10,
    "perplexity_tertile_buckets": 10, "recsys_item_cosine": 10,
    "scan_task_planner": 10, "shuffle_partition_advisor": 10,
    "single_source_risk_report": 10, "source_overlap_jaccard": 10,
    "spearman_len_vs_ttr": 10, "streaming_bounce_rate": 10,
    "streaming_cuped_monitor": 10, "streaming_ess_monitor": 10,
    "streaming_feature_hashing_monitor": 10, "streaming_frontier_bloom": 10,
    "streaming_ivf_assign": 10, "streaming_lsh_candidate_buckets": 10,
    "streaming_neyman_allocation": 10, "streaming_ohlc_bars": 10,
    "streaming_quality_monitor": 10, "streaming_rater_drift_monitor": 10,
    "streaming_sprt_monitor": 10, "streaming_type_entropy_drift": 10,
    "streaming_unigram_fertility": 10, "streaming_wav_haar_monitor": 10,
    "token_df_drift_halves": 10, "tokenizer_unigram_compression": 10,
    "tokenizer_unigram_fertility": 10, "tokenizer_unigram_fit": 10,
    "user_time_to_first_purchase": 10,
    # last driver-green row earned in round 11 (50 names)
    "brier_score_decomposition": 11, "cluster_kmeans_embeddings": 11,
    "dedup_embedding_cosine": 11, "dedup_exact": 11, "dedup_minhash_lsh": 11,
    "dedup_ngram_jaccard": 11, "dedup_simhash": 11, "dedup_survivors": 11,
    "doc_length_winsorize_audit": 11, "embedding_covariance": 11,
    "embedding_int8_quantize": 11, "embedding_norm_stats": 11,
    "embedding_outlier_zscore": 11, "events_mann_kendall_trend": 11,
    "events_permutation_test": 11, "events_power_mde_plan": 11,
    "events_runs_test": 11, "events_srm_check": 11,
    "ivf_incremental_assign": 11, "ivf_recall_report": 11,
    "multimodal_bmp_dhash": 11, "multimodal_wav_zcr_real": 11,
    "orders_did_estimator": 11, "similarity_lsh_neardup": 11,
    "similarity_topk_bucketed": 11, "similarity_topk_cosine": 11,
    "similarity_topk_ivf": 11, "split_leakage_audit": 11,
    "split_train_eval": 11, "streaming_brier_monitor": 11,
    "streaming_did_monitor": 11, "streaming_mann_kendall_monitor": 11,
    "streaming_permutation_monitor": 11, "streaming_power_mde_monitor": 11,
    "streaming_runs_monitor": 11, "streaming_split_leakage_monitor": 11,
    "streaming_srm_monitor": 11, "streaming_wav_zcr_monitor": 11,
    "text_bpe_token_count": 11, "text_fingerprint": 11,
    "text_language_id": 11, "text_pii_redaction": 11,
    "text_quality_score": 11, "text_repetition_filter": 11,
    "text_rolling_fingerprint": 11, "text_seqlen_histogram": 11,
    "text_tfidf_top_terms": 11, "text_token_entropy": 11,
    "text_token_stats": 11, "text_top_bigrams": 11,
    # last driver-green row earned in round 12 (50 names)
    "array_agg_user_profile": 12, "asof_purchase_attribution": 12,
    "bpe_apply_merges": 12, "bpe_learn_merges": 12,
    "bronze_compaction_roundtrip": 12, "checkpoint_retention_audit": 12,
    "content_defined_chunks": 12, "contrastive_triplets": 12,
    "corpus_js_divergence": 12, "corpus_mix_rebalance": 12,
    "corpus_token_budget_plan": 12, "cube_order_status_priority": 12,
    "customers_without_orders": 12, "datetime_functions_showcase": 12,
    "decontaminate_train_shingles": 12, "dedup_connected_components": 12,
    "dedup_lsh_index_maintenance": 12, "dedup_span_mask_manifest": 12,
    "distinct_parts_per_supplier": 12, "doc_sliding_chunks": 12,
    "events_hourly_rollup": 12, "events_json_extract": 12,
    "events_multi_rollup": 12, "events_quantile_uplift": 12,
    "events_user_retention": 12, "grouping_sets_revenue": 12,
    "multimodal_ahash_cluster_reps": 12, "multimodal_audio_frame_energy": 12,
    "multimodal_decode_features": 12, "multimodal_dedup_content_hash": 12,
    "multimodal_frame_sample": 12, "multimodal_resize": 12,
    "nations_with_rich_customers": 12, "pandas_acctbal_zscore": 12,
    "pandas_scalar_log_price": 12, "q5_local_supplier_volume": 12,
    "quota_sample_per_lang": 12, "rollup_returns": 12,
    "scalar_functions_showcase": 12, "setops_customer_segments": 12,
    "small_quantity_revenue": 12, "streaming_ccf_monitor": 12,
    "streaming_curation_funnel": 12, "streaming_lsh_index_maintenance": 12,
    "streaming_nbd_monitor": 12, "streaming_ttfp_monitor": 12,
    "text_curation_funnel": 12, "top_customers_by_revenue": 12,
    "window_customer_order_rank": 12, "window_event_gaps": 12,
}

#: Backwards-compatible view: the set of all driver-verified names.
#: (The hygiene tests and ordering logic key off membership; the ledger
#: above adds the per-name round used for stalest-first rotation.)
_DRIVER_CHECKED = frozenset(_DRIVER_EARNED)

#: Driver-green queries whose BEHAVIOR changed after their last green row:
#: deliberately absent from _DRIVER_CHECKED (the hygiene test enforces
#: they are the only permitted absences) and ordered FIRST so the next
#: driver pass re-earns their row before anything else. Round 10: empty —
#: span_corruption_manifest re-earned its row in CORRECTNESS_r09.json
#: after the phantom-span fix, and no published values changed since.
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
    # 501-query registry in round 11 — regenerate any time with
    # tools/regen_cost_order.py from the committed CORRECTNESS_LOCAL.json),
    # cheapest first: if the driver's
    # pass is time-capped rather than count-capped, cheap-first maximizes
    # how many entries earn a correctness row. Names absent from the list
    # (operators added after the measurement) slot in just after the
    # sub-second group.
    cost_order = (
        "binary_blob_source_stats", "text_fingerprint",
        "nations_with_rich_customers", "text_bpe_token_count",
        "sft_loss_masking_spans", "weighted_sample_docs",
        "customers_without_orders", "quota_sample_per_lang",
        "text_token_stats", "url_functions_showcase",
        "multimodal_metadata_scan", "span_corruption_manifest",
        "corpus_mix_rebalance", "fixed_width_source_read",
        "schema_evolution_merge_read", "split_train_eval",
        "pipe_sql_priority_stats", "text_seqlen_histogram",
        "data_freshness_sla", "datetime_functions_showcase",
        "doc_sliding_chunks", "q6_forecast_revenue",
        "scalar_functions_showcase", "text_quality_score",
        "bitwise_aggregates_showcase", "gdpr_purge_manifest",
        "grouping_sets_revenue", "q14_promo_revenue",
        "text_fano_burstiness", "arrow_map_embedding_norm",
        "cube_order_status_priority", "lang_temperature_weights",
        "multimodal_resize", "sft_pair_manifest", "text_pii_redaction",
        "dpo_preference_pairs", "pack_sequences_manifest",
        "partitioned_source_pruned_read", "lang_balance_weights",
        "lateral_top_customers_per_nation", "try_functions_showcase",
        "cv_fold_manifest", "parameterized_sql_showcase",
        "text_sentiment_lexicon", "dedup_exact", "events_json_extract",
        "multimodal_stratified_sample", "q12_priority_by_linestatus",
        "text_language_id", "text_adjacent_repetition",
        "events_daily_value_trend", "file_metadata_columns_read",
        "rollup_returns", "text_mojibake_detect", "bpe_fertility_by_lang",
        "q4_order_priority", "supplier_return_wilson_rank",
        "csv_source_permissive_read", "embedding_isotropy_proxy",
        "embedding_norm_stats", "jsonl_source_permissive_read",
        "multimodal_frame_sample", "null_safe_join_attribution",
        "percentile_order_prices", "q19_disjunctive_revenue",
        "unpivot_lineitem_measures", "embedding_int8_quantize",
        "embedding_pca2_closed_form", "linkage_blocking_quality",
        "multimodal_decode_features", "profile_hot_orderkeys",
        "q22_global_sales_opportunity", "text_unicode_script_profile",
        "benford_digit_audit", "dedup_url_canonical",
        "multimodal_dedup_content_hash", "multimodal_gif_stats",
        "scd2_customer_merge", "execute_immediate_showcase",
        "k_anonymity_audit", "events_props_templates",
        "pandas_grouped_agg_trimmed_mean", "rater_mcnemar_test",
        "events_props_variant_decode", "events_user_lifecycle_stages",
        "incremental_agg_maintenance", "multimodal_png_stats",
        "q15_top_supplier", "revenue_waterfall", "events_multi_rollup",
        "gmv_walk_forward_backtest", "pandas_scalar_log_price",
        "window_customer_order_rank", "collation_group_showcase",
        "content_defined_chunks", "decayed_leaderboard",
        "events_power_mde_plan", "events_psi_value_drift",
        "kmv_distinct_users", "multimodal_audio_frame_energy",
        "multimodal_avi_stats", "neyman_allocation_plan",
        "pandas_acctbal_zscore", "q7_volume_shipping", "text_hapax_ratio",
        "text_readability_features", "dp_noisy_nation_counts",
        "events_holt_forecast", "events_hourly_rollup", "merge_full_cdc",
        "quality_rater_agreement_kappa", "stats_qty_price_corr",
        "discount_cap_counterfactual", "events_funnel_latency",
        "gzip_jsonl_source_read", "linkage_fellegi_sunter",
        "orphan_file_audit", "q13_customer_distribution",
        "setops_customer_segments", "bronze_decode_errors",
        "multimodal_wav_silence_real", "rank_correlation_kendall",
        "small_quantity_revenue", "compaction_bin_packing_plan",
        "dedup_cluster_size_histogram", "events_interval_union_coverage",
        "grpo_group_advantage", "subject_access_export",
        "text_vocab_coverage", "embedding_bitwidth_sweep",
        "multimodal_avi_shot_boundaries", "multimodal_bmp_stats",
        "multimodal_magic_sniffer", "snapshot_diff_report",
        "text_zipf_slope", "top_customers_by_revenue",
        "array_agg_user_profile", "asof_next_touch_latency",
        "attribution_multi_touch", "feature_asof_training_matrix",
        "hll_distinct_users", "orc_source_roundtrip",
        "q9_product_type_profit", "range_join_price_bands",
        "text_bm25_search", "web_domain_profile", "best_of_n_selection",
        "dedup_prefix_collision", "events_ewma_forecast",
        "pivot_user_event_matrix", "q10_returned_items",
        "user_time_to_first_purchase", "window_event_gaps",
        "events_transition_matrix", "map_functions_showcase",
        "similarity_topk_binary_rerank", "basket_size_nbd_fit",
        "embedding_blocking_key_profile",
        "events_funnel_view_click_purchase", "events_theilsen_trend",
        "lineitem_ship_latency", "orders_duplicate_payment_audit",
        "q18_large_volume_customers", "text_rake_keywords",
        "token_df_drift_halves", "events_interval_overlap_join",
        "medallion_pipeline_rollup", "similarity_topk_bucketed",
        "udtf_word_expand", "events_burst_hours", "events_srm_check",
        "geo_cell_colocation", "q11_important_part_value",
        "q8_national_market_share", "revenue_trend_ols",
        "change_data_feed_report", "embedding_dim_variance_rank",
        "embedding_jl_projection_audit", "events_hill_tail_index",
        "events_seasonal_profile", "score_calibration_report",
        "xml_decode_roundtrip", "array_set_functions_showcase",
        "distinct_parts_per_supplier", "events_ab_uplift_test",
        "multimodal_ahash_neardup", "multimodal_silence_segments",
        "parts_price_anova_by_size", "salted_join_supplier_volume",
        "sql_udf_showcase", "l_diversity_audit", "orders_gmv_weekly_wow",
        "events_user_retention", "orders_repeat_purchase_gaps",
        "profile_lineitem_columns", "q3_shipping_priority",
        "similarity_lsh_neardup", "trigram_like_search",
        "user_trigram_paths", "aes_roundtrip_audit",
        "corpus_quota_rebalance_delta", "decontaminate_by_embedding",
        "mixture_temperature_sweep", "q1_pricing_summary",
        "streaming_state_budget_planner", "window_range_trailing_hour",
        "corpus_weights_ess", "events_seasonality_strength",
        "corpus_token_budget_plan", "kmeans_inertia_elbow",
        "multimodal_wav_haar_energy", "partition_spec_advisor",
        "corpus_dedup_aware_weights", "langid_precision_recall",
        "mlm_masking_manifest", "shard_manifest_balanced",
        "txn_log_time_travel", "events_hourly_gapfill",
        "q16_supplier_part_buckets", "q20_heavy_shippers",
        "events_hourly_anomaly", "events_type_audience_overlap",
        "incremental_join_maintenance", "similarity_topk_cosine",
        "split_leakage_audit", "ann_ndcg_truncation",
        "q2_min_cost_supplier", "rate_limiter_backtest",
        "dedup_frontier_bloom", "multimodal_bmp_ahash",
        "orders_priority_status_chi2", "asof_purchase_attribution",
        "ivf_cell_balance_report", "shuffle_partition_advisor",
        "text_lexical_diversity", "matryoshka_truncation_recall",
        "streaming_heavy_hitter_users", "text_feature_hashing",
        "text_top_bigrams", "events_self_excitation_ratio",
        "sketch_quantile_bins", "events_anomaly_persistence",
        "events_sessionize_batch", "market_concentration_hhi",
        "price_index_laspeyres", "streaming_csv_source_rollup",
        "t_closeness_audit", "text_word_pmi", "multimodal_bmp_dhash",
        "rag_context_pack", "text_repetition_filter",
        "events_session_window_batch", "streaming_gzip_jsonl_rollup",
        "streaming_upsert_latest_state", "events_cusum_drift",
        "events_props_schema_profile", "hll_merge_event_types",
        "embedding_outlier_zscore", "skipgram_negative_samples",
        "snapshot_retention_expiry_plan", "churn_label_manifest",
        "customer_balance_ks_test", "decision_stump_split_scores",
        "search_hybrid_rrf", "discount_elasticity_by_brand",
        "events_bounce_rate_by_entry", "session_window_rollup",
        "array_hof_showcase", "embedding_cluster_label_purity",
        "streaming_available_now_rollup", "streaming_kmv_distinct_users",
        "watermark_sizing_report", "embedding_mutual_nn_pairs",
        "data_quality_audit", "similarity_topk_ivf",
        "q5_local_supplier_volume", "streaming_dedup_events",
        "timeseries_znorm_subsequence_search", "attribution_window_sweep",
        "events_growth_accounting", "forecast_conformal_intervals",
        "q21_waiting_supplier", "supplier_scorecard", "text_chunk_dedup",
        "bronze_decode_roundtrip", "events_sprt_monitor",
        "brier_score_decomposition", "percentile_distributed_exact",
        "events_holtwinters_forecast", "knn_classifier_eval",
        "events_ohlc_bars", "repeated_ngram_spans",
        "surrogate_key_assignment", "text_term_proximity_search",
        "corpus_epoch_shuffle_manifest", "events_hourly_mad_outliers",
        "streaming_hll_distinct_users", "text_char_entropy",
        "pps_systematic_sample", "scd2_point_in_time_join",
        "ols_two_feature_normal_eq", "streaming_rater_drift_monitor",
        "join_skew_planner", "k_anonymity_generalize",
        "streaming_static_enrich", "heavy_hitter_tokens",
        "graph_degree_distribution", "similarity_maxsim_multivector",
        "streaming_dedup_within_watermark", "events_profile_cosine_pairs",
        "streaming_neyman_allocation", "streaming_union_sources_rollup",
        "text_token_entropy", "bloom_filter_membership", "bpe_learn_merges",
        "zorder_layout_stats", "curriculum_pacing_schedule",
        "customer_spend_gini", "embedding_pq_codes",
        "linkage_entity_clusters", "multimodal_wav_stats",
        "abc_customer_classification", "doc_length_winsorize_audit",
        "gopher_quality_rules", "padding_waste_report",
        "checkpoint_statestore_table", "vocab_growth_curve",
        "window_functions_showcase", "batch_replay_pruned_scan",
        "corpus_js_divergence", "dedup_incremental_delta",
        "events_changepoint_binseg", "orders_did_estimator",
        "orders_cohort_revenue", "streaming_sliding_rollup",
        "surrogate_key_incremental", "streaming_seasonality_monitor",
        "dedup_edit_distance", "orders_cuped_adjustment",
        "streaming_psi_drift", "corpus_source_datasheet",
        "graph_link_prediction_suppliers", "streaming_rate_limiter",
        "dedup_transitivity_audit", "streaming_txn_log_tail",
        "basket_part_pairs", "events_peak_concurrency", "bpe_apply_merges",
        "dedup_pair_provenance", "events_alarm_verification",
        "fuzzy_join_part_names", "bandit_replay_hourly",
        "events_dau_wau_mau", "events_mann_whitney_test",
        "embedding_covariance", "orders_survival_km",
        "streaming_srm_monitor", "fd_discovery_profile",
        "multimodal_shot_boundaries", "scan_task_planner",
        "streaming_ess_monitor", "events_ccf_count_value",
        "events_mann_kendall_trend", "streaming_magic_sniffer",
        "embedding_drift_ab_halves", "linkage_em_parameters",
        "similarity_topk_pq_adc", "streaming_hourly_rollup",
        "dedup_embedding_cosine", "dedup_exact_substring",
        "orders_open_backlog_daily", "quality_logreg_inference",
        "single_source_risk_report", "source_overlap_jaccard",
        "crosslingual_contamination", "tokenizer_vocab_pressure",
        "decontaminate_train_shingles", "ivf_recall_report",
        "streaming_interval_union_coverage", "streaming_self_excitation",
        "association_rules_parts", "graph_assortativity",
        "histogram_price_deciles", "streaming_value_quantiles",
        "dedup_survivors", "join_cardinality_audit",
        "streaming_sink_exactly_once_roundtrip", "dedup_minhash_lsh",
        "sketch_user_activity", "cms_token_counts",
        "dsir_importance_weights", "quality_logreg_training",
        "supplier_pareto_frontier", "contrastive_triplets",
        "streaming_fertility_drift", "events_haar_wavelet_energy",
        "semantic_dedup_semdedup", "streaming_sprt_monitor",
        "events_hourly_type_entropy", "streaming_power_mde_monitor",
        "customer_segment_entropy_by_nation", "cogroup_asof_pandas",
        "streaming_bounce_rate", "streaming_ohlc_bars",
        "streaming_wav_zcr_monitor", "corpus_shingle_novelty",
        "maxmin_fair_allocation", "streaming_runs_monitor",
        "streaming_topk_types_hourly", "text_entropy_rate_bigram",
        "streaming_session_rollup", "supplier_leadtime_percentiles",
        "spearman_len_vs_ttr", "streaming_stateful_type_counts",
        "streaming_update_mode_rollup", "bigram_lm_score",
        "bradley_terry_strengths", "fk_inclusion_profile",
        "part_name_brand_mi", "streaming_feature_hashing_monitor",
        "udtf_dynamic_ngrams", "events_runs_test",
        "dedup_span_mask_manifest", "blocklist_phrase_filter",
        "embedding_silhouette_centroid", "streaming_hill_tail_monitor",
        "text_tfidf_top_terms", "ivf_nprobe_sweep",
        "streaming_brier_monitor", "checkpoint_sources_table",
        "events_hourly_autocorr", "streaming_frontier_bloom",
        "lineitem_qty_price_heatmap", "streaming_brand_mi_drift",
        "streaming_lsh_candidate_buckets", "streaming_mann_kendall_monitor",
        "streaming_stateful_totals", "text_rolling_fingerprint",
        "events_markov_stationary", "streaming_late_data_drop",
        "embedding_power_iteration", "recursive_month_spine",
        "zonemap_skip_simulation", "hll_intersection_estimate",
        "ivf_incremental_assign", "streaming_did_monitor",
        "corpus_filter_funnel", "dedup_simhash", "dedup_containment",
        "kmv_set_ops_event_types", "streaming_type_entropy_drift",
        "streaming_cuped_monitor", "dedup_ngram_jaccard",
        "graph_label_propagation", "streaming_chained_windows",
        "events_permutation_test", "minhash_jaccard_calibration",
        "graph_modularity_by_brand", "streaming_wav_haar_monitor",
        "hits_authority_hub", "bucketed_join_colocated",
        "dedup_pipeline_composition", "dedup_connected_components",
        "batch_replay_source_slice", "rfm_customer_segments",
        "naive_bayes_langid", "checkpoint_offsetlog_table",
        "perplexity_tertile_buckets", "minhash_bbit_calibration",
        "streaming_quality_monitor", "multimodal_wav_zcr_real",
        "tokenizer_unigram_compression", "streaming_replay_source_rollup",
        "dedup_keep_best_quality", "cluster_kmeans_embeddings",
        "text_kneser_ney_bigram_score", "custom_sink_audit_roundtrip",
        "recsys_item_cosine", "ann_method_agreement",
        "streaming_ivf_assign", "streaming_semdedup",
        "checkpoint_commitlog_audit", "graph_bfs_hops",
        "tokenizer_unigram_fertility", "ann_pipeline_composition",
        "streaming_unattributed_purchases",
        "streaming_purchase_attribution", "corpus_difficulty_curriculum",
        "dedup_band_sweep_calibration", "streaming_split_leakage_monitor",
        "streaming_unigram_fertility", "tokenizer_unigram_fit",
        "streaming_join_then_windowed_agg",
        "orders_mean_value_bootstrap_ci", "graph_pagerank_parts",
        "graph_kcore_peel", "streaming_bootstrap_ci",
        "hive_source_partition_pruned", "sql_scripting_showcase",
        "graph_triangle_stats", "streaming_permutation_monitor"
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
    # Stalest-first among the driver-verified tail (see the rotation
    # policy at _DRIVER_EARNED): slots the driver has left after the new
    # operators re-earn the OLDEST green rows, keeping cumulative
    # verification from aging.
    checked = {
        n: s
        for n, s in sorted(
            REGISTRY.items(),
            key=lambda kv: (_DRIVER_EARNED.get(kv[0], 10**9), kv[0]),
        )
        if n in _DRIVER_CHECKED and n not in recheck
    }
    return {**recheck, **unchecked, **checked}
