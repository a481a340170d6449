"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` maps
every implemented operator family (SURVEY.md §2 + training-data ops) to a
(spark, sf_dir) -> DataFrame callable; ``oracle_sql()`` provides the
DuckDB-equivalent SQL for the value-hash correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from c3dc_etl_spark.suite import REGISTRY

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return REGISTRY["q1_pricing_summary"].fn(spark, SF0001)


# Driver-gate priority: the correctness gate verifies queries in dict
# order (with a bounded ~50-query per-round window). Round-5 order per
# VERDICT r4 ask #1: the 36 round-4 session-3 queries (judge-verified
# but never driver-checked) lead, followed by any round-5 additions,
# then the oldest previously-green blocks (r2-dated engine/source rows
# first). Every REGISTRY entry is included exactly once (asserted in
# tests/test_registry.py).
PRIORITY = [
    # --- round-4 session 3: judge-verified, never driver-checked ---
    "q4_priority_semijoin",
    "q13_order_distribution",
    "q16_supplier_variety",
    "q18_large_orders",
    "q19_disjunctive_revenue",
    "q22_dormant_customers",
    "scd2_dimension_build",
    "heavy_hitters_cms",
    "zorder_block_skipping",
    "record_linkage_blocked",
    "dq_expectations_report",
    "rolling_time_stats",
    "funnel_conversion",
    "pagerank_purchase_graph",
    "scd2_incremental_merge",
    "cohort_retention",
    "timeseries_gap_fill",
    "quantile_sketch_error",
    "ab_test_stats",
    "streaming_upsert_snapshot",
    "skew_salt_balance",
    "event_debounce",
    "source_json_column_extract",
    "label_propagation_vote",
    "exact_median_selection",
    "q7_nation_volume",
    "q9_product_profit",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q17_small_quantity",
    "sketch_hll_distinct",
    "sketch_kmv_set_algebra",
    "scd2_point_in_time_join",
    "q2_best_balance_supplier",
    "agg_multi_distinct",
    "null_semantics_probe",
    # --- new in round 5: never driver-checked ---
    "q8_market_share",
    "q10_returned_items",
    "q11_important_stock",
    "q12_shipmode_priority",
    "q20_potential_promotion",
    "q21_suppliers_kept_waiting",
    "table_log_snapshot_read",
    "table_log_time_travel",
    "table_log_merge_upsert",
    "table_log_pruned_read",
    "triangle_count_coorder",
    "ann_pq_adc_recall",
    "ann_ivfpq_recall",
    "dedup_containment",
    "ann_filtered_topk",
    "regressor_train_gd",
    "regressor_eval_r2",
    "classifier_train_stump",
    "embedding_pca_covariance",
    "table_log_optimize_zorder",
    "table_log_delete_where",
    "sample_temperature_mixture",
    "event_transition_matrix",
    "link_prediction_common_neighbors",
    "table_log_change_feed",
    "table_log_zorder_pruned_read",
    "feature_winsorize_clip",
    "market_basket_rules",
    "classifier_train_tree2",
    "bootstrap_mean_ci",
    "mannwhitney_u_events",
    "chi2_independence",
    "ks_two_sample",
    "spearman_rank_corr",
    "benford_first_digit",
    "cusum_changepoint",
    "acf_daily_events",
    "seasonal_naive_backtest",
    "theilsen_trend",
    "anomaly_mad_daily",
    "interval_concurrency_sweep",
    "attribution_first_last_touch",
    "dedup_prefix_filter",
    "dedup_edit_distance",
    "view_incremental_maintenance",
    "search_inverted_index",
    "search_conjunctive",
    "search_bm25_topk",
    "search_phrase_positions",
    "search_proximity_window",
    "similarity_tfidf_pairs",
    "graph_bfs_hops",
    "skyline_pareto_parts",
    "rolling_distinct_users",
    "set_ops_bag_semantics",
    "text_pmi_collocations",
    "graph_sssp_bounded",
    # --- r2-green: oldest surviving driver rows ---
    "engine_lookup_macros",
    "engine_subrecord_explode",
    "engine_latest_survival",
    "engine_primary_follow_up",
    "source_jsondir_pivot",
    "source_jsondir_dupkeys",
    "source_manifest_join",
    "validate_column_checks",
    "merge_fingerprint_invariance",
    "sample_stratified_hash",
    "sample_weighted_mixture",
    "corpus_build_pipeline",
    "text_repetition_stats",
    "pii_redaction",
    "contamination_ngram_overlap",
    "sequence_packing",
    "domain_stats",
    "domain_length_quantiles",
    "asof_join_events",
    "sessionize_events",
    "streaming_dedup_digests",
    "dedup_embedding_cosine",
    "ann_ivf_topk",
    "embedding_norms",
    "multimodal_metadata",
    "multimodal_features",
    "multimodal_frame_sample",
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_region_volume",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "dedup_cluster_components",
    "dedup_incremental_lsh",
    "dedup_cluster_best",
    "ann_cosine_topk",
    "ann_lsh_bucketed",
    "text_language_id",
    "text_quality_features",
    # --- r3-green: code unchanged since the r3 driver check ---
    "engine_field_splice",
    "source_workbook_scan",
    "source_jsondir_fileorder",
    "study_end_to_end",
    "config_merge_transformations",
    "mapping_static_validation",
    "reference_file_hashes",
    "document_assembly",
    "streaming_session_windows",
    "merged_document_assembly",
    "embedding_quantize_int8",
    "streaming_stateful_running_stats",
    "workbook_sink_roundtrip",
    "schema_pv_checks",
    "reference_file_plan",
    "amended_mapping_sink",
    "range_join_events",
    "rollup_hypertable",
    "sketch_kmv_distinct",
    "dedup_boilerplate_spans",
    "sample_domain_cap",
    "doc_chunk_windows",
    "text_bpe_token_count",
    "text_top_tokens",
    "engine_participant_node",
    "rowmapped_rule_build",
    "sink_duplicate_report",
    "streaming_windowed_counts",
    "row_numbering_lineage",
    "theta_rule_join",
    "filter_project",
    "broadcast_lookup_join",
    "dupe_count_assertion",
    "anti_join_integrity",
    "semi_join_exists",
    "replace_chain",
    "default_coalesce",
    "horizontal_sum_null",
    "multivalue_normalize",
    "enum_case_normalize",
    "int_round_cast",
    "numeric_guard",
    "allowed_values_filter",
    "required_fields_filter",
    "constant_injection",
    "uuid_content_derived",
    "survival_latest_window",
    "followup_primary_window",
    "fingerprint_dedup_first_wins",
    "drop_duplicates_pairs",
    # --- r4-green: driver-checked in round 4, code unchanged since ---
    "kmeans_embedding_clusters",
    "semantic_dedup_clusters",
    "ngram_lm_score",
    "text_tfidf_keywords",
    "sample_split_leakage_safe",
    "profile_documents",
    "ann_ivf_kmeans_recall",
    "streaming_static_enrich",
    "source_orc_roundtrip",
    "join_bucketed_colocated",
    "minhash_estimation_error",
    "sink_partitioned_pruning",
    "source_schema_evolution",
    "bpe_train_merges",
    "bpe_tokenize_apply",
    "streaming_stream_stream_join",
    "rollup_merge_partials",
    "q6_forecast_revenue_sql",
    "source_corrupt_records",
    "window_functions_suite",
    "agg_grouping_cube",
    "sample_weighted_reservoir",
    "kmeans_cluster_purity",
    "corpus_drift_psi",
    "doc_chunk_content_defined",
    "storage_staged_scan",
    "ann_ivf_recall",
    "streaming_session_late_data",
    "multimodal_decode_real",
    "contamination_bloom_filter",
    "interval_overlap_events",
    "sample_token_budget",
    "text_vocab_coverage",
    "multimodal_video_frames",
    "sample_split_assign",
    "corpus_snapshot_delta",
    "except_reconciliation",
    "distinct_count_per_node",
    "explode_subrecords",
    "typegroup_fanout_union",
    "pivot_long_to_wide",
    "json_flatten",
    "link_wiring_collect",
    "unpivot_wide_to_long",
    "text_token_counts",
    "text_fingerprint",
    "engine_typegroup_fanout",
    "engine_sum_macros",
    "source_delimited_scan",
    "merge_first_wins_engine",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, emitted in
    verification-priority order (see PRIORITY)."""
    ordered = {name: REGISTRY[name].fn for name in PRIORITY if name in REGISTRY}
    for name, spec in REGISTRY.items():
        if name not in ordered:
            ordered[name] = spec.fn
    return ordered


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query; entries without SQL-expressible
    semantics (mapInPandas kernels) are omitted -> rows-only check."""
    names = list(queries())
    return {
        name: REGISTRY[name].oracle
        for name in names
        if REGISTRY[name].oracle is not None
    }
