"""Edge-robustness: every query family must handle EMPTY input tables
without exceptions — the partition-of-a-100 TB-corpus that happens to
contain zero matching rows is a normal event, and operators that
collect/assume non-empty driver state break there first.

The fixture copies each table's schema (zero rows) into a temp sf_dir;
queries must return cleanly (0 rows for per-row ops; a well-defined
aggregate row for global aggregates).
"""

import os

import pytest

SF_SRC = "/root/testdata/sf0.001"

# Queries with driver-side iterative state (IVF init collects centroids)
# legitimately need a non-empty training corpus; everything else must
# cope with empty input.
EMPTY_OK_ZERO_ROWS = [
    "flagship_filter",
    "q1_pricing_summary",
    "topk_orders",
    "join_broadcast_dims",
    "window_rank_orders",
    "events_hourly",
    "sessionize_users",
    "token_count_docs",
    "repetition_signals",
    "pack_sequences",
    "tfidf_top_terms",
    "dedup_exact",
    "minhash_lsh_pairs",
    "cosine_topk",
    "lsh_ann_topk",
    "multimodal_meta",
    "video_frame_sample",
    "train_split_assign",
    "stratified_sample_docs",
    "rollup_cascade_events",
    "chunk_dedup_docs",
    "lang_mixture_rebalance",
    "winsorize_events",
    "salted_join_skewed",
    "training_manifest",
    "cohort_retention",
    "event_transition_matrix",
    "lang_confusion_matrix",
    "edit_distance_near_dup",
    "lang_rebalance_sample",
    "token_budget_waterfill",
    "time_decayed_user_score",
    "gdpr_erasure_audit",
    "retrieval_eval_metrics",
    "source_vocab_overlap",
    "neardup_flow_matrix",
    "semantic_decontamination",
    "domain_mixture_weights",
    "bpe_tokenize_fertility",
    "cogroup_purchase_context",
    "rfm_features",
    "snapshot_diff",
    "mad_anomaly_events",
    "cap_per_source",
    "daily_revenue_change",
    "bigram_logprob_docs",
    "embedding_inertia",
    "trigram_cosine_pairs",
    "interval_overlap_join",
    "time_decayed_user_value",
    "inter_arrival_stats",
    "heavy_hitters_tokens",
    "label_centroids",
    "spend_percentile_ranks",
    "region_nation_list",
    "corpus_curation_pipeline",
    "reservoir_sample_per_key",
    "corr_matrix_lineitem",
    "chisq_priority_status",
    "event_path_topk",
    "tdigest_quantiles_events",
    "cooccurrence_pairs",
    "incremental_mv_refresh",
    "zorder_curve_orders",
    "tdigest_by_event_type",
    "lateral_topn_per_status",
    "table_checksum_orders",
    "events_hourly_unique_users",
    "first_touch_attribution",
    "ohlc_hourly_value",
    "activity_streaks",
    "hard_negative_mining",
    "source_mixture_weights",
    "tokenizer_fertility_by_lang",
    "int8_quantized_topk",
    "hourly_value_bands",
    "pareto_customers",
    "referential_integrity_audit",
    "error_proximity_counts",
    "weighted_median_doc_length",
    "user_event_entropy",
    "hour_of_day_profile",
    "time_to_purchase_latency",
    "gini_revenue_customers",
    "skyline_parts",
    "brand_price_means",
    "token_entropy_by_lang",
    "order_revenue_reconciliation",
    "rolling_weekly_active_users",
    "user_feature_store",
    "prefix_filter_jaccard_pairs",
    "bloom_filter_join",
    "weighted_reservoir_docs",
    "cuped_adjusted_lift",
    "k_anonymity_audit",
    "interpolate_linear_events",
    "range_partition_planner",
    "cusum_changepoints",
    "inverted_index_topdf",
    "ses_forecast_revenue",
    "matryoshka_overlap",
    "triangle_count_copurchase",
    "item_item_recs",
    "adamic_adar_links",
    "psi_price_drift",
    "ks_statistic_values",
    "geo_mean_value_udaf",
    "dedup_rate_by_source",
    "cross_lang_dup_pairs",
    "benford_digit_audit",
    "theil_sen_trend",
    "cohort_ltv_curve",
    "bm25_search",
    "phash_near_dup_images",
    "pagerank_copurchase",
    "kaplan_meier_repurchase",
    "attribution_models_compare",
    "entity_resolution_pipeline",
    "scd2_point_in_time_join",
    "connected_components_stars",
    "bounce_rate_daily",
    "holt_linear_forecast",
    "rolling_corr_revenue_dau",
    "event_trigram_paths",
    "association_rules_brands",
    "acf_daily_revenue",
    "target_encoding_segment",
    "gdpr_delete_propagation",
    "calibration_bins_orders",
    "asof_forward_tolerance",
    "sequential_pair_mining",
    "bitmap_distinct_users",
    "quantile_align_sources",
    "embedding_dim_stats",
    "ts_features_daily",
    "seasonal_decompose_daily",
    "neyman_allocation",
    "bpe_merge_step",
    "lateness_audit_events",
    "l_diversity_audit",
    "curriculum_stages",
    "conversion_rate_bayes",
    "bfs_hops_copurchase",
    "audience_overlap_jaccard",
    "max_drawdown_daily",
    "haversine_nearest_supplier",
    "bootstrap_ci_revenue",
    "twap_daily_value",
    "sla_attainment_report",
    "degree_distribution_copurchase",
    "sentence_stats_by_lang",
    "collocations_pmi",
    "span_corruption_plan",
    "negative_sampling_weights",
    "rbo_rank_compare",
    "epoch_shuffle_plan",
    "ngram_novelty_curve",
    "fd_histogram_prices",
    "price_volume_decomposition",
    "golden_record_docs",
    "langid_confusion_metrics",
    "spearman_rank_corr",
    "mutual_information_lang_source",
    "zipf_fit_tokens",
    "vocab_coverage_curve",
    "length_bucket_padding",
    "duplicated_span_islands",
    "dp_noisy_counts",
    "mmr_diverse_topk",
    "conformal_prediction_interval",
    "group_kfold_assign",
    "preference_pairs_by_quality",
    "grid_spatial_join",
    "t_closeness_audit",
    "colbert_maxsim_labels",
    # round-5 operators
    "dsir_importance_weights",
    "incremental_neardup_lsh",
    "neardup_survivors_quality",
    "striped_shard_plan",
    "multimodal_token_bill",
    "loss_mask_plan",
    "perplexity_band_filter",
    "gate_ablation_report",
    "split_embedding_drift",
    "dro_mixture_step",
    "semdedup_pipeline",
    "event_runs_udtf",
    "pii_pseudonymize_join",
    "context_budget_curve",
    "neardup_cluster_sizes",
    # round-7 operators (streaming drains excluded as elsewhere — their
    # loud zero-input guards fire by design on an empty fixture)
    "manifest_roundtrip_stats",
    "grouped_median_chars",
    "transpose_returnflag_stats",
    "auc_stopword_density",
    "ngram_novelty_by_source",
    "customer_order_gaps_arrow",
    "triangle_count_copurchase",
    "scd2_customer_priority",
    "psi_split_drift",
    "sql_udf_revenue_tiers",
    "bucketed_colocated_join",
    # round-8 operators (streaming drains excluded as elsewhere)
    "countmin_heavy_hitters",
    "containment_dup_pairs",
    "kmeans_integer_lloyd",
    "corrupt_record_audit",
    "throttled_event_chain",
    "xml_props_roundtrip",
    "collated_source_rollup",
    "dpp_monthly_revenue",
    "winnowing_fingerprints",
    # round-9 operators (state_store_user_totals included: an empty
    # fixture still commits its drain batch, so the state read returns
    # cleanly with zero keys)
    "state_store_user_totals",
    "pipe_syntax_supplier_rollup",
    "parameterized_sql_brand_stats",
    "listagg_segments_by_nation",
    "state_evolution_snapshots",
    "dynamic_gap_sessions",
    "polymorphic_split_udtf",
    # round-10 operators: the join-state drain of an empty fixture still
    # commits its (zero-row) data batch, so the batch-0 state read
    # returns cleanly with zero buffered rows on both sides
    "join_state_buffered_sides",
    # NULLIF-guarded loop seed: zero orders -> NULL threshold, 0 rebinds,
    # one all-empty summary row on both engines
    "sql_script_trimmed_threshold",
    "execute_immediate_brand_topn",
    # commit-guarded metadata reads; identifier/percentile rollups of an
    # empty table are plain zero-row aggs
    "state_metadata_overview",
    "identifier_clause_rollup",
    "group_by_all_percentiles",
    # empty layout table -> one all-zero/-1 summary row on both engines
    "zorder_box_pruning",
    # commit-guarded change feed of two zero-row batches -> zero changes
    "state_change_feed_user_totals",
    # zero docs -> zero redaction rollup rows
    "pii_redaction_counts",
    # two empty generations -> zero rollup rows
    "merge_schema_evolution_read",
    # generated planning grid: input-free, 228 rows at any SF
    "lsh_parameter_planner",
    # empty hilbert layout -> one all-zero/-1 summary row
    "hilbert_box_pruning",
    # zero orders -> zero audit rows
    "ansi_try_arithmetic_audit",
    # round-11 operators: guarded empty-lexical-seed fusion; zero-row
    # aggs over empty feeds; empty quantized layout summary row
    "rrf_hybrid_retrieval",
    "url_canonical_dedup",
    "quantized_box_pruning",
    "tablesample_priority_profile",
    # commit-guarded: zero-row drains still commit, reads return typed
    # empty / zero-row frames
    "join_state_change_feed",
    "incremental_ingest_totals",
]


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    from mini_pandas_spark.sources import load_table

    out = tmp_path_factory.mktemp("sf_empty")
    for name in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        df = load_table(spark, SF_SRC, name)
        df.limit(0).write.mode("overwrite").parquet(str(out / f"{name}.parquet"))
    return str(out)


def test_queries_survive_empty_tables(spark, empty_sf_dir):
    from mini_pandas_spark.queries import queries

    qs = queries()
    for name in EMPTY_OK_ZERO_ROWS:
        rows = qs[name](spark, empty_sf_dir).collect()
        assert isinstance(rows, list), name
        assert all(r is not None for r in rows), name


def test_funnel_empty_is_zero_row_or_zero_counts(spark, empty_sf_dir):
    from mini_pandas_spark.queries import queries

    rows = queries()["funnel_conversion"](spark, empty_sf_dir).collect()
    if rows:  # a global agg over empty input may emit one all-zero row
        assert rows[0]["n_users"] == 0
