"""Dump formatted physical plans for the headline queries to PLANS.md.

Run: python tools/explain_audit.py [sf_dir]

The audit makes the scale-critical plan properties inspectable without
running Spark: PushedFilters on scans, pruned ReadSchema, broadcast
joins, TakeOrderedAndProject top-Ns, single-shuffle aggregates.
"""

from __future__ import annotations

import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

HEADLINERS = [
    "q1_pricing_summary",
    "q5_local_supplier",
    "zone_analytics",
    "top_k",
    "latest_metrics",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "embedding_srp_lsh",
    "ann_ivf_topk",
    "asof_enrich",
    "range_pair_counts",
    "detections_explode",
    "camera_dwell_stats",
    "embedding_neardup",
    "tfidf_top_terms",
    "stratified_sample",
    "salted_zone_sensors",
    "props_unwrap_typed",
    "zone_sketch_stats",
    "q20_surplus_suppliers",
    "q2_min_cost_supplier",
    "ann_ivf_kmeans",
    "decontaminate_ngram",
    "source_token_rebalance",
    "dedup_containment",
    "pack_sequences",
    "bigram_logprob_score",
    "length_outlier_filter",
    # round-5 additions
    "q8_market_share",
    "q9_product_profit",
    "q15_top_supplier",
    "ohlc_bars",
    "interp_linear",
    "cusum_drift",
    "type_corr_matrix",
    "ewma_batch",
    "exact_substring_spans",
    "global_shuffle_shards",
    "embedding_pq_codes",
    "knn_graph",
    "ngram_novelty",
    "source_ngram_overlap",
    # round-5 session-3 additions
    "acf_lags",
    "robust_zscore",
    "seasonal_anomaly",
    "markov_surprisal",
    "priority_dedup",
    "char_entropy",
    "bm25_scores",
    "cohort_retention",
    "basket_affinity",
    "column_profile",
    "zorder_codes",
    "partition_skew_report",
    # round-5 session-4 additions
    "interarrival_stats",
    "downsample_maxdev",
    "dup_ngram_chars",
    "chunk_dedup_share",
    "compaction_plan",
    # round-6 additions (PLANS regenerated in r7 — VERDICT r6 item 4)
    "semantic_dedup",
    "scd2_dim",
    "bpe_merge_counts",
    "ccnet_perplexity_buckets",
    "tokenizer_fertility",
    "rolling_quantile",
    "holt_linear",
    "doc_outlier_mahalanobis",
    "window_funnel_strict",
    # round-7 additions
    "centroid_tracks",
    "gopher_repetition_full",
    "ann_ivfpq_topk",
    "cdc_apply",
    "state_as_of",
    "audio_features_wav",
    "value_quantiles",
    "bloom_prefilter_report",
    "audio_resample_stats",
    "nearest_station_rollup",
    "hard_negative_mining",
    "bpe_train_merges",
    "time_weighted_avg",
    "counter_rate",
    "cms_error_report",
    "dataset_split_assign",
    "embedding_sq8",
    "zorder_prune_report",
    "zone_hour_cube",
    "type_cooccurrence",
    "gorilla_compression_estimate",
    "lateness_audit",
    "stream_state_estimate",
    "layer_reconciliation",
    "burstiness",
    "zipf_fit",
    "dup_cluster_histogram",
    "week_over_week",
    "dq_expectations",
    "theil_sen_slope",
    "hampel_filter",
    "ann_recall_report",
    "pagerank_types",
    "hll_distinct_report",
    "downsample_lttb",
    "track_lifetimes",
    "token_gini_by_source",
    "source_divergence_chi2",
    # round-7 session-3 additions
    "triangle_count",
    "benford_digit_test",
    "walsh_energy",
    "forecast_backtest",
    "k_anonymity_audit",
    "changepoint_detect",
    "hilbert_codes",
    "hilbert_prune_report",
    "embedding_pca_power",
    "cdc_chunk_dedup",
    "rollup_cascade",
    "code_detect",
    "od_matrix",
    "pareto_front",
    "rfm_segments",
    # round-7 session-4 additions
    "stl_decompose_lite",
    "ols_trend",
    "soft_dedup_weights",
    "snapshot_diff",
    "rake_keywords",
    "dbscan_grid",
    "km_survival",
    "zone_hod_mi",
    "ann_graph_search",
    "link_prediction_cn",
    "corpus_datasheet",
    "density_heatmap",
    "quantile_normalize",
    "cluster_label_nmi",
    "attribution_last_touch",
    "holt_winters_forecast",
    "kcenter_sample",
    "ivm_merge_view",
    "colocated_bias_pairs",
    "funnel_conversion_report",
    "zone_xcorr_lags",
    "audio_silence_segments",
    "minhash_estimate_audit",
    "dedup_cluster_modularity",
    "text_embedding_agreement",
    "ks_length_drift",
    "psi_drift_report",
    "dsir_importance_weights",
    "frames_ahash_dedup",
    "audio_walsh_bands",
    "kcore_decompose",
    "embedding_bq_hamming",
    "sax_symbols",
    "positional_delete_apply",
    "scene_cut_detect",
    "mrl_truncation_qc",
    "pmi_collocations",
    "hbos_outlier_scores",
    "stupid_backoff_score",
    "hll_merge_audit",
    "naive_bayes_langid",
    "ab_test_report",
    "decision_stump_train",
    "winnowing_fingerprints",
    "retrieval_metrics_report",
    "encoding_plan_report",
    "markov_attribution",
    "conformal_anomaly_rate",
    "heaps_law_fit",
    "graph_bfs_levels",
    "asof_nearest_enrich",
    "label_propagation_communities",
    "l_diversity_audit",
    "pit_training_join",
    "cep_pattern_counts",
    "dtw_zone_profiles",
    "asap_smoothing",
    "matrix_profile_lite",
    "watermark_detect",
    "pinball_forecast_eval",
    "rate_limit_audit",
    "isotonic_trend_fit",
    "wasserstein_drift",
    "idw_interpolation",
    "knn_classifier_eval",
    "rrf_hybrid_fusion",
    "segmented_trend_fit",
    "lof_outliers",
    "ppmi_svd_embeddings",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from smart_city_data_pipeline_spark.session import get_spark

    import __spark_entry__ as e

    spark = get_spark("explain-audit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()
    out = ["# Physical plans (explain formatted) — audit artifact\n"]
    out.append(f"Generated by tools/explain_audit.py at {sf_dir}.\n")
    for name in HEADLINERS:
        df = qs[name](spark, sf_dir)
        plan = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        out.append(f"\n## {name}\n\n```\n{plan}\n```\n")
    dest = os.path.join(REPO_ROOT, "PLANS.md")
    with open(dest, "w") as f:
        f.write("".join(out))
    print(f"wrote {dest} ({len(HEADLINERS)} plans)")
    spark.stop()


if __name__ == "__main__":
    main()
