"""Operator registry.

Each operator module exposes ``QUERIES: dict[str, fn(spark, sf_dir) ->
DataFrame]`` and ``ORACLES: dict[str, str]`` (DuckDB SQL producing the
same named columns). ``all_queries()`` / ``all_oracles()`` merge them
for the driver contract in ``__spark_entry__.py``.

The driver's correctness gate checks the FIRST 50 entries in iteration
order, so the merge is explicitly ordered: entries that are new or
changed this round, or that sat past the cap in earlier rounds, come
first; entries that have already been driver-green in two consecutive
rounds (plus the rows-only ``frames_features``, which can never
hash-match) are deferred to the tail. The full set — including the
tail — is run locally each round via ``tools/check_correctness.py``
and recorded in the round notes.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Round-8 rotation (VERDICT r7 item 4): the 79 keys that had never
# appeared in any driver gate window (judge-sweep-verified only) are
# rotated in over rounds 8-9 — 50 here, the remaining 28 lead round 9:
# ab_test_report, asof_nearest_enrich, attribution_last_touch,
# colocated_bias_pairs, decision_stump_train, density_heatmap,
# funnel_conversion_report, hbos_outlier_scores, hll_merge_audit,
# l_diversity_audit, ols_trend, pareto_front, psi_drift_report,
# quantile_normalize, rollup_cascade, wasserstein_drift, zone_hod_mi,
# zone_xcorr_lags, cluster_label_nmi, code_detect, corpus_datasheet,
# dsir_importance_weights, embedding_abtt_qc, embedding_bq_hamming,
# link_prediction_cn, pmi_collocations, rake_keywords,
# retrieval_metrics_report — plus the 11 displaced by the round-8
# additions: positional_delete_apply, hilbert_prune_report,
# audio_silence_segments, audio_walsh_bands, frames_ahash_dedup,
# scene_cut_detect, ivm_merge_view, soft_dedup_weights,
# minhash_estimate_audit, text_embedding_agreement,
# mrl_truncation_qc — and the 6 displaced by the late-round-8 wave:
# sax_symbols, od_matrix, snapshot_diff, pinball_forecast_eval,
# idw_interpolation, segmented_trend_fit, matrix_profile_lite,
# asap_smoothing.
# Window order: behavior-changed-this-round first (they must re-earn
# driver-green), then the keys VERDICT named as likeliest to diverge
# under the driver harness (driver-loop / mapInPandas shapes), then
# the remaining iterative/codec-shaped never-gated keys.
_GATE_FIRST = [
    # new in round 8 (never driver-checked; newest first)
    "local_morans_hotspots",  # LISA quadrant map
    "seasonal_strength_report",  # Wang-Hyndman forecastability
    "eps_elbow_report",  # k-distance elbow
    "granger_causality_lite",  # conditional lead-lag test
    "hill_tail_index",  # heavy-tail detector
    "dedup_threshold_sweep",  # Jaccard sensitivity curve
    "retention_cost_curve",  # retention what-if curve
    "iqr_outlier_fences",  # Tukey boxplot fences
    "city_snapshot",  # multi-source serving view + freshness
    "kneser_ney_score",  # interpolated KN bigram LM scoring
    "rouge2_candidate_report",  # clipped-bigram candidate audit
    "periodogram_power",  # daily/weekly DFT amplitude
    "weco_rule_violations",  # Western Electric zone rules
    "kalman_level_filter",  # integer-grid Kalman replay
    "graph_degree_assortativity",  # near-dup graph structure probe
    "bpe_encode_fertility",  # encode with the trained merges
    "t_closeness_audit",  # privacy trio completion
    "morans_i_grid",  # spatial autocorrelation
    "frames_equalize_stats",  # histogram equalization codec loop
    # behavior changed in round 8 (scale-killer rewrites + ADVICE fixes)
    "conformal_anomaly_rate",  # score-grid histogram rank pick
    "rrf_hybrid_fusion",  # per-leg top-1000 rank-depth caps
    "heaps_law_fit",  # two-level prefix sum
    "rfm_segments",  # bucket-rank ntile arithmetic, no global sort
    "ks_length_drift",  # DECIMAL(38,0) cross-multiply
    "encoding_plan_report",  # integer shiftright //8
    "rate_limit_audit",  # shared rate_bucket_step recurrence
    # VERDICT-named: harness divergence likeliest (driver loops /
    # mapInPandas / session-6 additions never driver-checked)
    "dtw_zone_profiles",
    "ann_graph_search",
    "kcenter_sample",
    "embedding_pca_power",
    "ppmi_svd_embeddings",
    # remaining never-driver-gated keys (iterative / codec / join-heavy)
    "dbscan_grid",
    "kcore_decompose",
    "label_propagation_communities",
    "graph_bfs_levels",
    "dedup_cluster_modularity",
    "stl_decompose_lite",
    "holt_winters_forecast",
    "cdc_chunk_dedup",
    "winnowing_fingerprints",
    "knn_classifier_eval",
    "lof_outliers",
    "naive_bayes_langid",
    "stupid_backoff_score",
    "watermark_detect",
    "markov_attribution",
    "km_survival",
    "pit_training_join",
    "cep_pattern_counts",
    "isotonic_trend_fit",
]

# Entries that can never hash-match (no oracle_sql twin by documented
# design: cv2-gated binary decode) — parked at the very tail so they
# never occupy a checkable slot in the driver's window (VERDICT r4
# item 3). ann_ivf_kmeans left this list in r5: its k-means now trains
# on the 2^16 integer grid (engine-exact), so the quantizer is
# re-learned by the DuckDB oracle and the entry is fully hash-checked.
_GATE_LAST = [
    "frames_features",
]


def _modules():
    from smart_city_data_pipeline_spark.operators import (
        dedup,
        lakehouse,
        multimodal,
        quality,
        similarity,
        skew,
        stats,
        textops,
        timeseries,
        tpch,
        traffic,
        vision,
    )
    from smart_city_data_pipeline_spark.streaming import cont_agg

    return (
        traffic,
        timeseries,
        tpch,
        textops,
        dedup,
        similarity,
        multimodal,
        vision,
        skew,
        cont_agg,
        lakehouse,
        quality,
        stats,
    )


def _ordered(merged: dict) -> dict:
    first = [k for k in _GATE_FIRST if k in merged]
    last = [k for k in _GATE_LAST if k in merged]
    rest = [k for k in merged if k not in set(first) | set(last)]
    return {k: merged[k] for k in first + rest + last}


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _modules():
        out.update(mod.QUERIES)
    return _ordered(out)


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _modules():
        out.update(mod.ORACLES)
    # Follow queries() ordering exactly: each module may declare its
    # ORACLES in a different insertion order than its QUERIES, and the
    # driver walks both dicts positionally.
    return {k: out[k] for k in all_queries() if k in out}
