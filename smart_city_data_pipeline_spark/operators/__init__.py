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

# Round-10 rotation (VERDICT r9 item 1): after the r9 window, exactly
# 48 checkable keys had never appeared in any driver gate (the ledger
# VERDICT r9 recounted — 18 later-r9 operators + 30 session-2
# additions, all judge-sweep green at sf0.001 in the r9 independent
# sweep). ALL 48 lead this round's 50-slot window, in the ledger's
# order, followed by `dedup_minhash_lsh` (behavior-adjacent change in
# r10: the band self-join gained the hot-bucket guard — plan-identical
# on this corpus by pytest, but VERDICT r9 item 3 requires the
# hash-green gate row) and `ulm_train_vocab` (new r10 operator):
# 48 + 1 + 1 = 50. The round-11 queue is therefore the r10-session
# additions that did not fit this window — `keyframe_select`,
# `wordpiece_train_merges`, `ulm_encode_fertility`, `arch_lm_test`,
# `dup_span_coverage`, `camera_handoff_matrix`,
# `lm_interpolation_sweep`, `neyman_allocation_plan` (each oracle-green at
# sf0.001 AND sf0.01 this session, planted-pytest verified) — plus
# any further additions noted here as they land.
_GATE_FIRST = [
    # --- the 48 never-driver-gated keys (VERDICT r9 ledger, verbatim)
    "ljung_box_test",
    "mann_kendall_trend",
    "markov_entropy_rate",
    "did_zone_report",
    "perplexity_threshold_sweep",
    "vocab_size_curve",
    "funnel_dropoff_times",
    "xbar_r_chart",
    "winsorized_stats",
    "cluster_representative_pick",
    "source_cap_sweep",
    "dedup_overmerge_audit",
    "truncation_loss_sweep",
    "grouped_kfold_assign",
    "rbm_pairs",
    "ivf_shard_plan",
    "embedding_threshold_sweep",
    "first_exceedance_report",
    "getis_ord_hotspots",
    "spearman_zone_corr",
    "filter_agreement_matrix",
    "clustering_depth_report",
    "mwu_zone_shift",
    "knox_spacetime",
    "diurnal_harmonic_fit",
    "feature_hashing_audit",
    "runs_test_randomness",
    "cross_source_neardup_matrix",
    "join_strategy_report",
    "dedup_survivor_bias",
    "ingest_novelty_timeline",  # oracle re-expressed in r10 (MIN(doc_id))
    "gumbel_return_levels",
    "watermark_whatif_curve",
    "kruskal_zone_test",
    "video_mjpeg_index",
    "frames_features_gif",
    "theta_sketch_overlap",
    "bitmap_index_plan",
    "lsh_banding_planner",
    "session_timeout_sweep",
    "median_polish_grid",
    "embedding_clip_plan",
    "sequence_gap_audit",
    "audio_clip_detect",
    "pacf_lags",
    "arima_order_suggest",
    "sensor_stuck_report",
    "frames_laplacian_stats",  # feature extraction refactored in r10 (shared helper)
    # --- behavior-adjacent change in round 10 (must re-earn driver-green)
    "dedup_minhash_lsh",  # band self-join gained the hot-bucket guard
    # --- new in round 10
    "ulm_train_vocab",  # Unigram-LM tokenizer training (integer-grid EM)
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
