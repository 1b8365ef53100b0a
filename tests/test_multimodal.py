"""Multimodal plumbing tests (SURVEY.md §2F): binary payload column, Arrow
batch decode via mapInPandas, metadata-only frame sampling."""

from __future__ import annotations

from smart_city_data_pipeline_spark.operators.multimodal import (
    camera_rollup,
    extract_features,
    frames_features,
    sample_frames,
    synth_frames,
)


def test_frames_schema(spark, sf_dir):
    frames = synth_frames(spark, sf_dir)
    kinds = {f.name: f.dataType.simpleString() for f in frames.schema.fields}
    assert kinds["payload"] == "binary"
    assert kinds["meta"].startswith("struct<width:int,height:int,format:string,frame_no:int")


def test_sampling_is_metadata_only(spark, sf_dir):
    frames = synth_frames(spark, sf_dir)
    sampled = sample_frames(frames, every_k=3)
    n_all = frames.count()
    n_s = sampled.count()
    assert 0 < n_s < n_all


def test_feature_extraction_deterministic(spark, sf_dir):
    frames = synth_frames(spark, sf_dir).limit(50)
    feats = extract_features(frames)
    rows = {r["frame_id"]: r for r in feats.collect()}
    assert len(rows) == 50
    r0 = rows[min(rows)]
    assert r0["n_bytes"] > 0
    assert sum(r0["histo_head"]) == r0["n_bytes"]  # histogram covers every byte
    assert 0 < r0["mean_intensity"] < 256
    # Deterministic across runs.
    again = {r["frame_id"]: r for r in extract_features(frames).collect()}
    assert again[min(rows)]["mean_intensity"] == r0["mean_intensity"]


def test_camera_rollup_and_query_entry(spark, sf_dir):
    out = frames_features(spark, sf_dir)
    assert out.columns == ["camera_id", "n_frames", "avg_intensity", "total_bytes"]
    rows = out.collect()
    assert len(rows) > 0
    assert all(r["n_frames"] > 0 for r in rows)
