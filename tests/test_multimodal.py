"""Multimodal plumbing tests (SURVEY.md §2F): binary payload column, Arrow
batch decode via mapInPandas, metadata-only frame sampling."""

from __future__ import annotations

from smart_city_data_pipeline_spark.operators.multimodal import (
    camera_rollup,
    crop_payload,
    extract_features,
    frames_features,
    resize_frames,
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


def test_crop_payload_is_jvm_side(spark, sf_dir):
    frames = synth_frames(spark, sf_dir).limit(20)
    cropped = crop_payload(frames, 16)
    rows = cropped.collect()
    assert all(len(bytes(r["payload"])) <= 16 for r in rows)
    # No Python boundary: the plan must not contain a MapInPandas node.
    assert "MapInPandas" not in cropped._jdf.queryExecution().executedPlan().toString()


def test_resize_frames_contract(spark, sf_dir):
    frames = synth_frames(spark, sf_dir).limit(20)
    resized = resize_frames(frames, 8, 4)
    rows = resized.collect()
    assert resized.schema["payload"].dataType.simpleString() == "binary"
    for r in rows:
        assert r["meta"]["width"] == 8 and r["meta"]["height"] == 4
        assert len(bytes(r["payload"])) <= 8 * 4
    # Deterministic stub.
    again = resize_frames(frames, 8, 4).collect()
    assert sorted(bytes(r["payload"]) for r in rows) == sorted(bytes(r["payload"]) for r in again)


def test_camera_rollup_and_query_entry(spark, sf_dir):
    out = frames_features(spark, sf_dir)
    assert out.columns == ["camera_id", "n_frames", "avg_intensity", "total_bytes"]
    rows = out.collect()
    assert len(rows) > 0
    assert all(r["n_frames"] > 0 for r in rows)
