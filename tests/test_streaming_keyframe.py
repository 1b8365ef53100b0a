"""Streaming keyframe pick ≡ batch keyframe_select: the max-of-struct
state is a commutative monoid, so ANY interleaving of the corpus's
decoded features must converge to the batch rows exactly."""

from __future__ import annotations

from smart_city_data_pipeline_spark.operators.multimodal import (
    FRAME_SAMPLE_K,
    _laplacian_feats,
    keyframe_select,
    sample_frames,
    synth_bmp_frames,
)
from smart_city_data_pipeline_spark.streaming.keyframe import keyframe_stream

FEAT_SCHEMA = "camera_id long, frame_id long, abs_lap long"


def test_streamed_keyframe_equals_batch(spark, sf_dir, tmp_path):
    feats = [
        (int(r["camera_id"]), int(r["frame_id"]), int(r["abs_lap"]))
        for r in _laplacian_feats(spark, sf_dir).collect()
    ]
    # adversarial interleaving: wave k gets frame_id % 3 == k, so every
    # window's winner can arrive before, between, or after its rivals
    waves = [[f for f in feats if f[1] % 3 == k] for k in range(3)]
    src = str(tmp_path / "src")

    def drop(rows):
        spark.createDataFrame(rows, FEAT_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    drop(waves[0])
    stream = spark.readStream.schema(FEAT_SCHEMA).parquet(src)
    q = (
        keyframe_stream(stream)
        .writeStream.format("memory")
        .queryName("kfq")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        for w in waves[1:]:
            drop(w)
            q.processAllAvailable()
        last = {}
        for r in spark.table("kfq").collect():
            last[(r["camera_id"], r["win_id"])] = (
                r["n_frames"], r["keyframe_id"], r["keyframe_lap"]
            )
    finally:
        q.stop()
    batch = {
        (r["camera_id"], r["win_id"]): (
            r["n_frames"], r["keyframe_id"], r["keyframe_lap"]
        )
        for r in keyframe_select(spark, sf_dir).collect()
    }
    assert last == batch
    assert batch  # corpus produces windows


def test_tie_resolution_survives_split_delivery(spark, tmp_path):
    """A tie delivered across DIFFERENT micro-batches (later-id frame
    first) must still resolve to the earliest frame."""
    src = str(tmp_path / "src")

    def drop(rows):
        spark.createDataFrame(rows, FEAT_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    drop([(1, 40, 900)])  # the later frame of the tie arrives first
    stream = spark.readStream.schema(FEAT_SCHEMA).parquet(src)
    q = (
        keyframe_stream(stream)
        .writeStream.format("memory")
        .queryName("kfq2")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        drop([(1, 5, 900), (1, 70, 100)])
        q.processAllAvailable()
        rows = {r["win_id"]: r for r in spark.table("kfq2").collect()}
    finally:
        q.stop()
    r = rows[0]
    assert (r["n_frames"], r["keyframe_id"], r["keyframe_lap"]) == (3, 5, 900)
