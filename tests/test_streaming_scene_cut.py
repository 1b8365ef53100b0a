"""Streaming scene-cut ≡ batch scene_cut_detect: the decoded-frame
feature stream, sliced into interleaved out-of-order micro-batches,
must converge to the batch per-camera census row for row."""

from __future__ import annotations

from datetime import datetime, timedelta

from smart_city_data_pipeline_spark.operators.multimodal import (
    FRAME_SAMPLE_K,
    extract_features,
    sample_frames,
    scene_cut_detect,
    synth_bmp_frames,
)
from smart_city_data_pipeline_spark.streaming.scene_cut import (
    scene_cut_stream,
)

FEAT_SCHEMA = (
    "camera_id long, frame_id long, ts timestamp, "
    "sum_intensity long, n_px long"
)

T0 = datetime(2026, 1, 1)
FLUSH_CAM = 999_999


def _corpus_feats(spark, sf_dir):
    feats = extract_features(
        sample_frames(synth_bmp_frames(spark, sf_dir), every_k=FRAME_SAMPLE_K)
    ).select("camera_id", "frame_id", "sum_intensity", "n_px")
    return [
        (
            int(r["camera_id"]),
            int(r["frame_id"]),
            T0 + timedelta(seconds=int(r["frame_id"])),
            int(r["sum_intensity"]),
            int(r["n_px"]),
        )
        for r in feats.collect()
    ]


def _drive(spark, tmp_path, waves, name):
    fdir = str(tmp_path / "feats")

    def drop(rows):
        spark.createDataFrame(rows, FEAT_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(fdir)

    drop(waves[0])
    stream = spark.readStream.schema(FEAT_SCHEMA).parquet(fdir)
    q = (
        scene_cut_stream(stream)
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        for wave in waves[1:]:
            drop(wave)
            q.processAllAvailable()
        for i in range(2):
            drop(
                [
                    (
                        FLUSH_CAM,
                        10_000_000 + i,
                        datetime(2026, 6, 1 + i),
                        0,
                        1,
                    )
                ]
            )
            q.processAllAvailable()
        # update mode: the LAST emitted row per camera is its state
        rows = spark.sql(
            f"SELECT * FROM {name}"
        ).collect()
        last = {}
        for r in rows:
            last[r["camera_id"]] = r
        last.pop(FLUSH_CAM, None)
        return last
    finally:
        q.stop()


def test_streamed_scene_cut_equals_batch(spark, sf_dir, tmp_path):
    """Corpus features in 3 interleaved waves (frame_id % 3 — each
    camera's frames arrive out of order across batches): final
    per-camera rows equal the batch census exactly."""
    feats = _corpus_feats(spark, sf_dir)
    waves = [
        [f for f in feats if f[1] % 3 == k] for k in range(3)
    ]
    got = _drive(spark, tmp_path, waves, "scq1")
    batch = {
        r["camera_id"]: r for r in scene_cut_detect(spark, sf_dir).collect()
    }
    assert set(got) == set(batch)
    for cam, b in batch.items():
        s = got[cam]
        for col in (
            "n_frames", "n_cuts", "max_jump", "first_cut_frame", "cut_rate"
        ):
            assert s[col] == b[col], (cam, col, s[col], b[col])


def test_streamed_scene_cut_handles_late_predecessor(spark, tmp_path):
    """A frame's true predecessor arriving one wave LATE must still be
    differenced in frame order: frames 0,2 arrive first, frame 1 (a
    huge spike) arrives later but before the watermark passes — the
    spike produces cuts on BOTH sides of it."""
    px = 100
    mk = lambda fid, s: (7, fid, T0 + timedelta(seconds=fid), s, px)  # noqa: E731
    waves = [
        [mk(0, 1000), mk(2, 1000)],
        [mk(1, 50_000)],  # late middle spike
    ]
    got = _drive(spark, tmp_path, waves, "scq2")
    r = got[7]
    assert r["n_frames"] == 3
    assert r["n_cuts"] == 2
    assert r["first_cut_frame"] == 1
    assert r["max_jump"] == 49_000


def test_frame_order_contract_violation_fails_loudly(spark, tmp_path):
    """A source violating the contract (event time monotone in frame_id
    per camera) must FAIL the query, not silently fold a regressed
    frame_id against the carried boundary: frame 10 is finalized first,
    then frame 5 arrives with a LATER event time."""
    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    px = 100
    waves = [
        # frame 10 early in event time -> finalized by the first flush
        [(7, 10, T0, 1000, px)],
        # frame 5 carries a LATER event time (contract violation); it
        # finalizes after the boundary has advanced to frame 10
        [(7, 5, T0 + timedelta(days=30), 2000, px)],
    ]
    with pytest.raises(StreamingQueryException, match="not.*monotone"):
        _drive(spark, tmp_path, waves, "scq_viol")
