"""Streaming centroid tracker ≡ batch twin (keyed state per camera).

Feeds the synthesized trajectory lake in TWO frame-aligned waves and
asserts the final emitted track table per camera equals the batch
``centroid_tracks`` fold over the full input — identity carried across
micro-batch boundaries in Spark keyed state.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from smart_city_data_pipeline_spark.catalog import table
from smart_city_data_pipeline_spark.operators.vision import (
    tracker_detections,
)
from smart_city_data_pipeline_spark.streaming.tracker import (
    streaming_centroid_tracks,
)

DET_SCHEMA = "camera_id long, f int, s int, cx int, cy int"


def test_streaming_tracker_equals_batch_fold(spark, sf_dir, tmp_path):
    dets = tracker_detections(table(spark, sf_dir, "events"))
    # keep it fast: 3 cameras
    cams = [r["camera_id"] for r in dets.select("camera_id").distinct().limit(3).collect()]
    dets = dets.filter(F.col("camera_id").isin(cams)).cache()
    mid = dets.agg(F.expr("percentile_approx(f, 0.5)")).collect()[0][0]

    src = str(tmp_path / "dets")
    # wave 1: frames <= mid; wave 2: the rest (frame-aligned split)
    dets.filter(F.col("f") <= mid).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(DET_SCHEMA).parquet(src)
    q = (
        streaming_centroid_tracks(stream)
        .writeStream.format("memory")
        .queryName("stream_tracks")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        dets.filter(F.col("f") > mid).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        rows = spark.table("stream_tracks").collect()
    finally:
        q.stop()

    # memory sink in update mode appends each batch's emission; the
    # LAST emission per (camera, track) is the final state
    final = {}
    for i, r in enumerate(rows):
        final[(r["camera_id"], r["track_id"])] = (i, tuple(r))
    got = sorted(v for _, v in final.values())

    # batch twin over the same filtered input, via the python fold
    from smart_city_data_pipeline_spark.operators.vision import tracker_update

    bycam = {}
    for r in sorted(dets.collect(), key=lambda r: (r["camera_id"], r["f"], r["s"])):
        bycam.setdefault(r["camera_id"], {}).setdefault(r["f"], []).append(
            (r["cx"], r["cy"])
        )
    expected = []
    for cam in bycam:
        tracks, nid = [], 0
        for f in sorted(bycam[cam]):
            nid = tracker_update(
                tracks, nid, f,
                [(c, x, y) for c, (x, y) in enumerate(bycam[cam][f])],
            )
        expected += [
            (cam, t["tid"], t["first_f"], t["last_f"], t["n_match"],
             bool(t["expired"]), t["cx"], t["cy"])
            for t in tracks
        ]
    assert got == sorted(expected)
    dets.unpersist()
