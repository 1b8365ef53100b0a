"""Streaming keyframe selection — the live twin of the batch
``keyframe_select`` pick (operators/multimodal.py).

The per-(camera, id-window) argmax-|Laplacian| state is a COMMUTATIVE
MONOID (max of (abs_lap, -frame_id) structs), so the twin needs no
custom stateful processor, no ordering machinery, and no arrival-order
assumptions at all: a plain update-mode streaming aggregation folds
every micro-batch into one struct per open window and the latest
emitted row per window equals the batch pick after any delivery
interleaving. Contrast ``scene_cut_stream``, whose frame differencing
NEEDS buffered finality — selection by per-frame score does not.

State: one (count, max-struct) row per (camera, window) seen —
windows correlate with event time, so a production deployment keys on
``window(ts, ...)`` alongside and lets the watermark evict closed
windows; the pick itself is unchanged. Redelivered frames fold
idempotently through the max but would double-count ``n_frames`` —
upstream exactly-once framing (streaming/dedup.py) owns that, same as
the other feature-stream twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from smart_city_data_pipeline_spark.operators.multimodal import KEYFRAME_WIN


def keyframe_stream(stream: DataFrame) -> DataFrame:
    """Per-(camera, KEYFRAME_WIN id window) running keyframe pick
    (update mode) from a decoded frame feature stream
    ``(camera_id, frame_id, abs_lap, ...)``; after all deliveries each
    window's row equals the batch ``keyframe_select`` row."""
    win = F.expr(f"frame_id DIV {KEYFRAME_WIN}").alias("win_id")
    best = F.max(
        F.struct(
            F.col("abs_lap").alias("lap"),
            (-F.col("frame_id")).alias("neg_fid"),
        )
    ).alias("b")
    return (
        stream.groupBy("camera_id", win)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_frames"), best)
        .select(
            "camera_id",
            "win_id",
            "n_frames",
            (-F.col("b.neg_fid")).cast("bigint").alias("keyframe_id"),
            F.col("b.lap").cast("bigint").alias("keyframe_lap"),
        )
    )
