"""Streaming centroid-association tracker — the reference's actual
shape: the Flink vision job keeps per-camera tracker state across
frames (``flink_vision_job_proper.py:37-128`` SimpleTracker held in
keyed state, :169 ``FrameProcessor``). Re-expressed Spark-first as
``applyInPandasWithState`` keyed by camera: the SAME closed-form
per-frame update as the batch twin (``operators/vision.tracker_update``
— greedy-equivalence pytest-pinned there), with the track table living
in Spark keyed state instead of a per-camera fold.

State is parallel integer arrays (one slot per track ever registered;
expired tracks retained for audit parity with the batch twin — a
production deployment would compact them out on emission and expire
idle cameras with a ProcessingTimeTimeout). Each micro-batch emits the
camera's full current track table (update mode), so after the last
batch the table ≡ the batch ``centroid_tracks`` output — asserted by
tests/test_streaming_tracker.py.

Contract: micro-batches must align on frame boundaries per camera (a
frame's detections may not straddle two batches — upstream this is one
``groupBy(camera, frame)`` or a frame-complete source, the same
guarantee the Flink job gets from processing whole decoded frames).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

from smart_city_data_pipeline_spark.operators.vision import _tracker_step

TRACKER_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("camera_id", T.LongType()),
        T.StructField("track_id", T.IntegerType()),
        T.StructField("first_frame", T.IntegerType()),
        T.StructField("last_frame", T.IntegerType()),
        T.StructField("n_matched", T.IntegerType()),
        T.StructField("expired", T.BooleanType()),
        T.StructField("final_cx", T.IntegerType()),
        T.StructField("final_cy", T.IntegerType()),
    ]
)

# parallel arrays, one element per track; expired encoded as 0/1
TRACKER_STATE_SCHEMA = T.StructType(
    [
        T.StructField("tid", T.ArrayType(T.IntegerType())),
        T.StructField("cx", T.ArrayType(T.IntegerType())),
        T.StructField("cy", T.ArrayType(T.IntegerType())),
        T.StructField("miss", T.ArrayType(T.IntegerType())),
        T.StructField("first_f", T.ArrayType(T.IntegerType())),
        T.StructField("last_f", T.ArrayType(T.IntegerType())),
        T.StructField("n_match", T.ArrayType(T.IntegerType())),
        T.StructField("expired", T.ArrayType(T.IntegerType())),
        T.StructField("next_id", T.IntegerType()),
    ]
)

_FIELDS = ("tid", "cx", "cy", "miss", "first_f", "last_f", "n_match", "expired")


def _track_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (camera_id,) = key
    if state.exists:
        s = state.get
        arrays = dict(zip(_FIELDS, s[: len(_FIELDS)]))
        nid = int(s[len(_FIELDS)])
        tracks = [
            {f: (bool(arrays[f][i]) if f == "expired" else int(arrays[f][i]))
             for f in _FIELDS}
            for i in range(len(arrays["tid"]))
        ]
    else:
        tracks, nid = [], 0
    active = [t for t in tracks if not t["expired"]]
    done = [t for t in tracks if t["expired"]]
    chunks = [pdf for pdf in pdfs]
    if chunks:
        pdf = pd.concat(chunks).sort_values(["f", "s"], kind="stable")
        for f, grp in pdf.groupby("f", sort=True):
            dets = [
                (c, int(x), int(y))
                for c, (x, y) in enumerate(zip(grp["cx"], grp["cy"]))
            ]
            nid = _tracker_step(active, done, nid, int(f), dets)
    tracks = sorted(done + active, key=lambda t: t["tid"])
    state.update(
        tuple([int(t[f]) for t in tracks] for f in _FIELDS) + (nid,)
    )
    yield pd.DataFrame(
        [
            (
                int(camera_id), t["tid"], t["first_f"], t["last_f"],
                t["n_match"], bool(t["expired"]), t["cx"], t["cy"],
            )
            for t in tracks
        ],
        columns=[
            "camera_id", "track_id", "first_frame", "last_frame",
            "n_matched", "expired", "final_cx", "final_cy",
        ],
    )


def streaming_centroid_tracks(dets: DataFrame) -> DataFrame:
    """Keyed-state tracker over a stream of (camera_id, f, s, cx, cy)
    detection rows; emits each camera's full track table per batch."""
    return (
        dets.select("camera_id", "f", "s", "cx", "cy")
        .groupBy("camera_id")
        .applyInPandasWithState(
            _track_fn,
            outputStructType=TRACKER_OUTPUT_SCHEMA,
            stateStructType=TRACKER_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
