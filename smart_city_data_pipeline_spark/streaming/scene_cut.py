"""Streaming shot-boundary detector — the live twin of the batch
``scene_cut_detect`` rollup (operators/multimodal.py): per-camera
frame differencing over decoded intensity sums, with the identical
integer cut rule ``|sum_t − sum_prev| > TH·n_px``.

Why buffered finality and not a plain fold: frame differencing needs
each frame's TRUE predecessor by frame_id, and micro-batches deliver
frames out of order. Each camera buffers arrivals until the watermark
proves no earlier-timestamped frame can still arrive, then replays the
finalized prefix in frame_id order against the last finalized frame
(the boundary — O(1) carried state) and folds the batch operator's
exact integer aggregates. Contract: per camera, event time is
MONOTONE in frame_id (true of video timestamps), so watermark finality
in time order IS frame order.

State per camera: the unfinalized frame buffer (bounded by the
watermark delay × frame rate), one boundary frame, and five exact
aggregate scalars. Output mode is update — the latest per-camera
census row; after a flush past every frame it equals the batch rollup
row for row (pytest replays the corpus in three interleaved waves).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from smart_city_data_pipeline_spark.operators.multimodal import SCENE_CUT_TH

SC_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("camera_id", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("n_cuts", T.LongType()),
        T.StructField("max_jump", T.LongType()),
        T.StructField("first_cut_frame", T.LongType()),
        T.StructField("cut_rate", T.DoubleType()),
    ]
)

SC_STATE_SCHEMA = T.StructType(
    [
        T.StructField("p_fid", T.ArrayType(T.LongType())),
        T.StructField("p_sum", T.ArrayType(T.LongType())),
        T.StructField("p_px", T.ArrayType(T.LongType())),
        T.StructField("p_ts", T.ArrayType(T.LongType())),
        T.StructField("b_fid", T.LongType()),
        T.StructField("b_sum", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("n_cuts", T.LongType()),
        T.StructField("max_jump", T.LongType()),
        T.StructField("first_cut", T.LongType()),
    ]
)

_NO_BOUNDARY = -1
_NO_VALUE = -1


def scene_cut_fold(
    boundary_sum: int | None,
    frames: list[tuple[int, int, int]],
    n_frames: int,
    n_cuts: int,
    max_jump: int | None,
    first_cut: int | None,
) -> tuple[int | None, int, int, int | None, int | None]:
    """Fold finalized (frame_id, sum, n_px) rows — ASCENDING frame_id —
    through the batch cut rule. Shared by the stream twin and its
    tests; returns the advanced (boundary_sum, aggregates)."""
    for fid, s, px in frames:
        if boundary_sum is not None:
            jump = abs(s - boundary_sum)
            if max_jump is None or jump > max_jump:
                max_jump = jump
            if jump > SCENE_CUT_TH * px:
                n_cuts += 1
                if first_cut is None:
                    first_cut = fid
        boundary_sum = s
        n_frames += 1
    return boundary_sum, n_frames, n_cuts, max_jump, first_cut


def _sc_update(key, pdfs: Iterator, state: GroupState):
    import pandas as pd

    (camera_id,) = key
    if state.exists:
        (
            p_fid, p_sum, p_px, p_ts, b_fid, b_sum,
            n_frames, n_cuts, max_jump, first_cut,
        ) = state.get
        pend = list(zip(p_fid, p_sum, p_px, p_ts))
    else:
        pend, b_fid, b_sum = [], _NO_BOUNDARY, _NO_VALUE
        n_frames = n_cuts = 0
        max_jump = first_cut = _NO_VALUE
    if not state.hasTimedOut:
        for pdf in pdfs:
            for fid, s, px, t in zip(
                pdf["frame_id"], pdf["sum_intensity"], pdf["n_px"], pdf["ts"]
            ):
                pend.append(
                    (int(fid), int(s), int(px), int(pd.Timestamp(t).value // 1000))
                )
    wm_us = state.getCurrentWatermarkMs() * 1000
    final = sorted(
        (e for e in pend if e[3] < wm_us), key=lambda e: e[0]
    )
    pend = [e for e in pend if e[3] >= wm_us]
    if final and b_fid != _NO_BOUNDARY and final[0][0] <= b_fid:
        # Contract violation (event time NOT monotone in frame_id for
        # this camera): a frame at or before the finalized boundary
        # would fold out of frame order and silently corrupt every
        # downstream diff — fail loudly instead.
        raise ValueError(
            f"camera {camera_id}: finalized frame_id {final[0][0]} "
            f"regresses behind boundary {b_fid} — event time is not "
            "monotone in frame_id for this source"
        )
    bs, nf, nc, mj, fc = scene_cut_fold(
        b_sum if b_fid != _NO_BOUNDARY else None,
        [(f, s, px) for f, s, px, _ in final],
        n_frames,
        n_cuts,
        max_jump if max_jump != _NO_VALUE else None,
        first_cut if first_cut != _NO_VALUE else None,
    )
    if final:
        b_fid, b_sum = final[-1][0], bs if bs is not None else _NO_VALUE
    n_frames, n_cuts = nf, nc
    max_jump = mj if mj is not None else _NO_VALUE
    first_cut = fc if fc is not None else _NO_VALUE
    state.update(
        (
            [e[0] for e in pend], [e[1] for e in pend],
            [e[2] for e in pend], [e[3] for e in pend],
            b_fid, b_sum, n_frames, n_cuts, max_jump, first_cut,
        )
    )
    if pend:
        state.setTimeoutTimestamp(
            max(min(e[3] for e in pend) // 1000 + 1,
                state.getCurrentWatermarkMs() + 1)
        )
    if n_frames or pend:
        from smart_city_data_pipeline_spark.functions.rounding import pround_py

        yield pd.DataFrame(
            {
                "camera_id": [int(camera_id)],
                "n_frames": [n_frames],
                "n_cuts": [n_cuts],
                "max_jump": [max_jump if max_jump != _NO_VALUE else None],
                "first_cut_frame": [
                    first_cut if first_cut != _NO_VALUE else None
                ],
                "cut_rate": [
                    pround_py(n_cuts / n_frames) if n_frames else None
                ],
            }
        )


def scene_cut_stream(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Per-camera scene-cut census (update mode) from a decoded frame
    feature stream ``(camera_id, frame_id, ts, sum_intensity, n_px)``;
    the final row per camera equals the batch ``scene_cut_detect``."""
    return (
        stream.select("camera_id", "frame_id", "ts", "sum_intensity", "n_px")
        .withWatermark("ts", watermark)
        .groupBy("camera_id")
        .applyInPandasWithState(
            _sc_update,
            outputStructType=SC_OUTPUT_SCHEMA,
            stateStructType=SC_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
