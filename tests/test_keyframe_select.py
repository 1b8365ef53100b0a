"""Keyframe pick: planted tie-break (equal Laplacian -> earliest
frame wins), window assignment, and composition over the real decode
path."""

from __future__ import annotations

from smart_city_data_pipeline_spark.operators.multimodal import (
    KEYFRAME_WIN,
    _keyframe_pick,
    _laplacian_feats,
    keyframe_select,
)


def test_tie_breaks_to_earliest_frame(spark):
    feats = spark.createDataFrame(
        [
            # camera 1, window 0: tie on abs_lap=900 between frames 5
            # and 40 -> frame 5 must win
            (1, 5, 900),
            (1, 40, 900),
            (1, 70, 100),
            # camera 1, window 1: single frame
            (1, KEYFRAME_WIN + 3, 7),
            # camera 2, window 0: strict max on the LATER frame
            (2, 10, 50),
            (2, 90, 60),
        ],
        "camera_id long, frame_id long, abs_lap long",
    )
    got = {
        (r["camera_id"], r["win_id"]): (
            r["keyframe_id"], r["keyframe_lap"], r["n_frames"]
        )
        for r in _keyframe_pick(feats).collect()
    }
    assert got == {
        (1, 0): (5, 900, 3),
        (1, 1): (KEYFRAME_WIN + 3, 7, 1),
        (2, 0): (90, 60, 2),
    }


def test_keyframe_is_windowed_argmax_of_decoded_features(spark, sf_dir):
    """The registered query must equal a direct python argmax over the
    decoded per-frame features (independent of the struct-max trick)."""
    feats = _laplacian_feats(spark, sf_dir).collect()
    want = {}
    for r in feats:
        key = (r["camera_id"], r["frame_id"] // KEYFRAME_WIN)
        cand = (-r["abs_lap"], r["frame_id"])
        n, best = want.get(key, (0, None))
        want[key] = (n + 1, cand if best is None else min(best, cand))
    got = {
        (r["camera_id"], r["win_id"]): (
            r["n_frames"], (-r["keyframe_lap"], r["keyframe_id"])
        )
        for r in keyframe_select(spark, sf_dir).collect()
    }
    assert got == want
