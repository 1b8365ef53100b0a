"""LTTB downsampling semantics (downsample_lttb).

The oracle hash-checks the main path on the real corpus; these tests
pin (1) the degenerate pass-through branch, which no corpus sensor
exercises (every sensor has 49+ points > LTTB_B), and (2) the
selection chain on planted data against an independently written
float-arithmetic LTTB — the classic formulation with true centroid
division, confirming the integer-scaled area picks identical points.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import numpy as np
import pandas as pd

from smart_city_data_pipeline_spark.operators.timeseries import (
    LTTB_B,
    _lttb_fold,
)


def _frame(points):
    """points: list of (user_id, event_id, ts, cents)."""
    return pd.DataFrame(
        {
            "user_id": [p[0] for p in points],
            "event_id": [p[1] for p in points],
            "ts": [np.datetime64(p[2], "us") for p in points],
            "tu": [
                int((p[2] - datetime(1970, 1, 1)).total_seconds() * 1_000_000)
                for p in points
            ],
            "y": [p[3] for p in points],
            "n_ser": [len(points)] * len(points),
        }
    )


def _run_fold(points):
    out = list(_lttb_fold(iter([_frame(points)])))
    assert len(out) == 1
    return out[0]


def test_degenerate_passthrough():
    t0 = datetime(2026, 1, 1)
    pts = [(7, i, t0 + timedelta(minutes=i), 100 + 7 * i) for i in range(5)]
    got = _run_fold(pts)
    assert list(got["bucket"]) == [0, 1, 2, 3, 4]
    assert list(got["n_bucket"]) == [1] * 5
    assert list(got["area_q"]) == [0] * 5
    assert [round(v, 4) for v in got["value"]] == [
        round((100 + 7 * i) / 100.0, 4) for i in range(5)
    ]


def reference_lttb_float(xs, ys, b):
    """Textbook LTTB (Steinarsson 2013) with float centroid division —
    written independently of the operator's integer-scaled form.
    Returns selected indices."""
    n = len(xs)
    sel = [0]
    nb = b - 2
    bucket = [0] + [(i - 1) * nb // (n - 2) + 1 for i in range(1, n - 1)] + [
        b - 1
    ]
    for k in range(1, b - 1):
        idxs = [i for i in range(n) if bucket[i] == k]
        nxt = [i for i in range(n) if bucket[i] == k + 1]
        cx = sum(xs[i] for i in nxt) / len(nxt)
        cy = sum(ys[i] for i in nxt) / len(nxt)
        ax, ay = xs[sel[-1]], ys[sel[-1]]
        best, best_a = None, -1.0
        for i in idxs:
            a = abs((xs[i] - ax) * (cy - ay) - (cx - ax) * (ys[i] - ay)) / 2.0
            if a > best_a:
                best, best_a = i, a
        sel.append(best)
    sel.append(n - 1)
    return sel


def test_selection_matches_float_reference():
    rng = np.random.default_rng(11)
    t0 = datetime(2026, 1, 1)
    n = 90
    pts = [
        (3, i, t0 + timedelta(seconds=int(60 + 37 * i)), int(rng.integers(100, 40000)))
        for i in range(n)
    ]
    got = _run_fold(pts)
    main = got[got["bucket"] < LTTB_B].sort_values("bucket")
    assert len(main) == LTTB_B
    xs = [(p[2] - datetime(1970, 1, 1)).total_seconds() for p in pts]
    ys = [p[3] for p in pts]
    sel = reference_lttb_float(xs, ys, LTTB_B)
    want_ts = [np.datetime64(pts[i][2], "us") for i in sel]
    assert list(main["ts"]) == want_ts


def test_bucket_sizes_partition_the_series():
    rng = np.random.default_rng(5)
    t0 = datetime(2026, 1, 1)
    n = 75
    pts = [
        (9, i, t0 + timedelta(seconds=int(11 * i)), int(rng.integers(0, 5000)))
        for i in range(n)
    ]
    got = _run_fold(pts)
    # first/last are singletons; middle bucket sizes sum to n-2
    assert got[got["bucket"] == 0]["n_bucket"].iloc[0] == 1
    assert got[got["bucket"] == LTTB_B - 1]["n_bucket"].iloc[0] == 1
    middles = got[(got["bucket"] > 0) & (got["bucket"] < LTTB_B - 1)]
    assert middles["n_bucket"].sum() == n - 2
