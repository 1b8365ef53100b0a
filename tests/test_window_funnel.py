"""Strict-order window funnel edge semantics (VERDICT r6 item 2).

Pins the strict-funnel contract against a python reference
implementation: greedy-earliest matching, strict ``>`` between
consecutive stages (same-timestamp events do NOT advance), inclusive
window boundary (``<= t1 + window``), and out-of-order events ignored.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from smart_city_data_pipeline_spark.operators.timeseries import (
    FUNNEL_HIGH_TS,
    window_funnel_frame,
)

SCHEMA = "user_id long, event_type string, ts timestamp"
STAGES = ("signup", "click", "purchase")
WINDOW = timedelta(days=1)
HIGH = datetime.fromisoformat(FUNNEL_HIGH_TS.replace(" ", "T"))


def _t(h, m=0, s=0):
    return datetime(2026, 3, 1, h, m, s)


def reference_funnel(events):
    """Greedy-earliest strict funnel, one user at a time."""
    by_user = {}
    for uid, etype, ts in events:
        by_user.setdefault(uid, []).append((etype, ts))
    out = {}
    for uid, evs in by_user.items():
        times = [None] * len(STAGES)
        s1 = [ts for e, ts in evs if e == STAGES[0]]
        if s1:
            times[0] = min(s1)
            for k in range(1, len(STAGES)):
                cand = [
                    ts
                    for e, ts in evs
                    if e == STAGES[k]
                    and ts > times[k - 1]
                    and ts <= times[0] + WINDOW
                ]
                if not cand:
                    break
                times[k] = min(cand)
        stage = sum(1 for t in times if t is not None)
        out[uid] = (stage, *[t if t is not None else HIGH for t in times])
    return out


def run_spark(spark, events):
    df = spark.createDataFrame(events, SCHEMA)
    rows = window_funnel_frame(df).collect()
    return {
        r["user_id"]: (
            r["funnel_stage"],
            r["t_signup"],
            r["t_click"],
            r["t_purchase"],
        )
        for r in rows
    }


CASES = [
    # full conversion in order
    (1, "signup", _t(0)), (1, "click", _t(1)), (1, "purchase", _t(2)),
    # same-timestamp click as signup: strict > rejects it; later click OK
    (2, "signup", _t(0)), (2, "click", _t(0)), (2, "click", _t(3)),
    # click BEFORE signup never counts, none after -> stage 1
    (3, "click", _t(0)), (3, "signup", _t(1)),
    # purchase before click (but after signup) doesn't count -> stage 2
    (4, "signup", _t(0)), (4, "purchase", _t(1)), (4, "click", _t(2)),
    # window boundary: click exactly at t1 + 1 day counts (inclusive)
    (5, "signup", _t(0)), (5, "click", _t(0) + WINDOW),
    # window overrun: click 1s past t1 + 1 day does NOT count
    (6, "signup", _t(0)), (6, "click", _t(0) + WINDOW + timedelta(seconds=1)),
    # no stage-1 at all -> stage 0, all sentinels
    (7, "click", _t(1)), (7, "purchase", _t(2)),
    # greedy anchor: FIRST signup anchors the window even if a later
    # signup would let the late click qualify
    (8, "signup", _t(0)), (8, "signup", _t(6)),
    (8, "click", _t(0) + WINDOW + timedelta(hours=2)),
    # same-timestamp purchase as click rejected; purchase after OK
    (9, "signup", _t(0)), (9, "click", _t(1)),
    (9, "purchase", _t(1)), (9, "purchase", _t(1, 0, 1)),
]


def test_matches_python_reference(spark):
    assert run_spark(spark, CASES) == reference_funnel(CASES)


def test_edge_semantics_pinned(spark):
    got = run_spark(spark, CASES)
    # strict >: user 2's t(0) click rejected, t(3) click matched
    assert got[2][0] == 2 and got[2][2] == _t(3)
    # pre-signup click ignored
    assert got[3][0] == 1 and got[3][2] == HIGH
    # out-of-order purchase ignored, stage stops at click
    assert got[4][0] == 2 and got[4][3] == HIGH
    # inclusive window boundary vs 1s overrun
    assert got[5][0] == 2
    assert got[6][0] == 1
    # no signup -> stage 0 with sentinels
    assert got[7] == (0, HIGH, HIGH, HIGH)
    # first signup anchors the window (greedy, not optimal)
    assert got[8][0] == 1
    # same-timestamp purchase-as-click rejected, next second matched
    assert got[9][0] == 3 and got[9][3] == _t(1, 0, 1)


def test_randomized_against_reference(spark):
    """Deterministic pseudo-random event soup vs the reference."""
    events = []
    x = 1
    for i in range(600):
        x = (x * 1103515245 + 12345) % (1 << 31)
        uid = 100 + (x % 25)
        etype = STAGES[(x >> 8) % 4 % 3] if (x >> 8) % 4 < 3 else "other"
        minutes = (x >> 16) % (36 * 60)  # 1.5 days => window edges hit
        events.append((uid, etype, _t(0) + timedelta(minutes=minutes)))
    assert run_spark(spark, events) == reference_funnel(events)
