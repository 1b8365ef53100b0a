"""Streaming strict-order window funnel: the live twin of the batch
``window_funnel_strict`` / ``funnel_conversion_report`` family
(operators/timeseries.py ``window_funnel_frame``).

Semantics are the batch frame's EXACTLY: per user, greedy-earliest
strict-order matching — stage k counts only if its first qualifying
event is strictly after stage k−1's matched time and within the
funnel window anchored at stage 1's first event. One final row per
user, emitted exactly once.

Why the state is a bounded EVENT BUFFER and not just per-stage min
timestamps: greedy-earliest matching is not an in-order fold under
out-of-order delivery — a late stage-1 event with an EARLIER
timestamp lowers the anchor t1 and can re-qualify stage-2 events that
were previously unmatched (pytest plants exactly this). So each user
buffers its stage events until the watermark PROVES the funnel final
(wm past t1 + window: any later event has ts >= wm > t1 + window, so
it can neither extend the funnel nor lower the anchor), then replays
the batch matcher over the buffer and emits. The buffer is bounded by
one funnel window per user (events past t1 + window are pruned on
arrival; with no anchor yet, events at/below the watermark can never
match a future anchor and are pruned too) — state is O(events within
one window), independent of history length.

Users with no stage events still emit their funnel_stage = 0 row
(the batch frame emits every distinct user), timed out one window
after their latest event.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from smart_city_data_pipeline_spark.operators.timeseries import (
    FUNNEL_HIGH_TS,
    FUNNEL_STAGES,
)

FUNNEL_WINDOW_US = 24 * 3600 * 1_000_000  # INTERVAL 1 DAY, in micros

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("stages", T.ArrayType(T.IntegerType())),
        T.StructField("ts_us", T.ArrayType(T.LongType())),
        T.StructField("max_ts_us", T.LongType()),
    ]
)


def funnel_match(
    events: list[tuple[int, int]], n_stages: int, window_us: int
) -> list[int]:
    """Greedy-earliest strict-order matcher — the batch frame's
    semantics over a (stage_idx 1-based, ts_us) buffer. Returns the
    matched ts_us per reached stage (possibly empty)."""
    per: list[list[int]] = [[] for _ in range(n_stages)]
    for s, ts in events:
        per[s - 1].append(ts)
    if not per[0]:
        return []
    t1 = min(per[0])
    hi = t1 + window_us
    matched = [t1]
    prev = t1
    for k in range(1, n_stages):
        cand = [x for x in per[k] if prev < x <= hi]
        if not cand:
            break
        prev = min(cand)
        matched.append(prev)
    return matched


def _make_funnel_fn(stages: tuple, window_us: int, high_us: int):
    n_stages = len(stages)
    stage_idx = {s: i + 1 for i, s in enumerate(stages)}

    def fn(key, pdfs: Iterator, state: GroupState):
        import pandas as pd

        def emit(buf):
            matched = funnel_match(buf, n_stages, window_us)
            row = {"user_id": [int(key[0])], "funnel_stage": [len(matched)]}
            for i, s in enumerate(stages):
                us = matched[i] if i < len(matched) else high_us
                row[f"t_{s}"] = [pd.Timestamp(us * 1000)]
            return pd.DataFrame(row)

        if state.hasTimedOut:
            st, ts, _ = state.get
            state.remove()
            yield emit(list(zip(st, ts)))
            return

        buf: list[tuple[int, int]] = []
        max_ts = 0
        if state.exists:
            st, ts, max_ts = state.get
            buf = list(zip(st, ts))
        for pdf in pdfs:
            for t, et in zip(pdf["ts"], pdf["event_type"]):
                us = int(pd.Timestamp(t).value // 1000)
                max_ts = max(max_ts, us)
                s = stage_idx.get(et)
                if s is not None:
                    buf.append((s, us))
        wm_us = state.getCurrentWatermarkMs() * 1000
        anchors = [ts for s, ts in buf if s == 1]
        if anchors:
            horizon = min(anchors) + window_us
            buf = [e for e in buf if e[1] <= horizon]
            timeout_us = horizon
        else:
            # no anchor yet: events at/below the watermark can never
            # qualify for a future anchor (strictly-after rule), drop
            buf = [e for e in buf if e[1] > wm_us]
            timeout_us = max_ts + window_us
        state.update(
            ([s for s, _ in buf], [t for _, t in buf], max_ts)
        )
        state.setTimeoutTimestamp(
            max(timeout_us // 1000 + 1, state.getCurrentWatermarkMs() + 1)
        )

    return fn


def funnel_stream(
    stream: DataFrame,
    stages: tuple = FUNNEL_STAGES,
    window_us: int = FUNNEL_WINDOW_US,
    watermark: str = "35 days",
) -> DataFrame:
    """Final funnel rows (append mode, exactly once per user) from a
    raw event stream; columns match the batch frame."""
    import pandas as pd

    high_us = int(pd.Timestamp(FUNNEL_HIGH_TS).value // 1000)
    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("funnel_stage", T.IntegerType()),
        ]
        + [T.StructField(f"t_{s}", T.TimestampType()) for s in stages]
    )
    return (
        stream.select("user_id", "ts", "event_type")
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_funnel_fn(stages, window_us, high_us),
            outputStructType=out_schema,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
