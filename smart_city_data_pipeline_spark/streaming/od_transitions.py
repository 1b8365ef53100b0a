"""Streaming origin→destination transitions: the live twin of the
batch ``od_matrix`` (operators/traffic.py).

Each sensor carries ONE scalar of keyed state — the zone and timestamp
of its latest event — and every micro-batch emits the zone-change
transitions it completes. Per-sensor ordering inside a batch is the
same (ts, event_id) total order the batch operator uses, and state
stitches transitions ACROSS micro-batch boundaries, so replaying the
whole history through any micro-batch slicing yields exactly the batch
operator's transition multiset (the ``congestion_streaks`` /
``ewma_stream`` discipline, pytest-chained in
tests/test_streaming_od.py).

State is O(|sensors|) scalars — independent of stream volume; a
rollup of the emitted transitions (count + transit seconds per zone
pair) is a plain downstream windowed aggregate.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

TRANSITION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("from_zone", T.StringType()),
        T.StructField("to_zone", T.StringType()),
        T.StructField("dt_s", T.LongType()),
        T.StructField("at_ts", T.TimestampType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("zone", T.StringType()),
        T.StructField("ts_us", T.LongType()),
    ]
)


def _transition_fn(key, pdfs, state: GroupState):
    (user_id,) = key
    zone, ts_us = state.get if state.exists else (None, None)
    out = {"from": [], "to": [], "dt": [], "at": []}
    chunks = [pdf for pdf in pdfs]
    if chunks:
        pdf = pd.concat(chunks).sort_values(
            ["ts", "event_id"], kind="stable"
        )
        for ts, etype in zip(pdf["ts"], pdf["event_type"]):
            cur_us = int(pd.Timestamp(ts).value // 1000)
            if zone is not None and etype != zone:
                # whole-second delta, matching unix_timestamp()'s floor
                out["from"].append(zone)
                out["to"].append(etype)
                out["dt"].append(cur_us // 1_000_000 - ts_us // 1_000_000)
                out["at"].append(pd.Timestamp(cur_us * 1000))
            zone, ts_us = etype, cur_us
        state.update((zone, ts_us))
    if out["from"]:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(out["from"]),
                "from_zone": out["from"],
                "to_zone": out["to"],
                "dt_s": out["dt"],
                "at_ts": out["at"],
            }
        )


def od_transition_stream(stream: DataFrame) -> DataFrame:
    """Zone-change transition events from a raw event stream."""
    return (
        stream.select("user_id", "ts", "event_id", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            _transition_fn,
            outputStructType=TRANSITION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
