"""Streaming latest-city-state maintenance — the stateful twin of the
``city_snapshot`` metrics leg: per-zone keyed state holding the newest
reading (epoch-µs timestamp, event_id tie-break, value), advanced per
micro-batch with ``applyInPandasWithState``. This is the reference
dashboard's in-memory latest-state map (``pipline2/test_code/
vision_prototype.py:246`` keeps exactly this dict per camera and
``templates/dashboard.html`` polls it) run as proper fault-tolerant
keyed streaming state instead of process memory.

Unlike the rate limiter, the update rule is a pure MAX over the
(us, event_id) total order — commutative and idempotent — so
stream ≡ batch holds under ANY delivery order across micro-batches
(a late event can never displace a newer stored reading). The pytest
asserts the final per-zone state equals the one-shot batch argmax,
integer for integer.

State per key is three scalars; output mode is update (latest reading
per zone after each batch)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

CS_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("zone", T.StringType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("last_event_id", T.LongType()),
        T.StructField("last_value", T.DoubleType()),
    ]
)

CS_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_us", T.LongType()),
        T.StructField("last_event_id", T.LongType()),
        T.StructField("last_value", T.DoubleType()),
    ]
)


def _cs_update(key, pdfs, state: GroupState):
    (zone,) = key
    if state.exists:
        last_us, last_eid, last_val = state.get
    else:
        last_us, last_eid, last_val = -1, -1, float("nan")
    for pdf in pdfs:
        for us, eid, val in zip(pdf["us"], pdf["event_id"], pdf["value"]):
            if (int(us), int(eid)) > (last_us, last_eid):
                last_us, last_eid, last_val = int(us), int(eid), float(val)
    state.update((last_us, last_eid, last_val))
    yield pd.DataFrame(
        {
            "zone": [zone],
            "last_us": [last_us],
            "last_event_id": [last_eid],
            "last_value": [last_val],
        }
    )


def city_state_stream(stream: DataFrame) -> DataFrame:
    """Running latest reading per zone over an event stream. Input
    needs (event_type, ts, event_id, value)."""
    from pyspark.sql import functions as F

    return (
        stream.select(
            F.col("event_type").alias("zone"),
            F.unix_micros(F.col("ts")).alias("us"),
            "event_id",
            "value",
        )
        .groupBy("zone")
        .applyInPandasWithState(
            _cs_update,
            outputStructType=CS_OUTPUT_SCHEMA,
            stateStructType=CS_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
