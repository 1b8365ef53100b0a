"""Streaming token-bucket rate limiter — the ENFORCEMENT twin of the
batch ``rate_limit_audit`` replay: per-sensor keyed state
(bucket level in integer microseconds, last event time, counters)
advanced per micro-batch with ``applyInPandasWithState``. The bucket
constants AND the transition function (``rate_bucket_step``) are
shared with the batch operator — one imported recurrence, so the two
paths cannot drift — and the pytest asserts per-sensor totals across
micro-batch waves equal the one-shot batch audit EXACTLY, integer for
integer.

In-order-delivery contract: stream≡batch exactness holds when each
key's events arrive across micro-batches in event-time order (within
a batch we sort; across batches we cannot). A late event (``us`` below
the stored high-water mark) takes the ``rate_bucket_step`` guarded
path — zero refill, high-water mark kept — so it consumes a token at
the late arrival point instead of corrupting the bucket level with a
negative elapsed; the batch audit, which globally sorts, would have
charged it at its true position. Deliver in order when exact replay
parity matters.

State per key is four scalars; output mode is update (latest running
totals per sensor)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from smart_city_data_pipeline_spark.operators.timeseries import (
    RATE_CAP_US,
    rate_bucket_step,
)

RL_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("sensor_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("n_accepted", T.LongType()),
        T.StructField("n_dropped", T.LongType()),
        T.StructField("first_drop_id", T.LongType()),
    ]
)

RL_STATE_SCHEMA = T.StructType(
    [
        T.StructField("tok", T.LongType()),
        T.StructField("prev_us", T.LongType()),
        T.StructField("acc", T.LongType()),
        T.StructField("drp", T.LongType()),
        T.StructField("first_drop", T.LongType()),
    ]
)


def _rl_update(key, pdfs, state: GroupState):
    (sensor_id,) = key
    if state.exists:
        tok, prev_us, acc, drp, first_drop = state.get
    else:
        tok, prev_us, acc, drp, first_drop = RATE_CAP_US, None, 0, 0, None
    chunks = [pdf for pdf in pdfs]
    if chunks:
        pdf = pd.concat(chunks).sort_values(
            ["us", "event_id"], kind="stable"
        )
        for us, eid in zip(pdf["us"], pdf["event_id"]):
            tok, prev_us, accepted = rate_bucket_step(tok, prev_us, int(us))
            if accepted:
                acc += 1
            else:
                drp += 1
                if first_drop is None:
                    first_drop = int(eid)
    state.update((tok, prev_us, acc, drp, first_drop))
    yield pd.DataFrame(
        {
            "sensor_id": [sensor_id],
            "n_events": [acc + drp],
            "n_accepted": [acc],
            "n_dropped": [drp],
            "first_drop_id": [first_drop],
        }
    )


def rate_limiter_stream(stream: DataFrame) -> DataFrame:
    """Running per-sensor token-bucket totals over an event stream.
    Input needs (user_id, us, event_id) — epoch-microsecond event
    time, the batch operator's exact units."""
    from pyspark.sql import functions as F

    return (
        stream.select(
            F.col("user_id"),
            F.unix_micros(F.col("ts")).alias("us"),
            "event_id",
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            _rl_update,
            outputStructType=RL_OUTPUT_SCHEMA,
            stateStructType=RL_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
