"""Streaming Kalman level filter — the stateful twin of the batch
``kalman_level_filter`` replay: per-sensor keyed state (grid-integer
level and variance, innovation accumulator, point count) advanced per
micro-batch with ``applyInPandasWithState``. The transition function
(``kalman_step``) and the grid constants are IMPORTED from the batch
operator — one recurrence, the paths cannot drift — and the pytest
asserts the final per-sensor state across micro-batch waves equals the
one-shot batch replay, integer for integer.

In-order-delivery contract (same as the rate limiter): the Kalman
recurrence is order-dependent, so stream ≡ batch exactness requires
each key's events to arrive across micro-batches in event-time order
(within a batch we sort; across batches we cannot). Out-of-order
delivery degrades gracefully — the filter still converges — but the
state sequence then differs from the batch's globally-sorted replay.

State per key is four scalars; output mode is update (latest filter
state per sensor)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from smart_city_data_pipeline_spark.operators.timeseries import (
    KAL_G,
    KAL_R_C2,
    kalman_step,
)

KS_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("sensor_id", T.LongType()),
        T.StructField("n_points", T.LongType()),
        T.StructField("xq", T.LongType()),
        T.StructField("pq", T.LongType()),
        T.StructField("sum_abs_innov", T.LongType()),
    ]
)

KS_STATE_SCHEMA = T.StructType(
    [
        T.StructField("xq", T.LongType()),
        T.StructField("pq", T.LongType()),
        T.StructField("sai", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def _ks_update(key, pdfs, state: GroupState):
    (sensor_id,) = key
    if state.exists:
        xq, pq, sai, n = state.get
    else:
        xq, pq, sai, n = None, None, 0, 0
    chunks = [pdf for pdf in pdfs]
    if chunks:
        pdf = pd.concat(chunks).sort_values(
            ["ts", "event_id"], kind="stable"
        )
        for z in pdf["z"]:
            z = int(z)
            if xq is None:
                xq, pq = z * KAL_G, KAL_R_C2 * KAL_G
            else:
                xq, pq, innov = kalman_step(xq, pq, z)
                sai += abs(innov)
            n += 1
    state.update((xq, pq, sai, n))
    yield pd.DataFrame(
        {
            "sensor_id": [sensor_id],
            "n_points": [n],
            "xq": [xq],
            "pq": [pq],
            "sum_abs_innov": [sai],
        }
    )


def kalman_stream(stream: DataFrame) -> DataFrame:
    """Running per-sensor Kalman state over an event stream. Input
    needs (user_id, ts, event_id, value) — readings quantize to cents
    exactly like the batch operator."""
    from pyspark.sql import functions as F

    return (
        stream.select(
            F.col("user_id"),
            "ts",
            "event_id",
            F.floor(F.col("value") * 100 + 0.5).cast("long").alias("z"),
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            _ks_update,
            outputStructType=KS_OUTPUT_SCHEMA,
            stateStructType=KS_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
