"""Streaming EPA NowCast — the live twin of the batch ``aqi_nowcast``
(operators/traffic.py): per-sensor keyed state holding the trailing
12 hourly (cents_sum, count) accumulators, advanced per micro-batch
with ``applyInPandasWithState`` and folded through the SHARED
``nowcast_fold_py`` transition (one integer recurrence, stream and
batch cannot drift — the kalman_step discipline).

The per-hour accumulators are COMMUTATIVE MONOIDS (sums/counts) and
the trailing-window prune is monotone in the anchor hour, so the
final state after any micro-batch slicing — including adversarial
newest-first delivery — equals the one-shot batch fold over the same
events, integer for integer (pytest delivers the corpus newest-first
in 3 waves on purpose). A late reading for an hour that has already
fallen out of the trailing window is ignored on arrival, exactly as
the batch window ignores it.

State per sensor is ≤ 12 (hour, sum, count) triples + one counter;
output mode is update (current NowCast per sensor after each batch),
with ``n_seen`` monotone so "latest row per sensor" is a max-struct
pick for downstream consumers and tests."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from smart_city_data_pipeline_spark.functions.aqi import (
    aqi_category_py,
    aqi_value_py,
)
from smart_city_data_pipeline_spark.functions.rounding import pround_py
from smart_city_data_pipeline_spark.operators.traffic import (
    NOWCAST_HOURS,
    nowcast_fold_py,
)

NC_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("sensor_id", T.LongType()),
        T.StructField("n_seen", T.LongType()),
        T.StructField("n_hours", T.LongType()),
        T.StructField("wq", T.LongType()),
        T.StructField("eligible", T.BooleanType()),
        T.StructField("nowcast_pm25", T.DoubleType()),
        T.StructField("nowcast_aqi", T.LongType()),
        T.StructField("nowcast_category", T.StringType()),
    ]
)

NC_STATE_SCHEMA = T.StructType(
    [
        T.StructField("hrs", T.ArrayType(T.LongType())),
        T.StructField("sums", T.ArrayType(T.LongType())),
        T.StructField("cnts", T.ArrayType(T.LongType())),
        T.StructField("n_seen", T.LongType()),
    ]
)


def _nc_update(key, pdfs, state: GroupState):
    import math

    (sensor_id,) = key
    hours: dict[int, list[int]] = {}
    n_seen = 0
    if state.exists:
        hrs, sums, cnts, n_seen = state.get
        hours = {int(h): [int(s), int(c)] for h, s, c in zip(hrs, sums, cnts)}
    for pdf in pdfs:
        for us, v in zip(pdf["us"], pdf["value"]):
            h = int(us) // 3_600_000_000
            c = int(math.floor(float(v) * 100 + 0.5))
            acc = hours.setdefault(h, [0, 0])
            acc[0] += c
            acc[1] += 1
            n_seen += 1
    # monotone trailing-window prune (batch semantics: only hours
    # within NOWCAST_HOURS of the anchor participate)
    anchor = max(hours)
    hours = {h: a for h, a in hours.items() if anchor - h < NOWCAST_HOURS}
    state.update(
        (
            list(hours),
            [a[0] for a in hours.values()],
            [a[1] for a in hours.values()],
            n_seen,
        )
    )
    n_hours, wq, eligible, ncents = nowcast_fold_py(
        {h: (a[0], a[1]) for h, a in hours.items()}
    )
    pm = ncents / 100.0
    yield pd.DataFrame(
        {
            "sensor_id": [int(sensor_id)],
            "n_seen": [n_seen],
            "n_hours": [n_hours],
            "wq": [wq],
            "eligible": [eligible],
            "nowcast_pm25": [pround_py(pm)],
            "nowcast_aqi": [aqi_value_py(pm)],
            "nowcast_category": [aqi_category_py(pm)],
        }
    )


def nowcast_stream(stream: DataFrame) -> DataFrame:
    """Running EPA NowCast per sensor over an event stream. Input
    needs (user_id, ts, value)."""
    return (
        stream.select(
            F.col("user_id").alias("sensor_id"),
            F.unix_micros(F.col("ts")).alias("us"),
            "value",
        )
        .groupBy("sensor_id")
        .applyInPandasWithState(
            _nc_update,
            outputStructType=NC_OUTPUT_SCHEMA,
            stateStructType=NC_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
