"""Streaming anomaly detection: per-sensor running-stats z-score.

The reference architecture's anomaly layer (README: "ML anomaly
detection" over sensor streams) re-expressed Spark-native: keyed state
via ``applyInPandasWithState`` carries each sensor's running
(count, sum, sum-of-squares); an incoming reading is flagged when it
sits more than ``z_max`` standard deviations from the PRE-UPDATE
running mean (so an anomaly cannot suppress itself by inflating the
variance it is judged against).

Scale notes: state is three scalars per sensor key — the same keyed
sharding as the Flink job; rows cross as Arrow batches. The operator
has an exact BATCH TWIN (:func:`batch_equivalent_anomalies`) built
from expanding window aggregates, which the test uses to verify the
stateful path event-for-event.
"""

from __future__ import annotations

import math
from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

ANOMALY_Z_MAX = 3.0
ANOMALY_MIN_N = 5  # readings required before the baseline is trusted

ANOMALY_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("zscore", T.DoubleType()),
    ]
)

ANOMALY_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("s1", T.DoubleType()),
        T.StructField("s2", T.DoubleType()),
    ]
)


def _anomaly_fn(z_max: float, min_n: int):
    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        n, s1, s2 = state.get if state.exists else (0, 0.0, 0.0)
        out_eid, out_ts, out_val, out_z = [], [], [], []
        chunks = [pdf for pdf in pdfs]
        if chunks:
            pdf = pd.concat(chunks).sort_values(["ts", "event_id"], kind="stable")
            for eid, ts, value in zip(pdf["event_id"], pdf["ts"], pdf["value"]):
                v = float(value)
                if n >= min_n:
                    mean = s1 / n
                    var = s2 / n - mean * mean
                    std = math.sqrt(var) if var > 0 else 0.0
                    if std > 0 and abs(v - mean) > z_max * std:
                        out_eid.append(int(eid))
                        out_ts.append(ts)
                        out_val.append(v)
                        out_z.append((v - mean) / std)
                n, s1, s2 = n + 1, s1 + v, s2 + v * v
        state.update((n, s1, s2))
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(out_eid),
                "event_id": out_eid,
                "ts": out_ts,
                "value": out_val,
                "zscore": out_z,
            }
        )

    return update


def anomaly_stream(
    stream: DataFrame, z_max: float = ANOMALY_Z_MAX, min_n: int = ANOMALY_MIN_N
) -> DataFrame:
    """Flag readings > ``z_max`` running standard deviations from the
    sensor's running mean (state: n, Σx, Σx² per key)."""
    return (
        stream.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _anomaly_fn(z_max, min_n),
            outputStructType=ANOMALY_OUTPUT_SCHEMA,
            stateStructType=ANOMALY_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def batch_equivalent_anomalies(
    df: DataFrame, z_max: float = ANOMALY_Z_MAX, min_n: int = ANOMALY_MIN_N
) -> DataFrame:
    """Batch twin: the same flags from EXPANDING window aggregates
    (frame = all prior rows per sensor, ordered by ts/event_id) — the
    declarative formulation the stateful operator must reproduce."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    n_prev = F.count(F.lit(1)).over(w)
    s1 = F.sum("value").over(w)
    s2 = F.sum(F.col("value") * F.col("value")).over(w)
    mean = s1 / n_prev
    var = s2 / n_prev - mean * mean
    std = F.when(var > 0, F.sqrt(var)).otherwise(F.lit(0.0))
    z = (F.col("value") - mean) / std
    return (
        df.select("user_id", "event_id", "ts", F.col("value").cast("double").alias("value"))
        .withColumn("n_prev", n_prev)
        .withColumn("mean_prev", mean)
        .withColumn("std", std)
        .withColumn("zscore", z)
        .filter(
            (F.col("n_prev") >= min_n)
            & (F.col("std") > 0)
            & (F.abs(F.col("value") - F.col("mean_prev")) > z_max * F.col("std"))
        )
        .select("user_id", "event_id", "ts", "value", "zscore")
    )
