"""Custom stateful streaming: per-sensor congestion streak detection.

Re-expresses the reference's Spark-Streaming congestion detector and the
Flink vision job's per-camera keyed state (``pipline2/data-proccessor/
stream/``) as ``applyInPandasWithState`` — Spark's keyed-state operator
with Arrow-batched (not per-row) Python execution.

Semantics: a sensor is "congested" while its reading exceeds
``threshold``; the operator tracks the length and start of the current
run of consecutive over-threshold readings per sensor and emits the
state after each batch.

Scale notes: state is one tiny tuple per sensor key, partitioned by the
shuffle on the grouping key — exactly how Flink keyed state shards.
Arrow moves each group's rows as columnar batches. Production runs add
``GroupStateTimeout.ProcessingTimeTimeout`` to expire dead sensors; the
test path uses NoTimeout for determinism.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("streak", T.IntegerType()),
        T.StructField("streak_start", T.TimestampType()),
        T.StructField("last_ts", T.TimestampType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("streak", T.IntegerType()),
        T.StructField("streak_start_us", T.LongType()),
        T.StructField("last_ts_us", T.LongType()),
    ]
)

CONGESTION_THRESHOLD = 160.0  # reading > 0.8 occupancy at the 200 scale


def _streak_fn(threshold: float):
    def update(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            streak, start_us, last_us = state.get
        else:
            streak, start_us, last_us = 0, None, None
        # A key's rows can arrive as SEVERAL Arrow chunks per micro-batch;
        # order is only meaningful after concatenating the whole group.
        chunks = [pdf for pdf in pdfs]
        if chunks:
            pdf = pd.concat(chunks).sort_values("ts", kind="stable")
            for ts, value in zip(pdf["ts"], pdf["value"]):
                ts_us = int(pd.Timestamp(ts).value // 1000)
                if value > threshold:
                    if streak == 0:
                        start_us = ts_us
                    streak += 1
                else:
                    streak, start_us = 0, None
                last_us = ts_us
        state.update((streak, start_us, last_us))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "streak": [streak],
                "streak_start": [pd.Timestamp(start_us * 1000) if start_us is not None else pd.NaT],
                "last_ts": [pd.Timestamp(last_us * 1000) if last_us is not None else pd.NaT],
            }
        )

    return update


def congestion_streaks(stream: DataFrame, threshold: float = CONGESTION_THRESHOLD) -> DataFrame:
    """Keyed-state streak detector over a stream of (user_id, ts, value)."""
    return (
        stream.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _streak_fn(threshold),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


EWMA_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ewma", T.DoubleType()),
        T.StructField("n_seen", T.LongType()),
        T.StructField("last_ts", T.TimestampType()),
    ]
)

EWMA_STATE_SCHEMA = T.StructType(
    [
        T.StructField("ewma", T.DoubleType()),
        T.StructField("n_seen", T.LongType()),
        T.StructField("last_ts_us", T.LongType()),
    ]
)


def _ewma_fn(alpha: float):
    def update(key, pdfs, state: GroupState):
        (user_id,) = key
        ewma, n_seen, last_us = state.get if state.exists else (None, 0, None)
        chunks = [pdf for pdf in pdfs]
        if chunks:
            pdf = pd.concat(chunks).sort_values("ts", kind="stable")
            for ts, value in zip(pdf["ts"], pdf["value"]):
                v = float(value)
                ewma = v if ewma is None else alpha * v + (1.0 - alpha) * ewma
                n_seen += 1
                last_us = int(pd.Timestamp(ts).value // 1000)
        state.update((ewma, n_seen, last_us))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "ewma": [ewma],
                "n_seen": [n_seen],
                "last_ts": [pd.Timestamp(last_us * 1000) if last_us is not None else pd.NaT],
            }
        )

    return update


def ewma_stream(stream: DataFrame, alpha: float = 0.2) -> DataFrame:
    """Exponentially-weighted moving average per sensor — an inherently
    RECURSIVE aggregate (y_t = a*x_t + (1-a)*y_{t-1}) that no window
    function expresses; keyed state via applyInPandasWithState is the
    Spark-native home for it. State per key is three scalars."""
    return (
        stream.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _ewma_fn(alpha),
            outputStructType=EWMA_OUTPUT_SCHEMA,
            stateStructType=EWMA_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def batch_equivalent_streaks(df: DataFrame, threshold: float = CONGESTION_THRESHOLD) -> DataFrame:
    """Batch oracle: trailing run-length of over-threshold readings per sensor.

    Classic gaps-and-islands with window functions — used by the test to
    verify the stateful operator against a declarative formulation.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    # event_id tie-break → ROWS-frame semantics; ts alone gives a RANGE
    # frame where tied timestamps are peers and the running sum diverges.
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = df.select(
        "user_id", "ts", "event_id", (F.col("value") > threshold).cast("int").alias("over")
    ).withColumn("grp", F.sum((F.col("over") == 0).cast("int")).over(w))
    # Rows in the trailing island (over=1 after the last reset) form the streak.
    last = flagged.groupBy("user_id").agg(
        F.max("grp").alias("max_grp"), F.max("ts").alias("last_ts")
    )
    streaks = (
        flagged.join(last, "user_id")
        .where((F.col("grp") == F.col("max_grp")) & (F.col("over") == 1))
        .groupBy("user_id", "last_ts")
        .agg(F.count(F.lit(1)).cast("int").alias("streak"), F.min("ts").alias("streak_start"))
    )
    return last.select("user_id", "last_ts").join(streaks, ["user_id", "last_ts"], "left").select(
        "user_id",
        F.coalesce("streak", F.lit(0)).alias("streak"),
        "streak_start",
        "last_ts",
    )
