"""Streaming ARCH-effect monitor — the live twin of the batch
``arch_lm_test`` (operators/stats.py): per-sensor volatility-
clustering detection that is BATCH-EXACT at drain despite the batch
statistic depending on the FULL-SERIES mean.

Why this is not a plain fold: the batch test demeans on the integer
grid with m = (Σy DIV n) over the WHOLE series, so z_t = (y_t − m)²
is unknowable while streaming. The twin therefore carries the exact
POLYNOMIAL MOMENTS the statistic expands into — for consecutive pairs
(y_t, y_{t−1}): P_ab = Σ y_t^a·y_{t−1}^b (a,b ≤ 2), X_k = Σ y_t^k and
W_k = Σ y_{t−1}^k (k = 3,4), plus the series (n, Σy) — all integer
COMMUTATIVE MONOIDS. At read time the finisher computes m and expands

    sx  = P20 − 2m·P10 + m²·np
    sy  = P02 − 2m·P01 + m²·np
    sxy = P22 − 2m(P21 + P12) + m²(P20 + P02 + 4·P11)
          − 2m³(P10 + P01) + m⁴·np
    sxx = X4 − 4m·X3 + 6m²·P20 − 4m³·P10 + m⁴·np
    syy = W4 − 4m·W3 + 6m²·P02 − 4m³·P01 + m⁴·np

(binomial identities, exact over Python bigints), then runs the SAME
IEEE double sequence as the batch operator — so stream ≡ batch bit
for bit after any delivery interleaving.

Pair formation needs each reading's TRUE predecessor by event time,
and micro-batches deliver out of order — so the per-sensor state
buffers arrivals until the watermark proves finality (the scene_cut
posture), folds the finalized prefix in (ts, event_id) order against
the carried last-finalized reading, and accumulates the moments.
Moments are stored as DECIMAL-STRINGS in state (y⁴ ≈ 1.6e17 per row —
int64 state would wrap on long series; Python bigints never do).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from smart_city_data_pipeline_spark.functions.rounding import pround_py
from smart_city_data_pipeline_spark.operators.stats import (
    ARCH_LM_CRIT,
    ARCH_MIN_PAIRS,
)

# moment vector layout (all stored as decimal strings):
# [n, sum_y, np, P10, P20, P01, P02, P11, P21, P12, P22, X3, X4, W3, W4]
_NM = 15
_IDX = {
    k: i
    for i, k in enumerate(
        "n sum_y np p10 p20 p01 p02 p11 p21 p12 p22 x3 x4 w3 w4".split()
    )
}

AM_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("sensor_id", T.LongType()),
        T.StructField("n_pairs", T.LongType()),
        T.StructField("lm_stat", T.DoubleType()),
        T.StructField("arch_flag", T.BooleanType()),
    ]
)

AM_STATE_SCHEMA = T.StructType(
    [
        T.StructField("p_ts", T.ArrayType(T.LongType())),
        T.StructField("p_eid", T.ArrayType(T.LongType())),
        T.StructField("p_y", T.ArrayType(T.LongType())),
        T.StructField("moments", T.ArrayType(T.StringType())),
        T.StructField("last_y", T.LongType()),
        T.StructField("has_last", T.BooleanType()),
    ]
)


def arch_fold(moments: list, last_y, ys: list) -> tuple:
    """Fold finalized integer readings (event-time order) into the
    moment vector; returns (moments, new last_y). Shared by the stream
    twin and its tests."""
    m = list(moments)
    prev = last_y
    for y in ys:
        m[_IDX["n"]] += 1
        m[_IDX["sum_y"]] += y
        if prev is not None:
            m[_IDX["np"]] += 1
            m[_IDX["p10"]] += y
            m[_IDX["p20"]] += y * y
            m[_IDX["p01"]] += prev
            m[_IDX["p02"]] += prev * prev
            m[_IDX["p11"]] += y * prev
            m[_IDX["p21"]] += y * y * prev
            m[_IDX["p12"]] += y * prev * prev
            m[_IDX["p22"]] += y * y * prev * prev
            m[_IDX["x3"]] += y ** 3
            m[_IDX["x4"]] += y ** 4
            m[_IDX["w3"]] += prev ** 3
            m[_IDX["w4"]] += prev ** 4
        prev = y
    return m, prev


def arch_finish(moments: list):
    """(n_pairs, lm_stat, arch_flag) from the exact moment vector —
    the identical IEEE sequence as the batch operator's final select,
    after the exact binomial expansion around m = sum_y DIV n."""
    g = {k: moments[i] for k, i in _IDX.items()}
    np_ = g["np"]
    if np_ == 0:
        return 0, None, None
    # Truncate toward zero, matching Spark DECIMAL DIV and DuckDB //
    # (both of which give -7 DIV 2 = -3, while Python's // floors to
    # -4): the stream ≡ batch contract must hold for negative sums too.
    sum_y, n_obs = g["sum_y"], g["n"]
    m = sum_y // n_obs if sum_y >= 0 else -((-sum_y) // n_obs)
    sx = g["p20"] - 2 * m * g["p10"] + m * m * np_
    sy = g["p02"] - 2 * m * g["p01"] + m * m * np_
    sxy = (
        g["p22"]
        - 2 * m * (g["p21"] + g["p12"])
        + m * m * (g["p20"] + g["p02"] + 4 * g["p11"])
        - 2 * m ** 3 * (g["p10"] + g["p01"])
        + m ** 4 * np_
    )
    sxx = (
        g["x4"] - 4 * m * g["x3"] + 6 * m * m * g["p20"]
        - 4 * m ** 3 * g["p10"] + m ** 4 * np_
    )
    syy = (
        g["w4"] - 4 * m * g["w3"] + 6 * m * m * g["p02"]
        - 4 * m ** 3 * g["p01"] + m ** 4 * np_
    )
    n = float(np_)
    num = n * float(sxy) - float(sx) * float(sy)
    denx = n * float(sxx) - float(sx) * float(sx)
    deny = n * float(syy) - float(sy) * float(sy)
    if np_ >= ARCH_MIN_PAIRS and denx > 0 and deny > 0:
        lm = n * (num * num) / (denx * deny)
        return np_, pround_py(lm), bool(lm > ARCH_LM_CRIT)
    return np_, None, None


def _am_update(key, pdfs: Iterator, state: GroupState):
    import pandas as pd

    (sensor_id,) = key
    if state.exists:
        p_ts, p_eid, p_y, mom_s, last_y, has_last = state.get
        pend = list(zip(p_ts, p_eid, p_y))
        moments = [int(s) for s in mom_s]
    else:
        pend, moments = [], [0] * _NM
        last_y, has_last = 0, False
    if not state.hasTimedOut:
        for pdf in pdfs:
            for ts, eid, y in zip(pdf["ts"], pdf["event_id"], pdf["y"]):
                pend.append(
                    (int(pd.Timestamp(ts).value // 1000), int(eid), int(y))
                )
    wm_us = state.getCurrentWatermarkMs() * 1000
    final = sorted((e for e in pend if e[0] < wm_us), key=lambda e: (e[0], e[1]))
    pend = [e for e in pend if e[0] >= wm_us]
    moments, new_last = arch_fold(
        moments, last_y if has_last else None, [y for _, _, y in final]
    )
    if new_last is not None:
        last_y, has_last = new_last, True
    state.update(
        (
            [e[0] for e in pend],
            [e[1] for e in pend],
            [e[2] for e in pend],
            [str(v) for v in moments],
            last_y,
            has_last,
        )
    )
    if pend:
        state.setTimeoutTimestamp(
            max(min(e[0] for e in pend) // 1000 + 1,
                state.getCurrentWatermarkMs() + 1)
        )
    n_pairs, lm, flag = arch_finish(moments)
    if moments[_IDX["n"]] or pend:
        yield pd.DataFrame(
            {
                "sensor_id": [int(sensor_id)],
                "n_pairs": [n_pairs],
                "lm_stat": [lm],
                "arch_flag": [flag],
            }
        )


def arch_monitor_stream(
    stream: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Per-sensor running ARCH LM census (update mode) from a raw
    event stream; after a flush past every reading each sensor's row
    equals the batch ``arch_lm_test`` row."""
    from pyspark.sql import functions as F

    return (
        stream.select(
            F.col("user_id").alias("sensor_id"),
            "ts",
            "event_id",
            F.floor(F.col("value") * 100 + F.lit(0.5))
            .cast("long")
            .alias("y"),
        )
        .withWatermark("ts", watermark)
        .groupBy("sensor_id")
        .applyInPandasWithState(
            _am_update,
            outputStructType=AM_OUTPUT_SCHEMA,
            stateStructType=AM_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
