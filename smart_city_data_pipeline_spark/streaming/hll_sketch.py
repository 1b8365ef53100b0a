"""Streaming distinct-count maintenance via HLL register merge —
the sketch that makes "distinct sensors, continuously" possible at
all: exact streaming COUNT(DISTINCT) needs state proportional to the
number of distinct keys (unbounded), while the HLL register file is a
fixed m×|vocab| cells whatever the stream volume.

Stream ≡ batch is EXACT at the REGISTER level, not approximately: the
register-update rows come from the SAME ``hll_rho_rows`` construction
the batch operators use (operators/traffic.py — shared code, the paths
cannot drift), registers MAX-merge per micro-batch (the monoid that
made ``hll_merge_audit``'s shard proof pass), and the pytest asserts
integer register equality against a one-shot batch computation over
the full stream, plus estimate equality against
``hll_distinct_report``. Batch-id bookkeeping makes crash-replayed
micro-batches idempotent (the ``cont_agg`` discipline).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from smart_city_data_pipeline_spark.functions.rounding import pround
from smart_city_data_pipeline_spark.operators.traffic import (
    HLL_ALPHA,
    HLL_M,
    hll_rho_rows,
)
from smart_city_data_pipeline_spark.streaming.warehouse_sink import (
    stream_to_warehouse,
)


def merge_hll_registers(path: str, batch_df: DataFrame, batch_id: int) -> None:
    """Idempotent read-merge-swap of one micro-batch's registers into
    the JSON register sidecar. The collect is bounded by m×|vocab|
    cells (64×5 here) — never by batch size; the heavy lifting (the
    per-batch MAX aggregate) runs distributed."""
    state: dict = {"regs": {}, "last_batch_id": -1}
    if os.path.exists(path):
        with open(path) as fh:
            state = json.load(fh)
        if batch_id <= state["last_batch_id"]:
            return  # crash-replay of an already-merged batch
    rows = (
        hll_rho_rows(batch_df)
        .groupBy("event_type", "idx")
        .agg(F.max("rho").alias("m_j"))
        .collect()
    )
    regs = state["regs"]
    for r in rows:
        key = f"{r['event_type']}:{r['idx']}"
        if r["m_j"] > regs.get(key, 0):
            regs[key] = r["m_j"]
    state["last_batch_id"] = batch_id
    tmp = path + "._tmp"
    with open(tmp, "w") as fh:
        json.dump(state, fh)
    os.replace(tmp, path)  # atomic swap


def continuous_hll(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Maintain the HLL register sidecar from an event stream."""
    return stream_to_warehouse(
        stream,
        lambda df, bid: merge_hll_registers(path, df, bid),
        checkpoint,
        available_now,
    )


def read_hll_registers(spark: SparkSession, path: str) -> DataFrame:
    """The maintained registers as (event_type, idx, m_j) rows."""
    with open(path) as fh:
        state = json.load(fh)
    rows = [
        (key.rsplit(":", 1)[0], int(key.rsplit(":", 1)[1]), int(m))
        for key, m in state["regs"].items()
    ]
    return spark.createDataFrame(rows, "event_type string, idx long, m_j long")


def read_hll_estimate(spark: SparkSession, path: str) -> DataFrame:
    """On-read finisher: the raw Flajolet estimate per event type from
    the maintained registers — the same BIGINT-harmonic-sum expression
    the batch report uses, evaluated over the sidecar rows."""
    regs = read_hll_registers(spark, path)
    per_type = regs.groupBy("event_type").agg(
        F.max("m_j").alias("m_max"),
        F.count(F.lit(1)).alias("n_filled"),
        F.collect_list("m_j").alias("ms"),
    )
    pow2 = lambda e: F.pow(F.lit(2.0), e.cast("double")).cast("long")  # noqa: E731
    ssum = F.aggregate(
        F.col("ms"),
        F.lit(0).cast("long"),
        lambda acc, m: acc + pow2(F.col("m_max") - m),
    ) + (F.lit(HLL_M) - F.col("n_filled")).cast("long") * pow2(F.col("m_max"))
    est = F.lit(HLL_ALPHA * HLL_M * HLL_M) * F.pow(
        F.lit(2.0), F.col("m_max").cast("double")
    ) / F.col("s").cast("double")
    return (
        per_type.withColumn("s", ssum)
        .select(
            "event_type",
            (F.lit(HLL_M) - F.col("n_filled")).cast("long").alias("v_zero"),
            pround(est).alias("hll_estimate"),
        )
    )
