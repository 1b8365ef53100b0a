"""Streaming data-quality monitor.

The batch expectation suite (operators/quality.py) gates bronze→silver
promotions; this is the same rule set run CONTINUOUSLY — per event-time
window, how many rows violated each rule — so a collector regression
(reference: `pipline2/load/streaming_data_collector.py` trusts its
input blindly) pages within a watermark delay instead of at the next
batch audit.

Spark-first shape: a stream-static join against the registry (the
static side is planned per micro-batch; no stream state), then ONE
windowed aggregate whose violation counters are the SAME conditional
sums the batch suite uses — rules are defined once
(quality.row_rule_conditions) and imported here, so batch gate and
live monitor can never drift apart. State is one row per window per
aggregate — O(windows in watermark), independent of stream volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from smart_city_data_pipeline_spark.operators.quality import (
    row_rule_conditions,
)


def dq_monitor_stream(
    events: DataFrame,
    registry: DataFrame,
    window: str = "10 minutes",
    watermark: str = "20 minutes",
) -> DataFrame:
    """Windowed violation counts per rule over an event stream.

    ``events``: streaming DataFrame with the events schema.
    ``registry``: STATIC registry dimension (s_suppkey key).
    Emits one row per closed window: window bounds, rows checked, and
    one ``v_<rule>`` counter per row-local rule (append mode — rows
    finalize when the watermark passes the window end)."""
    reg = registry.select(F.col("s_suppkey").alias("reg_key"))
    j = events.withWatermark("ts", watermark).join(
        F.broadcast(reg), events["user_id"] == reg["reg_key"], "left"
    )

    def viol(cond) -> F.Column:
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long")

    return j.groupBy(F.window("ts", window)).agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[
            viol(cond).alias(f"v_{rule}")
            for rule, cond in row_rule_conditions()
        ],
    ).select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        "n_rows",
        *[f"v_{rule}" for rule, _ in row_rule_conditions()],
    )
