"""Stream-stream joins with watermark-bounded state.

The reference's Flink job correlates camera detections with traffic
state per key; Spark-first this is a stream-stream inner join with an
event-time range condition. BOTH sides carry watermarks, and the range
predicate (`e.ts BETWEEN v.ts AND v.ts + window`) lets Spark compute
exactly how long each side's rows must be retained — state is
O(watermark window), not O(stream), which is what keeps a correlation
join running forever at production volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def correlate_streams(
    left: DataFrame,
    right: DataFrame,
    window: str = "10 minutes",
    watermark: str = "20 minutes",
) -> DataFrame:
    """Pair each left event with right events of the same sensor whose
    timestamp falls in [left.ts, left.ts + window]."""
    l = (
        left.select(
            F.col("user_id").alias("l_user"),
            F.col("ts").alias("l_ts"),
            F.col("event_id").alias("l_event_id"),
        )
        .withWatermark("l_ts", watermark)
    )
    r = (
        right.select(
            F.col("user_id").alias("r_user"),
            F.col("ts").alias("r_ts"),
            F.col("value").alias("r_value"),
        )
        .withWatermark("r_ts", watermark)
    )
    return l.join(
        r,
        (F.col("l_user") == F.col("r_user"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {window}")),
    ).select("l_user", "l_event_id", "l_ts", "r_ts", "r_value")


def batch_equivalent_correlate(left: DataFrame, right: DataFrame, window: str = "10 minutes") -> DataFrame:
    """The same correlation in batch — the streaming test's oracle."""
    l = left.select(
        F.col("user_id").alias("l_user"),
        F.col("ts").alias("l_ts"),
        F.col("event_id").alias("l_event_id"),
    )
    r = right.select(
        F.col("user_id").alias("r_user"),
        F.col("ts").alias("r_ts"),
        F.col("value").alias("r_value"),
    )
    return l.join(
        r,
        (F.col("l_user") == F.col("r_user"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {window}")),
    ).select("l_user", "l_event_id", "l_ts", "r_ts", "r_value")
