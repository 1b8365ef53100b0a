"""Windowed streaming aggregates with watermarks.

Re-expresses the reference's streaming rollups — the Flink vision job's
windowed per-camera counts (``pipline2/data-proccessor/stream/
flink_vision_job_proper.py``) and TimescaleDB's 1-minute continuous
aggregates (``init-timescaledb.sql:50``) — as Structured Streaming
window aggregations.

Scale notes: watermark bounds state (late rows beyond the watermark are
dropped, so state size is O(active windows × keys), not O(history));
the aggregation itself is the same map-side-combinable hash aggregate
as batch. ``trigger(availableNow=True)`` gives exactly-once batch-like
draining for tests and backfills; in production the same query runs
continuously with a processing-time trigger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_zone_counts(
    stream: DataFrame,
    window_duration: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Per-zone tumbling-window count/avg — the 1-min continuous aggregate."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_duration), F.col("event_type").alias("zone"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.avg("value").alias("avg_value"),
        )
        .select(
            F.col("window.start").alias("bucket"),
            "zone",
            "n_events",
            "avg_value",
        )
    )


def batch_equivalent_zone_counts(df: DataFrame, window_duration: str = "1 minute") -> DataFrame:
    """The same rollup expressed in batch — the streaming test's oracle."""
    return (
        df.groupBy(F.window("ts", window_duration), F.col("event_type").alias("zone"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.avg("value").alias("avg_value"),
        )
        .select(F.col("window.start").alias("bucket"), "zone", "n_events", "avg_value")
    )
