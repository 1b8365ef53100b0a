"""Streaming SESSION windows (gap-based) as a native windowed aggregate.

The batch ``sessionize`` operator (operators/timeseries.py) assigns
session ids with a lag/cumsum window; streaming can't look back over
history, so the Spark-native form is ``F.session_window`` — a dynamic-
gap window that the engine merges as events arrive, matching the Flink
tracker's session semantics (``flink_vision_job_proper.py:35``).

Scale notes: session state is per ACTIVE (key, open-session) only —
the watermark finalizes sessions whose gap has provably expired and
evicts them, so state is O(active keys), never O(history). Merging
sessions across micro-batches is engine-managed state-store work, not a
shuffle of history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SESSION_GAP = "30 minutes"


def session_stats(
    stream: DataFrame,
    gap: str = SESSION_GAP,
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-user session rollup: bounds, event count, value total."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.col("user_id"), F.session_window("ts", gap))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def batch_equivalent_sessions(df: DataFrame, gap: str = SESSION_GAP) -> DataFrame:
    """The same rollup in batch (session_window works on static frames)
    — the streaming test's oracle."""
    return (
        df.groupBy(F.col("user_id"), F.session_window("ts", gap))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


# Dynamic per-row gap: interactive zones close sessions quickly, error
# streams idle longer before the session is considered over — the
# expression-valued session_window gap (Spark 3.2+), which a fixed-gap
# formulation can only approximate with the worst-case gap (inflating
# state retention for EVERY key).
DYNAMIC_GAPS = {"error": "45 minutes", "purchase": "10 minutes"}
DYNAMIC_GAP_DEFAULT = "30 minutes"


def dynamic_gap() -> F.Column:
    gap = F.lit(DYNAMIC_GAP_DEFAULT)
    for etype, g in DYNAMIC_GAPS.items():
        gap = F.when(F.col("event_type") == etype, F.lit(g)).otherwise(gap)
    return gap


def session_stats_dynamic(
    stream: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Per-(user, event_type) session rollup with a PER-ROW gap
    expression — state eviction follows each type's own idle budget."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(
            F.col("user_id"),
            F.col("event_type"),
            F.session_window("ts", dynamic_gap()),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            "event_type",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


def batch_equivalent_sessions_dynamic(df: DataFrame) -> DataFrame:
    """Batch twin of the dynamic-gap rollup (the streaming test's
    oracle)."""
    return (
        df.groupBy(
            F.col("user_id"),
            F.col("event_type"),
            F.session_window("ts", dynamic_gap()),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            "event_type",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )
