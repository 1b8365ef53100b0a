"""Streaming deduplication — exactly-once event-id dedup with bounded
state.

The reference's bridges redeliver on reconnect (MQTT QoS / Kafka
at-least-once), so the collectors see duplicate envelopes. Spark-first:
``dropDuplicatesWithinWatermark`` keys state by event_id and EXPIRES
entries once the watermark passes, so state is O(events per watermark
window), not O(stream history) — the property that keeps this running
forever at 100 TB/day.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_stream(stream: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Drop redelivered events (same event_id) within the watermark."""
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )
