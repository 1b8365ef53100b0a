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


def correlate_streams_outer(
    left: DataFrame,
    right: DataFrame,
    window: str = "10 minutes",
    watermark: str = "20 minutes",
) -> DataFrame:
    """LEFT OUTER stream-stream correlation: like
    :func:`correlate_streams`, but a left event that finds no right
    match is still emitted — with NULL right columns — once the
    watermark guarantees no match can arrive anymore.

    This is the semantically hard streaming-join class: the no-match
    row must be emitted EXACTLY ONCE, and only when the GLOBAL
    watermark (the min across both inputs' event-time watermarks)
    passes ``l_ts + window`` and evicts the left row from state. Until
    then the row waits in state; Spark can only prove "no match" at
    eviction time. Same bounded-state story as the inner form — the
    range condition sizes retention to O(window + watermark) — plus
    the null-emission contract pytest-asserted phase by phase
    (tests/test_streaming.py): no null row before the watermark
    passes, exactly one after, matched subset ≡ the batch inner join.
    """
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
        "left_outer",
    ).select("l_user", "l_event_id", "l_ts", "r_ts", "r_value")


def correlate_streams_full_outer(
    left: DataFrame,
    right: DataFrame,
    window: str = "10 minutes",
    watermark: str = "20 minutes",
) -> DataFrame:
    """FULL OUTER stream-stream correlation — completes the join-class
    matrix next to :func:`correlate_streams` (inner) and
    :func:`correlate_streams_outer` (left): no-match rows from BOTH
    sides are emitted null-padded, each exactly once, when the global
    watermark evicts them from state.

    Eviction timing differs per side: a left row can be declared
    matchless once the watermark passes ``l_ts + window`` (no right
    row in its forward window can still arrive); a right row once the
    watermark passes ``r_ts`` itself plus the left-retention bound
    Spark derives from the range condition (a matching left row must
    satisfy ``l_ts >= r_ts - window``). State stays O(window +
    watermark) on both sides. The right-outer variant is this join
    with the left side's null rows filtered — Spark accepts
    ``right_outer`` directly, but full-outer exercises both eviction
    paths at once, which is what the phased pytest pins
    (tests/test_stream_outer_join.py::test_full_outer_*).
    """
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
        "full_outer",
    ).select(
        "l_user", "l_event_id", "l_ts", "r_user", "r_ts", "r_value"
    )


def correlate_streams_right_outer(
    left: DataFrame,
    right: DataFrame,
    window: str = "10 minutes",
    watermark: str = "20 minutes",
) -> DataFrame:
    """RIGHT OUTER stream-stream correlation — the last cell of the
    join-class matrix (inner / left / full / right): a right event
    with no left partner in its backward window ``[r_ts − window,
    r_ts]`` is emitted null-padded exactly once at eviction. The
    mirror of :func:`correlate_streams_outer`'s contract with the
    eviction clock on the RIGHT row: Spark can prove "no left match"
    once the global watermark passes ``r_ts`` plus the left-retention
    bound derived from the range condition. State stays O(window +
    watermark) on both sides; the null-emission contract is pinned
    phase by phase in tests/test_stream_outer_join.py::
    test_right_outer_emits_right_nulls_exactly_once."""
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
        "right_outer",
    ).select(
        "l_user", "l_event_id", "l_ts", "r_user", "r_ts", "r_value"
    )


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
