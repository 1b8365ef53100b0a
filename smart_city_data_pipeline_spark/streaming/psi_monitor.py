"""Streaming PSI drift monitor — the batch ``psi_drift_report`` run
continuously: per event-time window, the population-stability index of
the live value distribution against a STATIC reference histogram (the
trained-model input distribution), so a drifting sensor mix pages
within a watermark delay instead of at the next batch audit.

Spark-first shape: the stream side is ONE windowed count aggregate
(state = open windows × buckets, independent of volume); the reference
is a static bucket histogram planned per micro-batch; PSI itself runs
ON READ over the windowed-count sink through the SAME ``psi_finish``
the batch operator uses (shared code — monitor and report cannot
drift; the ``quality.row_rule_conditions`` / ``hll_rho_rows``
discipline), with the same bucket key (``psi_value_bucket``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from smart_city_data_pipeline_spark.operators.stats import (
    psi_finish,
    psi_value_bucket,
)


def psi_reference_counts(events: DataFrame) -> DataFrame:
    """Static reference histogram: (event_type, bucket, ce)."""
    return (
        events.select("event_type", psi_value_bucket().alias("bucket"))
        .groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).alias("ce"))
    )


def psi_window_counts(
    events: DataFrame, window: str = "7 days", watermark: str = "1 day"
) -> DataFrame:
    """Streaming leg: windowed (event_type, bucket) counts, append mode
    (rows finalize when the watermark passes the window end)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", window),
            "event_type",
            psi_value_bucket().alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("ca"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "bucket",
            "ca",
        )
    )


def psi_from_counts(actual: DataFrame, expected: DataFrame) -> DataFrame:
    """On-read finisher: densify the reference over every observed
    (window, event_type) — so a reference bucket with no live traffic
    in SOME window still counts as one-sided in THAT window — then
    full-outer-align the actual counts and run the SHARED batch
    finisher keyed by (window_start, event_type)."""
    wins = actual.select(
        F.col("window_start").alias("e_ws"),
        F.col("event_type").alias("e_et"),
    ).distinct()
    dense_exp = wins.join(
        expected.select(
            F.col("event_type").alias("e_et"),
            F.col("bucket").alias("e_bucket"),
            "ce",
        ),
        "e_et",
    )
    d, a = dense_exp.alias("d"), actual.alias("a")
    joined = d.join(
        a,
        (F.col("d.e_ws") == F.col("a.window_start"))
        & (F.col("d.e_et") == F.col("a.event_type"))
        & (F.col("d.e_bucket") == F.col("a.bucket")),
        "full_outer",
    ).select(
        F.coalesce(F.col("d.e_ws"), F.col("a.window_start")).alias(
            "window_start"
        ),
        F.coalesce(F.col("d.e_et"), F.col("a.event_type")).alias(
            "event_type"
        ),
        F.coalesce(F.col("d.e_bucket"), F.col("a.bucket")).alias("bucket"),
        F.coalesce(F.col("d.ce"), F.lit(0)).alias("ce"),
        F.coalesce(F.col("a.ca"), F.lit(0)).alias("ca"),
    )
    return psi_finish(joined, ["window_start", "event_type"])
