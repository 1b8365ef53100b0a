"""Streaming PSI drift monitor: windowed streaming counts + the shared
psi_finish must reproduce a batch PSI computation over the same windows
exactly, windows only finalize after the watermark passes, and a
planted distribution shift flags as 'shifted' while an in-distribution
window reads 'stable'."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from smart_city_data_pipeline_spark.operators.stats import (
    psi_finish,
    psi_value_bucket,
)
from smart_city_data_pipeline_spark.streaming.psi_monitor import (
    psi_from_counts,
    psi_reference_counts,
    psi_window_counts,
)

EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _ev(eid, day, hour, value, etype="click"):
    return (eid, datetime(2025, 6, day, hour), eid % 7, etype, value, "{}")


def _reference(spark):
    # reference: values spread across low buckets 0..3 (25-wide cents
    # buckets => values 5..95)
    rows = [_ev(i, 1, 0, 5.0 + (i % 4) * 25.0) for i in range(200)]
    return spark.createDataFrame(rows, EV_SCHEMA)


def test_streamed_psi_equals_batch_and_flags_shift(spark, tmp_path):
    edir = str(tmp_path / "ev")
    ref = _reference(spark)
    expected = psi_reference_counts(ref)

    # window 1 (days 8-14): in-distribution traffic; window 2 (days
    # 15-21): shifted to high buckets. day-22 event pushes the
    # watermark past both window ends.
    stream_rows = (
        [_ev(1000 + i, 8 + (i % 7), 1, 5.0 + (i % 4) * 25.0) for i in range(160)]
        + [_ev(2000 + i, 15 + (i % 7), 1, 305.0 + (i % 4) * 25.0) for i in range(160)]
        + [_ev(3000, 23, 1, 5.0)]
    )
    spark.createDataFrame(stream_rows, EV_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(edir)

    stream = spark.readStream.schema(EV_SCHEMA).parquet(edir)
    q = (
        psi_window_counts(stream, window="7 days", watermark="1 day")
        .writeStream.format("memory")
        .queryName("psi_counts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    actual = spark.table("psi_counts")

    got = {
        (r["window_start"], r["event_type"]): r
        for r in psi_from_counts(actual, expected).collect()
    }
    # the two monitored windows closed (day-23 row's window is still
    # open and absent from the append sink)
    assert len(got) == 2

    # exact equality with a fully-batch computation over the same
    # window expression and the same finisher
    batch_ev = spark.createDataFrame(stream_rows, EV_SCHEMA)
    batch_actual = (
        batch_ev.groupBy(
            F.window("ts", "7 days"),
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
        .join(
            actual.select("window_start").distinct(), "window_start"
        )  # restrict to the closed windows the stream emitted
    )
    want = {
        (r["window_start"], r["event_type"]): r
        for r in psi_from_counts(batch_actual, expected).collect()
    }
    assert {k: tuple(v) for k, v in got.items()} == {
        k: tuple(v) for k, v in want.items()
    }

    # verdicts: in-distribution window stable, shifted window shifted
    verdicts = sorted(
        (r["window_start"], r["stability"]) for r in got.values()
    )
    assert verdicts[0][1] == "stable"
    assert verdicts[1][1] == "shifted"
    # the shifted window's live buckets are absent from the reference
    shifted = [r for r in got.values() if r["stability"] == "shifted"][0]
    assert shifted["n_onesided"] > 0
