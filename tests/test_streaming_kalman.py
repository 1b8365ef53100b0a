"""Streaming Kalman state ≡ batch replay, integer for integer, across
time-ordered micro-batch waves (the shared-kalman_step contract)."""

from __future__ import annotations

import duckdb

from pyspark.sql import functions as F

from smart_city_data_pipeline_spark.operators.timeseries import (
    KAL_G,
    kalman_level_filter,
)
from smart_city_data_pipeline_spark.streaming.kalman_stream import (
    kalman_stream,
)

EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def test_streaming_kalman_equals_batch(spark, sf_dir, tmp_path):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id,"
        f" event_type, value, props"
        f" FROM read_parquet('{sf_dir}/events.parquet') ORDER BY ts, event_id"
    ).fetchall()
    sdir = str(tmp_path / "ev_stream")

    third = len(rows) // 3
    waves = [rows[:third], rows[third : 2 * third], rows[2 * third :]]
    for wave in waves:
        spark.createDataFrame(wave, EV_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(sdir)
    q = (
        kalman_stream(
            spark.readStream.schema(EV_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(sdir)
        )
        .writeStream.format("memory")
        .queryName("kal_state")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n_sensors = len({r[2] for r in rows})
    assert spark.table("kal_state").count() > n_sensors  # multiple batches

    latest = (
        spark.table("kal_state")
        .groupBy("sensor_id")
        .agg(F.max(F.struct("n_points", "xq", "pq", "sum_abs_innov")).alias("s"))
        .select("sensor_id", "s.*")
        .collect()
    )
    got = {
        r["sensor_id"]: (r["n_points"], r["xq"], r["pq"], r["sum_abs_innov"])
        for r in latest
    }

    batch = {
        r["sensor_id"]: r
        for r in kalman_level_filter(spark, sf_dir).collect()
    }
    assert set(got) == set(batch)
    for sid, (n, xq, pq, sai) in got.items():
        b = batch[sid]
        assert n == b["n_points"], sid
        # batch reports pround(xq/G/100); reconstruct from raw state
        import math

        assert b["final_level"] == math.floor(
            xq / KAL_G / 100.0 * 10000.0 + 0.5
        ) / 10000.0, sid
        assert b["final_variance"] == math.floor(
            pq / KAL_G / 10000.0 * 10000.0 + 0.5
        ) / 10000.0, sid
        if n > 1:
            assert b["mean_abs_innovation"] == math.floor(
                sai / (n - 1) / KAL_G / 100.0 * 10000.0 + 0.5
            ) / 10000.0, sid
