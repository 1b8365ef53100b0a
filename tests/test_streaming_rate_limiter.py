"""Streaming token-bucket enforcement ≡ batch rate_limit_audit, integer
for integer, across time-ordered micro-batch waves."""

from __future__ import annotations

import duckdb

from pyspark.sql import functions as F

from smart_city_data_pipeline_spark.operators.timeseries import (
    rate_limit_audit,
)
from smart_city_data_pipeline_spark.streaming.rate_limiter import (
    rate_limiter_stream,
)

EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def test_streaming_totals_equal_batch(spark, sf_dir, tmp_path):
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
    # one query, one file per micro-batch: keyed state carries across
    # the three time-ordered waves (the memory sink cannot recover
    # from a checkpoint, so restart-per-wave is not an option here —
    # maxFilesPerTrigger gives the same batch boundaries in one run).
    q = (
        rate_limiter_stream(
            spark.readStream.schema(EV_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(sdir)
        )
        .writeStream.format("memory")
        .queryName("rl_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n_rows = spark.table("rl_totals").count()
    n_sensors = len({r[2] for r in rows})
    assert n_rows > n_sensors  # > one row per sensor => multiple batches ran

    # update-mode sink holds one row per (sensor, batch); the running
    # totals are monotone, so the latest = max n_events per sensor.
    latest = (
        spark.table("rl_totals")
        .groupBy("sensor_id")
        .agg(
            F.max(
                F.struct(
                    "n_events", "n_accepted", "n_dropped", "first_drop_id"
                )
            ).alias("s")
        )
        .select("sensor_id", "s.*")
        .collect()
    )
    got = {r["sensor_id"]: tuple(r)[1:] for r in latest}
    want = {
        r["sensor_id"]: (
            r["n_events"],
            r["n_accepted"],
            r["n_dropped"],
            r["first_drop_id"],
        )
        for r in rate_limit_audit(spark, sf_dir).collect()
    }
    assert got == want
