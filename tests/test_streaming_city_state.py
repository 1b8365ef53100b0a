"""Streaming latest-city-state ≡ batch per-zone argmax, integer for
integer, across micro-batch waves — delivered OUT of time order on
purpose: the max-(us, event_id) update rule is commutative/idempotent,
so unlike the rate limiter there is no in-order contract to honor."""

from __future__ import annotations

import duckdb

from pyspark.sql import functions as F

from smart_city_data_pipeline_spark.streaming.city_state import (
    city_state_stream,
)

EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def test_streaming_state_equals_batch_argmax(spark, sf_dir, tmp_path):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id,"
        f" event_type, value, props"
        f" FROM read_parquet('{sf_dir}/events.parquet')"
        f" ORDER BY ts DESC, event_id DESC"  # REVERSE order: newest first
    ).fetchall()
    sdir = str(tmp_path / "ev_stream")

    third = len(rows) // 3
    waves = [rows[:third], rows[third : 2 * third], rows[2 * third :]]
    for wave in waves:
        spark.createDataFrame(wave, EV_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(sdir)
    q = (
        city_state_stream(
            spark.readStream.schema(EV_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(sdir)
        )
        .writeStream.format("memory")
        .queryName("cs_state")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n_zones = len({r[3] for r in rows})
    assert spark.table("cs_state").count() > n_zones  # multiple batches ran

    # update-mode sink holds one row per (zone, batch); last_us/eid are
    # monotone under the max rule, so latest = max struct per zone.
    latest = (
        spark.table("cs_state")
        .groupBy("zone")
        .agg(
            F.max(
                F.struct("last_us", "last_event_id", "last_value")
            ).alias("s")
        )
        .select("zone", "s.*")
        .collect()
    )
    got = {
        r["zone"]: (r["last_us"], r["last_event_id"], r["last_value"])
        for r in latest
    }

    want_rows = con.execute(
        f"""
        SELECT event_type AS zone, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
               event_id, value
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY event_type
                ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
            FROM read_parquet('{sf_dir}/events.parquet')
        ) WHERE rn = 1
        """
    ).fetchall()
    want = {z: (us, eid, val) for z, us, eid, val in want_rows}
    assert set(got) == set(want)
    for z in want:
        assert got[z][0] == want[z][0], z
        assert got[z][1] == want[z][1], z
        assert got[z][2] == want[z][2], z
