"""Streaming NowCast ≡ batch aqi_nowcast: per-hour accumulators are
commutative monoids and the trailing-window prune is anchor-monotone,
so replaying the corpus NEWEST-FIRST in 3 waves (the adversarial
delivery order) must land on the batch operator's exact integers."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from smart_city_data_pipeline_spark.operators.traffic import aqi_nowcast
from smart_city_data_pipeline_spark.streaming.nowcast import nowcast_stream

EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def test_streamed_nowcast_equals_batch(spark, sf_dir, tmp_path):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id,"
        f" event_type, value, props"
        f" FROM read_parquet('{sf_dir}/events.parquet')"
        f" ORDER BY ts DESC, event_id DESC"  # newest first, on purpose
    ).fetchall()
    sdir = str(tmp_path / "ev_stream")
    third = len(rows) // 3
    waves = [rows[:third], rows[third : 2 * third], rows[2 * third :]]
    for wave in waves:
        spark.createDataFrame(wave, EV_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(sdir)
    q = (
        nowcast_stream(
            spark.readStream.schema(EV_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(sdir)
        )
        .writeStream.format("memory")
        .queryName("nc_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not drain"
    sink = spark.table("nc_stream")
    n_sensors = len({r[2] for r in rows})
    assert sink.count() > n_sensors  # multiple batches really ran

    # n_seen is monotone per sensor, so latest = max struct.
    latest = (
        sink.groupBy("sensor_id")
        .agg(
            F.max(
                F.struct(
                    "n_seen",
                    "n_hours",
                    "wq",
                    "eligible",
                    "nowcast_pm25",
                    "nowcast_aqi",
                    "nowcast_category",
                )
            ).alias("s")
        )
        .select("sensor_id", "s.*")
    )
    got = {r["sensor_id"]: r for r in latest.collect()}
    want = {r["sensor_id"]: r for r in aqi_nowcast(spark, sf_dir).collect()}
    assert set(got) == set(want)
    for sid, w in want.items():
        g = got[sid]
        for col in (
            "n_hours",
            "wq",
            "eligible",
            "nowcast_pm25",
            "nowcast_aqi",
            "nowcast_category",
        ):
            assert g[col] == w[col], (sid, col, g[col], w[col])
