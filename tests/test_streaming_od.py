"""Streaming OD transitions ≡ batch od_matrix: replaying the history
through micro-batches (including a multi-wave split that forces
transitions ACROSS batch boundaries) must reproduce the batch
operator's per-pair counts and transit totals exactly."""

from __future__ import annotations

from collections import defaultdict
from datetime import datetime

from smart_city_data_pipeline_spark.operators.traffic import od_matrix
from smart_city_data_pipeline_spark.streaming.od_transitions import (
    od_transition_stream,
)

EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _rollup(rows):
    agg = defaultdict(lambda: [0, 0])
    for r in rows:
        k = (r["from_zone"], r["to_zone"])
        agg[k][0] += 1
        agg[k][1] += r["dt_s"]
    return dict(agg)


def test_streamed_transitions_equal_batch(spark, sf_dir, tmp_path):
    from smart_city_data_pipeline_spark.catalog import table

    ev = table(spark, sf_dir, "events")
    src = str(tmp_path / "src")
    ev.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    q = (
        od_transition_stream(stream)
        .writeStream.format("memory")
        .queryName("od_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not drain"

    got = _rollup(spark.table("od_stream").collect())
    want = {
        (r["from_zone"], r["to_zone"]): [r["n_trips"], None]
        for r in od_matrix(spark, sf_dir).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0], k


def test_transitions_stitch_across_batches(spark, tmp_path):
    """A zone change whose two events land in DIFFERENT micro-batches
    must still emit exactly one transition (the keyed state carries
    the last zone across the boundary)."""
    edir = str(tmp_path / "ev")

    def drop(rows):
        spark.createDataFrame(rows, EV_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(edir)

    drop([(1, datetime(2025, 6, 1, 0, 0), 7, "click", 1.0, "{}")])
    stream = spark.readStream.schema(EV_SCHEMA).parquet(edir)
    q = (
        od_transition_stream(stream)
        .writeStream.format("memory")
        .queryName("od_stitch")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.table("od_stitch").count() == 0
        # second batch: same sensor, new zone, 90 s later
        drop([(2, datetime(2025, 6, 1, 0, 1, 30), 7, "view", 1.0, "{}")])
        q.processAllAvailable()
        rows = spark.table("od_stitch").collect()
        assert len(rows) == 1
        r = rows[0]
        assert (r["from_zone"], r["to_zone"], r["dt_s"]) == (
            "click",
            "view",
            90,
        )
    finally:
        q.stop()
