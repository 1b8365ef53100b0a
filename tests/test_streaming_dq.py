"""Streaming DQ monitor: windowed violation counts equal the batch
rule recomputation, and windows only finalize after the watermark
passes (append-mode contract)."""

from __future__ import annotations

import json
from datetime import datetime

from smart_city_data_pipeline_spark.streaming.dq_monitor import (
    dq_monitor_stream,
)

EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)
REG_SCHEMA = "s_suppkey long"


def _t(h, m=0):
    return datetime(2025, 6, 1, h, m)


def _ev(eid, ts, uid, etype="click", value=10.0, k=5):
    return (eid, ts, uid, etype, value, json.dumps({"k": k}))


def test_dq_monitor_counts_match_batch_rules(spark, tmp_path):
    edir = str(tmp_path / "ev")
    registry = spark.createDataFrame([(1,), (2,)], REG_SCHEMA)

    # phase 1 — one 10-min window [00:00, 00:10) with known violations:
    # e2 over-range value, e3 bad type, e4 unregistered sensor, e5 bad k
    phase1 = [
        _ev(1, _t(0, 1), 1),
        _ev(2, _t(0, 2), 1, value=999.0),
        _ev(3, _t(0, 3), 2, etype="error"),
        _ev(4, _t(0, 4), 77),
        _ev(5, _t(0, 5), 2, k=99),
    ]
    spark.createDataFrame(phase1, EV_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(edir)

    stream = spark.readStream.schema(EV_SCHEMA).parquet(edir)
    q = (
        dq_monitor_stream(stream, registry)
        .writeStream.format("memory")
        .queryName("dq_monitor")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # watermark has not passed 00:10 — window must not be final yet
        assert spark.table("dq_monitor").count() == 0

        # phase 2: far-future clean row advances the watermark
        spark.createDataFrame(
            [_ev(99, _t(2, 0), 1)], EV_SCHEMA
        ).coalesce(1).write.mode("append").parquet(edir)
        q.processAllAvailable()
        rows = spark.table("dq_monitor").collect()
    finally:
        q.stop()

    assert len(rows) == 1  # the 2:00 window is still open
    w = rows[0]
    assert w["window_start"] == _t(0, 0) and w["window_end"] == _t(0, 10)
    assert w["n_rows"] == 5
    assert w["v_event_id_not_null"] == 0
    assert w["v_ts_in_range"] == 0
    assert w["v_value_non_negative"] == 0
    assert w["v_value_below_250"] == 1  # e2
    assert w["v_event_type_allowed"] == 1  # e3
    assert w["v_sensor_registered"] == 1  # e4
    assert w["v_props_k_below_64"] == 1  # e5


def test_dq_monitor_is_stateless_beyond_windows(spark, tmp_path):
    """The only stateful operator is the windowed aggregate (plus the
    watermark) — the registry join must plan as stream-static with no
    join state."""
    edir = str(tmp_path / "ev")
    spark.createDataFrame([_ev(1, _t(0, 1), 1)], EV_SCHEMA).coalesce(
        1
    ).write.mode("append").parquet(edir)
    registry = spark.createDataFrame([(1,)], REG_SCHEMA)
    stream = spark.readStream.schema(EV_SCHEMA).parquet(edir)
    q = (
        dq_monitor_stream(stream, registry)
        .writeStream.format("memory")
        .queryName("dq_monitor_state")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        ops = q.lastProgress["stateOperators"]
        assert len(ops) == 1  # the aggregate; no stream-stream join op
    finally:
        q.stop()
