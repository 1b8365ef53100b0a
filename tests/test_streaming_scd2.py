"""Streaming SCD2 maintenance: micro-batch waves folded through
``scd2_merge`` must reproduce the one-shot batch dimension EXACTLY,
and a crash-replayed batch must be idempotent (the consecutive-
identical collapse absorbs re-delivered change rows — no batch-id
sidecar)."""

from __future__ import annotations

import duckdb

from smart_city_data_pipeline_spark.operators.lakehouse import scd2_dim
from smart_city_data_pipeline_spark.streaming.scd2_sink import (
    continuous_scd2_dim,
    merge_scd2_micro_batch,
)

EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _events(sf_dir):
    con = duckdb.connect()
    return con.execute(
        f"SELECT event_id, ts, user_id, event_type, value, props "
        f"FROM read_parquet('{sf_dir}/events.parquet') ORDER BY ts, event_id"
    ).fetchall()


def _norm(df):
    return sorted(
        (
            r["entity_id"],
            r["attr_value"],
            str(r["valid_from"]),
            str(r["valid_to"]),
            r["is_current"],
            r["version"],
        )
        for r in df.collect()
    )


def test_streamed_waves_equal_batch_dim(spark, sf_dir, tmp_path):
    rows = _events(sf_dir)
    sdir = str(tmp_path / "chg_stream")
    dim_path = str(tmp_path / "scd2_dim")

    third = len(rows) // 3
    waves = [rows[:third], rows[third : 2 * third], rows[2 * third :]]
    for wave in waves:
        spark.createDataFrame(wave, EV_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(sdir)
        q = continuous_scd2_dim(
            spark.readStream.schema(EV_SCHEMA).parquet(sdir),
            dim_path,
            str(tmp_path / "ckpt"),
        )
        assert q.awaitTermination(120), "stream did not drain in time"

    got = _norm(spark.read.parquet(dim_path))
    want = _norm(scd2_dim(spark, sf_dir))
    assert got == want
    # the historized shape is real: some entity has more than one version
    assert any(v[5] > 1 for v in got)


def test_replayed_batch_is_idempotent(spark, sf_dir, tmp_path):
    rows = _events(sf_dir)
    half = len(rows) // 2
    dim_path = str(tmp_path / "dim")
    first = spark.createDataFrame(rows[:half], EV_SCHEMA)
    second = spark.createDataFrame(rows[half:], EV_SCHEMA)
    merge_scd2_micro_batch(spark, dim_path, first)
    merge_scd2_micro_batch(spark, dim_path, second)
    once = _norm(spark.read.parquet(dim_path))
    merge_scd2_micro_batch(spark, dim_path, second)  # crash replay
    twice = _norm(spark.read.parquet(dim_path))
    assert once == twice
