"""Streaming HLL distinct maintenance: register merge over micro-batch
waves must reproduce the one-shot batch registers EXACTLY (integer
MAX monoid + shared hll_rho_rows ⇒ cell-for-cell equality), the
estimate must match hll_distinct_report, and crash-replayed batches
must be idempotent."""

from __future__ import annotations

import duckdb

from pyspark.sql import functions as F

from smart_city_data_pipeline_spark.operators.traffic import (
    hll_distinct_report,
    hll_rho_rows,
)
from smart_city_data_pipeline_spark.streaming.hll_sketch import (
    continuous_hll,
    merge_hll_registers,
    read_hll_estimate,
    read_hll_registers,
)

EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _events(sf_dir):
    con = duckdb.connect()
    return con.execute(
        f"SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type,"
        f" value, props"
        f" FROM read_parquet('{sf_dir}/events.parquet') ORDER BY event_id"
    ).fetchall()


def test_streamed_registers_equal_batch(spark, sf_dir, tmp_path):
    rows = _events(sf_dir)
    sdir = str(tmp_path / "ev_stream")
    regpath = str(tmp_path / "hll_regs.json")

    third = len(rows) // 3
    waves = [rows[:third], rows[third : 2 * third], rows[2 * third :]]
    for wave in waves:
        spark.createDataFrame(wave, EV_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(sdir)
        q = continuous_hll(
            spark.readStream.schema(EV_SCHEMA).parquet(sdir),
            regpath,
            str(tmp_path / "ckpt"),
        )
        q.awaitTermination()

    # register-level exactness vs one-shot batch over the union
    batch = {
        (r["event_type"], r["idx"]): r["m_j"]
        for r in hll_rho_rows(spark.createDataFrame(rows, EV_SCHEMA))
        .groupBy("event_type", "idx")
        .agg(F.max("rho").alias("m_j"))
        .collect()
    }
    streamed = {
        (r["event_type"], r["idx"]): r["m_j"]
        for r in read_hll_registers(spark, regpath).collect()
    }
    assert streamed == batch

    # estimate-level equality vs the batch report operator
    want = {
        r["event_type"]: (r["v_zero"], r["hll_estimate"])
        for r in hll_distinct_report(spark, sf_dir).collect()
    }
    got = {
        r["event_type"]: (r["v_zero"], r["hll_estimate"])
        for r in read_hll_estimate(spark, regpath).collect()
    }
    assert got == want


def test_replayed_batch_is_idempotent(spark, sf_dir, tmp_path):
    rows = _events(sf_dir)[:600]
    regpath = str(tmp_path / "hll_regs.json")
    df = spark.createDataFrame(rows, EV_SCHEMA)
    merge_hll_registers(regpath, df, 0)
    first = {
        (r["event_type"], r["idx"]): r["m_j"]
        for r in read_hll_registers(spark, regpath).collect()
    }
    merge_hll_registers(regpath, df, 0)  # crash replay of batch 0
    again = {
        (r["event_type"], r["idx"]): r["m_j"]
        for r in read_hll_registers(spark, regpath).collect()
    }
    assert again == first
