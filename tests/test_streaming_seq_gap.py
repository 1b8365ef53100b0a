"""Streaming sequence-gap census ≡ batch sequence_gap_audit: bitmap
state is idempotent under redelivery and commutative across arrival
order, so shuffled waves must converge to the batch rows exactly."""

from __future__ import annotations

from datetime import datetime, timedelta

from smart_city_data_pipeline_spark.operators.quality import (
    SEQ_BLOCK,
    sequence_gap_audit,
)
from smart_city_data_pipeline_spark.streaming.seq_gap import seq_gap_stream

EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)

T0 = datetime(2026, 1, 1)


def _drive(spark, tmp_path, waves, name):
    edir = str(tmp_path / "ev")

    def drop(rows):
        spark.createDataFrame(rows, EV_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(edir)

    drop(waves[0])
    stream = spark.readStream.schema(EV_SCHEMA).parquet(edir)
    q = (
        seq_gap_stream(stream)
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        for wave in waves[1:]:
            drop(wave)
            q.processAllAvailable()
        last = {}
        for r in spark.table(name).collect():
            last[r["block_id"]] = r
        return last
    finally:
        q.stop()


def test_streamed_seq_gap_equals_batch(spark, tmp_path):
    """ids 0..9999 with a 100-id hole and two duplicated ids, delivered
    in 3 interleaved waves (duplicates land in DIFFERENT waves):
    per-block present/distinct/duplicated/min/max equal the batch
    audit."""
    ids = [i for i in range(10_000) if not (5000 <= i < 5100)]
    rows = [
        (i, T0 + timedelta(seconds=k % 3600), i % 9, "a", 1.0, "")
        for k, i in enumerate(ids)
    ]
    waves = [[r for r in rows if r[0] % 3 == k] for k in range(3)]
    # redeliver id 7 in wave 1 and id 8200 in wave 2
    waves[1].append((7, T0, 7, "a", 1.0, ""))
    waves[2].append((8200, T0, 1, "a", 1.0, ""))
    got = _drive(spark, tmp_path, waves, "sgq1")
    all_rows = [r for w in waves for r in w]
    d = str(tmp_path / "batch")
    spark.createDataFrame(all_rows, EV_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(d + "/events.parquet")
    batch = {
        r["block_id"]: r for r in sequence_gap_audit(spark, d).collect()
    }
    assert set(got) == set(batch)
    for bid, b in batch.items():
        s = got[bid]
        for col in ("n_present", "n_duplicated", "min_id", "max_id"):
            assert s[col] == b[col], (bid, col)
        # the batch audit reports distinct implicitly (present - dup)
        assert s["n_distinct"] == b["n_present"] - b["n_duplicated"]
    assert got[1]["n_present"] == SEQ_BLOCK - 100
    assert got[0]["n_duplicated"] + got[2]["n_duplicated"] == 2


def test_out_of_contract_event_id_fails_loudly(spark, tmp_path):
    """A negative event_id (Spark DIV truncation routes -4095..-1 into
    block 0) must FAIL the query, not silently flip a tail bit of block
    0's bitmap via Python negative indexing."""
    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    rows = [(5, T0, 1, "a", 1.0, ""), (-3, T0, 1, "a", 1.0, "")]
    with pytest.raises(StreamingQueryException, match="outside block"):
        _drive(spark, tmp_path, [rows], "sgq_neg")
