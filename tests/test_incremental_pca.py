"""Streaming incremental PCA: raw-moment maintenance over micro-batch
waves must reproduce the one-shot batch operator EXACTLY (integer
monoids + shared finisher ⇒ row-for-row equality), and crash-replayed
batches must be idempotent."""

from __future__ import annotations

import duckdb

from smart_city_data_pipeline_spark.operators.similarity import (
    embedding_pca_power,
)
from smart_city_data_pipeline_spark.streaming.incremental_pca import (
    continuous_pca_moments,
    merge_pca_moments,
    read_pca_from_moments,
)

EMB_SCHEMA = "vec_id long, embedding array<float>, label int"


def _vecs(sf_dir):
    con = duckdb.connect()
    return con.execute(
        f"SELECT vec_id, embedding, label "
        f"FROM read_parquet('{sf_dir}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()


def test_streamed_moments_equal_batch_pca(spark, sf_dir, tmp_path):
    rows = _vecs(sf_dir)
    dim = len(rows[0][1])
    sdir = str(tmp_path / "emb_stream")
    moments = str(tmp_path / "pca_moments.json")

    # three waves, then one availableNow pass per wave so each wave is
    # its own micro-batch generation
    third = len(rows) // 3
    waves = [rows[:third], rows[third : 2 * third], rows[2 * third :]]
    for i, wave in enumerate(waves):
        spark.createDataFrame(wave, EMB_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(sdir)
        q = continuous_pca_moments(
            spark.readStream.schema(EMB_SCHEMA).parquet(sdir),
            moments,
            str(tmp_path / "ckpt"),
            dim,
        )
        q.awaitTermination()

    got = sorted(
        read_pca_from_moments(spark, moments, dim).collect(),
        key=lambda r: r["dim"],
    )
    want = sorted(
        embedding_pca_power(spark, sf_dir).collect(), key=lambda r: r["dim"]
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_replayed_batch_is_idempotent(spark, sf_dir, tmp_path):
    rows = _vecs(sf_dir)[:50]
    dim = len(rows[0][1])
    moments = str(tmp_path / "m.json")
    df = spark.createDataFrame(rows, EMB_SCHEMA)
    merge_pca_moments(spark, moments, df, 0, dim)
    once = [
        tuple(r)
        for r in read_pca_from_moments(spark, moments, dim).collect()
    ]
    merge_pca_moments(spark, moments, df, 0, dim)  # crash replay
    twice = [
        tuple(r)
        for r in read_pca_from_moments(spark, moments, dim).collect()
    ]
    assert once == twice
