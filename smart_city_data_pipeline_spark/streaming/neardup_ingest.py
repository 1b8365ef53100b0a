"""Streaming near-dup ingest — the continuous twin of
``operators.dedup.dedup_incremental``.

A production crawl deduplicates every ingest batch against the corpus
it has already accepted. The batch operator simulates ONE such probe
(top-20%-of-ids vs the rest); the continuous form folds every
micro-batch of arriving documents through the identical MinHash
machinery:

- PROBE: the batch's slim band rows equi-join the stored corpus band
  index on (band_idx, band_hash) — O(batch × bucket) per ingest, never
  O(corpus²) — and candidates verify by signature similarity exactly
  as the batch operator (same ``_minhash_eq_sim`` expression, same
  threshold), yielding one report row per new doc with ≥1 prior-corpus
  near-dup.
- INDEX MAINTENANCE: the batch's band rows are appended as a
  ``batch_id=<k>`` partition of the index lake.

Exactly-once discipline (the cont_agg/scd2 posture): both writes are
PER-BATCH PARTITION OVERWRITES, so a crash-replayed micro-batch
rewrites its own partitions byte-for-byte; and the probe reads only
``batch_id < k`` partitions, so a replay of batch k never sees its own
half-written index rows (micro-batches are sequential, so a crashed
partition is always repaired by the replay before any later batch
probes the lake). Index reads pin the schema explicitly — no footer
inference that could trip over a partition mid-repair.

Scale: the index is partitioned by ingest batch and keyed by band; at
100 TB the probe join shuffles only the CURRENT batch against the
matching band buckets (the one-sided probe documented on the batch
operator, dedup.py:828), and compaction of old partitions is the
standard lakehouse maintenance job (`compaction_plan`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from smart_city_data_pipeline_spark.functions.hashing import md5_long
from smart_city_data_pipeline_spark.functions.rounding import pround
from smart_city_data_pipeline_spark.operators.dedup import (
    MINHASH_SIM_THRESHOLD,
    N_MINHASH,
    _band_cols,
    _minhash_aggs,
    _minhash_eq_sim,
    _shingles,
)
from smart_city_data_pipeline_spark.sources import maintenance
from smart_city_data_pipeline_spark.streaming.warehouse_sink import (
    stream_to_warehouse,
)

INDEX_SCHEMA = T.StructType(
    [T.StructField("doc_id", T.LongType())]
    + [T.StructField(f"m{i}", T.LongType()) for i in range(N_MINHASH)]
    + [
        T.StructField("band_idx", T.IntegerType()),
        T.StructField("band_hash", T.StringType()),
        T.StructField("batch_id", T.LongType()),
    ]
)

REPORT_SCHEMA = T.StructType(
    [
        T.StructField("new_doc_id", T.LongType()),
        T.StructField("n_dups", T.LongType()),
        T.StructField("first_dup", T.LongType()),
        T.StructField("batch_id", T.LongType()),
    ]
)


def _doc_band_rows(docs: DataFrame) -> DataFrame:
    """(doc_id, m0..m15, band_idx, band_hash) for a documents frame —
    the exact signature/banding pipeline of the batch operators,
    lifted off the catalog so it runs on a micro-batch."""
    sh = (
        docs.select(
            "doc_id", F.explode_outer(_shingles(F.col("text"))).alias("shingle")
        )
        .filter(F.col("shingle").isNotNull())
        .select("doc_id", md5_long(F.col("shingle")).alias("hs"))
    )
    sig = sh.groupBy("doc_id").agg(*_minhash_aggs())
    return sig.select(
        "doc_id",
        *[F.col(f"m{i}") for i in range(N_MINHASH)],
        F.posexplode(F.array(*_band_cols())).alias("band_idx", "band_hash"),
    )


def probe_and_index_micro_batch(
    spark: SparkSession, root: str, batch_df: DataFrame, batch_id: int
) -> None:
    """Fold one micro-batch of documents: probe the prior-batch band
    index for near-dups, write the dup report, then append the batch's
    band rows — all as idempotent per-batch partition overwrites."""
    idx_dir = root.rstrip("/") + "/band_index"
    rep_dir = root.rstrip("/") + "/dups"
    bands = _doc_band_rows(batch_df).alias("sa")
    fs, idx_path = maintenance._hadoop_fs(spark, idx_dir)
    if fs.exists(idx_path):
        corpus = (
            spark.read.schema(INDEX_SCHEMA)
            .parquet(idx_dir)
            .filter(F.col("batch_id") < F.lit(batch_id))
            .alias("sb")
        )
        sim = _minhash_eq_sim()
        report = (
            bands.join(
                corpus,
                (F.col("sa.band_idx") == F.col("sb.band_idx"))
                & (F.col("sa.band_hash") == F.col("sb.band_hash")),
            )
            .select(
                F.col("sa.doc_id").alias("new_doc_id"),
                F.col("sb.doc_id").alias("old_doc_id"),
                pround(sim).alias("sig_sim"),
            )
            .filter(F.col("sig_sim") >= MINHASH_SIM_THRESHOLD)
            .dropDuplicates(["new_doc_id", "old_doc_id"])
            .groupBy("new_doc_id")
            .agg(
                F.count(F.lit(1)).alias("n_dups"),
                F.min("old_doc_id").alias("first_dup"),
            )
        )
    else:
        report = spark.createDataFrame(
            [], "new_doc_id long, n_dups long, first_dup long"
        )
    # batch_id lives in the partition directory name on both lakes
    report.write.mode("overwrite").parquet(f"{rep_dir}/batch_id={batch_id}")
    bands.write.mode("overwrite").parquet(f"{idx_dir}/batch_id={batch_id}")


def continuous_neardup_ingest(
    stream: DataFrame, root: str, checkpoint: str, available_now: bool = True
) -> StreamingQuery:
    """Maintain the dup report + band index from a documents stream."""
    return stream_to_warehouse(
        stream,
        lambda df, bid: probe_and_index_micro_batch(
            df.sparkSession, root, df, bid
        ),
        checkpoint,
        available_now,
    )


def read_dup_report(spark: SparkSession, root: str) -> DataFrame:
    """All dup-report rows so far, with the ingest batch that found
    them (partition column)."""
    return spark.read.schema(REPORT_SCHEMA).parquet(
        root.rstrip("/") + "/dups"
    )
