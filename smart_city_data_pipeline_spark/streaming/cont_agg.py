"""Incremental continuous-aggregate maintenance.

TimescaleDB refreshes its ``traffic_1min`` continuous aggregate
incrementally — only buckets invalidated by new rows are recomputed
(``pipline2/init-timescaledb.sql:63-68``). The Spark-native twin is a
``foreachBatch`` loop: each micro-batch contributes PARTIAL aggregates
for only the (zone, minute) buckets it touches, and those partials are
merged additively into the rollup lake — never a from-scratch recompute
of the whole rollup, never a full-history rescan.

Correctness pieces:

- sum/count are commutative monoids, so merging per-batch partials is
  exact regardless of how events split across micro-batches; avg is
  derived on read (``read_minute_rollup``) — storing it would make the
  merge lossy.
- foreachBatch can REPLAY a batch after a crash; the merge is made
  idempotent by recording ``last_batch_id`` in the lake rows and
  skipping any batch id at-or-below the high-water mark. Because the
  lake swap is a single-directory replace (maintenance._commit_swap),
  the data and the bookkeeping commit together.
- Money/reading sums stay in DECIMAL(18,2) across merges so the rollup
  equals the batch recompute bit-for-bit (pytest-asserted against the
  one-shot groupBy).

At 100 TB the rollup lake is a fraction of the fact stream (one row per
zone-minute), so the per-batch read-merge-swap touches only rollup-sized
data; the fact stream is consumed once, map-side-partially aggregated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from smart_city_data_pipeline_spark.sources import maintenance
from smart_city_data_pipeline_spark.streaming.warehouse_sink import stream_to_warehouse

BUCKET_KEYS = ("zone", "minute")


def _minute_partials(df: DataFrame) -> DataFrame:
    """Per-(zone, minute) partial aggregate of one micro-batch."""
    return df.groupBy(
        F.col("event_type").alias("zone"),
        F.date_trunc("minute", F.col("ts")).alias("minute"),
    ).agg(
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .alias("total_value"),
        F.count(F.lit(1)).alias("n_events"),
        F.max("value").alias("peak_value"),
    )


def merge_partials_into_lake(
    spark: SparkSession,
    path: str,
    part: DataFrame,
    keys: tuple[str, ...],
    merge_aggs: list,
    batch_id: int,
) -> None:
    """Generic idempotent read-merge-swap of one batch's partials into a
    rollup lake. ``part`` must carry ``last_batch_id``; ``merge_aggs``
    are the monoid merges applied on ``groupBy(keys)`` over
    current ∪ partials and must include
    ``F.max("last_batch_id")``. Shared by the minute rollup and the
    incremental top-k totals (streaming/topk.py)."""
    fs, dest = maintenance._hadoop_fs(spark, path)
    if fs.exists(dest):
        cur = spark.read.parquet(path)
        applied = cur.agg(F.max("last_batch_id")).collect()[0][0]
        if applied is not None and batch_id <= applied:
            return  # crash-replay of an already-merged batch
        merged = cur.unionByName(part).groupBy(*keys).agg(*merge_aggs)
    else:
        merged = part
    tmp = path.rstrip("/") + "._tmp_contagg"
    _, tpath = maintenance._hadoop_fs(spark, tmp)
    if fs.exists(tpath):
        fs.delete(tpath, True)
    merged.write.mode("overwrite").parquet(tmp)
    maintenance._commit_swap(spark, path, tmp)


def refresh_minute_rollup(
    spark: SparkSession, path: str, batch_df: DataFrame, batch_id: int
) -> None:
    """Merge one micro-batch's partials into the rollup lake (idempotent)."""
    part = _minute_partials(batch_df).withColumn("last_batch_id", F.lit(batch_id))
    merge_partials_into_lake(
        spark,
        path,
        part,
        BUCKET_KEYS,
        [
            F.sum("total_value").cast("decimal(18,2)").alias("total_value"),
            F.sum("n_events").alias("n_events"),
            F.max("peak_value").alias("peak_value"),
            F.max("last_batch_id").alias("last_batch_id"),
        ],
        batch_id,
    )


def continuous_minute_rollup(
    stream: DataFrame, path: str, checkpoint: str, available_now: bool = True
) -> StreamingQuery:
    """Maintain the 1-minute rollup lake from an events stream."""
    return stream_to_warehouse(
        stream,
        lambda df, bid: refresh_minute_rollup(df.sparkSession, path, df, bid),
        checkpoint,
        available_now,
    )


def read_minute_rollup(spark: SparkSession, path: str) -> DataFrame:
    """User-facing view: derives avg from the mergeable state."""
    df = spark.read.parquet(path)
    return df.select(
        "zone",
        "minute",
        "total_value",
        "n_events",
        "peak_value",
        (F.col("total_value").cast("double") / F.col("n_events")).alias("avg_value"),
    )


def minute_rollup_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """queries() entry: the one-shot BATCH twin of the incremental
    continuous aggregate — the exact same :func:`_minute_partials`
    shape the foreachBatch loop merges, plus the derived-on-read avg.

    This puts the continuous-aggregate maintenance path under the hash
    gate: pytest asserts the multi-batch streaming merge equals this
    batch rollup decimal-exactly, and the driver hash-checks this
    rollup against the DuckDB oracle — so stream ≡ batch twin ≡ oracle.
    """
    from smart_city_data_pipeline_spark.catalog import table
    from smart_city_data_pipeline_spark.functions.rounding import pround

    r = _minute_partials(table(spark, sf_dir, "events"))
    return r.select(
        "zone",
        "minute",
        F.col("total_value").cast("double").alias("total_value"),
        "n_events",
        pround(F.col("peak_value")).alias("peak_value"),
        pround(F.col("total_value").cast("double") / F.col("n_events")).alias("avg_value"),
    )


def _oracle() -> str:
    from smart_city_data_pipeline_spark.functions.rounding import (
        pround_sql,
        sum_exact_sql,
    )

    total = sum_exact_sql("value")
    return f"""
        SELECT event_type AS zone,
               date_trunc('minute', ts) AS minute,
               {total} AS total_value,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               {pround_sql('MAX(value)')} AS peak_value,
               {pround_sql(f'{total} / COUNT(*)')} AS avg_value
        FROM events
        GROUP BY 1, 2
    """


QUERIES = {"minute_rollup_batch": minute_rollup_batch}
ORACLES = {"minute_rollup_batch": _oracle()}
