"""Lake maintenance: latest-wins upsert and small-file compaction.

- ``upsert_latest`` re-expresses the warehouse's realtime-metrics upsert
  (``init-db.sql:85`` — latest value per metric key, ON CONFLICT DO
  UPDATE) on a parquet lake: union existing + updates, keep the newest
  row per key. Plain parquet has no ACID merge, so the result is
  materialized (eager localCheckpoint truncates lineage) before the
  overwrite — at production scale the same logic targets a table format
  (Delta/Iceberg MERGE) where the swap is atomic.
- ``compact_lake`` rewrites a partitioned lake with one file per
  partition dir. Streams and per-hour collectors accumulate small files;
  at 1000 executors an uncompacted day of hourly JSONL is millions of
  tiny objects, and scan cost is dominated by open() calls, not bytes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def upsert_latest(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
) -> None:
    """Keep the newest row per key across existing data and updates."""
    if os.path.exists(path):
        existing = spark.read.parquet(path)
        merged = existing.unionByName(updates)
    else:
        merged = updates
    w = Window.partitionBy(*key_cols).orderBy(F.col(ts_col).desc())
    latest = (
        merged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    # Materialize BEFORE overwriting the directory being read.
    latest = latest.localCheckpoint(eager=True)
    latest.write.mode("overwrite").parquet(path)


def compact_lake(spark: SparkSession, path: str, partition_cols: list[str]) -> None:
    """Rewrite a partitioned lake with one file per partition value."""
    df = spark.read.option("basePath", path).parquet(path)
    compacted = df.repartition(*[F.col(c) for c in partition_cols]).localCheckpoint(
        eager=True
    )
    (
        compacted.write.partitionBy(*partition_cols)
        .mode("overwrite")
        .parquet(path)
    )
