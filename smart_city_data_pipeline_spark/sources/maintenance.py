"""Lake maintenance: latest-wins upsert and small-file compaction.

- ``upsert_latest`` re-expresses the warehouse's realtime-metrics upsert
  (``init-db.sql:85`` — latest value per metric key, ON CONFLICT DO
  UPDATE) on a parquet lake: union existing + updates, keep the newest
  row per key. Plain parquet has no ACID merge, so the merge is written
  to a SIBLING TEMP DIRECTORY and swapped in — at production scale the
  same logic targets a table format (Delta/Iceberg MERGE) where the
  swap is atomic.
- ``compact_lake`` rewrites a partitioned lake with one file per
  partition dir. Streams and per-hour collectors accumulate small files;
  at 1000 executors an uncompacted day of hourly JSONL is millions of
  tiny objects, and scan cost is dominated by open() calls, not bytes.

Durability/remote-fs rules (both operations):

- Existence is probed through the Hadoop FileSystem API, NEVER
  ``os.path.exists`` — a driver-local probe returns False for every
  hdfs:// or s3a:// path, which would silently replace a remote lake
  with just the update batch.
- The new data is FULLY written to a temp sibling dir while the old
  directory is still being read (no localCheckpoint needed — source and
  destination never overlap), then swapped in with delete+rename. A
  crash anywhere during the write leaves the old lake untouched; only
  the delete→rename window (two metadata ops) is exposed, and even
  there the complete new data survives in the temp dir — never the
  silent truncation of an in-place overwrite losing executor blocks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for ``path`` under the session's Hadoop conf —
    resolves the correct scheme (file://, hdfs://, s3a://, ...)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def _commit_swap(spark: SparkSession, path: str, tmp: str) -> None:
    """Replace ``path`` with the fully-written ``tmp`` directory.

    Module-level seam so tests can fault-inject a crash between the
    temp write and the swap and assert the old lake is intact.
    """
    fs, dest = _hadoop_fs(spark, path)
    _, tsrc = _hadoop_fs(spark, tmp)
    fs.delete(dest, True)
    if not fs.rename(tsrc, dest):
        raise IOError(f"rename {tmp} -> {path} failed; new data is at {tmp}")


def upsert_latest(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
) -> None:
    """Keep the newest row per key across existing data and updates."""
    fs, dest = _hadoop_fs(spark, path)
    tmp = path.rstrip("/") + "._tmp_upsert"
    _, tpath = _hadoop_fs(spark, tmp)
    if fs.exists(tpath):
        fs.delete(tpath, True)  # stale leftover from a crashed run
    if fs.exists(dest):
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
    latest.write.mode("overwrite").parquet(tmp)
    _commit_swap(spark, path, tmp)


def compact_lake(spark: SparkSession, path: str, partition_cols: list[str]) -> None:
    """Rewrite a partitioned lake with one file per partition value."""
    fs, _ = _hadoop_fs(spark, path)
    tmp = path.rstrip("/") + "._tmp_compact"
    _, tpath = _hadoop_fs(spark, tmp)
    if fs.exists(tpath):
        fs.delete(tpath, True)
    df = spark.read.option("basePath", path).parquet(path)
    (
        df.repartition(*[F.col(c) for c in partition_cols])
        .write.partitionBy(*partition_cols)
        .mode("overwrite")
        .parquet(tmp)
    )
    _commit_swap(spark, path, tmp)


def forget_subject(
    spark: SparkSession,
    path: str,
    key_col: str,
    subject_ids: list,
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Right-to-be-forgotten erasure over a parquet lake: remove every
    row whose ``key_col`` is in ``subject_ids`` and return the per-
    partition audit the DPO files (rows before, rows erased, rows
    after) — the GDPR/CCPA deletion pass plain parquet needs spelled
    out (a table format runs ``DELETE WHERE``; the rewrite-and-swap
    below is that statement's physical plan anyway).

    Scale shape: the anti-join predicate is a literal IN over the
    (small) subject list, so partition pruning and row-group skipping
    still apply to the scan; the rewrite repartitions by the partition
    columns so output files stay one-per-partition (the
    ``compact_lake`` layout). Crash safety is the module's standard
    temp-sibling + swap: the old lake is readable until the fully
    written replacement renames in.

    The audit is computed from the SAME scan lineage before the swap
    (counts per partition), so what it reports is exactly what was
    erased."""
    fs, _ = _hadoop_fs(spark, path)
    tmp = path.rstrip("/") + "._tmp_forget"
    _, tpath = _hadoop_fs(spark, tmp)
    if fs.exists(tpath):
        fs.delete(tpath, True)
    df = spark.read.option("basePath", path).parquet(path)
    hit = F.col(key_col).isin(*subject_ids)
    group = (
        [F.col(c) for c in partition_cols]
        if partition_cols
        # a STRING literal: an integer literal in groupBy is read as a
        # positional GROUP BY index
        else [F.lit("all").alias("partition")]
    )
    audit = (
        df.groupBy(*group)
        .agg(
            F.count(F.lit(1)).cast("long").alias("rows_before"),
            F.sum(F.when(hit, 1).otherwise(0)).cast("long").alias("rows_erased"),
        )
        .withColumn(
            "rows_after", (F.col("rows_before") - F.col("rows_erased"))
        )
        .collect()
    )
    kept = df.filter(~hit)
    writer = kept.repartition(
        *[F.col(c) for c in (partition_cols or [])]
    ) if partition_cols else kept.coalesce(1)
    w = writer.write.mode("overwrite")
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.parquet(tmp)
    _commit_swap(spark, path, tmp)
    return spark.createDataFrame(audit)
