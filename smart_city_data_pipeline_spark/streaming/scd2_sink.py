"""Streaming SCD2 dimension maintenance.

The batch operator (``operators/lakehouse.py:scd2_build_frame`` /
``scd2_merge``) historizes a change stream after the fact; a live
warehouse maintains the dimension CONTINUOUSLY — each micro-batch of
change events folds into the stored dimension as it arrives (the
foreachBatch twin of Delta's streaming MERGE INTO an SCD2 table).

Design:

- each micro-batch runs ``scd2_merge`` (dimension history ∪ new batch
  through the same build), so stream state IS the batch-exact
  dimension at every point — no drift to reconcile;
- replayed batches are idempotent BY CONSTRUCTION: a re-delivered
  change row lands adjacent to its first copy in the (ts, tie) window
  order and is dropped by the consecutive-identical collapse — no
  batch-id sidecar needed (asserted in tests/test_streaming_scd2.py);
- the dimension parquet is replaced via the crash-safe temp-write +
  ``_commit_swap`` rename of ``sources/maintenance.py`` — a crash
  before the swap leaves the previous dimension intact;
- scale: the merge cost is the SCD2 windows over (stored history ∪
  batch), partitioned by the dimension key. At 100 TB the stored-side
  scan is pruned to the keys present in the batch (the incremental
  form documented on ``scd2_merge``); the swap is two metadata ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from smart_city_data_pipeline_spark.operators.lakehouse import (
    scd2_build_frame,
    scd2_merge,
)
from smart_city_data_pipeline_spark.sources.maintenance import (
    _commit_swap,
    _hadoop_fs,
    recover_swap,
)


def merge_scd2_micro_batch(
    spark: SparkSession, dim_path: str, batch_df: DataFrame
) -> None:
    """Fold one micro-batch of change events into the stored dimension.

    "No dimension yet" is decided by an explicit FileSystem existence
    probe (after ``recover_swap`` rolls forward any crashed swap) —
    never by catching the read error, which would silently rebuild
    from the current micro-batch alone (losing all prior history) on
    ANY transient read failure. A real read error propagates, the
    micro-batch fails, and streaming retries it.
    """
    recover_swap(spark, dim_path)
    fs, dest = _hadoop_fs(spark, dim_path)
    if fs.exists(dest):
        dim = spark.read.parquet(dim_path)
        merged = scd2_merge(dim, batch_df)
    else:
        merged = scd2_build_frame(batch_df)
    tmp = dim_path.rstrip("/") + ".tmp"
    merged.write.mode("overwrite").parquet(tmp)
    _commit_swap(spark, dim_path, tmp)


def continuous_scd2_dim(
    stream: DataFrame, dim_path: str, checkpoint: str
) -> StreamingQuery:
    """Maintain an SCD2 dimension from a change-event stream.

    ``availableNow`` drains what is present and stops — the test/cron
    shape; drop the trigger for an always-on maintainer.
    """

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        merge_scd2_micro_batch(batch_df.sparkSession, dim_path, batch_df)

    return (
        stream.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
