"""Stream → hour-partitioned lake sink.

The reference's collectors continuously drain Kafka into the
``year=/month=/day=/hour=`` lake (``pipline2/collectors/``). Spark-first:
``writeStream`` with ``partitionBy`` and a checkpoint gives the same
layout with exactly-once file-sink semantics (the manifest log replaces
the collectors' manual offset bookkeeping).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def stream_to_lake(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    ts_col: str = "ts",
    fmt: str = "parquet",
    available_now: bool = True,
) -> StreamingQuery:
    """Continuously write the stream into the y/m/d/h-partitioned lake."""
    out = (
        stream.withColumn("year", F.year(ts_col))
        .withColumn("month", F.month(ts_col))
        .withColumn("day", F.dayofmonth(ts_col))
        .withColumn("hour", F.hour(ts_col))
    )
    writer = (
        out.writeStream.format(fmt)
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .partitionBy("year", "month", "day", "hour")
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
