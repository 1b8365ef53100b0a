"""Stream → warehouse via foreachBatch.

The reference's batch job ends in a JDBC write
(``traffic_batch_processing.py:117``); streaming continuously, the
Spark-native pattern is ``foreachBatch``: each micro-batch is handed to
a normal batch writer (JDBC, upsert, multi-sink fan-out) together with
its batch id for exactly-once bookkeeping. The sink function is
pluggable so tests exercise the full streaming machinery with a local
writer while production plugs in ``sources.writers.write_jdbc``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def stream_to_warehouse(
    stream: DataFrame,
    batch_writer: Callable[[DataFrame, int], None],
    checkpoint: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Drive the stream through foreachBatch into a batch writer."""
    writer = (
        stream.writeStream.foreachBatch(batch_writer)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
