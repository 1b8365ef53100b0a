"""Streaming event-id continuity monitor — the live twin of the batch
``sequence_gap_audit`` (operators/quality.py): per 4096-id block,
present / distinct / duplicate accounting against the dense producer
contract, maintained incrementally as micro-batches land.

State design: one 4096-BIT BITMAP (512 bytes, fixed) per block plus
two counters — presence is idempotent under redelivery (a set bit
stays set) and commutative across arrival order, so stream ≡ batch
under ANY delivery order with NO watermark machinery at all; the
duplicate counter increments exactly when a bit was already set. The
`n_expected`/`n_missing` columns need the global max id, which is only
known at read time — the stream emits per-block (present, distinct,
duplicated, min/max id) and the serving read joins the 1-row max
(exactly how the batch operator builds them), keeping the stateful
operator pure per-key.

Output mode update: latest census row per block; pytest replays the
corpus with duplicates in 3 shuffled waves and matches the batch
operator row for row after the final wave.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from smart_city_data_pipeline_spark.operators.quality import SEQ_BLOCK

SG_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("block_id", T.LongType()),
        T.StructField("n_present", T.LongType()),
        T.StructField("n_distinct", T.LongType()),
        T.StructField("n_duplicated", T.LongType()),
        T.StructField("min_id", T.LongType()),
        T.StructField("max_id", T.LongType()),
    ]
)

SG_STATE_SCHEMA = T.StructType(
    [
        T.StructField("bitmap", T.BinaryType()),
        T.StructField("n_present", T.LongType()),
        T.StructField("n_duplicated", T.LongType()),
        T.StructField("min_id", T.LongType()),
        T.StructField("max_id", T.LongType()),
    ]
)


def _sg_update(key, pdfs: Iterator, state: GroupState):
    import pandas as pd

    (block_id,) = key
    if state.exists:
        bitmap_b, n_present, n_dup, min_id, max_id = state.get
        bitmap = bytearray(bitmap_b)
    else:
        bitmap = bytearray(SEQ_BLOCK // 8)
        n_present = n_dup = 0
        min_id = max_id = None
    base = int(block_id) * SEQ_BLOCK
    for pdf in pdfs:
        for eid in pdf["event_id"]:
            eid = int(eid)
            off = eid - base
            if not 0 <= off < SEQ_BLOCK:
                # Out-of-contract id (e.g. negative, where Spark's DIV
                # truncation routes ids -(SEQ_BLOCK-1)..-1 into block 0):
                # Python's negative indexing would silently flip a bit
                # at the bitmap TAIL and corrupt the census — fail the
                # query instead, diverging loudly like the batch twin.
                raise ValueError(
                    f"event_id {eid} outside block {block_id} "
                    f"[{base}, {base + SEQ_BLOCK})"
                )
            byte, bit = off >> 3, 1 << (off & 7)
            n_present += 1
            if bitmap[byte] & bit:
                n_dup += 1
            else:
                bitmap[byte] |= bit
            min_id = eid if min_id is None else min(min_id, eid)
            max_id = eid if max_id is None else max(max_id, eid)
    state.update((bytes(bitmap), n_present, n_dup, min_id, max_id))
    yield pd.DataFrame(
        {
            "block_id": [int(block_id)],
            "n_present": [n_present],
            "n_distinct": [n_present - n_dup],
            "n_duplicated": [n_dup],
            "min_id": [min_id],
            "max_id": [max_id],
        }
    )


def seq_gap_stream(stream: DataFrame) -> DataFrame:
    """Per-block continuity census (update mode) from a raw event
    stream; after all deliveries each block's row equals the batch
    ``sequence_gap_audit`` minus the read-time expected/missing join."""
    from pyspark.sql import functions as F

    return (
        stream.select(
            F.expr(f"event_id DIV {SEQ_BLOCK}").alias("block_id"), "event_id"
        )
        .groupBy("block_id")
        .applyInPandasWithState(
            _sg_update,
            outputStructType=SG_OUTPUT_SCHEMA,
            stateStructType=SG_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
