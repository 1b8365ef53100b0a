"""Stream-static enrichment join: each streaming reading picks up its
sensor's registration metadata (zone, road type — the dimension the
reference keeps in Postgres, ``init-db.sql``) on the way through the
pipeline.

This is the STATELESS join class: the static side is a batch
DataFrame that Spark re-binds per micro-batch and broadcasts — no
watermark, no join state, nothing to evict. That distinction is the
scale story: a stream-static join costs one broadcast per micro-batch
regardless of stream volume, while the stream-stream form
(:mod:`streaming.joins`) must hold watermark-bounded state on both
sides. Use this form whenever one side is a slowly-changing dim; a
dim refresh is picked up on the next re-plan without restarting the
query.

The left join keeps readings from unregistered sensors (dim miss →
nulls) so the quarantine path can route them, mirroring the JSONL
lake's corrupt-line policy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_stream(
    stream_df: DataFrame, dim_df: DataFrame, on: str = "user_id"
) -> DataFrame:
    """Left-join a streaming DataFrame against a static dim on the
    sensor key; the dim side is explicitly broadcast (bounded: one row
    per registered sensor-metadata entry)."""
    return stream_df.join(F.broadcast(dim_df), on, "left")


def batch_equivalent_enrich(
    batch_df: DataFrame, dim_df: DataFrame, on: str = "user_id"
) -> DataFrame:
    """The identical join in batch — the streaming test's oracle."""
    return batch_df.join(F.broadcast(dim_df), on, "left")
