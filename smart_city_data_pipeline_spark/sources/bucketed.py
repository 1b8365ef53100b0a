"""Bucketed warehouse tables — co-located fact joins without shuffles.

The reference's warehouse keys its fact tables on (zone, timestamp) /
order ids via btree indexes (``init-db.sql``); Spark's equivalent
physical design is BUCKETING: both fact tables hash-clustered into the
same number of buckets on the join key, so a later join reads matching
buckets side by side — no Exchange on either side of the
SortMergeJoin. At 100 TB this removes the single biggest shuffle in the
daily-report path (lineitem⋈orders) from EVERY downstream run: you pay
the clustering once at ingest, not per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort: bool = True,
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table."""
    w = df.write.bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.mode("overwrite").format("parquet").saveAsTable(table_name)


def cobucketed_join(
    spark: SparkSession, left_table: str, right_table: str, left_key: str, right_key: str
) -> DataFrame:
    """Join two co-bucketed tables on their bucket keys (shuffle-free)."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[left_key] == right[right_key])
