"""Skew-mitigation helpers.

AQE's skew-join splitting handles joins at runtime, but a DISTINCT
aggregation on a low-cardinality, heavily-skewed group key (5 zones
across 100 TB of events) concentrates each key's whole distinct-set in
one task. The classic fix is salting on the DISTINCT column: every
distinct value lands in exactly one of n_salts sub-buckets, the
per-(key, salt) distinct counts are disjoint, and their SUM is the
exact global distinct count — two map-side-combinable shuffles whose
largest task shrinks by n_salts.

(`F.hash` is fine here — the salt never leaves the plan, so no
engine-portability contract applies.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_distinct_count(
    df: DataFrame, group_col: str, distinct_col: str, n_salts: int = 16
) -> DataFrame:
    """Exact COUNT(DISTINCT distinct_col) GROUP BY group_col, salted."""
    salted = df.withColumn(
        "_salt", F.pmod(F.hash(F.col(distinct_col)), F.lit(n_salts))
    )
    partial = salted.groupBy(group_col, "_salt").agg(
        F.countDistinct(distinct_col).alias("_partial")
    )
    return partial.groupBy(group_col).agg(F.sum("_partial").alias("n_distinct"))


def salted_zone_sensors(spark, sf_dir: str) -> DataFrame:
    """queries() entry: exact distinct sensors per zone via salting —
    the 100 TB-safe shape for COUNT(DISTINCT) on a 5-value group key
    (an unsalted plan concentrates each zone's whole distinct-set in
    one task). The salt is internal, so the result is EXACTLY the
    naive COUNT(DISTINCT) and the oracle is plain SQL."""
    from smart_city_data_pipeline_spark.catalog import table

    ev = table(spark, sf_dir, "events").select(
        F.col("event_type").alias("zone"), "user_id"
    )
    return salted_distinct_count(ev, "zone", "user_id")


QUERIES = {
    "salted_zone_sensors": salted_zone_sensors,
}

ORACLES = {
    "salted_zone_sensors": """
        SELECT event_type AS zone,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct
        FROM events
        GROUP BY 1
    """,
}
