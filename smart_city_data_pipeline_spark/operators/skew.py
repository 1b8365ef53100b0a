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
