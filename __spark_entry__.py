"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` enumerate every implemented operator from SURVEY.md §2
with its DuckDB oracle (same column names, both sides round floats to
4 decimals and keep money math in exact DECIMAL until the final cast).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: hourly per-zone traffic stats with congestion share —
    the reference's zone-analytics + hourly-report path
    (traffic_batch_processing.py:74, init-db.sql:72)."""
    from pyspark.sql import functions as F

    from smart_city_data_pipeline_spark.catalog import table
    from smart_city_data_pipeline_spark.functions.congestion import congestion_level
    from smart_city_data_pipeline_spark.functions.rounding import pround

    ev = table(spark, "/root/testdata/sf0.001", "events")
    occ = F.col("value") / 200.0
    return (
        ev.withColumn("congestion_level", congestion_level(occ))
        .groupBy(
            F.col("event_type").alias("zone"),
            F.date_trunc("hour", F.col("ts")).alias("hour"),
        )
        .agg(
            pround(F.avg("value")).alias("avg_value"),
            F.count(F.lit(1)).alias("n_events"),
            pround(F.avg((F.col("congestion_level") == "high").cast("double"))).alias("high_congestion_share"),
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from smart_city_data_pipeline_spark.operators import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from smart_city_data_pipeline_spark.operators import all_oracles

    return all_oracles()
