"""Table catalog: the driver-generated parquet lake.

Mirrors the reference's Hive external-table catalog
(``setup_smart_city_hive.hql``) — one table per entity, parquet-backed,
registered as temp views so both the DataFrame API and ``spark.sql``
can address them. Reads are plain ``spark.read.parquet`` so filter
pushdown / column pruning reach the scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table. Plain parquet scan → pushdown-friendly.

    The lake stores TIMESTAMP(NANOS) (pandas-written parquet); Spark has
    no nanosecond timestamp type, so we read nanos as long and truncate
    to microseconds — the same truncation DuckDB applies when casting
    TIMESTAMP_NS → TIMESTAMP, keeping both engines bit-identical.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for field in df.schema.fields:
        if field.name in ("ts",) and field.dataType.simpleString() == "bigint":
            df = df.withColumn(field.name, F.timestamp_micros(F.expr(f"{field.name} div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Load every table and register it as a temp view."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
