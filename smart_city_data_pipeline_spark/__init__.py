"""PySpark-native analytics engine with the capabilities of the
smart-city-data-pipeline reference (see SURVEY.md).

Everything is expressed as declarative DataFrame plans so Catalyst /
Tungsten pick the physical strategy (pushdown, pruning, broadcast,
whole-stage codegen). Python UDFs appear only where built-ins cannot
express the semantics, and then always as Arrow-batched pandas UDFs.
"""

from smart_city_data_pipeline_spark.session import get_spark
from smart_city_data_pipeline_spark.catalog import TABLES, load_tables

__all__ = ["get_spark", "load_tables", "TABLES"]
