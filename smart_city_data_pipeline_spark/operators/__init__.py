"""Operator registry.

Each operator module exposes ``QUERIES: dict[str, fn(spark, sf_dir) ->
DataFrame]`` and ``ORACLES: dict[str, str]`` (DuckDB SQL producing the
same named columns). ``all_queries()`` / ``all_oracles()`` merge them
for the driver contract in ``__spark_entry__.py``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from smart_city_data_pipeline_spark.operators import (
        dedup,
        multimodal,
        similarity,
        textops,
        timeseries,
        tpch,
        traffic,
        vision,
    )

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in (traffic, timeseries, tpch, textops, dedup, similarity, multimodal, vision):
        out.update(mod.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    from smart_city_data_pipeline_spark.operators import (
        dedup,
        multimodal,
        similarity,
        textops,
        timeseries,
        tpch,
        traffic,
        vision,
    )

    out: dict[str, str] = {}
    for mod in (traffic, timeseries, tpch, textops, dedup, similarity, multimodal, vision):
        out.update(mod.ORACLES)
    return out
