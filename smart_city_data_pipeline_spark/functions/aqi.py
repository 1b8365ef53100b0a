"""EPA AQI from PM2.5 — piecewise-linear breakpoint transform.

Semantics from reference ``data-simulators/air-quality/
air_quality_simulator.py:95`` (_calculate_aqi): Python ``int()``
truncation on positive values == floor. Pure Column expressions, so the
transform stays inside whole-stage codegen at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def aqi_value(pm25: Column) -> Column:
    """AQI integer from a PM2.5 concentration column (µg/m³)."""
    return F.floor(
        F.when(pm25 <= 12.0, (50.0 / 12.0) * pm25)
        .when(pm25 <= 35.4, 50.0 + (50.0 / 23.4) * (pm25 - 12.0))
        .when(pm25 <= 55.4, 100.0 + (50.0 / 20.0) * (pm25 - 35.4))
        .when(pm25 <= 150.4, 150.0 + (50.0 / 95.0) * (pm25 - 55.4))
        .when(pm25 <= 250.4, 200.0 + (100.0 / 100.0) * (pm25 - 150.4))
        .otherwise(300.0 + (200.0 / 249.6) * F.least(pm25 - 250.4, F.lit(249.6)))
    )


def aqi_category(pm25: Column) -> Column:
    """AQI category label for a PM2.5 concentration column."""
    return (
        F.when(pm25 <= 12.0, "Good")
        .when(pm25 <= 35.4, "Moderate")
        .when(pm25 <= 55.4, "Unhealthy for Sensitive Groups")
        .when(pm25 <= 150.4, "Unhealthy")
        .when(pm25 <= 250.4, "Very Unhealthy")
        .otherwise("Hazardous")
    )


# The same piecewise transform as ANSI SQL, for oracle parity checks.
def aqi_value_sql(col: str) -> str:
    return (
        f"CAST(FLOOR(CASE"
        f" WHEN {col} <= 12.0 THEN (50.0/12.0)*{col}"
        f" WHEN {col} <= 35.4 THEN 50.0 + (50.0/23.4)*({col}-12.0)"
        f" WHEN {col} <= 55.4 THEN 100.0 + (50.0/20.0)*({col}-35.4)"
        f" WHEN {col} <= 150.4 THEN 150.0 + (50.0/95.0)*({col}-55.4)"
        f" WHEN {col} <= 250.4 THEN 200.0 + (100.0/100.0)*({col}-150.4)"
        f" ELSE 300.0 + (200.0/249.6)*LEAST({col}-250.4, 249.6)"
        f" END) AS BIGINT)"
    )


def aqi_category_sql(col: str) -> str:
    return (
        f"CASE"
        f" WHEN {col} <= 12.0 THEN 'Good'"
        f" WHEN {col} <= 35.4 THEN 'Moderate'"
        f" WHEN {col} <= 55.4 THEN 'Unhealthy for Sensitive Groups'"
        f" WHEN {col} <= 150.4 THEN 'Unhealthy'"
        f" WHEN {col} <= 250.4 THEN 'Very Unhealthy'"
        f" ELSE 'Hazardous' END"
    )


# Python twins of the Column transforms — used by the streaming
# NowCast twin (one breakpoint table, IDENTICAL IEEE arithmetic, so
# stream and batch cannot disagree at a category boundary).
def aqi_value_py(pm25: float) -> int:
    if pm25 <= 12.0:
        x = (50.0 / 12.0) * pm25
    elif pm25 <= 35.4:
        x = 50.0 + (50.0 / 23.4) * (pm25 - 12.0)
    elif pm25 <= 55.4:
        x = 100.0 + (50.0 / 20.0) * (pm25 - 35.4)
    elif pm25 <= 150.4:
        x = 150.0 + (50.0 / 95.0) * (pm25 - 55.4)
    elif pm25 <= 250.4:
        x = 200.0 + (100.0 / 100.0) * (pm25 - 150.4)
    else:
        x = 300.0 + (200.0 / 249.6) * min(pm25 - 250.4, 249.6)
    import math

    return int(math.floor(x))


def aqi_category_py(pm25: float) -> str:
    if pm25 <= 12.0:
        return "Good"
    if pm25 <= 35.4:
        return "Moderate"
    if pm25 <= 55.4:
        return "Unhealthy for Sensitive Groups"
    if pm25 <= 150.4:
        return "Unhealthy"
    if pm25 <= 250.4:
        return "Very Unhealthy"
    return "Hazardous"
