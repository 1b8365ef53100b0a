"""Congestion / occupancy classification and parking pricing.

Semantics from reference ``pipline2/spark-jobs/
traffic_batch_processing.py:64`` (occupancy-only thresholds),
``data-simulators/sumo-traffic/sumo_mqtt_connector.py:118``
(occupancy-or-speed variant) and ``data-simulators/parking-sensors/
parking_simulator.py:165-197`` (status buckets + dynamic pricing).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from smart_city_data_pipeline_spark.functions.rounding import pround


def congestion_level(occupancy: Column) -> Column:
    """high if occ > 0.8, medium if > 0.5, else low (batch-job variant)."""
    return (
        F.when(occupancy > 0.8, "high")
        .when(occupancy > 0.5, "medium")
        .otherwise("low")
    )


def congestion_level_speed(occupancy: Column, speed_kmh: Column) -> Column:
    """SUMO-connector variant: occupancy OR speed thresholds."""
    return (
        F.when((occupancy > 0.8) | (speed_kmh < 20), "high")
        .when((occupancy > 0.5) | (speed_kmh < 40), "medium")
        .otherwise("low")
    )


def parking_status(occupancy_rate: Column) -> Column:
    """full ≥0.95, high ≥0.80, medium ≥0.50, else low."""
    return (
        F.when(occupancy_rate >= 0.95, "full")
        .when(occupancy_rate >= 0.80, "high")
        .when(occupancy_rate >= 0.50, "medium")
        .otherwise("low")
    )


def dynamic_rate(base_rate: Column, occupancy_rate: Column) -> Column:
    """base_rate * (1 + occupancy_rate * 0.5), rounded to cents."""
    return pround(base_rate * (1.0 + occupancy_rate * 0.5), 2)
