"""Gated JDBC/Kafka connectors: the plan construction must execute all
the way to the missing-driver/package boundary (proves the plumbing is
real, not a stub that would also fail on a provisioned cluster)."""

from __future__ import annotations

import pytest

from smart_city_data_pipeline_spark.catalog import table
from smart_city_data_pipeline_spark.sources.writers import write_jdbc, write_kafka


def test_jdbc_sink_reaches_driver_lookup(spark, sf_dir):
    df = table(spark, sf_dir, "nation")
    with pytest.raises(Exception) as exc:
        write_jdbc(df, "jdbc:postgresql://localhost:5432/smartcity", "nation_sink")
    # Fails at the JDBC layer (no driver jar here), not in our plumbing.
    msg = str(exc.value)
    assert "driver" in msg.lower() or "jdbc" in msg.lower()


def test_kafka_sink_reaches_datasource_lookup(spark, sf_dir):
    df = table(spark, sf_dir, "nation")
    with pytest.raises(Exception) as exc:
        write_kafka(df, "localhost:9092", "smartcity.nation")
    assert "kafka" in str(exc.value).lower()
