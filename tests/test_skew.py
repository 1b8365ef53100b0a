"""Salted distinct-count must equal the exact aggregate."""

from __future__ import annotations

from pyspark.sql import functions as F

from smart_city_data_pipeline_spark.catalog import table
from smart_city_data_pipeline_spark.operators.skew import salted_distinct_count


def test_salted_distinct_count_exact(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    got = {
        r["event_type"]: r["n_distinct"]
        for r in salted_distinct_count(ev, "event_type", "user_id").collect()
    }
    want = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert got == want
    # More salts than distinct values still exact.
    got64 = {
        r["event_type"]: r["n_distinct"]
        for r in salted_distinct_count(ev, "event_type", "user_id", n_salts=64).collect()
    }
    assert got64 == want
