"""Accuracy tests for sketch-based operators (rows-only oracle in the
driver gate): HLL distinct within its configured rsd, approx
percentiles within rank tolerance."""

from __future__ import annotations

from pyspark.sql import functions as F

from smart_city_data_pipeline_spark.catalog import table
from smart_city_data_pipeline_spark.operators.traffic import zone_sketch_full


def test_sketch_accuracy(spark, sf_dir):
    got = {r["zone"]: r for r in zone_sketch_full(spark, sf_dir).collect()}
    ev = table(spark, sf_dir, "events")
    exact = {
        r["zone"]: r
        for r in ev.groupBy(F.col("event_type").alias("zone"))
        .agg(
            F.countDistinct("user_id").alias("sensors"),
            # Rank-tolerance bounds around each target percentile.
            F.expr(
                "percentile(value, array(0.47, 0.53, 0.92, 0.98))"
            ).alias("bounds"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    assert set(got) == set(exact)
    for zone, e in exact.items():
        g = got[zone]
        assert g["n_events"] == e["n"]
        # HLL++ at rsd=0.02: allow 3 sigma.
        assert abs(g["approx_sensors"] - e["sensors"]) <= max(2, 0.06 * e["sensors"])
        p50, p95 = g["value_p50"], g["value_p95"]
        lo50, hi50, lo95, hi95 = e["bounds"]
        assert lo50 <= p50 <= hi50, zone
        assert lo95 <= p95 <= hi95, zone
