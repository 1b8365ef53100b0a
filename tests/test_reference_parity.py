"""Direct parity with the REFERENCE's own formulas (not just the DuckDB
oracle): Python mirrors of the simulator code, evaluated against our
Column expressions over dense value grids including every breakpoint
neighborhood.

Mirrored semantics:
- EPA AQI: ``air_quality_simulator.py:95`` _calculate_aqi — note
  Python ``int()`` truncation on the piecewise-linear value.
- congestion: ``sumo_mqtt_connector.py:118`` / ``traffic_batch_
  processing.py:64`` — occupancy > 0.8 high, > 0.5 medium.
- parking status/pricing: ``parking_simulator.py:188-197`` — >= 0.95
  full / >= 0.80 high / >= 0.50 medium, rate = round(base*(1+occ*0.5),2).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from smart_city_data_pipeline_spark.functions.aqi import aqi_category, aqi_value
from smart_city_data_pipeline_spark.functions.congestion import (
    congestion_level,
    dynamic_rate,
    parking_status,
)


def _ref_aqi(pm25: float) -> tuple[int, str]:
    # Faithful mirror of air_quality_simulator.py:95 (_calculate_aqi).
    if pm25 <= 12.0:
        return int((50 / 12.0) * pm25), "Good"
    elif pm25 <= 35.4:
        return int(50 + ((50 / 23.4) * (pm25 - 12.0))), "Moderate"
    elif pm25 <= 55.4:
        return int(100 + ((50 / 20.0) * (pm25 - 35.4))), "Unhealthy for Sensitive Groups"
    elif pm25 <= 150.4:
        return int(150 + ((50 / 95.0) * (pm25 - 55.4))), "Unhealthy"
    elif pm25 <= 250.4:
        return int(200 + ((100 / 100.0) * (pm25 - 150.4))), "Very Unhealthy"
    else:
        return int(300 + ((200 / 249.6) * min(pm25 - 250.4, 249.6))), "Hazardous"


def _ref_congestion(occ: float) -> str:
    return "high" if occ > 0.8 else "medium" if occ > 0.5 else "low"


def _ref_parking(occ: float) -> str:
    return (
        "full" if occ >= 0.95 else "high" if occ >= 0.80 else "medium" if occ >= 0.50 else "low"
    )


def _ref_rate(base: float, occ: float) -> float:
    return round(base * (1 + occ * 0.5), 2)


def _grid(breaks, span, step):
    vals = [round(i * step, 6) for i in range(int(span / step) + 1)]
    for b in breaks:  # dense neighborhoods around every breakpoint
        for eps in (-1e-6, -1e-9, 0.0, 1e-9, 1e-6):
            v = b + eps
            if v >= 0:
                vals.append(v)
    return sorted(set(vals))


def test_aqi_matches_reference_formula(spark):
    vals = _grid([12.0, 35.4, 55.4, 150.4, 250.4, 500.0], 520.0, 0.37)
    df = spark.createDataFrame([(v,) for v in vals], ["pm25"]).select(
        "pm25", aqi_value(F.col("pm25")).alias("aqi"), aqi_category(F.col("pm25")).alias("cat")
    )
    for r in df.collect():
        want_aqi, want_cat = _ref_aqi(r["pm25"])
        assert r["aqi"] == want_aqi, f"pm25={r['pm25']}: {r['aqi']} != {want_aqi}"
        assert r["cat"] == want_cat, r["pm25"]


def test_congestion_and_parking_match_reference(spark):
    vals = _grid([0.5, 0.8, 0.95], 1.2, 0.013)
    df = spark.createDataFrame([(v,) for v in vals], ["occ"]).select(
        "occ",
        congestion_level(F.col("occ")).alias("cong"),
        parking_status(F.col("occ")).alias("park"),
        dynamic_rate(F.lit(2.5), F.col("occ")).alias("rate"),
    )
    for r in df.collect():
        assert r["cong"] == _ref_congestion(r["occ"]), r["occ"]
        assert r["park"] == _ref_parking(r["occ"]), r["occ"]
        # Rate: the reference uses Python round() (half-even on the FLOAT
        # REPRESENTATION — e.g. round(2.565, 2) == 2.56 because 2.565 is
        # stored as 2.56499…); our contract uses portable half-up
        # (floor(x*100+0.5)) so the engines agree with each other. The
        # two conventions can differ by exactly one cent at .xx5 ties,
        # never more.
        assert abs(r["rate"] - _ref_rate(2.5, r["occ"])) <= 0.01 + 1e-9, r["occ"]
