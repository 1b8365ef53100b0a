"""Planted-data property tests for the round-9 operators — the oracle
hash-check pins Spark≡DuckDB on the real corpus; these pin the
SEMANTICS on constructed inputs where the right answer is known in
closed form or derivable by an independent Python implementation."""

from __future__ import annotations

import math
from datetime import datetime, timedelta
from fractions import Fraction

from smart_city_data_pipeline_spark.functions.rounding import pround_py
from smart_city_data_pipeline_spark.operators.traffic import (
    NOWCAST_HOURS,
    NOWCAST_W_GRID,
    PPE_MIN_N,
    aqi_nowcast,
    parking_price_elasticity,
)

EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)

T0 = datetime(2026, 1, 1)


def _write_events(spark, tmp_path, rows):
    d = str(tmp_path / "lake")
    spark.createDataFrame(rows, EV_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(d + "/events.parquet")
    return d


# --------------------------------------------------------------- NowCast


def _ref_nowcast(readings):
    """Independent integer-exact NowCast: readings = [(hour_index,
    value)] for ONE sensor. Mirrors the EPA algorithm on the engine's
    grids (cents hourly means via truncated division, 1/64 dyadic
    weight)."""
    per_hour: dict[int, list[int]] = {}
    for h, v in readings:
        per_hour.setdefault(h, []).append(int(math.floor(v * 100 + 0.5)))
    means = {h: sum(cs) // len(cs) for h, cs in per_hour.items()}
    anchor = max(means)
    win = {anchor - h: m for h, m in means.items() if anchor - h < NOWCAST_HOURS}
    mn, mx = min(win.values()), max(win.values())
    if mx <= 0:
        wq = NOWCAST_W_GRID
    else:
        wq = max((mn * NOWCAST_W_GRID) // mx, NOWCAST_W_GRID // 2)
    top = NOWCAST_HOURS - 1
    num = sum(
        m * wq**age * NOWCAST_W_GRID ** (top - age) for age, m in win.items()
    )
    den = sum(wq**age * NOWCAST_W_GRID ** (top - age) for age in win)
    recent3 = sum(1 for age in win if age <= 2)
    return {
        "n_hours": len(win),
        "wq": wq,
        "eligible": recent3 >= 2,
        "nowcast_pm25": pround_py((num // den) / 100.0),
    }


def test_nowcast_constant_series_is_identity(spark, tmp_path):
    """Constant concentration for 14 hours: w = 1 (wq = 64), NowCast
    equals the constant, and only the trailing 12 hours count."""
    rows = [
        (h, T0 + timedelta(hours=h), 5, "a", 35.25, "") for h in range(14)
    ]
    [r] = aqi_nowcast(spark, _write_events(spark, tmp_path, rows)).collect()
    assert r["n_hours"] == NOWCAST_HOURS
    assert r["wq"] == NOWCAST_W_GRID
    assert r["eligible"] is True
    assert r["nowcast_pm25"] == 35.25
    assert r["nowcast_category"] == "Moderate"


def test_nowcast_volatile_series_clamps_weight_and_matches_reference(
    spark, tmp_path
):
    """A spiky profile drives min/max below 0.5 so the weight clamps
    at wq = 32; the value matches the independent integer replay."""
    vals = [10.0, 80.0, 20.0, 90.0, 15.0, 70.0, 25.0, 95.0, 30.0, 60.0]
    readings = [(h, v) for h, v in enumerate(vals)]
    rows = [
        (h, T0 + timedelta(hours=h), 9, "a", v, "") for h, v in readings
    ]
    ref = _ref_nowcast(readings)
    assert ref["wq"] == NOWCAST_W_GRID // 2  # the profile really clamps
    [r] = aqi_nowcast(spark, _write_events(spark, tmp_path, rows)).collect()
    assert r["wq"] == ref["wq"]
    assert r["n_hours"] == ref["n_hours"]
    assert r["nowcast_pm25"] == ref["nowcast_pm25"]
    # recent hours dominate: last readings hover 60-95 vs early 10-30
    assert r["nowcast_pm25"] > sum(vals) / len(vals) - 10


def test_nowcast_gap_in_recent_hours_marks_ineligible(spark, tmp_path):
    """Data at the anchor hour and 5+ hours before only: 1 of the 3
    most recent hours present -> eligible = false, value still
    reported."""
    rows = [
        (0, T0, 7, "a", 12.0, ""),
        (1, T0 + timedelta(hours=1), 7, "a", 14.0, ""),
        (2, T0 + timedelta(hours=8), 7, "a", 40.0, ""),
    ]
    [r] = aqi_nowcast(spark, _write_events(spark, tmp_path, rows)).collect()
    assert r["eligible"] is False
    assert r["n_hours"] == 3
    assert r["nowcast_pm25"] is not None


def test_nowcast_multi_reading_hours_and_reference_match(spark, tmp_path):
    """Hours with several readings use the truncated-mean grid; the
    full pipeline matches the independent replay on a mixed profile."""
    readings = []
    vals = [22.0, 23.5, 19.0, 31.0, 28.0, 35.5, 27.0, 26.0]
    for h, v in enumerate(vals):
        readings += [(h, v), (h, v + 1.0), (h, v - 0.5)]
    rows = [
        (i, T0 + timedelta(hours=h, minutes=7 * (i % 3)), 4, "a", v, "")
        for i, (h, v) in enumerate(readings)
    ]
    ref = _ref_nowcast(readings)
    [r] = aqi_nowcast(spark, _write_events(spark, tmp_path, rows)).collect()
    assert r["nowcast_pm25"] == ref["nowcast_pm25"]
    assert r["wq"] == ref["wq"]
    assert r["eligible"] is ref["eligible"]


# ---------------------------------------------- parking price elasticity


def _ref_elasticity(vals):
    """Independent replay of the per-lot regression: occupancy on the
    clamped 0..200 grid, simulator tariff in truncated cents, dime
    buckets; exact Fraction moments; returns None when degenerate."""
    occ = [min(int(math.floor(v)), 200) for v in vals]
    rate = [250 + (250 * o) // 400 for o in occ]
    pb = [r // 10 for r in rate]
    pts = [
        (pb[i] - pb[i - 1], occ[i + 1] - occ[i], rate[i])
        for i in range(1, len(occ) - 1)
    ]
    n = len(pts)
    if n < PPE_MIN_N:
        return None
    sx = sum(p[0] for p in pts)
    sy = sum(p[1] for p in pts)
    sxy = sum(p[0] * p[1] for p in pts)
    sxx = sum(p[0] * p[0] for p in pts)
    syy = sum(p[1] * p[1] for p in pts)
    dx = n * sxx - sx * sx
    if dx <= 0:
        return None
    num = n * sxy - sx * sy
    dy = n * syy - sy * sy
    slope = float(num) / float(dx)
    return {
        "n_obs": n,
        "mean_rate": pround_py(
            float(sum(p[2] for p in pts)) / float(n) / 100.0
        ),
        "occ_pct_per_dollar": pround_py(slope * 5.0),
        "r2": pround_py(float(num) * float(num) / (float(dx) * float(dy)))
        if dy > 0
        else None,
    }


def test_elasticity_planted_negative_response(spark, tmp_path):
    """Plant a lot where every price RISE is followed by an occupancy
    DROP and vice versa: the fitted elasticity is negative and matches
    the independent Fraction replay exactly."""
    # zig-zag occupancy: each move flips sign, so a price rise (driven
    # by the previous occupancy rise) precedes an occupancy fall.
    vals = []
    level = 60.0
    for i in range(30):
        level += 50.0 if i % 2 == 0 else -50.0
        vals.append(level)
    rows = [
        (i, T0 + timedelta(minutes=i), 3, "a", v, "")
        for i, v in enumerate(vals)
    ]
    ref = _ref_elasticity(vals)
    [r] = parking_price_elasticity(
        spark, _write_events(spark, tmp_path, rows)
    ).collect()
    assert r["n_obs"] == ref["n_obs"]
    assert r["mean_rate"] == ref["mean_rate"]
    assert r["occ_pct_per_dollar"] == ref["occ_pct_per_dollar"]
    assert r["r2"] == ref["r2"]
    assert r["occ_pct_per_dollar"] < 0


def test_elasticity_mixed_lots_match_reference(spark, tmp_path):
    """Two lots with different response patterns each match their own
    independent replay (keyed regression does not cross-contaminate)."""
    v1 = [100.0 + 30.0 * math.sin(i / 2.0) + 3.0 * (i % 5) for i in range(40)]
    v2 = [50.0 + 15.0 * ((i * 7) % 11) for i in range(25)]
    rows = [
        (i, T0 + timedelta(minutes=i), 1, "a", v, "")
        for i, v in enumerate(v1)
    ] + [
        (1000 + i, T0 + timedelta(minutes=i), 2, "a", v, "")
        for i, v in enumerate(v2)
    ]
    got = {
        r["lot_id"]: r
        for r in parking_price_elasticity(
            spark, _write_events(spark, tmp_path, rows)
        ).collect()
    }
    for lot, vals in ((1, v1), (2, v2)):
        ref = _ref_elasticity(vals)
        assert got[lot]["n_obs"] == ref["n_obs"]
        assert got[lot]["occ_pct_per_dollar"] == ref["occ_pct_per_dollar"]
        assert got[lot]["r2"] == ref["r2"]


def test_elasticity_constant_price_lot_is_excluded(spark, tmp_path):
    """A lot whose occupancy never leaves one dime bucket has zero
    design variance -> excluded; a lot under the min-N bar too."""
    rows = [
        # lot 5: constant occupancy -> every x = 0 -> dx = 0
        (i, T0 + timedelta(minutes=i), 5, "a", 80.0, "")
        for i in range(30)
    ] + [
        # lot 6: plenty of variance but only 6 points (< PPE_MIN_N)
        (100 + i, T0 + timedelta(minutes=i), 6, "a", 30.0 * i, "")
        for i in range(6)
    ]
    got = parking_price_elasticity(
        spark, _write_events(spark, tmp_path, rows)
    ).collect()
    assert got == []


def test_elasticity_fraction_exactness_guard():
    """The double-based reference agrees with the all-Fraction path on
    the planted zig-zag (guards the test itself against float drift)."""
    vals = []
    level = 60.0
    for i in range(30):
        level += 50.0 if i % 2 == 0 else -50.0
        vals.append(level)
    occ = [min(int(math.floor(v)), 200) for v in vals]
    rate = [250 + (250 * o) // 400 for o in occ]
    pb = [r // 10 for r in rate]
    pts = [
        (pb[i] - pb[i - 1], occ[i + 1] - occ[i])
        for i in range(1, len(occ) - 1)
    ]
    n = len(pts)
    sx, sy = sum(p[0] for p in pts), sum(p[1] for p in pts)
    sxy = sum(p[0] * p[1] for p in pts)
    sxx = sum(p[0] * p[0] for p in pts)
    exact = Fraction(n * sxy - sx * sy, n * sxx - sx * sx) * 5
    ref = _ref_elasticity(vals)
    assert ref["occ_pct_per_dollar"] == pround_py(float(exact))
