"""Planted-data property tests for the late-round-8 operators — each
constructs an input whose right answer is known in closed form or
derivable by an independent Python implementation (the oracle hash
pins Spark≡DuckDB; these pin the SEMANTICS)."""

from __future__ import annotations

import math
from datetime import datetime, timedelta

from smart_city_data_pipeline_spark.operators.traffic import (
    DBSCAN_CELL,
    ELBOW_K,
    MORAN_CELL,
    eps_elbow_report,
    local_morans_hotspots,
    morans_i_grid,
)
from smart_city_data_pipeline_spark.operators.timeseries import (
    granger_causality_lite,
    hill_tail_index,
    seasonal_strength_report,
)
from smart_city_data_pipeline_spark.operators.quality import (
    t_closeness_audit,
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


def _cell(uid: int) -> tuple[int, int]:
    return (
        ((uid * 8191) % 10000) // MORAN_CELL,
        ((uid * 524287) % 10000) // MORAN_CELL,
    )


def _uids_for_cells(want, n_each, limit=200000):
    """Scan candidate sensor ids and pick n_each whose layout position
    lands in each wanted cell (positions are a pure function of id)."""
    got = {c: [] for c in want}
    for uid in range(1, limit):
        c = _cell(uid)
        if c in got and len(got[c]) < n_each:
            got[c].append(uid)
        if all(len(v) == n_each for v in got.values()):
            break
    assert all(len(v) == n_each for v in got.values()), {
        c: len(v) for c, v in got.items()
    }
    return got


def test_morans_checkerboard_is_negative(spark, tmp_path):
    """High/low values arranged in a 4x4 checkerboard of adjacent
    cells: every rook neighbor pair disagrees, so Moran's I is
    strongly negative and the verdict is 'not clustered'."""
    cells = [(cx, cy) for cx in range(4) for cy in range(4)]
    uids = _uids_for_cells(cells, 1)
    rows = []
    eid = 0
    for (cx, cy), ids in uids.items():
        v = 200.0 if (cx + cy) % 2 == 0 else 10.0
        for uid in ids:
            for rep in range(3):
                rows.append(
                    (eid, T0 + timedelta(minutes=eid), uid, "z", v, "")
                )
                eid += 1
    [r] = morans_i_grid(spark, _write_events(spark, tmp_path, rows)).collect()
    assert r["morans_i"] < -0.5
    assert r["clustered"] is False

    quads = {
        (q["cx"], q["cy"]): q["quadrant"]
        for q in local_morans_hotspots(
            spark, _write_events(spark, tmp_path, rows)
        ).collect()
    }
    # checkerboard = every cell is a spatial OUTLIER (HL or LH)
    assert set(quads.values()) <= {"HL", "LH"}


def test_morans_split_field_is_positive(spark, tmp_path):
    """Left half high, right half low: neighbors agree, I > 0,
    clustered verdict true, and LISA labels the halves HH/LL."""
    cells = [(cx, cy) for cx in range(4) for cy in range(4)]
    uids = _uids_for_cells(cells, 1)
    rows = []
    eid = 0
    for (cx, cy), ids in uids.items():
        v = 200.0 if cx < 2 else 10.0
        for uid in ids:
            rows.append((eid, T0 + timedelta(minutes=eid), uid, "z", v, ""))
            eid += 1
    sf = _write_events(spark, tmp_path, rows)
    [r] = morans_i_grid(spark, sf).collect()
    assert r["morans_i"] > 0.3
    assert r["clustered"] is True
    quads = {
        (q["cx"], q["cy"]): q["quadrant"]
        for q in local_morans_hotspots(spark, sf).collect()
    }
    assert quads[(0, 0)] == "HH" and quads[(3, 3)] == "LL"


def test_granger_planted_direction(spark, tmp_path):
    """B_t = A_{t-1} with A an iid-looking md5 sequence: A→B shows a
    large gain and a causal verdict; B→A shows (near) none."""
    import hashlib

    def a_val(t):
        h = hashlib.md5(f"gr:{t}".encode()).hexdigest()
        return 100.0 + (int(h[:8], 16) % 10000) / 100.0

    rows = []
    eid = 0
    for t in range(200):
        ts = T0 + timedelta(hours=t)
        rows.append((eid, ts, 1, "A", round(a_val(t), 2), ""))
        eid += 1
        rows.append((eid, ts, 2, "B", round(a_val(t - 1), 2), ""))
        eid += 1
    out = {
        (r["cause"], r["effect"]): r
        for r in granger_causality_lite(
            spark, _write_events(spark, tmp_path, rows)
        ).collect()
    }
    ab = out[("A", "B")]
    ba = out[("B", "A")]
    assert ab["granger_causal"] is True
    assert ab["gain_share"] > 0.9
    assert ba["gain_share"] is None or ba["gain_share"] < 0.1


def test_seasonal_strength_pure_cycle(spark, tmp_path):
    """A pure 24h cosine with no trend: seasonal strength ≈ 1."""
    rows = []
    for h in range(24 * 14):
        v = round(100.0 + 10.0 * math.cos(2 * math.pi * (h % 24) / 24.0), 2)
        rows.append((h, T0 + timedelta(hours=h), 1, "z", v, ""))
    [r] = seasonal_strength_report(
        spark, _write_events(spark, tmp_path, rows)
    ).collect()
    assert r["seasonal_strength"] > 0.95
    assert r["strong_seasonality"] is True


def test_hill_recovers_pareto_alpha(spark, tmp_path):
    """Plant an exact Pareto(alpha=1.5) tail: the Hill estimate lands
    near 1.5 and flags heavy_tail."""
    alpha = 1.5
    rows = []
    eid = 0
    # top ranks follow x_r = 50 * (200/r)^(1/alpha); bulk is small
    for r in range(1, 201):
        v = round(50.0 * (200.0 / r) ** (1.0 / alpha), 2)
        rows.append((eid, T0 + timedelta(minutes=eid), 1, "p", v, ""))
        eid += 1
    got = {
        r["event_type"]: r
        for r in hill_tail_index(
            spark, _write_events(spark, tmp_path, rows)
        ).collect()
    }
    r = got["p"]
    assert 1.3 < r["tail_index"] < 1.7
    assert r["heavy_tail"] is True


def test_t_closeness_uniform_distributions(spark, tmp_path):
    """Two sensors emitting IDENTICAL (zone, hour, value) patterns:
    every class's sensor distribution equals the global one, so the
    max distance is 0 and every t passes."""
    rows = []
    eid = 0
    for uid in (1, 2):
        for z in ("a", "b"):
            for h in range(4):
                rows.append(
                    (
                        eid,
                        T0 + timedelta(hours=h),
                        uid,
                        z,
                        50.0,
                        "",
                    )
                )
                eid += 1
    out = t_closeness_audit(
        spark, _write_events(spark, tmp_path, rows)
    ).collect()
    assert len(out) == 3
    for r in out:
        assert r["max_distance"] == 0.0
        assert r["t_close"] is True
        assert r["n_violating"] == 0


def test_eps_elbow_matches_python_reference(spark, tmp_path):
    """Independent Python replay of the full elbow construction
    (3x3-cell 4-NN distances, d2 histogram, chord deviation) on an
    arbitrary planted fleet must agree exactly."""
    uids = list(range(1, 400, 7))
    rows = [
        (i, T0 + timedelta(minutes=i), uid, "z", 1.0, "")
        for i, uid in enumerate(uids)
    ]
    [r] = eps_elbow_report(
        spark, _write_events(spark, tmp_path, rows)
    ).collect()

    pts = {
        uid: ((uid * 8191) % 10000, (uid * 524287) % 10000) for uid in uids
    }
    cell = {
        uid: (px // DBSCAN_CELL, py // DBSCAN_CELL)
        for uid, (px, py) in pts.items()
    }
    kd2s, n_capped = [], 0
    for uid, (px, py) in pts.items():
        cx, cy = cell[uid]
        cands = sorted(
            (px - qx) ** 2 + (py - qy) ** 2
            for vid, (qx, qy) in pts.items()
            if vid != uid
            and abs(cell[vid][0] - cx) <= 1
            and abs(cell[vid][1] - cy) <= 1
        )
        if len(cands) < ELBOW_K:
            n_capped += 1
        else:
            kd2s.append(cands[ELBOW_K - 1])
    assert r["n_points"] == len(pts)
    assert r["n_capped"] == n_capped
    from collections import Counter

    hist = sorted(Counter(kd2s).items())
    cum = 0
    curve = []
    for d2, c in hist:
        cum += c
        curve.append((cum, d2))
    (x1, y1), (x2, y2) = curve[0], curve[-1]
    best = max(
        curve,
        key=lambda p: (abs((y2 - y1) * (p[0] - x1) - (x2 - x1) * (p[1] - y1)), -p[1]),
    )
    assert r["knee_d2"] == best[1]
