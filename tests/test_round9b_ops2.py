"""Planted-data property tests for the second late-round-9 batch
(mwu_zone_shift, knox_spacetime, diurnal_harmonic_fit,
feature_hashing_audit) against independent Python replays."""

from __future__ import annotations

import hashlib
import math
from datetime import datetime, timedelta

from smart_city_data_pipeline_spark.functions.rounding import pround_py
from smart_city_data_pipeline_spark.operators.stats import (
    MWU_Z0_DEN2,
    MWU_Z0_NUM2,
    mwu_zone_shift,
)
from smart_city_data_pipeline_spark.operators.textops import (
    FEATHASH_DIMS,
    feature_hashing_audit,
)
from smart_city_data_pipeline_spark.operators.timeseries import (
    HARMONIC_COS,
    HARMONIC_SIN,
    diurnal_harmonic_fit,
)
from smart_city_data_pipeline_spark.operators.traffic import (
    KNOX_MINUTES,
    MORAN_CELL,
    knox_spacetime,
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


def _write_docs(spark, tmp_path, rows):
    d = str(tmp_path / "lake")
    schema = (
        "doc_id long, text string, lang string, source string, n_chars long"
    )
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(d + "/documents.parquet")
    return d


# ------------------------------------------------------- mwu_zone_shift


def _ref_mwu(xs, ys):
    """Independent tie-corrected MWU on integer samples."""
    merged = [(v, 1) for v in xs] + [(v, 0) for v in ys]
    r2 = {}
    vals = [v for v, _ in merged]
    for v in set(vals):
        less = sum(1 for w in vals if w < v)
        eq = sum(1 for w in vals if w == v)
        r2[v] = 2 * less + eq + 1
    r2_a = sum(r2[v] for v, s in merged if s == 1)
    n_a, n_b = len(xs), len(ys)
    n = n_a + n_b
    u2 = r2_a - n_a * (n_a + 1)
    dev = u2 - n_a * n_b
    tie_term = sum(
        t * (t * t - 1) for t in (vals.count(v) for v in set(vals))
    )
    var_num = n**3 - n - tie_term
    sig = (
        var_num > 0
        and 3 * MWU_Z0_DEN2 * dev * dev * n * (n - 1)
        > MWU_Z0_NUM2 * n_a * n_b * var_num
    )
    verdict = "a_high" if (sig and dev > 0) else (
        "b_high" if (sig and dev < 0) else "ns"
    )
    z = (
        pround_py(
            dev
            * math.sqrt(3.0)
            * math.sqrt(n - 1.0)
            / math.sqrt(n_a * n_b)
            / math.sqrt(var_num / n)
        )
        if var_num > 0 and n_a and n_b
        else None
    )
    return {"n_a": n_a, "n_b": n_b, "u2_a": u2, "z_score": z,
            "verdict": verdict}


def test_mwu_separated_and_tied_match_replay(spark, tmp_path):
    """Type a strictly above type b (20 h each) must be a_high; type c
    interleaves b with heavy ties and is checked column-for-column
    against the independent replay."""
    rows, eid = [], 0
    a_vals = [50.0 + h for h in range(20)]
    b_vals = [10.0 + h for h in range(20)]
    # same multiset as b hour-reversed: every value ties once across
    # the b/c merge, the shift is exactly zero
    c_vals = list(reversed(b_vals))
    for h in range(20):
        for typ, vals in (("a", a_vals), ("b", b_vals), ("c", c_vals)):
            rows.append((eid, T0 + timedelta(hours=h), 1, typ, vals[h], ""))
            eid += 1
    got = {
        (r["type_a"], r["type_b"]): r
        for r in mwu_zone_shift(
            spark, _write_events(spark, tmp_path, rows)
        ).collect()
    }
    assert len(got) == 3

    def q(vals):
        return [int(math.floor(v * 100 + 0.5)) * 128 for v in vals]

    series = {"a": q(a_vals), "b": q(b_vals), "c": q(c_vals)}
    for (ta, tb), r in got.items():
        e = _ref_mwu(series[ta], series[tb])
        for k, v in e.items():
            assert r[k] == v, (ta, tb, k, r[k], v)
    assert got[("a", "b")]["verdict"] == "a_high"
    assert got[("a", "b")]["u2_a"] == 2 * 20 * 20  # complete separation
    assert got[("b", "c")]["verdict"] == "ns"  # identical multisets
    assert got[("b", "c")]["u2_a"] == 20 * 20  # dev exactly zero


# ------------------------------------------------------- knox_spacetime


def _cell(uid: int) -> tuple[int, int]:
    return (
        ((uid * 8191) % 10000) // MORAN_CELL,
        ((uid * 524287) % 10000) // MORAN_CELL,
    )


def _uids_for_cells(want, n_each=1, limit=400000):
    got = {c: [] for c in want}
    for uid in range(1, limit):
        c = _cell(uid)
        if c in got and len(got[c]) < n_each:
            got[c].append(uid)
        if all(len(v) == n_each for v in got.values()):
            break
    assert all(len(v) == n_each for v in got.values())
    return got


def _ref_knox(points):
    """Brute-force pair replay: points = [(cx, cy, minute)]."""
    n = len(points)

    def close_space(p, q):
        return abs(p[0] - q[0]) + abs(p[1] - q[1]) <= 1

    def close_time(p, q):
        return abs(p[2] - q[2]) <= KNOX_MINUTES

    ns = nt = x = 0
    for i in range(n):
        for j in range(i + 1, n):
            s = close_space(points[i], points[j])
            t = close_time(points[i], points[j])
            ns += s
            nt += t
            x += s and t
    ratio = (
        pround_py(x * n * (n - 1) / 2.0 / (ns * nt)) if ns and nt else None
    )
    return {
        "n_events": n,
        "close_space_pairs": ns,
        "close_time_pairs": nt,
        "close_both_pairs": x,
        "knox_ratio": ratio,
        "interaction": bool(ratio is not None and ratio > 1.0),
    }


def test_knox_incident_cluster_matches_replay(spark, tmp_path):
    """An incident burst (12 events, one cell, 30 minutes) over a
    scattered background must show interaction > 1 and match the
    brute-force pair replay exactly."""
    incident_cell = (10, 10)
    bg_cells = [(x, y) for x in (0, 3, 6, 14) for y in (0, 3, 6, 14)]
    uids = _uids_for_cells([incident_cell] + bg_cells)
    rows, pts, eid = [], [], 0
    for k in range(12):
        ts = T0 + timedelta(minutes=3 * k)
        uid = uids[incident_cell][0]
        rows.append((eid, ts, uid, "a", 1.0, ""))
        pts.append((*_cell(uid), int(ts.timestamp()) // 60))
        eid += 1
    for d, c in enumerate(bg_cells):
        ts = T0 + timedelta(days=1 + d, minutes=17 * d)
        uid = uids[c][0]
        rows.append((eid, ts, uid, "a", 1.0, ""))
        pts.append((*_cell(uid), int(ts.timestamp()) // 60))
        eid += 1
    ref = _ref_knox(pts)
    [r] = knox_spacetime(spark, _write_events(spark, tmp_path, rows)).collect()
    for k, v in ref.items():
        assert r[k] == v, (k, r[k], v)
    assert r["interaction"] is True
    assert r["knox_ratio"] > 1.0


def test_knox_independent_layout_is_not_flagged(spark, tmp_path):
    """Spatial and temporal proximity fully decoupled: every pair is
    time-close (same minute) so close_both == close_space and the
    ratio is exactly 1 — no interaction."""
    cells = [(0, 0), (0, 1), (5, 5), (9, 3)]
    uids = _uids_for_cells(cells)
    rows = [
        (i, T0, uids[c][0], "a", 1.0, "")
        for i, c in enumerate(cells)
    ]
    [r] = knox_spacetime(spark, _write_events(spark, tmp_path, rows)).collect()
    assert r["close_time_pairs"] == 6  # C(4,2)
    assert r["close_space_pairs"] == 1  # only (0,0)-(0,1)
    assert r["close_both_pairs"] == 1
    assert r["knox_ratio"] == 1.0
    assert r["interaction"] is False


# -------------------------------------------------- diurnal_harmonic_fit


def test_harmonic_exact_cosine_recovery(spark, tmp_path):
    """Data generated FROM the quantized basis (cents = 2000 + c_h and
    2000 + s_h) is fit residual-free: mesor 20.0, amplitude
    128·1024/12800, peak hour 0 (cos) / 6 (sin)."""
    rows, eid = [], 0
    for day in range(2):
        for h in range(24):
            ts = T0 + timedelta(days=day, hours=h)
            vc = (2000 + HARMONIC_COS[h]) / 100.0
            vs = (2000 + HARMONIC_SIN[h]) / 100.0
            rows.append((eid, ts, 1, "cosine", vc, ""))
            rows.append((eid + 1, ts, 1, "sine", vs, ""))
            eid += 2
    got = {
        r["event_type"]: r
        for r in diurnal_harmonic_fit(
            spark, _write_events(spark, tmp_path, rows)
        ).collect()
    }
    amp = pround_py(128 * 1024 / 12800.0)
    for typ, peak in (("cosine", 0.0), ("sine", 6.0)):
        r = got[typ]
        assert r["n_points"] == 48
        assert r["mesor"] == 20.0
        assert r["amplitude"] == amp
        assert r["peak_hour"] == peak


def test_harmonic_flat_series_has_zero_amplitude(spark, tmp_path):
    rows = [
        (h, T0 + timedelta(hours=h), 1, "flat", 33.0, "") for h in range(24)
    ]
    [r] = diurnal_harmonic_fit(
        spark, _write_events(spark, tmp_path, rows)
    ).collect()
    assert r["mesor"] == 33.0
    assert r["amplitude"] == 0.0


def test_harmonic_degenerate_single_hour_is_null(spark, tmp_path):
    """Only one distinct hour-of-day: the design matrix is singular
    (D = 0) and the fit reports NULLs honestly."""
    rows = [
        (k, T0 + timedelta(days=k), 1, "one", 10.0 + k, "") for k in range(5)
    ]
    [r] = diurnal_harmonic_fit(
        spark, _write_events(spark, tmp_path, rows)
    ).collect()
    assert r["n_points"] == 5
    assert r["mesor"] is None
    assert r["amplitude"] is None
    assert r["peak_hour"] is None


# -------------------------------------------------- feature_hashing_audit


def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_feature_hashing_matches_replay(spark, tmp_path):
    """Known vocabulary with skewed counts: every (dim, depth) row
    matches the hashlib replay, term/occurrence mass is conserved, and
    empty slots appear as the depth-0 row."""
    vocab = [f"tok{i:03d}" for i in range(40)]
    docs = []
    for i, term in enumerate(vocab):
        docs.append(" ".join([term] * (i + 1)))
    rows = [(i, t, "en", "src", len(t)) for i, t in enumerate(docs)]
    got = {}
    for r in feature_hashing_audit(
        spark, _write_docs(spark, tmp_path, rows)
    ).collect():
        got[(r["dim"], r["depth"])] = (
            r["n_slots"], r["n_terms"], r["n_occurrences"]
        )
    ref = {}
    for dim in FEATHASH_DIMS:
        slots = {}
        for i, term in enumerate(vocab):
            slot = _md5_long(term) % dim
            t, o = slots.get(slot, (0, 0))
            slots[slot] = (t + 1, o + i + 1)
        by_depth = {}
        for t, o in slots.values():
            s, tt, oo = by_depth.get(t, (0, 0, 0))
            by_depth[t] = (s + 1, tt + t, oo + o)
        if dim - len(slots) > 0:
            by_depth[0] = (dim - len(slots), 0, 0)
        for depth, v in by_depth.items():
            ref[(dim, depth)] = v
    assert got == ref
    for dim in FEATHASH_DIMS:
        assert sum(t for (d, _), (_, t, _) in got.items() if d == dim) == 40
        assert (
            sum(s for (d, _), (s, _, _) in got.items() if d == dim) == dim
        )
