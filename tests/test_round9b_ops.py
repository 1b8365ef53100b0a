"""Planted-data property tests for the late-round-9 operators
(filter_agreement_matrix, getis_ord_hotspots, clustering_depth_report,
spearman_zone_corr) — the oracle hash-check pins Spark≡DuckDB on the
real corpus; these pin SEMANTICS on constructed inputs where the right
answer is known in closed form or via an independent Python replay."""

from __future__ import annotations

import hashlib
import math
from datetime import datetime, timedelta
from fractions import Fraction

from smart_city_data_pipeline_spark.functions.rounding import pround_py
from smart_city_data_pipeline_spark.operators.lakehouse import (
    CLUST_INGEST_FILES,
    clustering_depth_report,
)
from smart_city_data_pipeline_spark.operators.textops import (
    filter_agreement_matrix,
)
from smart_city_data_pipeline_spark.operators.timeseries import (
    spearman_zone_corr,
)
from smart_city_data_pipeline_spark.operators.traffic import (
    GSTAR_Z0_DEN2,
    GSTAR_Z0_NUM2,
    MORAN_CELL,
    getis_ord_hotspots,
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


# ----------------------------------------------- filter_agreement_matrix


def test_filter_agreement_planted_sets(spark, tmp_path):
    """Four docs engineered so each rule's reject set is known exactly:
    A passes everything, B fails lang only, C fails lang+quality+rep,
    D fails length only."""
    doc_a = " ".join(["the"] * 10 + [f"w{i:03d}" for i in range(90)])
    doc_b = " ".join(f"b{i:03d}" for i in range(60))
    doc_c = " ".join(["zz"] * 60)
    doc_d = " ".join(["the"] * 5 + [f"d{i:03d}" for i in range(25)])
    rows = [
        (i, t, "en", "src", len(t))
        for i, t in enumerate([doc_a, doc_b, doc_c, doc_d])
    ]
    got = {
        (r["rule_a"], r["rule_b"]): r
        for r in filter_agreement_matrix(
            spark, _write_docs(spark, tmp_path, rows)
        ).collect()
    }
    # reject sets: lang={B,C}, quality={C}, rep={C}, len={D}
    expect = {
        ("lang", "quality"): (2, 1, 1),
        ("lang", "rep"): (2, 1, 1),
        ("lang", "len"): (2, 1, 0),
        ("quality", "rep"): (1, 1, 1),
        ("quality", "len"): (1, 1, 0),
        ("rep", "len"): (1, 1, 0),
    }
    assert set(got) == set(expect)
    for pair, (na, nb, both) in expect.items():
        r = got[pair]
        assert (r["n_a"], r["n_b"], r["n_both"]) == (na, nb, both), pair
        either = na + nb - both
        assert r["n_either"] == either
        assert r["n_only_a"] == na - both
        assert r["n_only_b"] == nb - both
        assert r["jaccard"] == pround_py(both / either if either else 0.0)
    assert got[("quality", "rep")]["jaccard"] == 1.0
    assert got[("lang", "len")]["jaccard"] == 0.0


# --------------------------------------------------- getis_ord_hotspots


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
    assert all(len(v) == n_each for v in got.values()), {
        c: len(v) for c, v in got.items()
    }
    return got


def _ref_gstar(values_by_cell):
    """Independent integer replay of the G* map: values_by_cell maps
    (cx, cy) -> list of planted cent readings."""
    cells = {
        c: (sum(cs) * 128) // len(cs) for c, cs in values_by_cell.items()
    }
    m = len(cells)
    sv = sum(cells.values())
    svv = sum(v * v for v in cells.values())
    out = {}
    for (cx, cy), v in cells.items():
        nb = [
            cells[(cx + dx, cy + dy)]
            for dx, dy in ((0, 1), (0, -1), (1, 0), (-1, 0))
            if (cx + dx, cy + dy) in cells
        ]
        w = len(nb) + 1
        nsum = sum(nb) + v
        num = nsum * m - sv * w
        aa = m * svv - sv * sv
        bb = m * w - w * w
        sig = GSTAR_Z0_DEN2 * num * num * (m - 1) > GSTAR_Z0_NUM2 * aa * bb
        verdict = "hot" if (num > 0 and sig) else (
            "cold" if (num < 0 and sig) else "ns"
        )
        z = (
            pround_py(
                float(num) * math.sqrt(m - 1.0)
                / math.sqrt(float(aa)) / math.sqrt(float(bb))
            )
            if aa > 0 and bb > 0
            else None
        )
        gi = pround_py(nsum / sv) if sv != 0 else None
        out[(cx, cy)] = {
            "cell_mean": pround_py(v / 12800.0),
            "w_window": w,
            "gi_share": gi,
            "z_score": z,
            "verdict": verdict,
        }
    return out


def test_gstar_spike_is_hot_and_matches_replay(spark, tmp_path):
    """One high cell in a plus of zeros plus 24 far empty-ish cells:
    the spike is G*-hot; every cell's columns match the independent
    integer replay."""
    center = (10, 10)
    plus = [(10, 11), (10, 9), (9, 10), (11, 10)]
    far = [
        (x, y)
        for x in (0, 2, 4, 6)
        for y in (0, 2, 4, 6)
    ] + [(0, 14), (2, 14), (4, 14), (6, 14), (14, 0), (14, 2), (14, 4), (14, 6)]
    want = [center] + plus + far
    uids = _uids_for_cells(want)
    rows, planted = [], {}
    for i, c in enumerate(want):
        val = 100.0 if c == center else 0.0
        uid = uids[c][0]
        rows.append((i, T0 + timedelta(minutes=i), uid, "a", val, ""))
        planted.setdefault(c, []).append(
            int(math.floor(val * 100 + 0.5))
        )
    ref = _ref_gstar(planted)
    got = {
        (r["cx"], r["cy"]): r
        for r in getis_ord_hotspots(
            spark, _write_events(spark, tmp_path, rows)
        ).collect()
    }
    assert set(got) == set(ref)
    for c, e in ref.items():
        r = got[c]
        for k, v in e.items():
            assert r[k] == v, (c, k, r[k], v)
    assert got[center]["verdict"] == "hot"
    # G* windows include self AND neighbors, so the whole plus shape is
    # the hot SPOT (that's the statistic's point); nothing else is.
    hot = {c for c, r in got.items() if r["verdict"] == "hot"}
    assert hot == {center, *plus}


def test_gstar_flat_field_is_ns_with_null_z(spark, tmp_path):
    """A constant field has zero variance: aa = 0, every verdict ns,
    z NULL, gi_share = W/M."""
    want = [(0, 0), (0, 2), (2, 0), (2, 2), (4, 4)]
    uids = _uids_for_cells(want)
    rows = [
        (i, T0 + timedelta(minutes=i), uids[c][0], "a", 7.0, "")
        for i, c in enumerate(want)
    ]
    out = getis_ord_hotspots(
        spark, _write_events(spark, tmp_path, rows)
    ).collect()
    assert len(out) == 5
    for r in out:
        assert r["verdict"] == "ns"
        assert r["z_score"] is None
        assert r["w_window"] == 1  # no rook neighbors planted
        assert r["gi_share"] == pround_py(1 / 5)


# --------------------------------------------- clustering_depth_report


def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _ref_depth(rows):
    """Independent replay: rows are (event_id, ts) tuples."""
    files = {}
    for eid, ts in rows:
        f_ing = ("ingest", f"ingest:{_md5_long(str(eid)) % CLUST_INGEST_FILES}")
        f_day = ("clustered", "day:" + ts.strftime("%Y-%m-%d"))
        secs = int(ts.timestamp())
        for key in (f_ing, f_day):
            lo, hi, n = files.get(key, (secs, secs, 0))
            files[key] = (min(lo, secs), max(hi, secs), n + 1)
    out = {}
    for layout in ("ingest", "clustered"):
        fs = {k[1]: v for k, v in files.items() if k[0] == layout}
        depths, pairs = [], 0
        for fid, (lo, hi, _) in fs.items():
            depths.append(
                sum(1 for lo2, hi2, _ in fs.values() if lo2 <= lo <= hi2)
            )
            pairs += sum(
                1
                for fid2, (lo2, hi2, _) in fs.items()
                if fid2 < fid and lo2 <= hi and hi2 >= lo
            )
        out[layout] = {
            "n_files": len(fs),
            "max_depth": max(depths),
            "avg_depth": pround_py(sum(depths) / len(depths)),
            "overlapping_pairs": pairs,
        }
    return out


def test_clustering_depth_matches_replay_and_orders_layouts(spark, tmp_path):
    """Three disjoint days of events: the day layout has depth 1 and
    zero overlapping pairs, the ingest-hash layout interleaves all
    days, and every column matches the independent replay."""
    rows, planted = [], []
    eid = 0
    for day in range(3):
        for k in range(40):
            ts = T0 + timedelta(days=day, minutes=7 * k)
            rows.append((eid, ts, eid % 9, "a", 1.0, ""))
            planted.append((eid, ts))
            eid += 1
    ref = _ref_depth(planted)
    got = {
        r["layout"]: r
        for r in clustering_depth_report(
            spark, _write_events(spark, tmp_path, rows)
        ).collect()
    }
    assert set(got) == {"ingest", "clustered"}
    for layout, e in ref.items():
        for k, v in e.items():
            assert got[layout][k] == v, (layout, k, got[layout][k], v)
    assert got["clustered"]["max_depth"] == 1
    assert got["clustered"]["overlapping_pairs"] == 0
    assert got["ingest"]["max_depth"] > 1


# ------------------------------------------------- spearman_zone_corr


def _ref_spearman(xs, ys):
    """Exact Spearman via Pearson on doubled average ranks."""

    def r2(vals):
        return [
            2 * sum(1 for w in vals if w < v)
            + sum(1 for w in vals if w == v)
            + 1
            for v in vals
        ]

    ra, rb = r2(xs), r2(ys)
    n = len(ra)
    sx, sy = sum(ra), sum(rb)
    sxy = sum(a * b for a, b in zip(ra, rb))
    sxx = sum(a * a for a in ra)
    syy = sum(b * b for b in rb)
    cov = n * sxy - sx * sy
    vx, vy = n * sxx - sx * sx, n * syy - sy * sy
    if vx <= 0 or vy <= 0:
        return None
    return pround_py(
        float(cov) / math.sqrt(float(vx)) / math.sqrt(float(vy))
    )


def test_spearman_monotone_and_ties_match_replay(spark, tmp_path):
    """b is a nonlinear monotone transform of a (rho exactly +1 where
    Pearson would not be), c reverses it (rho -1), d carries ties and
    is checked against the exact rank replay."""
    a_vals = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0]
    b_vals = [v * v / 10 for v in a_vals]  # monotone, nonlinear
    c_vals = list(reversed(a_vals))
    d_vals = [1.0, 1.0, 2.0, 2.0, 3.0, 3.0, 4.0, 5.0]
    rows, eid = [], 0
    for h in range(8):
        for typ, vals in (
            ("a", a_vals), ("b", b_vals), ("c", c_vals), ("d", d_vals)
        ):
            rows.append(
                (eid, T0 + timedelta(hours=h), 1, typ, vals[h], "")
            )
            eid += 1
    got = {
        (r["type_a"], r["type_b"]): r
        for r in spearman_zone_corr(
            spark, _write_events(spark, tmp_path, rows)
        ).collect()
    }
    assert len(got) == 6

    def q(vals):  # the engine's quantized integer series point
        return [int(math.floor(v * 100 + 0.5)) * 128 for v in vals]

    series = {"a": q(a_vals), "b": q(b_vals), "c": q(c_vals), "d": q(d_vals)}
    for (ta, tb), r in got.items():
        assert r["n_buckets"] == 8
        assert r["spearman_rho"] == _ref_spearman(series[ta], series[tb]), (
            ta,
            tb,
        )
    assert got[("a", "b")]["spearman_rho"] == 1.0
    assert got[("a", "c")]["spearman_rho"] == -1.0


def test_spearman_constant_series_is_null(spark, tmp_path):
    rows = []
    for h in range(5):
        rows.append((h * 2, T0 + timedelta(hours=h), 1, "a", 5.0, ""))
        rows.append((h * 2 + 1, T0 + timedelta(hours=h), 1, "b", float(h), ""))
    [r] = spearman_zone_corr(
        spark, _write_events(spark, tmp_path, rows)
    ).collect()
    assert r["spearman_rho"] is None
