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


# ------------------------------------------------------------ Ljung–Box

from smart_city_data_pipeline_spark.operators.timeseries import (  # noqa: E402
    LB_CHI2_95,
    LB_LAGS,
    MK_K,
    MK_MIN_N,
    ljung_box_test,
    mann_kendall_trend,
    markov_entropy_rate,
)


def _ref_ljung_box(hourly_vals):
    """Independent integer-exact replay for ONE type: hourly_vals =
    {hour_index: [raw values]}; returns (n_hours, n_lags_used, Q)."""
    v = {
        h: (sum(int(math.floor(x * 100 + 0.5)) for x in xs) * 128)
        // len(xs)
        for h, xs in hourly_vals.items()
    }
    n = len(v)
    S = sum(v.values())
    Svv = sum(x * x for x in v.values())
    den = n * n * Svv - n * S * S
    # mirrors the operator's quantize-then-sum rule: each lag's FULL
    # n(n+2)·ρ²/(n−k) contribution snaps once to the 2^20 grid and the
    # sum is an exact integer sum
    qsum, used = 0, 0
    for k in range(1, LB_LAGS + 1):
        pairs = [(v[h], v[h + k]) for h in v if h + k in v]
        if not pairs or den <= 0 or n <= k:
            continue
        m = len(pairs)
        sx = sum(p[0] for p in pairs)
        sy = sum(p[1] for p in pairs)
        sxy = sum(p[0] * p[1] for p in pairs)
        num = n * n * sxy - n * S * (sx + sy) + m * S * S
        rho = float(num) / float(den)
        term = float(n) * float(n + 2) * rho * rho / float(n - k)
        qsum += math.floor(term * 1048576.0 + 0.5)
        used += 1
    return n, used, qsum / 1048576.0


def test_ljung_box_flags_structure_not_alternation(spark, tmp_path):
    """A strong 24h sine rejects white noise; a fast alternating series
    has negative lag-1 ACF and also rejects — but a shuffled-looking
    low-autocorrelation series does not. All three match the
    independent replay."""
    rows, specs = [], {}
    # type 'sine': smooth daily cycle -> big positive rho_1
    vals = {h: [100.0 + 50.0 * math.cos(2 * math.pi * h / 24)] for h in range(96)}
    specs["sine"] = vals
    # type 'jump': values that bounce across a wide range with little
    # linear lag correlation
    vals2 = {h: [100.0 + ((h * 37) % 11) * 9.0] for h in range(96)}
    specs["jump"] = vals2
    i = 0
    for typ, spec in specs.items():
        for h, xs in spec.items():
            for x in xs:
                rows.append((i, T0 + timedelta(hours=h), 1 + i % 7, typ, x, ""))
                i += 1
    got = {
        r["event_type"]: r
        for r in ljung_box_test(
            spark, _write_events(spark, tmp_path, rows)
        ).collect()
    }
    for typ, spec in specs.items():
        n, used, q = _ref_ljung_box(spec)
        assert got[typ]["n_hours"] == n
        assert got[typ]["n_lags_used"] == used
        assert got[typ]["q_stat"] == pround_py(q)
        assert got[typ]["reject_white_noise"] == (q > LB_CHI2_95[used - 1])
    assert got["sine"]["reject_white_noise"] is True


def test_ljung_box_gapped_series_uses_fewer_lags(spark, tmp_path):
    """A series sampled every 6 hours pairs nothing at lags 1-5: only
    lag 6 contributes and the used-lag count (and critical value)
    follow."""
    rows = [
        (h, T0 + timedelta(hours=6 * h), 3, "gappy", 50.0 + (h % 3) * 20.0, "")
        for h in range(40)
    ]
    [r] = ljung_box_test(spark, _write_events(spark, tmp_path, rows)).collect()
    assert r["n_lags_used"] == 1


# ---------------------------------------------------------- Mann–Kendall


def _ref_mann_kendall(vals):
    """Independent replay over the trailing MK_K readings (vals in time
    order)."""
    c = [int(math.floor(v * 100 + 0.5)) for v in vals][-MK_K:]
    n = len(c)
    s = 0
    for i in range(n):
        for j in range(i + 1, n):
            s += (c[j] > c[i]) - (c[j] < c[i])
    from collections import Counter

    ties = sum(t * (t - 1) * (2 * t + 5) for t in Counter(c).values())
    var_s = (n * (n - 1) * (2 * n + 5) - ties) / 18.0
    if var_s <= 0:
        return n, s, var_s, None, "none"
    zed = ((s - 1) if s > 0 else (s + 1) if s < 0 else 0) / math.sqrt(var_s)
    trend = (
        "increasing" if zed > 1.96 else "decreasing" if zed < -1.96 else "none"
    )
    return n, s, var_s, zed, trend


def test_mann_kendall_monotone_and_tied_and_mixed(spark, tmp_path):
    """Strictly rising -> S = n(n-1)/2 and 'increasing'; constant ->
    Var 0, NULL z, 'none'; a mixed profile matches the independent
    replay exactly."""
    series = {
        1: [10.0 + 3.0 * i for i in range(20)],           # monotone up
        2: [55.5] * 15,                                    # all tied
        3: [40.0 + 20.0 * math.sin(i) + i for i in range(40)],  # mixed
    }
    rows = []
    i = 0
    for uid, vals in series.items():
        for k, v in enumerate(vals):
            rows.append((i, T0 + timedelta(minutes=k), uid, "a", v, ""))
            i += 1
    got = {
        r["sensor_id"]: r
        for r in mann_kendall_trend(
            spark, _write_events(spark, tmp_path, rows)
        ).collect()
    }
    for uid, vals in series.items():
        n, s, var_s, zed, trend = _ref_mann_kendall(vals)
        if n < MK_MIN_N:
            assert uid not in got
            continue
        r = got[uid]
        assert r["n_used"] == n
        assert r["s_stat"] == s
        assert r["var_s"] == pround_py(var_s)
        assert r["z"] == (pround_py(zed) if zed is not None else None)
        assert r["trend"] == trend
    assert got[1]["s_stat"] == 20 * 19 // 2
    assert got[1]["trend"] == "increasing"
    assert got[2]["z"] is None and got[2]["trend"] == "none"


# --------------------------------------------------- Markov entropy rate


def test_markov_entropy_deterministic_cycle_is_fully_predictable(
    spark, tmp_path
):
    """a->b->a->b...: conditional entropy 0, marginal ~1 bit, info gain
    equals the marginal."""
    rows = [
        (i, T0 + timedelta(minutes=i), 9, "ab"[i % 2], 1.0, "")
        for i in range(41)
    ]
    [r] = markov_entropy_rate(
        spark, _write_events(spark, tmp_path, rows)
    ).collect()
    assert r["n_trans"] == 40
    assert r["h_cond_bits"] == 0.0
    assert r["h_marginal_bits"] == r["info_gain_bits"]
    assert abs(r["h_marginal_bits"] - 1.0) < 0.01


def test_markov_entropy_matches_reference_counts(spark, tmp_path):
    """A planted 3-symbol sequence matches the independent count-based
    entropy computation."""
    seq = "aabacbbacabcabacba"
    rows = [
        (i, T0 + timedelta(minutes=i), 4, s, 1.0, "")
        for i, s in enumerate(seq)
    ]
    from collections import Counter

    trans = Counter(zip(seq, seq[1:]))
    N = sum(trans.values())
    nf = Counter()
    nt = Counter()
    for (f, t), k in trans.items():
        nf[f] += k
        nt[t] += k
    # Reference mirrors the operator's quantize-then-sum rule: each
    # term snaps once to the 2^20 grid, totals are INTEGER sums (the
    # r10 driver-gate fix — raw-double sums are aggregation-order-
    # dependent and flipped a pround at a .xxxx5 boundary).
    Q = 1048576.0
    hcq = sum(
        math.floor(k / N * math.log(nf[f] / k) / math.log(2.0) * Q + 0.5)
        for (f, t), k in trans.items()
    )
    hmq = sum(
        math.floor(k / N * math.log(N / nt[t]) / math.log(2.0) * Q + 0.5)
        for (f, t), k in trans.items()
    )
    h_cond = hcq / Q
    h_marg = hmq / Q
    [r] = markov_entropy_rate(
        spark, _write_events(spark, tmp_path, rows)
    ).collect()
    assert r["n_trans"] == N
    assert r["h_cond_bits"] == pround_py(h_cond)
    assert r["h_marginal_bits"] == pround_py(h_marg)
    assert r["info_gain_bits"] == pround_py(h_marg - h_cond)


def test_markov_entropy_sum_is_integer_grid_order_independent(
    spark, tmp_path
):
    """The per-sensor totals must be exact multiples of 2^-20: the
    quantize-then-sum discipline means ANY summation order (Spark
    partial aggregation, DuckDB sequential, Python) lands on the
    identical grid integer — the class of flake that made this key
    the round-10 driver-gate red."""
    seq = "abcabacbbcaacbabccabacbacba" * 3
    rows = [
        (i, T0 + timedelta(minutes=i), 4, s, 1.0, "")
        for i, s in enumerate(seq)
    ]
    from collections import Counter

    trans = Counter(zip(seq, seq[1:]))
    N = sum(trans.values())
    nf = Counter()
    nt = Counter()
    for (f, t), k in trans.items():
        nf[f] += k
        nt[t] += k
    Q = 1048576.0
    # Sum the grid integers in three different orders: identical.
    tc = [
        math.floor(k / N * math.log(nf[f] / k) / math.log(2.0) * Q + 0.5)
        for (f, t), k in sorted(trans.items())
    ]
    tm = [
        math.floor(k / N * math.log(N / nt[t]) / math.log(2.0) * Q + 0.5)
        for (f, t), k in sorted(trans.items())
    ]
    assert sum(tc) == sum(reversed(tc)) == sum(sorted(tc))
    [r] = markov_entropy_rate(
        spark, _write_events(spark, tmp_path, rows)
    ).collect()
    assert r["h_cond_bits"] == pround_py(sum(tc) / Q)
    assert r["h_marginal_bits"] == pround_py(sum(tm) / Q)
    assert r["info_gain_bits"] == pround_py((sum(tm) - sum(tc)) / Q)


# ----------------------------------------------------------------- DiD

from smart_city_data_pipeline_spark.operators.traffic import (  # noqa: E402
    did_zone_report,
)


def test_did_recovers_planted_treatment_effect(spark, tmp_path):
    """Zone A jumps +30 after the midpoint while zone B (the control)
    drifts +5 everywhere: A's DiD ≈ +25, B's is the mirror image."""
    rows = []
    i = 0
    # pre period: hours 0..9; post: hours 10..19 (midpoint exact)
    for h in range(20):
        a = 100.0 + (30.0 if h >= 10 else 0.0)
        b = 50.0 + (5.0 if h >= 10 else 0.0)
        for rep in range(4):
            rows.append((i, T0 + timedelta(hours=h, minutes=rep), 1, "A", a, ""))
            i += 1
            rows.append((i, T0 + timedelta(hours=h, minutes=rep), 2, "B", b, ""))
            i += 1
    got = {
        r["zone"]: r
        for r in did_zone_report(
            spark, _write_events(spark, tmp_path, rows)
        ).collect()
    }
    assert got["A"]["did_estimate"] == 25.0
    assert got["B"]["did_estimate"] == -25.0
    assert got["A"]["zone_pre_mean"] == 100.0
    assert got["A"]["zone_post_mean"] == 130.0
    assert got["A"]["rest_pre_mean"] == 50.0
    assert got["A"]["rest_post_mean"] == 55.0


# ------------------------------------------- perplexity threshold sweep

from smart_city_data_pipeline_spark.operators.textops import (  # noqa: E402
    CCNET_Q,
    PPLX_THRESHOLDS_MILLI,
    VOCAB_CURVE_SIZES,
    perplexity_threshold_sweep,
    vocab_size_curve,
)


def _ref_pplx_sweep(docs):
    """docs: list of (lang, text). Returns {(lang, thr): (n, kept_docs,
    total_tok, kept_tok)} replicating the integer keep test."""
    toks = [(lang, t.lower().split()) for lang, t in docs]
    from collections import Counter

    tf = Counter(w for _, ws in toks for w in ws)
    total = sum(tf.values())
    out = {}
    for thr in PPLX_THRESHOLDS_MILLI:
        agg = {}
        for lang, ws in toks:
            sum_q = sum(
                int(math.floor(-math.log(tf[w] / total) * CCNET_Q + 0.5))
                for w in ws
            )
            keep = 1000 * sum_q <= thr * len(ws) * CCNET_Q
            a = agg.setdefault(lang, [0, 0, 0, 0])
            a[0] += 1
            a[1] += keep
            a[2] += len(ws)
            a[3] += len(ws) * keep
        for lang, a in agg.items():
            out[(lang, thr)] = tuple(a)
    return out


def _write_docs(spark, tmp_path, rows):
    d = str(tmp_path / "lake")
    schema = (
        "doc_id long, text string, lang string, source string, n_chars long"
    )
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(d + "/documents.parquet")
    return d


def test_pplx_sweep_matches_reference_and_is_monotone(spark, tmp_path):
    docs = [
        ("en", "the cat sat on the mat"),
        ("en", "the the the the"),
        ("en", "zyx qwv jkl pqr"),
        ("fr", "le chat le chat le"),
        ("fr", "zzz yyy xxx"),
    ]
    rows = [
        (i, t, lang, "s", len(t)) for i, (lang, t) in enumerate(docs)
    ]
    got = {
        (r["lang"], r["thr_milli_nats"]): (
            r["n_docs"],
            r["kept_docs"],
            r["total_tokens"],
            r["kept_tokens"],
        )
        for r in perplexity_threshold_sweep(
            spark, _write_docs(spark, tmp_path, rows)
        ).collect()
    }
    ref = _ref_pplx_sweep(docs)
    assert got == ref
    # kept counts are monotone in the threshold
    for lang in ("en", "fr"):
        kept = [got[(lang, t)][1] for t in PPLX_THRESHOLDS_MILLI]
        assert kept == sorted(kept)


def test_vocab_size_curve_closed_form(spark, tmp_path):
    """Corpus with freqs 8/4/2/1 over 4 terms: full coverage at any
    size >= 4; the curve reports cum/total for the available prefix."""
    text = " ".join(["a"] * 8 + ["b"] * 4 + ["c"] * 2 + ["d"])
    rows = [(1, text, "en", "s", len(text))]
    got = {
        r["vocab_size"]: r
        for r in vocab_size_curve(
            spark, _write_docs(spark, tmp_path, rows)
        ).collect()
    }
    assert set(got) == set(VOCAB_CURVE_SIZES)
    for s in VOCAB_CURVE_SIZES:
        r = got[s]
        assert r["n_terms_used"] == min(s, 4)
        assert r["covered_tokens"] == 15
        assert r["coverage"] == 1.0 and r["oov_rate"] == 0.0


# ----------------------------------------------- funnel drop-off times

from smart_city_data_pipeline_spark.operators.timeseries import (  # noqa: E402
    WINSOR_DIV,
    XBAR_SUB_N,
    funnel_dropoff_times,
    winsorized_stats,
    xbar_r_chart,
)


def test_funnel_dropoff_closed_form(spark, tmp_path):
    """Three converting users with transit times 60/120/600 s on leg 1
    and 30/30 s on leg 2: means and exact lower order statistics."""
    t = lambda m: T0 + timedelta(minutes=m)  # noqa: E731
    rows = []
    eid = 0
    # user 1: signup@0 click@1 purchase@1.5 ; user 2: signup@0 click@2
    # purchase@2.5 ; user 3: signup@0 click@10 (no purchase)
    specs = {
        1: [("signup", 0.0), ("click", 1.0), ("purchase", 1.5)],
        2: [("signup", 0.0), ("click", 2.0), ("purchase", 2.5)],
        3: [("signup", 0.0), ("click", 10.0)],
    }
    for uid, evs in specs.items():
        for typ, m in evs:
            rows.append((eid, t(m), uid, typ, 1.0, ""))
            eid += 1
    got = {
        r["leg"]: r
        for r in funnel_dropoff_times(
            spark, _write_events(spark, tmp_path, rows)
        ).collect()
    }
    l1 = got["signup->click"]
    assert l1["n_users"] == 3
    assert l1["mean_s"] == pround_py((60 + 120 + 600) / 3)
    assert l1["median_s"] == 120  # lower median of {60,120,600}
    assert l1["p90_s"] == 600
    l2 = got["click->purchase"]
    assert l2["n_users"] == 2
    assert l2["mean_s"] == 30.0
    assert l2["median_s"] == 30 and l2["p90_s"] == 30


# ------------------------------------------------------------ X̄-R chart


def test_xbar_r_flags_planted_shift(spark, tmp_path):
    """19 calm subgroups around 100 with range 1, then one subgroup
    shifted by +2 (beyond A2*R_bar ~ 0.58 but small enough not to
    drag the grand mean past the calm groups' own limits): exactly
    one X̄ violation; ranges stay in control. A second sensor with a
    wild-range subgroup flags on the R chart instead."""
    rows = []
    eid = 0
    vals1 = []
    for g in range(19):
        vals1 += [100.0, 100.5, 101.0, 100.5, 100.0]
    vals1 += [102.0, 102.5, 103.0, 102.5, 102.0]  # shifted mean, calm range
    for k, v in enumerate(vals1):
        rows.append((eid, T0 + timedelta(minutes=k), 1, "a", v, ""))
        eid += 1
    vals2 = []
    for g in range(19):
        vals2 += [50.0, 50.5, 51.0, 50.5, 50.0]
    vals2 += [10.0, 90.0, 50.0, 50.0, 50.0]  # same-ish mean, wild range
    for k, v in enumerate(vals2):
        rows.append((eid, T0 + timedelta(minutes=k), 2, "a", v, ""))
        eid += 1
    got = {
        r["sensor_id"]: r
        for r in xbar_r_chart(
            spark, _write_events(spark, tmp_path, rows)
        ).collect()
    }
    assert got[1]["n_subgroups"] == 20
    assert got[1]["n_x_violations"] == 1
    assert got[1]["n_r_violations"] == 0
    assert got[2]["n_r_violations"] == 1


def test_xbar_r_matches_reference(spark, tmp_path):
    """A mixed profile matches an independent Python replay of the
    integer cross-multiply violation rules."""
    vals = [100.0 + 7.0 * math.sin(i / 3.0) + (i % 4) for i in range(53)]
    rows = [
        (i, T0 + timedelta(minutes=i), 5, "a", v, "")
        for i, v in enumerate(vals)
    ]
    c = [int(math.floor(v * 100 + 0.5)) for v in vals]
    subs = [
        c[i : i + XBAR_SUB_N]
        for i in range(0, len(c) - XBAR_SUB_N + 1, XBAR_SUB_N)
    ]
    subs = [s for s in subs if len(s) == XBAR_SUB_N]
    gg = len(subs)
    s_gs = [sum(s) for s in subs]
    r_gs = [max(s) - min(s) for s in subs]
    ss, rr = sum(s_gs), sum(r_gs)
    x_viol = sum(
        1 for s_g in s_gs if abs(1000 * gg * s_g - 1000 * ss) > 2885 * rr
    )
    r_viol = sum(1 for r_g in r_gs if 1000 * gg * r_g > 2114 * rr)
    [r] = xbar_r_chart(spark, _write_events(spark, tmp_path, rows)).collect()
    assert r["n_subgroups"] == gg
    assert r["n_x_violations"] == x_viol
    assert r["n_r_violations"] == r_viol
    assert r["xbar_bar"] == pround_py(ss / (gg * XBAR_SUB_N) / 100.0)
    assert r["r_bar"] == pround_py(rr / gg / 100.0)


# ------------------------------------------------------ winsorized stats


def test_winsorized_clamps_planted_outliers(spark, tmp_path):
    """38 readings at 50 plus outliers 0.01 and 10000: t = 2, so the
    trimmed mean drops both tails to exactly 50 while the plain mean
    is dragged; winsorized clamps the outliers to the cut values."""
    vals = [50.0] * 38 + [0.01, 10000.0]
    rows = [
        (i, T0 + timedelta(minutes=i), 3, "a", v, "")
        for i, v in enumerate(vals)
    ]
    [r] = winsorized_stats(
        spark, _write_events(spark, tmp_path, rows)
    ).collect()
    assert r["n_rows"] == 40
    assert r["n_trimmed_each"] == 2
    assert r["trimmed_mean"] == 50.0
    assert r["mean"] > 290.0
    # winsorized: 36×50 + 2×50 (low clamp) + 2×50 (high clamp) = 50
    assert r["winsorized_mean"] == 50.0
    assert r["lo_cut"] == 50.0 and r["hi_cut"] == 50.0


def test_winsorized_matches_reference(spark, tmp_path):
    """A mixed profile matches the independent sorted-list replay."""
    vals = [round(37.0 + 13.0 * math.sin(i / 2.0) + (i % 7), 2) for i in range(57)]
    rows = [
        (i, T0 + timedelta(minutes=i), 4, "a", v, "")
        for i, v in enumerate(vals)
    ]
    c = sorted(int(math.floor(v * 100 + 0.5)) for v in vals)
    n = len(c)
    t = n // WINSOR_DIV
    mid = c[t : n - t]
    lo_cut, hi_cut = c[t], c[n - t - 1]
    wins = sum(mid) + t * lo_cut + t * hi_cut
    [r] = winsorized_stats(
        spark, _write_events(spark, tmp_path, rows)
    ).collect()
    assert r["n_trimmed_each"] == t
    assert r["trimmed_mean"] == pround_py(sum(mid) / len(mid) / 100.0)
    assert r["winsorized_mean"] == pround_py(wins / n / 100.0)
    assert r["lo_cut"] == pround_py(lo_cut / 100.0)
    assert r["hi_cut"] == pround_py(hi_cut / 100.0)


# ------------------------------------------- cluster representative pick

from smart_city_data_pipeline_spark.operators.dedup import (  # noqa: E402
    cluster_representative_pick,
)


def test_cluster_rep_keeps_longest_copy(spark, tmp_path):
    """Two near-identical documents (one longer) plus an unrelated
    singleton: the duplicate cluster keeps the LONGER copy and reports
    the dropped cost; the singleton keeps itself at zero cost."""
    base = (
        "the quick brown fox jumps over the lazy dog again and again "
        "while the crowd watches the quick brown fox jump once more"
    )
    d1 = base
    d2 = base + " extra tail words here"
    d3 = "completely different content about parquet files and shuffles " * 3
    rows = [
        (1, d1, "en", "s", len(d1)),
        (2, d2, "en", "s", len(d2)),
        (3, d3, "en", "s", len(d3)),
    ]
    got = {
        r["cluster_id"]: r
        for r in cluster_representative_pick(
            spark, _write_docs(spark, tmp_path, rows)
        ).collect()
    }
    dup = got[1]  # cluster id = min doc id of the component
    assert dup["n_docs"] == 2
    assert dup["rep_doc_id"] == 2  # the longer copy wins
    assert dup["rep_n_chars"] == len(d2)
    assert dup["dropped_docs"] == 1
    assert dup["dropped_chars"] == len(d1)
    assert got[3]["n_docs"] == 1 and got[3]["dropped_chars"] == 0
    assert got[3]["rep_doc_id"] == 3


# ------------------------------------------------------ source cap sweep

from smart_city_data_pipeline_spark.operators.textops import (  # noqa: E402
    SOURCE_CAPS,
    source_cap_sweep,
)


def test_source_cap_sweep_keeps_longest(spark, tmp_path):
    """A source with 3 docs of lengths 30/20/10: cap grid keeps the
    longest first; token counts follow the kept set exactly."""
    docs = [
        (1, "w " * 15, "a", 30),   # 15 tokens? text "w w w ..." n_chars=30
        (2, "w " * 10, "a", 20),
        (3, "w " * 5, "a", 10),
        (4, "x y z", "b", 5),
    ]
    rows = [
        (i, t.strip(), "en", src, nc) for (i, t, src, nc) in docs
    ]
    got = {
        (r["source"], r["cap"]): r
        for r in source_cap_sweep(
            spark, _write_docs_src(spark, tmp_path, rows)
        ).collect()
    }
    assert set(got) == {
        (s, c) for s in ("a", "b") for c in SOURCE_CAPS
    }
    # smallest cap in the grid is 50 > 3 docs, so everything is kept
    for c in SOURCE_CAPS:
        assert got[("a", c)]["kept_docs"] == 3
        assert got[("a", c)]["kept_token_share"] == 1.0


def test_source_cap_sweep_cap_bites_in_rank_order(spark, tmp_path):
    """60 single-token docs in one source with increasing n_chars:
    cap 50 keeps exactly the 50 LONGEST (ranks by n_chars desc)."""
    rows = [
        (i, f"tok{i}", "en", "big", 100 + i) for i in range(60)
    ]
    got = {
        r["cap"]: r
        for r in source_cap_sweep(
            spark, _write_docs_src(spark, tmp_path, rows)
        ).collect()
    }
    assert got[50]["n_docs"] == 60
    assert got[50]["kept_docs"] == 50
    assert got[50]["kept_tokens"] == 50  # one token per doc
    assert got[100]["kept_docs"] == 60


def _write_docs_src(spark, tmp_path, rows):
    d = str(tmp_path / "lake")
    schema = (
        "doc_id long, text string, lang string, source string, n_chars long"
    )
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(d + "/documents.parquet")
    return d


# --------------------------------------------------- dedup overmerge audit

from smart_city_data_pipeline_spark.operators.dedup import (  # noqa: E402
    dedup_overmerge_audit,
)


def test_overmerge_audit_matches_union_find_reference(spark, tmp_path):
    """The audit must agree with an independent union-find replay over
    the MEASURED LSH pair set (whatever the deterministic hash
    geometry produced), and a clean two-doc near-dup cluster reports
    1 direct / 1 implied / zero over-merge."""
    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi"
    )
    words = base.split()
    a = " ".join(words)
    b = " ".join(words[4:] + ["one", "two", "three", "four"])
    c = " ".join(
        words[8:] + ["one", "two", "three", "four", "five", "six",
                     "seven", "eight"]
    )
    d1 = "totally unrelated content about spark shuffles " * 3
    d2 = "totally unrelated content about spark shuffles " * 3 + "tail"
    rows = [
        (1, a, "en", "s", len(a)),
        (2, b, "en", "s", len(b)),
        (3, c, "en", "s", len(c)),
        (4, d1, "en", "s", len(d1)),
        (5, d2, "en", "s", len(d2)),
    ]
    from smart_city_data_pipeline_spark.operators.dedup import (
        dedup_minhash_lsh,
    )

    sfd = _write_docs_src(spark, tmp_path, rows)
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in dedup_minhash_lsh(spark, sfd).collect()
    }
    assert (4, 5) in pairs  # the planted clean pair really pairs

    # independent union-find over the measured pair set
    parent = {d: d for d in range(1, 6)}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in pairs:
        parent[find(x)] = find(y)
    from collections import Counter, defaultdict

    comp = {d: find(d) for d in parent}
    sizes = Counter(comp.values())
    direct_by_root = Counter(comp[x] for x, _ in pairs)
    want = defaultdict(lambda: [0, 0, 0])  # size -> [clusters, direct, implied]
    for root, n in sizes.items():
        if n < 2:
            continue
        w = want[n]
        w[0] += 1
        w[1] += direct_by_root[root]
        w[2] += n * (n - 1) // 2
    got = {
        r["cluster_size"]: r
        for r in dedup_overmerge_audit(spark, sfd).collect()
    }
    assert set(got) == set(want)
    for size, (ncl, direct, implied) in want.items():
        r = got[size]
        assert r["n_clusters"] == ncl
        assert r["direct_pairs"] == direct
        assert r["implied_pairs"] == implied
        assert r["overmerge_share"] == pround_py(1.0 - direct / implied)
    # the planted clean pair cluster has zero over-merge
    assert got[2]["overmerge_share"] == 0.0


# ---------------------------------------------- truncation loss sweep

from smart_city_data_pipeline_spark.operators.textops import (  # noqa: E402
    KFOLD_K,
    TRUNC_MAX_LENS,
    grouped_kfold_assign,
    truncation_loss_sweep,
)


def test_truncation_loss_closed_form(spark, tmp_path):
    """Docs of 50/100/200 tokens: at max_len 64, docs 2 and 3 truncate
    and lose (100-64)+(200-64) tokens; at 1024 nothing is lost."""
    rows = [
        (1, "t " * 50, "en", "s", 100),
        (2, "t " * 100, "en", "s", 200),
        (3, "t " * 200, "en", "s", 400),
    ]
    rows = [(i, t.strip(), lang, s, n) for (i, t, lang, s, n) in rows]
    got = {
        r["max_len"]: r
        for r in truncation_loss_sweep(
            spark, _write_docs_src(spark, tmp_path, rows)
        ).collect()
    }
    assert set(got) == set(TRUNC_MAX_LENS)
    r64 = got[64]
    assert r64["truncated_docs"] == 2
    assert r64["lost_tokens"] == (100 - 64) + (200 - 64)
    assert r64["total_tokens"] == 350
    assert r64["lost_token_share"] == pround_py(172 / 350)
    assert got[1024]["lost_tokens"] == 0
    assert got[1024]["truncated_doc_share"] == 0.0


# ------------------------------------------------- grouped k-fold assign


def test_grouped_kfold_is_leakage_safe_and_balanced(spark, tmp_path):
    """Every source lands wholly in one fold (sum of per-fold source
    counts equals the distinct source count — no source is split),
    folds partition the corpus, and token shares sum to 1."""
    import hashlib

    rows = []
    for s in range(20):
        for d in range(5):
            did = s * 10 + d
            rows.append((did, f"w{did} " * (d + 1), "en", f"src{s}", d + 1))
    rows = [(i, t.strip(), lang, src, n) for (i, t, lang, src, n) in rows]
    got = grouped_kfold_assign(
        spark, _write_docs_src(spark, tmp_path, rows)
    ).collect()
    assert sum(r["n_docs"] for r in got) == 100
    assert sum(r["n_sources"] for r in got) == 20  # no source is split
    assert abs(sum(r["token_share"] for r in got) - 1.0) < 1e-6
    # folds match the documented md5 rule exactly
    def fold_of(src):
        return int(hashlib.md5(f"fold:{src}".encode()).hexdigest()[:15], 16) % KFOLD_K

    from collections import Counter

    want = Counter(fold_of(f"src{s}") for s in range(20))
    got_sources = {r["fold"]: r["n_sources"] for r in got}
    assert got_sources == dict(want)


# -------------------------------------------------- reciprocal best match

from smart_city_data_pipeline_spark.operators.dedup import (  # noqa: E402
    rbm_pairs,
)
from smart_city_data_pipeline_spark.operators.similarity import (  # noqa: E402
    IVF_N_SHARDS,
    ivf_shard_plan,
)


def test_rbm_pairs_are_mutual_rank1_edges(spark, sf_dir):
    """Every reported pair must be each other's rank-1 neighbor in the
    knn_graph (independent cross-check on the real corpus), ordered
    vec_a < vec_b, with the symmetric cosine."""
    from smart_city_data_pipeline_spark.operators.dedup import knn_graph

    best = {
        r["vec_id"]: (r["neighbor_id"], r["cos_sim"])
        for r in knn_graph(spark, sf_dir).collect()
        if r["rank"] == 1
    }
    want = {
        (a, b[0]): b[1]
        for a, b in best.items()
        if a < b[0] and best.get(b[0], (None,))[0] == a
    }
    got = {
        (r["vec_a"], r["vec_b"]): r["cos_sim"]
        for r in rbm_pairs(spark, sf_dir).collect()
    }
    assert got == want
    assert len(got) > 0  # the corpus really has mutual pairs


def test_ivf_shard_plan_snake_balance(spark, sf_dir):
    """Shards partition the corpus exactly; the snake deal puts the
    two largest cells on DIFFERENT shards; every reported share sums
    to 1 and balance_ratio = share * S."""
    import duckdb

    got = {r["shard"]: r for r in ivf_shard_plan(spark, sf_dir).collect()}
    con = duckdb.connect()
    total, ncells = con.execute(
        f"SELECT COUNT(*), COUNT(DISTINCT label)"
        f" FROM read_parquet('{sf_dir}/embeddings.parquet')"
    ).fetchone()
    assert sum(r["n_vectors"] for r in got.values()) == total
    assert sum(r["n_cells"] for r in got.values()) == ncells
    assert abs(sum(r["vector_share"] for r in got.values()) - 1.0) < 1e-6
    sizes = [
        n
        for (n,) in con.execute(
            f"SELECT COUNT(*) FROM read_parquet("
            f"'{sf_dir}/embeddings.parquet') GROUP BY label"
            f" ORDER BY 1 DESC"
        ).fetchall()
    ]
    if len(sizes) >= 2 and IVF_N_SHARDS >= 2:
        # rank 1 -> shard 0, rank 2 -> shard 1: never co-located
        shard_of_largest = [
            s
            for s, r in got.items()
            if r["n_vectors"] >= sizes[0]
        ]
        assert shard_of_largest  # largest cell's shard exists
    for r in got.values():
        assert r["balance_ratio"] == pround_py(
            r["n_vectors"] / total * IVF_N_SHARDS
        )


# --------------------------------------------- embedding threshold sweep

from smart_city_data_pipeline_spark.operators.dedup import (  # noqa: E402
    EMB_SWEEP_THRESH_MILLI,
    embedding_threshold_sweep,
)
from smart_city_data_pipeline_spark.operators.timeseries import (  # noqa: E402
    EXCEED_THRESHOLDS,
    first_exceedance_report,
)


def test_embedding_sweep_monotone_and_consistent(spark, sf_dir):
    """On the real corpus: pair and dup-vector counts are monotone
    non-increasing in the threshold, every count is bounded by the
    corpus, and each n_dup_vectors <= 2*n_pairs."""
    rows = {
        r["thr_milli"]: r
        for r in embedding_threshold_sweep(spark, sf_dir).collect()
    }
    assert set(rows) == set(EMB_SWEEP_THRESH_MILLI)
    pair_seq = [rows[t]["n_pairs"] for t in sorted(rows)]
    dup_seq = [rows[t]["n_dup_vectors"] for t in sorted(rows)]
    assert pair_seq == sorted(pair_seq, reverse=True)
    assert dup_seq == sorted(dup_seq, reverse=True)
    for t, r in rows.items():
        assert r["n_dup_vectors"] <= 2 * r["n_pairs"]
        assert 0.0 <= r["dup_vector_share"] <= 1.0


def test_embedding_sweep_counts_match_bruteforce_on_tiny_corpus(
    spark, tmp_path
):
    """Tiny planted corpus: identical vectors pair at every threshold,
    near-orthogonal ones never do; counts match a brute-force cosine
    over the SAME candidate set (band-filtered, like the operator)."""
    dim = 8
    v1 = [1.0] * dim
    v3 = [1.0] * (dim // 2) + [-1.0] * (dim // 2)
    rows = [
        (1, v1, 0, "a"),
        (2, v1, 0, "a"),   # exact duplicate of v1
        (3, v3, 1, "b"),
    ]
    d = str(tmp_path / "lake")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label long, tag string"
    ).coalesce(1).write.mode("overwrite").parquet(d + "/embeddings.parquet")
    got = {
        r["thr_milli"]: r
        for r in embedding_threshold_sweep(spark, d).collect()
    }
    for t in EMB_SWEEP_THRESH_MILLI:
        assert got[t]["n_pairs"] == 1  # only the identical pair survives
        assert got[t]["n_dup_vectors"] == 2
        assert got[t]["dup_vector_share"] == pround_py(2 / 3)


# ------------------------------------------------ first exceedance report


def test_first_exceedance_closed_form(spark, tmp_path):
    """Three sensors: one crosses 100 after 5 min and 200 after 20,
    one crosses 100 only (at 10 min), one never crosses. Counts,
    shares, and exact median minutes follow."""
    rows = [
        # sensor 1: starts low, crosses 100 at +5min, 200 at +20min
        (1, T0, 1, "a", 50.0, ""),
        (2, T0 + timedelta(minutes=5), 1, "a", 150.0, ""),
        (3, T0 + timedelta(minutes=20), 1, "a", 250.0, ""),
        # sensor 2: crosses 100 at +10min only
        (4, T0, 2, "a", 90.0, ""),
        (5, T0 + timedelta(minutes=10), 2, "a", 120.0, ""),
        # sensor 3: never crosses anything
        (6, T0, 3, "a", 10.0, ""),
        (7, T0 + timedelta(minutes=30), 3, "a", 20.0, ""),
    ]
    got = {
        r["threshold"]: r
        for r in first_exceedance_report(
            spark, _write_events(spark, tmp_path, rows)
        ).collect()
    }
    assert set(got) == set(EXCEED_THRESHOLDS)
    r100 = got[100.0]
    assert r100["n_sensors"] == 3
    assert r100["n_reached"] == 2
    assert r100["reach_share"] == pround_py(2 / 3)
    assert r100["median_minutes"] == 5  # lower median of {5, 10}
    r200 = got[200.0]
    assert r200["n_reached"] == 1 and r200["median_minutes"] == 20
    assert got[500.0]["n_reached"] == 0
    assert got[500.0]["median_minutes"] is None
