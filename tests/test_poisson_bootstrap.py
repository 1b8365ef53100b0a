"""poisson_bootstrap_ci vs an independent Python replay of the
deterministic md5 → Poisson(1) draw and the order-statistic CI, plus
the statistical sanity property: a high-variance type gets a wider
interval than a constant one (whose CI must collapse to the point)."""

from __future__ import annotations

import hashlib
from datetime import datetime

from smart_city_data_pipeline_spark.functions.rounding import pround_py
from smart_city_data_pipeline_spark.operators.stats import (
    BOOT_B,
    BOOT_POISSON_THRESH,
    poisson_bootstrap_ci,
)

EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)

# 'steady': 60 readings of exactly 5.00 (zero variance -> CI collapses
# to the mean); 'mixed': 60 readings alternating 1.00 / 99.00.
_PLANT = [
    (i, datetime(2025, 3, 1, i % 24), i % 7, "steady", 5.0, "{}")
    for i in range(60)
] + [
    (1000 + i, datetime(2025, 3, 2, i % 24), i % 7, "mixed",
     1.0 if i % 2 == 0 else 99.0, "{}")
    for i in range(60)
]


def _w(eid: int, b: int) -> int:
    # mirrors the engines' draw: one md5 per (event, b DIV 6), six
    # 20-bit uniforms per digest (three slices of each 60-bit half)
    g, j = divmod(b, 6)
    hx = hashlib.md5(f"{eid}:{g}".encode()).hexdigest()
    h = int(hx[:15], 16) if j < 3 else int(hx[15:30], 16)
    u = (h >> (20 * (j % 3))) % 1048576
    for k, t in BOOT_POISSON_THRESH:
        if u < t:
            return k
    return 10


def _ref(rows):
    by_type = {}
    for eid, _, _, et, val, _ in rows:
        cents = int(val * 100.0 + 0.5)
        by_type.setdefault(et, []).append((eid, cents))
    out = {}
    for et, evs in by_type.items():
        reps = []
        for b in range(BOOT_B):
            n_eff = s = 0
            for eid, cents in evs:
                w = _w(eid, b)
                n_eff += w
                s += w * cents
            if n_eff > 0:
                reps.append((s * 1048576 // n_eff, b, s, n_eff))
        reps.sort()
        m = len(reps)
        lo = reps[(25 * m + 999) // 1000 - 1]
        hi = reps[(975 * m + 999) // 1000 - 1]
        n = len(evs)
        cs = sum(c for _, c in evs)
        out[et] = (
            n,
            pround_py(cs / (100.0 * n)),
            pround_py(lo[2] / (100.0 * lo[3])),
            pround_py(hi[2] / (100.0 * hi[3])),
        )
    return out


def test_bootstrap_matches_replay_and_interval_widths(spark, tmp_path):
    d = str(tmp_path / "ev")
    spark.createDataFrame(_PLANT, EV_SCHEMA).coalesce(1).write.parquet(
        d + "/events.parquet"
    )
    got = {
        r["event_type"]: (
            r["n_events"], r["mean_value"], r["ci_lo"], r["ci_hi"]
        )
        for r in poisson_bootstrap_ci(spark, d).collect()
    }
    assert got == _ref(_PLANT)
    # zero-variance type: every replicate mean is exactly the value,
    # so the interval is the point
    assert got["steady"][2] == got["steady"][3] == 5.0
    # high-variance type: a strictly wider interval that brackets the
    # full-sample mean
    lo, hi = got["mixed"][2], got["mixed"][3]
    assert lo < got["mixed"][1] < hi
    assert (hi - lo) > 1.0
