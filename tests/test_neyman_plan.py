"""neyman_allocation_plan vs an independent reference: a high-variance
stratum must be over-sampled relative to its proportional share, and
the floors/budget arithmetic must match exactly."""

from __future__ import annotations

import math
import re

from smart_city_data_pipeline_spark.functions.rounding import pround_py
from smart_city_data_pipeline_spark.operators.textops import (
    NEYMAN_BUDGET,
    neyman_allocation_plan,
)

# Stratum 'steady': 40 docs of exactly 50 tokens (S_h = 0 -> zero
# allocation despite being the BIGGEST stratum). Stratum 'mixed':
# 20 docs alternating 10 / 400 tokens (huge spread -> dominates).
# Stratum 'single': one doc (n=1 -> S_h defined as 0).
_PLANT = (
    [("steady", " ".join(["w"] * 50))] * 40
    + [("mixed", " ".join(["w"] * (10 if i % 2 == 0 else 400))) for i in range(20)]
    + [("single", " ".join(["w"] * 77))]
)


def _ref(rows):
    strata = {}
    for src, text in rows:
        x = len([t for t in re.split(r"\s+", text.strip().lower()) if t])
        n, sx, sxx = strata.get(src, (0, 0, 0))
        strata[src] = (n + 1, sx + x, sxx + x * x)
    # mirrors the operator's quantize-then-sum rule: each stratum's
    # S_h snaps once to the 2^20 grid (small enough that floor stays
    # inside a 64-bit long at any corpus size), the weight is the
    # exact integer product n x S_h_q, the total an exact integer
    # sum, and the allocation pure integer floor division
    w = {}
    for src, (n, sx, sxx) in strata.items():
        s_h = (
            math.sqrt((n * sxx - sx * sx) / (n * (n - 1.0))) if n > 1 else 0.0
        )
        wq = n * math.floor(s_h * 1048576.0 + 0.5)
        w[src] = (n, sx, s_h, wq)
    twq = sum(v[3] for v in w.values())
    out = {}
    for src, (n, sx, s_h, wq) in w.items():
        out[src] = (
            n,
            pround_py(sx / n),
            pround_py(s_h),
            pround_py(wq / twq) if twq > 0 else None,
            (NEYMAN_BUDGET * wq) // twq if twq > 0 else 0,
        )
    return out


def test_allocation_matches_reference_and_favors_variance(spark, tmp_path):
    d = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, t, "en", src, len(t)) for i, (src, t) in enumerate(_PLANT)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(d + "/documents.parquet")
    got = {
        r["source"]: (
            r["n_docs"], r["mean_tokens"], r["stddev_tokens"],
            r["alloc_share"], r["n_sample"],
        )
        for r in neyman_allocation_plan(spark, d).collect()
    }
    want = _ref(_PLANT)
    assert got == want
    # the zero-variance stratum gets NOTHING despite being largest;
    # the spread stratum takes the whole budget (minus floor loss)
    assert got["steady"][4] == 0
    assert got["single"][4] == 0
    assert got["mixed"][4] == NEYMAN_BUDGET


def test_two_variable_strata_split_budget_exactly(spark, tmp_path):
    """Two nonzero-variance strata: shares sum to ~1, integer floors
    never overshoot the budget, and each matches the quantized-grid
    reference."""
    plant = (
        [("a", " ".join(["w"] * (5 if i % 2 == 0 else 105))) for i in range(12)]
        + [("b", " ".join(["w"] * (40 if i % 3 == 0 else 70))) for i in range(18)]
    )
    d = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, t, "en", src, len(t)) for i, (src, t) in enumerate(plant)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(d + "/documents.parquet")
    got = {
        r["source"]: (
            r["n_docs"], r["mean_tokens"], r["stddev_tokens"],
            r["alloc_share"], r["n_sample"],
        )
        for r in neyman_allocation_plan(spark, d).collect()
    }
    assert got == _ref(plant)
    n_total = sum(v[4] for v in got.values())
    assert NEYMAN_BUDGET - len(got) < n_total <= NEYMAN_BUDGET
