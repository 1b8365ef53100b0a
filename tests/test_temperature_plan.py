"""temperature_sampling_plan vs an independent reference: the
quantized-grid share arithmetic must match exactly, tau=1.0 must
reproduce proportional sampling, and smaller tau must strictly
up-weight the low-resource source (the knob's whole point)."""

from __future__ import annotations

import math
import re

from smart_city_data_pipeline_spark.functions.rounding import pround_py
from smart_city_data_pipeline_spark.operators.textops import (
    SAMPLING_TEMPS,
    TEMP_Q,
    temperature_sampling_plan,
)

# 'big': 30 docs x 100 tokens; 'mid': 10 x 40; 'small': 4 x 5 —
# a 3000 / 400 / 20 token imbalance.
_PLANT = (
    [("big", " ".join(["w"] * 100))] * 30
    + [("mid", " ".join(["w"] * 40))] * 10
    + [("small", " ".join(["w"] * 5))] * 4
)


def _xt(x, tau):
    """x^tau via the SAME sqrt composition the engines use — the
    reference must mirror the correctly-rounded op sequence, not
    Python's pow."""
    if tau == 0.25:
        return math.sqrt(math.sqrt(x))
    if tau == 0.5:
        return math.sqrt(x)
    if tau == 0.75:
        return math.sqrt(x) * math.sqrt(math.sqrt(x))
    return x


def _ref(rows):
    per = {}
    for src, text in rows:
        x = len([t for t in re.split(r"\s+", text.strip()) if t])
        n, c = per.get(src, (0, 0))
        per[src] = (n + 1, c + x)
    corpus = sum(c for _, c in per.values())
    mx = max(c for _, c in per.values())
    out = {}
    for tau in SAMPLING_TEMPS:
        wq = {
            src: math.floor(_xt(c / mx, tau) * TEMP_Q + 0.5)
            for src, (_, c) in per.items()
        }
        twq = sum(wq.values())
        for src, (n, c) in per.items():
            out[(tau, src)] = (
                n,
                c,
                pround_py(wq[src] / twq),
                pround_py(wq[src] * corpus / (twq * c)) if c > 0 else 0.0,
            )
    return out


def test_plan_matches_reference_and_flattens_at_low_tau(spark, tmp_path):
    d = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, t, "en", src, len(t)) for i, (src, t) in enumerate(_PLANT)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(d + "/documents.parquet")
    got = {
        (r["tau"], r["source"]): (
            r["n_docs"], r["n_tokens"], r["sample_share"], r["epochs"]
        )
        for r in temperature_sampling_plan(spark, d).collect()
    }
    assert got == _ref(_PLANT)
    # tau = 1.0 is proportional sampling: share == tokens/corpus, so
    # every source's epoch factor is ~1 (one corpus-sized draw sees
    # each source about once)
    for src in ("big", "mid", "small"):
        assert abs(got[(1.0, src)][3] - 1.0) <= 2e-4
    # smaller tau strictly up-weights the low-resource source and
    # strictly down-weights the dominant one
    small_shares = [got[(t, "small")][2] for t in SAMPLING_TEMPS]
    big_shares = [got[(t, "big")][2] for t in SAMPLING_TEMPS]
    assert small_shares == sorted(small_shares, reverse=True)
    assert big_shares == sorted(big_shares)
    # the over-sampling diagnostic: at tau=0.25 the small source is
    # re-seen many times per corpus draw
    assert got[(0.25, "small")][3] > 5.0
