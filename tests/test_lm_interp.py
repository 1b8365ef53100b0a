"""lm_interpolation_sweep vs an independent Python reference on a
planted corpus where the held-out argmin is provably an INTERIOR
lambda (the whole point of interpolation: some eval bigrams are
unseen, so pure-ish bigram pays the near-OOV price, while pure
unigram wastes the order signal)."""

from __future__ import annotations

import math
import re

from smart_city_data_pipeline_spark.operators.textops import (
    LM_INTERP_DEN,
    LM_INTERP_Q,
    lm_interpolation_sweep,
)

# Even docs (train): strongly ordered 'a b' / 'c d' chains. Odd docs
# (eval): mostly the same chains (bigram wins) plus a few pairs whose
# bigram is UNSEEN in train ('b c' boundary and the novel 'e' token),
# which only unigram mass can pay for.
_PLANT_DOCS = [
    ("a b " * 30).strip(),          # doc 0 (train)
    ("a b c d a b " * 10).strip(),  # doc 1 (eval)
    ("c d " * 30).strip(),          # doc 2 (train)
    ("c d e a b " * 6).strip(),     # doc 3 (eval): 'e' unseen in train
]


def _ref_sweep(texts):
    toks = {}
    for did, t in enumerate(texts):
        toks[did] = [w for w in re.split(r"\s+", t.strip().lower()) if w]
    uni, big, pre, nn = {}, {}, {}, 0
    for did, tk in toks.items():
        if did % 2 == 0:
            for w in tk:
                uni[w] = uni.get(w, 0) + 1
                nn += 1
            for a, b in zip(tk, tk[1:]):
                big[(a, b)] = big.get((a, b), 0) + 1
                pre[a] = pre.get(a, 0) + 1
    vv = len(uni)
    ev = [p for did, tk in toks.items() if did % 2 == 1
          for p in zip(tk, tk[1:])]
    out = {}
    for k in range(LM_INTERP_DEN):
        lam = k / LM_INTERP_DEN
        s = 0
        for a, b in ev:
            p1 = (uni.get(b, 0) + 1) / (nn + vv + 1)
            p2 = big.get((a, b), 0) / pre[a] if a in pre else 0.0
            mix = lam * p2 + (1.0 - lam) * p1
            s += math.floor(-math.log(mix) * float(LM_INTERP_Q) + 0.5)
        from smart_city_data_pipeline_spark.functions.rounding import pround_py

        out[k] = (len(ev), pround_py(s / (len(ev) * LM_INTERP_Q)))
    return out


def test_sweep_matches_reference_and_argmin_is_interior(spark, tmp_path):
    d = str(tmp_path / "corpus")
    spark.createDataFrame(
        [(i, t, "en", "plant", len(t)) for i, t in enumerate(_PLANT_DOCS)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(d + "/documents.parquet")
    got = {
        r["lam_num"]: (r["n_pairs"], r["mean_neg_logprob"])
        for r in lm_interpolation_sweep(spark, d).collect()
    }
    want = _ref_sweep(_PLANT_DOCS)
    assert got == want
    # interior argmin: lambda=0 (pure unigram) is not best, and the
    # curve bends back up approaching pure bigram (unseen 'd e'/'b c')
    means = [want[k][1] for k in range(LM_INTERP_DEN)]
    best = min(range(LM_INTERP_DEN), key=lambda k: means[k])
    assert 0 < best < LM_INTERP_DEN - 1
    assert means[LM_INTERP_DEN - 1] > means[best]
    assert means[0] > means[best]
