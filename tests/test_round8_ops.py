"""Planted-data property tests for the round-8 operators — the oracle
hash-check pins Spark≡DuckDB on the real corpus; these pin the
SEMANTICS on constructed inputs where the right answer is known in
closed form or derivable by an independent Python implementation."""

from __future__ import annotations

import math
from collections import Counter
from datetime import datetime, timedelta
from fractions import Fraction

import pytest

from smart_city_data_pipeline_spark.operators.timeseries import (
    KAL_G,
    KAL_R_C2,
    kalman_level_filter,
    periodogram_power,
    weco_rule_violations,
)
from smart_city_data_pipeline_spark.operators.textops import (
    KN_Q,
    kneser_ney_score,
)
from smart_city_data_pipeline_spark.operators.dedup import (
    rouge2_candidate_report,
)

EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)
DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"

T0 = datetime(2026, 1, 1)


def _write_events(spark, tmp_path, rows):
    d = str(tmp_path / "lake")
    spark.createDataFrame(rows, EV_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(d + "/events.parquet")
    return d


def _write_docs(spark, tmp_path, rows):
    d = str(tmp_path / "lake")
    spark.createDataFrame(rows, DOC_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(d + "/documents.parquet")
    return d


def test_kalman_constant_series_locks_on(spark, tmp_path):
    """A constant series has zero innovation after the init point and
    the level equals the constant exactly; the variance shrinks below
    the measurement variance (the gain did its job)."""
    rows = [
        (i, T0 + timedelta(minutes=i), 7, "a", 123.45, "")
        for i in range(40)
    ]
    got = kalman_level_filter(spark, _write_events(spark, tmp_path, rows))
    [r] = got.collect()
    assert r["n_points"] == 40
    assert r["final_level"] == 123.45
    assert r["mean_abs_innovation"] == 0.0
    assert r["final_variance"] < KAL_R_C2 / 10000.0


def test_kalman_step_tracks_toward_new_level(spark, tmp_path):
    """After a level shift the filter moves monotonically toward the
    new level and ends strictly between old and new."""
    rows = [
        (i, T0 + timedelta(minutes=i), 3, "a", 100.0, "") for i in range(20)
    ] + [
        (20 + i, T0 + timedelta(minutes=20 + i), 3, "a", 200.0, "")
        for i in range(5)
    ]
    [r] = kalman_level_filter(
        spark, _write_events(spark, tmp_path, rows)
    ).collect()
    assert 100.0 < r["final_level"] < 200.0
    assert r["mean_abs_innovation"] > 0


def test_weco_rule4_run_of_eight(spark, tmp_path):
    """20 alternating points around 0 then 8 consecutive at +1: the
    mean is 8/28 < 1, so the final 8 sit on one side — rule 4 fires;
    nothing is ever near 3 sigma."""
    vals = [(-1.0) ** i for i in range(20)] + [1.0] * 8
    rows = [
        (i, T0 + timedelta(minutes=i), 11, "a", v, "")
        for i, v in enumerate(vals)
    ]
    [r] = weco_rule_violations(
        spark, _write_events(spark, tmp_path, rows)
    ).collect()
    assert r["n_points"] == 28
    assert r["n_rule4"] >= 1
    assert r["n_rule1"] == 0


def test_periodogram_recovers_daily_amplitude(spark, tmp_path):
    """A pure 24 h cosine of amplitude 0.5 over 14 whole days: the
    daily amplitude estimate lands on 0.5 (quantization + cent
    rounding tolerance) and the weekly bin stays near zero."""
    rows = []
    for h in range(14 * 24):
        v = 100.0 + 0.5 * math.cos(2 * math.pi * h / 24.0)
        rows.append((h, T0 + timedelta(hours=h), 1, "z", round(v, 2), ""))
    got = {
        r["period_h"]: r["amplitude"]
        for r in periodogram_power(
            spark, _write_events(spark, tmp_path, rows)
        ).collect()
    }
    assert abs(got[24] - 0.5) < 0.02
    assert got[168] < 0.1


def test_rouge2_identical_docs_score_one(spark, tmp_path):
    """Two identical documents share every minhash band, so they are a
    candidate pair, and their clipped-bigram overlap is total."""
    text = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, text, "en", "s", len(text)),
        (2, text, "en", "s", len(text)),
    ]
    out = rouge2_candidate_report(
        spark, _write_docs(spark, tmp_path, rows)
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["doc_a"], r["doc_b"]) == (1, 2)
    assert r["rouge2_p"] == 1.0 and r["rouge2_r"] == 1.0
    assert r["rouge2_f1"] == 1.0


def _kn_expected(train_texts, eval_texts):
    """Independent interpolated-KN implementation on exact Fractions
    (D = 3/4), replicating the operator's documented fallbacks."""
    def bigrams(t):
        tk = t.lower().split()
        return list(zip(tk, tk[1:]))

    big = Counter(bg for t in train_texts for bg in bigrams(t))
    c1 = Counter()
    n1fw = Counter()
    n1bw = Counter()
    for (w1, w2), c in big.items():
        c1[w1] += c
        n1fw[w1] += 1
        n1bw[w2] += 1
    ncc = len(big)
    D = Fraction(3, 4)
    total_q = 0
    n = 0
    for t in eval_texts:
        for w1, w2 in bigrams(t):
            nb = max(n1bw.get(w2, 0), 1)
            if w1 in c1:
                p = (
                    Fraction(max(Fraction(big.get((w1, w2), 0)) - D, 0), c1[w1])
                    + D * n1fw[w1] / c1[w1] * Fraction(nb, ncc)
                )
            else:
                p = Fraction(nb, ncc)
            total_q += math.floor(-math.log(float(p)) * KN_Q + 0.5)
            n += 1
    return total_q / n / KN_Q


def test_kneser_ney_matches_fraction_reference(spark, tmp_path):
    """Plant a corpus whose md5 split is probed so train/eval are
    known, then check the operator's mean_neg_logprob against an
    independent Fraction-arithmetic interpolated-KN scorer. Also the
    KN identity: probabilities over the continuation vocab of a seen
    context sum to exactly 1."""
    from smart_city_data_pipeline_spark.functions.hashing import md5_long

    from pyspark.sql import functions as F

    # probe the split the operator uses: md5("kn:"+id) % 10 < 8
    probe = spark.range(200).select(
        "id",
        (
            md5_long(F.concat(F.lit("kn:"), F.col("id").cast("string")))
            % 10
            < 8
        ).alias("tr"),
    )
    split = {r["id"]: r["tr"] for r in probe.collect()}
    train_ids = [i for i in range(200) if split[i]][:6]
    eval_ids = [i for i in range(200) if not split[i]][:3]

    texts = {
        train_ids[0]: "a b c a b d",
        train_ids[1]: "a b c c b a",
        train_ids[2]: "b c d a a b",
        train_ids[3]: "c a b b d c",
        train_ids[4]: "d d a b c a",
        train_ids[5]: "a c b d c b",
        eval_ids[0]: "a b c d",
        eval_ids[1]: "b a c c zzz b",
        eval_ids[2]: "zzz qqq a b",
    }
    rows = [
        (i, t, "en", "s", len(t)) for i, t in sorted(texts.items())
    ]
    sf = _write_docs(spark, tmp_path, rows)
    out = kneser_ney_score(spark, sf).collect()
    assert len(out) == 1
    got = out[0]
    want = _kn_expected(
        [texts[i] for i in train_ids], [texts[i] for i in eval_ids]
    )
    assert got["mean_neg_logprob"] == pytest.approx(want, abs=1e-3)
    assert got["n_ctx_oov"] >= 1  # 'zzz'/'qqq' contexts exercised
    assert got["n_unseen_bigram"] >= 1

    # KN normalization identity on the train counts (exact Fractions)
    def bigrams(t):
        tk = t.lower().split()
        return list(zip(tk, tk[1:]))

    big = Counter(
        bg for i in train_ids for bg in bigrams(texts[i])
    )
    c1 = Counter()
    n1fw = Counter()
    n1bw = Counter()
    for (w1, w2), c in big.items():
        c1[w1] += c
        n1fw[w1] += 1
        n1bw[w2] += 1
    ncc = len(big)
    D = Fraction(3, 4)
    vocab = set(n1bw)
    for w1 in c1:
        s = sum(
            Fraction(max(Fraction(big.get((w1, w2), 0)) - D, 0), c1[w1])
            + D * n1fw[w1] / c1[w1] * Fraction(n1bw[w2], ncc)
            for w2 in vocab
        )
        assert s == 1
