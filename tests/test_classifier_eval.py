"""classifier_calibration_report / roc_auc_report vs independent
Python references: the scores come from the already-oracle-verified
quality_classifier_score; what these tests pin is the NEW aggregation
arithmetic — binned reliability/ECE/Brier and the tie-aware rank AUC —
against a second implementation that shares no code with the
operators (ranks instead of cumulative-negative sums for AUC)."""

from __future__ import annotations

import math

from smart_city_data_pipeline_spark.functions.rounding import pround_py
from smart_city_data_pipeline_spark.operators.stats import (
    classifier_calibration_report,
    roc_auc_report,
)
from smart_city_data_pipeline_spark.operators.textops import (
    quality_classifier_score,
)

# Stopword-rich English (scores high), punctuation-soup German (scores
# low), and a middling mixed band so several bins are populated.
_PLANT = (
    [("en", "the and of to in is was for on as it with he at by")] * 8
    + [("en", "a quick brown fox jumps over the lazy dog again and again")] * 6
    + [("de", "!!! ??? ,,, ;;; ::: !!! ??? ,,, ;;; :::")] * 7
    + [("de", "zugverbindung fernverkehr hauptbahnhof verspaetung gleis")] * 5
    + [("en", "alpha beta gamma delta epsilon zeta eta theta iota kappa")] * 4
)


def _write_docs(spark, tmp_path, plant):
    d = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, t, lang, f"src{i % 3}", len(t)) for i, (lang, t) in enumerate(plant)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(d + "/documents.parquet")
    return d


def _sy_pairs(spark, d, plant):
    """(s, y) per doc on the exact 1e-4 grid, read back from the
    verified score operator so the reference shares no aggregation
    code with the units under test."""
    scores = {
        r["doc_id"]: r["qc_score"]
        for r in quality_classifier_score(spark, d).collect()
    }
    return [
        (int(math.floor(scores[i] * 10000.0 + 0.5)), 1 if lang == "en" else 0)
        for i, (lang, _) in enumerate(plant)
    ]


def _cal_ref(pairs):
    bins = {}
    for s, y in pairs:
        b = min(s // 1000, 9)
        n, p, cs, sq = bins.get(b, (0, 0, 0, 0))
        bins[b] = (n + 1, p + y, cs + s, sq + (s - y * 10000) ** 2)
    n_total = sum(v[0] for v in bins.values())
    rows = {}
    ece_num = 0
    for b, (n, p, cs, sq) in bins.items():
        mc = pround_py(cs / (10000.0 * n))
        fp = pround_py(p / n)
        gap_i = abs(
            int(math.floor(mc * 10000.0 + 0.5))
            - int(math.floor(fp * 10000.0 + 0.5))
        )
        ece_num += gap_i * n
        rows[b] = (n, p, mc, fp, gap_i / 10000.0)
    ece = pround_py(ece_num / (10000.0 * n_total))
    brier = pround_py(
        sum(v[3] for v in bins.values()) / (100000000.0 * n_total)
    )
    return rows, ece, brier


def _auc_ref(pairs):
    """Tie-aware AUC via average ranks — a different identity than the
    operator's cumulative-negative formula."""
    pos = [s for s, y in pairs if y == 1]
    neg = [s for s, y in pairs if y == 0]
    num2 = sum(
        2 * sum(1 for t in neg if t < s) + sum(1 for t in neg if t == s)
        for s in pos
    )
    return pround_py(num2 / (2.0 * len(pos) * len(neg)))


def test_calibration_matches_reference(spark, tmp_path):
    d = _write_docs(spark, tmp_path, _PLANT)
    pairs = _sy_pairs(spark, d, _PLANT)
    want_rows, want_ece, want_brier = _cal_ref(pairs)
    got = classifier_calibration_report(spark, d).collect()
    assert {
        r["bin"]: (
            r["n_docs"], r["n_pos"], r["mean_conf"], r["frac_pos"], r["cal_gap"]
        )
        for r in got
    } == want_rows
    assert all(r["ece"] == want_ece for r in got)
    assert all(r["brier"] == want_brier for r in got)
    assert len(got) >= 2  # the plant populates both tails


def test_roc_matches_reference_and_separable_corpus_hits_auc_1(
    spark, tmp_path
):
    d = _write_docs(spark, tmp_path, _PLANT)
    pairs = _sy_pairs(spark, d, _PLANT)
    got = roc_auc_report(spark, d).collect()
    assert all(r["auc"] == _auc_ref(pairs) for r in got)
    # per-threshold cumulative counts against a direct recount
    for r in got:
        s = int(math.floor(r["thr"] * 10000.0 + 0.5))
        assert r["n_pos_ge"] == sum(1 for t, y in pairs if y == 1 and t >= s)
        assert r["n_neg_ge"] == sum(1 for t, y in pairs if y == 0 and t >= s)
    # tpr/fpr both non-decreasing as the threshold drops
    ordered = sorted(got, key=lambda r: -r["thr"])
    assert all(
        a["tpr"] <= b["tpr"] and a["fpr"] <= b["fpr"]
        for a, b in zip(ordered, ordered[1:])
    )
    # a perfectly separable plant (every en score above every de score)
    # must read AUC exactly 1.0
    sep = [p for p in _PLANT if "fox" not in p[1] and "alpha" not in p[1]]
    d2 = _write_docs(spark, tmp_path / "sep", sep)
    sep_pairs = _sy_pairs(spark, d2, sep)
    assert min(s for s, y in sep_pairs if y == 1) > max(
        s for s, y in sep_pairs if y == 0
    )
    got2 = roc_auc_report(spark, d2).collect()
    assert all(r["auc"] == 1.0 for r in got2)


def test_null_lang_counts_as_negative(spark, tmp_path):
    """A NULL lang row is a NEGATIVE, not a dropped row: the Spark
    label uses eqNullSafe to match the oracle's CASE WHEN lang = 'en'
    semantics (a plain == would NULL the label and silently remove
    the row from every moment sum — r11 review finding)."""
    plant = _PLANT[:6] + [(None, "!!! ??? ,,, ;;; ::: !!! ??? ,,, ;;;")] * 3
    d = _write_docs(spark, tmp_path, plant)
    pairs = _sy_pairs(spark, d, plant)
    assert sum(1 for _, y in pairs if y == 0) == 3  # NULLs landed as 0
    want_rows, want_ece, want_brier = _cal_ref(pairs)
    got = classifier_calibration_report(spark, d).collect()
    assert sum(r["n_docs"] for r in got) == len(plant)  # nothing dropped
    assert {
        r["bin"]: (
            r["n_docs"], r["n_pos"], r["mean_conf"], r["frac_pos"], r["cal_gap"]
        )
        for r in got
    } == want_rows
    assert all(r["ece"] == want_ece and r["brier"] == want_brier for r in got)
    got_roc = roc_auc_report(spark, d).collect()
    assert all(r["auc"] == _auc_ref(pairs) for r in got_roc)


def test_roc_all_ties_reads_auc_half(spark, tmp_path):
    """One shared score across both classes: every pair is a tie, and
    the Mann-Whitney half-credit convention must land AUC at exactly
    0.5 (the naive >-only or >=-only formulas read 0.0 / 1.0)."""
    plant = [("en", "same text every time")] * 5 + [
        ("de", "same text every time")
    ] * 5
    d = _write_docs(spark, tmp_path, plant)
    got = roc_auc_report(spark, d).collect()
    assert len(got) == 1
    assert got[0]["auc"] == 0.5
    assert got[0]["tpr"] == 1.0 and got[0]["fpr"] == 1.0
