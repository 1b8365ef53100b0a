"""Planted-data test for dedup_remediation_funnel: exact-dup docs drop
whole (and never double-count into the survivor signals), span and
self-repeat tokens accrue only to survivors, per source."""

from __future__ import annotations

from smart_city_data_pipeline_spark.operators.dedup import (
    dedup_remediation_funnel,
)

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def test_funnel_planted(spark, tmp_path):
    t1 = " ".join(f"q{i}" for i in range(12))
    rep = " ".join([f"r{i}" for i in range(8)] * 2)  # self-repeats at pos 8
    quote = " ".join(f"s{i}" for i in range(8))
    docs = [
        (0, t1, "en", "a", 0),
        (1, t1, "en", "a", 0),  # exact dup of 0 -> drops whole
        (2, rep, "en", "a", 0),  # survivor, 8 self-repeat tokens
        (3, f"u0 u1 {quote}", "en", "b", 0),  # first occurrence -> kept
        (4, f"{quote} v0 v1", "en", "b", 0),  # survivor, 8 span-cut tokens
    ]
    d = str(tmp_path / "docs")
    spark.createDataFrame(docs, DOC_SCHEMA).coalesce(1).write.parquet(
        d + "/documents.parquet"
    )
    got = {r["source"]: r for r in dedup_remediation_funnel(spark, d).collect()}
    a, b = got["a"], got["b"]
    assert (a["n_docs"], a["n_tokens"]) == (3, 40)
    assert (a["docs_exact_dup"], a["tok_exact_dup"]) == (1, 12)
    # doc 1 is an exact dup: its span-cut tokens must NOT double-count
    assert a["tok_span_cut"] == 0
    assert a["tok_self_repeat"] == 8
    assert a["remediated_share_ub"] == 0.5
    assert (b["n_docs"], b["n_tokens"]) == (2, 20)
    assert (b["docs_exact_dup"], b["tok_exact_dup"]) == (0, 0)
    assert b["tok_span_cut"] == 8
    assert b["tok_self_repeat"] == 0
    assert b["remediated_share_ub"] == 0.4
