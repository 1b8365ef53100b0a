"""Planted-data tests for dedup_span_rewrite: keep-first-occurrence
cutting, overlap merge before excision, within-doc repetition exempt
(df is cross-document), and full-duplicate annihilation."""

from __future__ import annotations

import hashlib

from smart_city_data_pipeline_spark.operators.dedup import (
    SPAN_K,
    dedup_span_rewrite,
)

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_span_rewrite_planted(spark, tmp_path):
    assert SPAN_K == 8
    quote = " ".join(f"q{i}" for i in range(20))
    run9 = " ".join(f"x{i}" for i in range(9))  # 2 overlapping windows
    rep8 = " ".join(f"r{i}" for i in range(8))
    dup10 = " ".join(f"d{i}" for i in range(10))
    docs = [
        # 0/1 share the 20-token quote; doc 0 is first -> untouched
        (0, f"alpha beta {quote} tail0", "en", "s", 0),
        (1, f"{quote} gammaX deltaX", "en", "s", 0),
        # 3 repeats an 8-token phrase WITHIN itself only: df=1, exempt
        (3, f"{rep8} mid0 mid1 {rep8}", "en", "s", 0),
        # 4/5 share a 9-token run -> two OVERLAPPING windows in 5 must
        # merge to 9 cut positions (not 16)
        (4, f"{run9} aa0 aa1 aa2", "en", "s", 0),
        (5, f"{run9} bb0 bb1 bb2", "en", "s", 0),
        # 6/7 exact duplicates -> 7 rewrites to the empty string
        (6, dup10, "en", "s", 0),
        (7, dup10, "en", "s", 0),
    ]
    d = str(tmp_path / "docs")
    spark.createDataFrame(docs, DOC_SCHEMA).coalesce(1).write.parquet(
        d + "/documents.parquet"
    )
    got = {r["doc_id"]: r for r in dedup_span_rewrite(spark, d).collect()}

    # doc 0: every shared window's first occurrence -> full text kept
    assert got[0]["n_tokens_cut"] == 0
    assert got[0]["rewrite_sig"] == _md5(f"alpha beta {quote} tail0")
    # doc 1: quote excised (13 windows merge to 20 positions)
    assert got[1]["n_tokens"] == 22
    assert got[1]["n_tokens_after"] == 2
    assert got[1]["n_tokens_cut"] == 20
    assert got[1]["rewrite_sig"] == _md5("gammax deltax")
    # doc 3: within-doc repetition is not cross-doc duplication
    assert got[3]["n_tokens_cut"] == 0
    assert got[3]["rewrite_sig"] == _md5(f"{rep8} mid0 mid1 {rep8}")
    # doc 4 first -> kept; doc 5 loses the union 0..8, not 2x8
    assert got[4]["n_tokens_cut"] == 0
    assert got[5]["n_tokens"] == 12
    assert got[5]["n_tokens_cut"] == 9
    assert got[5]["rewrite_sig"] == _md5("bb0 bb1 bb2")
    # doc 7: fully duplicated -> empty rewrite
    assert got[6]["n_tokens_cut"] == 0
    assert got[7]["n_tokens_after"] == 0
    assert got[7]["n_tokens_cut"] == 10
    assert got[7]["rewrite_sig"] == _md5("")
