"""Planted-data tests for self_repetition_truncate: truncation at the
first repeated 8-token window, degenerate all-same-token loops, and
untruncated passthrough (unique / too-short docs)."""

from __future__ import annotations

import hashlib

from smart_city_data_pipeline_spark.operators.dedup import (
    SPAN_K,
    self_repetition_truncate,
)

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_self_repetition_truncate_planted(spark, tmp_path):
    assert SPAN_K == 8
    prefix = [f"p{i}" for i in range(15)]
    repeat = prefix[2:10]  # re-quotes its own tokens 2..9
    tail = [f"t{i}" for i in range(6)]
    doc_a = " ".join(prefix + repeat + tail)
    doc_b = " ".join(["a"] * 12)  # degenerate loop
    doc_c = " ".join(f"u{i}" for i in range(30))  # all unique
    doc_d = "w0 w1 w2 w3 w4 w5 w6"  # shorter than one window
    docs = [
        (0, doc_a, "en", "s", 0),
        (1, doc_b, "en", "s", 0),
        (2, doc_c, "en", "s", 0),
        (3, doc_d, "en", "s", 0),
    ]
    d = str(tmp_path / "docs")
    spark.createDataFrame(docs, DOC_SCHEMA).coalesce(1).write.parquet(
        d + "/documents.parquet"
    )
    got = {r["doc_id"]: r for r in self_repetition_truncate(spark, d).collect()}

    # doc 0: window at pos 15 replays the window at pos 2 -> keep 15
    assert got[0]["truncated"] is True
    assert got[0]["n_tokens"] == 29
    assert got[0]["n_tokens_after"] == 15
    assert got[0]["trunc_sig"] == _md5(" ".join(prefix))
    # doc 1: every window identical -> first repeat at pos 1, keep 1
    assert got[1]["truncated"] is True
    assert got[1]["n_tokens_after"] == 1
    assert got[1]["trunc_sig"] == _md5("a")
    # docs 2/3: untruncated passthrough
    for did, txt in ((2, doc_c), (3, doc_d)):
        assert got[did]["truncated"] is False
        assert got[did]["n_tokens_after"] == got[did]["n_tokens"]
        assert got[did]["trunc_sig"] == _md5(txt)
