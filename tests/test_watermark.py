"""Watermark detection: a planted green-list-generated document must
flag while ordinary word-soup text does not (the operator's oracle
parity covers the arithmetic; this pins the DETECTION POWER on actual
watermarked generation)."""

from __future__ import annotations

import hashlib

from smart_city_data_pipeline_spark.operators.textops import (
    WM_GAMMA_DEN,
    watermark_detect,
)

VOCAB = [
    "the", "fast", "key", "order", "sort", "table", "scan", "merge",
    "part", "window", "small", "hash", "join", "batch", "stream",
    "spark", "dup", "row", "data", "slow",
]


def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _is_green(prev: str, token: str) -> bool:
    return _md5_long(f"wm:{prev}:{token}") % WM_GAMMA_DEN == 0


def _watermarked_text(n_tokens: int) -> str:
    """Greedy green-list generation: always pick the first green
    continuation (a soft-watermark sampler boosts green logits; greedy
    selection is its deterministic limit)."""
    toks = [VOCAB[0]]
    for _ in range(n_tokens - 1):
        nxt = next(
            (w for w in VOCAB if _is_green(toks[-1], w)), VOCAB[1]
        )
        toks.append(nxt)
    return " ".join(toks)


def _human_text(n_tokens: int, seed: str = "h") -> str:
    """md5-driven word soup, independent of the green partition (a
    short MODULAR pattern repeats its handful of bigrams and inherits
    their green bias — the first draft tripped exactly that)."""
    return " ".join(
        VOCAB[_md5_long(f"{seed}:{i}") % len(VOCAB)]
        for i in range(n_tokens)
    )


def test_planted_watermark_flags(spark, tmp_path):
    docs = [
        (0, _watermarked_text(120), "en", "src0", 0),
        (1, _human_text(120), "en", "src0", 0),
        (2, _human_text(200), "de", "src1", 0),
    ]
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    got = {
        r["doc_id"]: r
        for r in watermark_detect(spark, str(tmp_path)).collect()
    }
    assert got[0]["watermark_detected"] is True
    assert got[0]["z_score"] > 4
    assert got[1]["watermark_detected"] is False
    assert got[2]["watermark_detected"] is False
    # calibration: human green fraction stays near gamma = 1/4
    assert abs(got[1]["green_frac"] - 0.25) < 0.15
