"""Unigram-LM tokenizer training vs an INDEPENDENT Python EM
reference: the reference below re-implements seed → hard-EM → prune
with plain dicts and its own Viterbi DP (no imports from the operator
beyond the shared grid constants), over a PLANTED corpus engineered so
the EM rounds actually move the segmentations."""

from __future__ import annotations

import re

from smart_city_data_pipeline_spark.operators.textops import (
    ULM_EM_ITERS,
    ULM_GRID,
    ULM_MAX_PIECE,
    ULM_MAX_WORD,
    ULM_SEED_N,
    ULM_VOCAB_TARGET,
    ulm_train_vocab,
)

# Repeated multi-char motifs (ab / abab / cdef) so multi-char pieces
# win seeds and the re-quantized scores shift segmentations between
# EM rounds; plus singleton words for alphabet coverage.
_PLANT_DOCS = [
    "abab abab ababab cdef cdefcdef ab ab ab",
    "cdef cdef ab abab xyz xyz q",
    "ababab ababab cdef zq zq zq ab",
    "mmmm mmmm mm mm mm cdefab",
    "abcd abcd ab cd ab cd abcd",
]

# Corpus engineered so the EM provably MOVES: under seed scores the
# word "abcd" Viterbi-segments as [abcd] (q0_abcd*GRID^3 = 384*GRID^2
# beats q0_ab*q0_cd*GRID^2 = 324*GRID^2 with the counts below), but
# after round 1's requantization over USED pieces only (total 90:
# ab=40 cd=40 abcd=10 -> q 56/56/14) the split wins (3136 vs 1792)
# and "abcd" drops out of the vocabulary entirely.
_FLIP_DOCS = [
    " ".join(["ab"] * 40),
    " ".join(["cd"] * 40),
    " ".join(["abcd"] * 10),
    "xyz",
]


def _ref_viterbi(w, vocab):
    """Independent DP: maximize product(q)*GRID^(len(w)-k), ties to the
    smallest bracket-encoded segmentation."""
    dp = [None] * (len(w) + 1)
    dp[0] = (1, [])
    for j in range(1, len(w) + 1):
        cands = []
        for i in range(max(0, j - ULM_MAX_PIECE), j):
            if dp[i] is None or w[i:j] not in vocab:
                continue
            score = dp[i][0] * vocab[w[i:j]] * ULM_GRID ** (j - i - 1)
            cands.append((score, dp[i][1] + [w[i:j]]))
        if cands:
            dp[j] = max(
                cands,
                key=lambda c: (
                    c[0],
                    [-ord(ch) for ch in "".join(f"[{p}]" for p in c[1])],
                ),
            )
    return dp[len(w)][1]


def _ref_ulm(texts, iters=ULM_EM_ITERS):
    words = {}
    for t in texts:
        for w in re.split(r"\s+", t.strip().lower()):
            if w and len(w) <= ULM_MAX_WORD:
                words[w] = words.get(w, 0) + 1
    # seed: every substring occurrence of length 1..MAX_PIECE
    sub = {}
    for w, wn in words.items():
        for s in range(len(w)):
            for ln in range(1, min(ULM_MAX_PIECE, len(w) - s) + 1):
                p = w[s:s + ln]
                sub[p] = sub.get(p, 0) + wn
    multis = sorted(
        ((p, c) for p, c in sub.items() if len(p) >= 2),
        key=lambda pc: (-pc[1], pc[0]),
    )[:ULM_SEED_N]
    singles = sorted(p for p in sub if len(p) == 1)
    seed = dict(multis)
    seed.update({p: sub[p] for p in singles})
    total = sum(seed.values())
    vocab = {p: max(1, c * ULM_GRID // total) for p, c in seed.items()}
    counts = {}
    for _ in range(iters):
        counts = {}
        for w, wn in words.items():
            for p in _ref_viterbi(w, vocab):
                counts[p] = counts.get(p, 0) + wn
        total = sum(counts.values())
        vocab = {p: max(1, c * ULM_GRID // total) for p, c in counts.items()}
        for ch in singles:
            vocab.setdefault(ch, 1)
    kept = sorted(
        ((p, c) for p, c in counts.items() if len(p) >= 2),
        key=lambda pc: (-pc[1], pc[0]),
    )[:ULM_VOCAB_TARGET]
    out = {ch: (counts.get(ch, 0), vocab[ch]) for ch in singles}
    out.update({p: (c, vocab[p]) for p, c in kept})
    return out


def _plant(spark, tmp_path, docs, name):
    d = str(tmp_path / name)
    spark.createDataFrame(
        [(i, t, "en", "plant", len(t)) for i, t in enumerate(docs)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(d + "/documents.parquet")
    return d


def test_ulm_matches_independent_reference(spark, tmp_path):
    d = _plant(spark, tmp_path, _PLANT_DOCS, "corpus")
    got = {
        r["piece"]: (r["n_viterbi"], r["score_q"])
        for r in ulm_train_vocab(spark, d).collect()
    }
    want = _ref_ulm(_PLANT_DOCS)
    assert got == want
    # sanity: the planted motifs were actually learned as pieces
    assert "ab" in got and got["ab"][0] > 0
    assert "cdef" in got


def test_ulm_em_actually_moves(spark, tmp_path):
    """The EM loop must not be a fixed point: on _FLIP_DOCS the word
    'abcd' segments as [abcd] under seed scores but as [ab][cd] after
    round 1's requantization, so 'abcd' drops out of the final vocab.
    The operator must agree with the reference on this corpus too."""
    want = _ref_ulm(_FLIP_DOCS)
    one = _ref_ulm(_FLIP_DOCS, iters=1)
    assert one != want  # the EM moved after round 1
    assert "abcd" in one and one["abcd"][0] > 0
    assert "abcd" not in want  # ...and pruned the seed-era piece
    assert want["ab"][0] == 50  # 40 standalone + 10 from the split
    d = _plant(spark, tmp_path, _FLIP_DOCS, "flip")
    got = {
        r["piece"]: (r["n_viterbi"], r["score_q"])
        for r in ulm_train_vocab(spark, d).collect()
    }
    assert got == want


def test_ulm_singles_never_pruned(spark, sf_dir):
    """Every single character of the corpus alphabet survives pruning
    (segmentability guarantee), and multi-char pieces obey the target
    cap."""
    rows = ulm_train_vocab(spark, sf_dir).collect()
    pieces = {r["piece"] for r in rows}
    multis = [p for p in pieces if len(p) >= 2]
    assert len(multis) <= ULM_VOCAB_TARGET
    from smart_city_data_pipeline_spark.catalog import table

    alphabet = {
        ch
        for (t,) in table(spark, sf_dir, "documents").select("text").collect()
        for w in t.strip().lower().split()
        if len(w) <= ULM_MAX_WORD
        for ch in w
    }
    assert alphabet <= pieces


def test_ulm_fertility_matches_reference(spark, tmp_path):
    """ulm_encode_fertility ≡ an independent encode pass: prune the
    reference's final vocab, re-Viterbi every word, and compute the
    weighted ratios directly."""
    from smart_city_data_pipeline_spark.functions.rounding import pround_py
    from smart_city_data_pipeline_spark.operators.textops import (
        ulm_encode_fertility,
    )

    ref = _ref_ulm(_PLANT_DOCS)  # piece -> (count, q): the pruned vocab
    vocab = {p: q for p, (_, q) in ref.items()}
    words = {}
    for t in _PLANT_DOCS:
        for w in re.split(r"\s+", t.strip().lower()):
            if w and len(w) <= ULM_MAX_WORD:
                words[w] = words.get(w, 0) + 1
    pieces_after = sum(
        wn * len(_ref_viterbi(w, vocab)) for w, wn in words.items()
    )
    tw = sum(words.values())
    cb = sum(wn * len(w) for w, wn in words.items())
    d = _plant(spark, tmp_path, _PLANT_DOCS, "fert")
    row = ulm_encode_fertility(spark, d).collect()[0]
    assert row["em_iters"] == ULM_EM_ITERS
    assert row["vocab_pieces"] == len(vocab)
    assert row["vocab_words"] == len(words)
    assert row["total_words"] == tw
    assert row["chars_per_word"] == pround_py(cb / tw)
    assert row["pieces_per_word"] == pround_py(pieces_after / tw)
    assert row["saved_share"] == pround_py((cb - pieces_after) / cb)
    assert row["pieces_per_word"] < row["chars_per_word"]  # vocab bought something
