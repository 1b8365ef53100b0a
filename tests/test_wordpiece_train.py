"""WordPiece training vs an independent Python reference (own pair/
symbol counting and Fraction-exact likelihood scoring, quantized on
the shared grid), over a planted corpus where the WordPiece pick
PROVABLY differs from BPE's count-argmax pick."""

from __future__ import annotations

import re
from fractions import Fraction

from smart_city_data_pipeline_spark.operators.textops import (
    WP_SCORE_SHIFT,
    WP_TRAIN_ITERS,
    wordpiece_train_merges,
)

# 'xy' is the most FREQUENT pair (12 occurrences) but x and y are
# everywhere, so its likelihood is diluted; 'qz' occurs 6 times and
# q/z occur nowhere else, so count(qz)/(count(q)count(z)) = 6/36 wins
# over 12/(25*25). BPE would pick 'x y'; WordPiece must pick 'q z'.
_PLANT_DOCS = [
    "xyx yxy xyxy qz qz qz",
    "xy xy xy xy qz qz qz",
    "yx yx xy xy x y x y",
]


def _ref_wordpiece(texts, iters):
    words = {}
    for t in texts:
        for w in re.split(r"\s+", t.strip().lower()):
            if w:
                words[w] = words.get(w, 0) + 1
    syms = {w: ([c for c in w], n) for w, n in words.items()}
    out = []
    for it in range(1, iters + 1):
        pc, sc = {}, {}
        for seq, n in syms.values():
            for s in seq:
                sc[s] = sc.get(s, 0) + n
            for a, b in zip(seq, seq[1:]):
                pc[(a, b)] = pc.get((a, b), 0) + n
        best = None
        for (a, b), c in pc.items():
            q = c * WP_SCORE_SHIFT // (sc[a] * sc[b])
            key = (-q, -c, f"{a} {b}")
            if best is None or key < best[0]:
                best = (key, (a, b), c, q)
        (_, (a, b), c, q) = best
        out.append((it, f"{a} {b}", c, q))
        for w, (seq, n) in syms.items():
            new = []
            for s in seq:
                if new and new[-1] == a and s == b:
                    new[-1] = a + b
                else:
                    new.append(s)
            syms[w] = (new, n)
    return out


def test_wordpiece_matches_independent_reference(spark, tmp_path):
    d = str(tmp_path / "corpus")
    spark.createDataFrame(
        [(i, t, "en", "plant", len(t)) for i, t in enumerate(_PLANT_DOCS)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(d + "/documents.parquet")
    got = [tuple(r) for r in wordpiece_train_merges(spark, d).collect()]
    want = _ref_wordpiece(_PLANT_DOCS, WP_TRAIN_ITERS)
    assert got == want


def test_wordpiece_pick_differs_from_count_argmax(spark):
    """The planted corpus separates the two objectives: round 1 must
    fuse the rare-but-exclusive 'q z', not the frequent 'x y'."""
    want = _ref_wordpiece(_PLANT_DOCS, 1)
    assert want[0][1] == "q z"
    # count argmax would have picked x y (strictly more occurrences)
    counts = {}
    for t in _PLANT_DOCS:
        for w in t.split():
            for a, b in zip(w, w[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + 1
    assert max(counts.items(), key=lambda kv: (kv[1], kv[0]))[0] != ("q", "z")


def test_wordpiece_score_is_fraction_faithful():
    """The quantized integer score must floor the exact Fraction score
    on the shared grid (spot-check the reference's round-1 table)."""
    words = {}
    for t in _PLANT_DOCS:
        for w in re.split(r"\s+", t.strip().lower()):
            words[w] = words.get(w, 0) + 1
    pc, sc = {}, {}
    for w, n in words.items():
        for s in w:
            sc[s] = sc.get(s, 0) + n
        for a, b in zip(w, w[1:]):
            pc[(a, b)] = pc.get((a, b), 0) + n
    for (a, b), c in pc.items():
        exact = Fraction(c, sc[a] * sc[b])
        q = c * WP_SCORE_SHIFT // (sc[a] * sc[b])
        assert q == int(exact * WP_SCORE_SHIFT)
