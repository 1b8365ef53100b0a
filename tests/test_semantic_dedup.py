"""SemDeDup semantics on a corpus with PLANTED paraphrase clusters
(VERDICT r5 item 4): near-identical vectors must collapse to exactly
one survivor (the lowest vec_id), spread-out vectors must all survive.
"""

from __future__ import annotations

import pytest

from smart_city_data_pipeline_spark.operators.similarity import (
    SEMDEDUP_T,
    semantic_dedup,
    semantic_dedup_frame,
)

DIM = 8


def _vec(axis: int, eps: float = 0.0, eps_axis: int = 1) -> list[float]:
    """Unit-ish vector along ``axis`` with a small ``eps`` bleed onto
    ``eps_axis`` — cosine vs the pure axis vector ≈ 1/sqrt(1+eps²)."""
    v = [0.0] * DIM
    v[axis] = 1.0
    if eps:
        v[(axis + eps_axis) % DIM] = eps
    return v


@pytest.fixture(scope="module")
def planted(spark):
    # two paraphrase clusters (3 + 2 members, eps ≈ 0 → cos ≈ 1) and
    # three mutually-orthogonal singletons
    rows = [
        (0, _vec(0)), (1, _vec(0, 0.01)), (2, _vec(0, 0.02, 2)),  # cluster A
        (10, _vec(3)), (11, _vec(3, 0.015)),                      # cluster B
        (20, _vec(5)), (21, _vec(6)), (22, _vec(7)),              # singletons
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _centroids():
    # two hand-made cells on the integer grid: one near cluster A's
    # axis, one near cluster B's — singletons land where L2 puts them
    s = 65536.0
    return [
        [s if i == 0 else 0.0 for i in range(DIM)],
        [s if i == 3 else 0.0 for i in range(DIM)],
    ]


def test_one_survivor_per_planted_cluster(planted):
    out = {r["vec_id"]: r for r in semantic_dedup_frame(planted, _centroids()).collect()}
    assert set(out) == {0, 1, 2, 10, 11, 20, 21, 22}
    # cluster A: only the lowest id survives, others point at it
    assert out[0]["kept"] and out[0]["dominated_by"] == -1
    for v in (1, 2):
        assert not out[v]["kept"]
        assert out[v]["dominated_by"] == 0
        assert out[v]["max_sim"] >= SEMDEDUP_T
    # cluster B likewise
    assert out[10]["kept"]
    assert not out[11]["kept"] and out[11]["dominated_by"] == 10


def test_orthogonal_singletons_all_survive(planted):
    out = {r["vec_id"]: r for r in semantic_dedup_frame(planted, _centroids()).collect()}
    for v in (20, 21, 22):
        assert out[v]["kept"], v
        assert out[v]["n_near"] == 0
        assert out[v]["max_sim"] == 0.0


def test_survivor_set_is_prefix_closed(planted):
    """Greedy lowest-id pick: a dropped vector's dominator is always
    kept OR itself dominated by a still-lower id — following the chain
    terminates at a kept vector (no dangling canonical)."""
    out = {r["vec_id"]: r for r in semantic_dedup_frame(planted, _centroids()).collect()}
    for r in out.values():
        if not r["kept"]:
            dom = r["dominated_by"]
            assert dom in out and dom < r["vec_id"]


def test_corpus_entry_has_both_branches(spark, sf_dir):
    """On the real corpus the operator must actually dedup (both
    kept/dropped branches real) and every cell id must be a valid
    quantizer cell."""
    out = semantic_dedup(spark, sf_dir).collect()
    kept = [r for r in out if r["kept"]]
    dropped = [r for r in out if not r["kept"]]
    assert kept and dropped
    assert all(0 <= r["cell"] < 16 for r in out)
    for r in dropped:
        assert r["dominated_by"] < r["vec_id"]
        assert r["max_sim"] >= SEMDEDUP_T
