"""k-core peeling vs a sequential python reference, plus the
KCORE_ROUNDS convergence-headroom contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from smart_city_data_pipeline_spark.operators.similarity import (
    KCORE_ROUNDS,
    _peel_edges,
    kcore_decompose,
)


def _py_kcore(edges: list[tuple[int, int]], k: int) -> set[tuple[int, int]]:
    """Sequential reference peel: drop nodes with degree < k to fixpoint."""
    cur = set(edges)
    while True:
        deg: dict[int, int] = {}
        for u, v in cur:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        nxt = {(u, v) for u, v in cur if deg[u] >= k and deg[v] >= k}
        if nxt == cur:
            return cur
        cur = nxt


# Planted graph: a 4-clique (3-core), a triangle hanging off it via one
# bridge edge (2-core), and a pendant chain (coreness 1, peels away in
# several rounds — exercises the iteration, not just one pass).
PLANTED = [
    (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),  # 4-clique
    (4, 10), (10, 11), (11, 12), (10, 12),           # bridge + triangle
    (12, 20), (20, 21), (21, 22), (22, 23),          # pendant chain
]


@pytest.mark.parametrize("k", [2, 3])
def test_peel_matches_python_reference(spark, k):
    df = spark.createDataFrame(
        [(0, u, v) for u, v in PLANTED], ["label", "u", "v"]
    )
    got = {
        (r["u"], r["v"]) for r in _peel_edges(df, k).collect()
    }
    assert got == _py_kcore(PLANTED, k)


def test_planted_core_membership(spark):
    df = spark.createDataFrame(
        [(0, u, v) for u, v in PLANTED], ["label", "u", "v"]
    )
    core2 = _peel_edges(df, 2)
    nodes2 = {
        r["n"]
        for r in core2.select(F.col("u").alias("n"))
        .unionAll(core2.select(F.col("v").alias("n")))
        .distinct()
        .collect()
    }
    # chain peels away entirely; clique + triangle (+ bridge nodes on
    # the 4..10 edge are NOT 2-core members: the bridge edge dies)
    assert nodes2 == {1, 2, 3, 4, 10, 11, 12}
    core3 = _peel_edges(df, 3)
    nodes3 = {
        r["n"]
        for r in core3.select(F.col("u").alias("n"))
        .unionAll(core3.select(F.col("v").alias("n")))
        .distinct()
        .collect()
    }
    assert nodes3 == {1, 2, 3, 4}


def test_rounds_headroom(spark, sf_dir):
    """The real near-dup graph must converge well inside KCORE_ROUNDS
    (the oracle replays exactly KCORE_ROUNDS rounds — agreement needs
    the fixpoint reached within the cap)."""
    from smart_city_data_pipeline_spark.operators.dedup import (
        embedding_neardup,
    )

    edges = embedding_neardup(spark, sf_dir).select(
        "label", F.col("vec_a").alias("u"), F.col("vec_b").alias("v")
    )
    cur = edges.localCheckpoint(eager=False)
    prev = -1
    rounds = 0
    for _ in range(KCORE_ROUNDS):
        deg = (
            cur.select("label", F.col("u").alias("node"))
            .unionAll(cur.select("label", F.col("v").alias("node")))
            .groupBy("label", "node")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        keep = deg.filter(F.col("d") >= 2).select("label", "node")
        cur = (
            cur.join(keep.withColumnRenamed("node", "u"), ["label", "u"])
            .join(keep.withColumnRenamed("node", "v"), ["label", "v"])
            .select("label", "u", "v")
            .localCheckpoint(eager=False)
        )
        n = cur.count()
        rounds += 1
        if n == prev:
            break
        prev = n
    assert rounds * 2 <= KCORE_ROUNDS, f"converged in {rounds}, cap {KCORE_ROUNDS}"


def test_kcore_monotone(spark, sf_dir):
    out = kcore_decompose(spark, sf_dir).collect()
    assert len(out) > 0
    for r in out:
        assert r["n_nodes"] >= r["core2_nodes"] >= r["core3_nodes"] >= 0
