"""knn_pagerank vs an independent Python replay: the integer mass
recurrence over the operator's own (oracle-verified) kNN edge list
must match exactly, and the structural PageRank properties (popular
nodes rank above peripheral ones, teleport floor for dangling nodes)
must hold on a planted 3-cluster corpus."""

from __future__ import annotations

from smart_city_data_pipeline_spark.functions.rounding import pround_py
from smart_city_data_pipeline_spark.operators.dedup import knn_graph
from smart_city_data_pipeline_spark.operators.similarity import (
    PR_BASE,
    PR_Q,
    PR_ROUNDS,
    knn_pagerank,
)

DIM = 64


def _vec(axis, eps_seed):
    """Unit-ish vector along one axis with a small deterministic
    perturbation so cosines inside a cluster are distinct."""
    v = [0.0] * DIM
    v[axis] = 1.0
    v[(axis + 7) % DIM] = 0.01 * ((eps_seed % 5) + 1)
    v[(axis + 13) % DIM] = 0.003 * ((eps_seed % 3) + 1)
    return v


def _plant(spark, tmp_path):
    # three orthogonal clusters (sizes 5 / 4 / 3): kNN edges stay
    # in-cluster, so the graph has three disconnected directed parts
    rows = []
    vid = 0
    for axis, size in ((0, 5), (20, 4), (40, 3)):
        for i in range(size):
            rows.append((vid, _vec(axis, vid), axis))
            vid += 1
    d = str(tmp_path / "emb")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.parquet(d + "/embeddings.parquet")
    return d


def _pr_ref(edges, nodes):
    deg = {}
    for u, _ in edges:
        deg[u] = deg.get(u, 0) + 1
    r = {n: PR_Q for n in nodes}
    for _ in range(PR_ROUNDS):
        s = {n: 0 for n in nodes}
        for u, v in edges:
            s[v] += r[u] // deg[u]
        r = {n: PR_BASE + (85 * s[n]) // 100 for n in nodes}
    return {
        n: (deg.get(n, 0), pround_py(r[n] / PR_Q)) for n in nodes
    }


def test_pagerank_matches_integer_replay_and_ranks_popular_nodes(
    spark, tmp_path
):
    d = _plant(spark, tmp_path)
    edges = [
        (row["vec_id"], row["neighbor_id"])
        for row in knn_graph(spark, d).collect()
    ]
    nodes = list(range(12))
    want = _pr_ref(edges, nodes)
    got = {
        row["vec_id"]: (row["out_deg"], row["pagerank"])
        for row in knn_pagerank(spark, d).collect()
    }
    assert got == want
    # edges never cross the orthogonal clusters
    cluster = lambda n: 0 if n < 5 else (1 if n < 9 else 2)
    assert all(cluster(u) == cluster(v) for u, v in edges)
    # every node with in-links sits strictly above the teleport floor;
    # the floor itself is PR_BASE-driven
    floor = pround_py((PR_BASE + 0) / PR_Q)
    in_deg = {}
    for _, v in edges:
        in_deg[v] = in_deg.get(v, 0) + 1
    for n in nodes:
        if in_deg.get(n, 0) == 0:
            assert got[n][1] == floor
        else:
            assert got[n][1] > floor
    # the most-linked node of the big cluster outranks every node of
    # the 3-cluster (more mass circulates among 5 than among 3)
    big_best = max(got[n][1] for n in range(5))
    small_best = max(got[n][1] for n in range(9, 12))
    assert big_best > small_best
