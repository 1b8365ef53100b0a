"""hits_scores vs an independent Python replay of the integer
hub/authority recurrence over the operator's own (oracle-verified)
kNN edge list, plus the normalization and no-in-link structural
properties."""

from __future__ import annotations

from smart_city_data_pipeline_spark.functions.rounding import pround_py
from smart_city_data_pipeline_spark.operators.dedup import knn_graph
from smart_city_data_pipeline_spark.operators.similarity import (
    HITS_ROUNDS,
    hits_scores,
)
from tests.test_knn_pagerank import _plant

Q = 1048576


def _hits_ref(edges, nodes):
    h = {n: Q for n in nodes}
    a = {n: 0 for n in nodes}
    for _ in range(HITS_ROUNDS):
        ar = {n: 0 for n in nodes}
        for u, v in edges:
            ar[v] += h[u]
        am = max(max(ar.values()), 1)
        a = {n: ar[n] * Q // am for n in nodes}
        hr = {n: 0 for n in nodes}
        for u, v in edges:
            hr[u] += a[v]
        hm = max(max(hr.values()), 1)
        h = {n: hr[n] * Q // hm for n in nodes}
    return {n: (pround_py(h[n] / Q), pround_py(a[n] / Q)) for n in nodes}


def test_hits_matches_integer_replay_and_normalizes(spark, tmp_path):
    d = _plant(spark, tmp_path)
    edges = [
        (r["vec_id"], r["neighbor_id"]) for r in knn_graph(spark, d).collect()
    ]
    nodes = list(range(12))
    want = _hits_ref(edges, nodes)
    got = {
        r["vec_id"]: (r["hub"], r["authority"])
        for r in hits_scores(spark, d).collect()
    }
    assert got == want
    # max-normalization pins the best hub and best authority at 1.0
    assert max(v[0] for v in got.values()) == 1.0
    assert max(v[1] for v in got.values()) == 1.0
    # a node nobody links to has authority exactly 0; a node with no
    # out-links has hub exactly 0
    in_nodes = {v for _, v in edges}
    out_nodes = {u for u, _ in edges}
    for n in nodes:
        if n not in in_nodes:
            assert got[n][1] == 0.0
        if n not in out_nodes:
            assert got[n][0] == 0.0
