"""facility_location_select vs an independent Python greedy replay
over the operator's own weighted band-mate edge list, plus the
submodularity guarantee (marginal gains are non-increasing) and the
representative property (one pick per planted cluster before any
second pick inside a cluster)."""

from __future__ import annotations

from smart_city_data_pipeline_spark.operators.similarity import (
    FL_K,
    _fl_weighted_edges,
    facility_location_select,
)
from tests.test_knn_pagerank import _plant


def _ref(edges, nodes):
    adj = {}
    for src, v, w in edges:
        adj.setdefault(src, {})[v] = w
    cur = {n: 0 for n in nodes}
    picks, chosen = [], set()
    for order in range(1, FL_K + 1):
        gains = {
            c: sum(max(0, w - cur[v]) for v, w in adj.get(c, {}).items())
            for c in nodes
            if c not in chosen
        }
        pick = max(gains, key=lambda c: (gains[c], -c))
        chosen.add(pick)
        for v, w in adj.get(pick, {}).items():
            cur[v] = max(cur[v], w)
        picks.append((order, pick, gains[pick], sum(cur.values())))
    return picks


def test_greedy_matches_replay_and_covers_each_cluster(spark, tmp_path):
    d = _plant(spark, tmp_path)  # 3 orthogonal clusters: 5 / 4 / 3
    edf, ndf = _fl_weighted_edges(spark, d)
    edges = [(r["src"], r["v"], int(r["w"])) for r in edf.collect()]
    nodes = [r["v"] for r in ndf.collect()]
    want = _ref(edges, nodes)
    got = [
        (r["sel_order"], r["vec_id"], r["gain"], r["total_coverage"])
        for r in facility_location_select(spark, d).collect()
    ]
    got.sort()
    assert got == want
    # submodularity: marginal gains never increase
    gains = [g for _, _, g, _ in got]
    assert gains == sorted(gains, reverse=True)
    # coverage is non-decreasing and consistent with the gain deltas
    covs = [c for _, _, _, c in got]
    assert covs == sorted(covs)
    # the first three picks hit three DIFFERENT clusters — covering a
    # new orthogonal cluster always beats doubling up inside one
    cluster = lambda n: 0 if n < 5 else (1 if n < 9 else 2)
    first3 = {cluster(vid) for _, vid, _, _ in got[:3]}
    assert first3 == {0, 1, 2}
