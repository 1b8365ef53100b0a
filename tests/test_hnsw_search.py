"""Planted-corpus test for ann_hnsw_search: the multi-layer descent
reaches the true nearest neighbor in fewer hops than the flat layer-0
walk (ann_graph_search), which the same corpus traps at its hop cap.

Corpus: 120 unit vectors on a planar arc (0.012 rad apart, ids 5..124
in angle order) + 5 probes just past the far end. The flat walk enters
at id 5 (angle 0) and must crawl the whole arc on k=3 edges — it hits
GS_MAX_HOPS far from the target. The md5 layer assignment puts node 82
on layer 2 and ~1/8 of nodes on layer 1, so the hierarchical walk
long-jumps on the sparse layers and lands exactly."""

from __future__ import annotations

import math

from smart_city_data_pipeline_spark.operators.dedup import (
    GS_MAX_HOPS,
    ann_graph_search,
    ann_hnsw_search,
)


def _write_arc(spark, tmp_path) -> str:
    n, delta = 120, 0.012
    rows = []
    far = (n - 1) * delta
    for p in range(5):
        th = far + 0.003 * (p + 1)
        rows.append((p, [math.cos(th), math.sin(th)] + [0.0] * 62, 0))
    for i in range(n):
        th = i * delta
        rows.append((5 + i, [math.cos(th), math.sin(th)] + [0.0] * 62, 0))
    d = str(tmp_path / "arc")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.parquet(d + "/embeddings.parquet")
    return d


def test_hnsw_beats_flat_walk_on_planted_arc(spark, tmp_path):
    d = _write_arc(spark, tmp_path)
    flat = {r["probe_id"]: r for r in ann_graph_search(spark, d).collect()}
    hnsw = {r["probe_id"]: r for r in ann_hnsw_search(spark, d).collect()}
    assert set(flat) == set(hnsw) == set(range(5))
    for p in range(5):
        f, h = flat[p], hnsw[p]
        total = h["n_hops_l2"] + h["n_hops_l1"] + h["n_hops_l0"]
        # strictly fewer hops AND a strictly better settle point
        assert total < f["n_hops"]
        assert h["cos_sim"] > f["cos_sim"]
    # the flat walk is trapped at its cap, far from the target
    assert all(flat[p]["n_hops"] == GS_MAX_HOPS for p in range(5))
    assert all(flat[p]["cos_sim"] < 0.5 for p in range(5))
    # the descent enters at the md5 layer-2 node and lands EXACTLY:
    # each probe's nearest corpus vector is itself (probes are corpus
    # members, the ann_graph_search convention)
    assert all(hnsw[p]["entry_id"] == 82 for p in range(5))
    assert all(hnsw[p]["neighbor_id"] == p for p in range(5))
    assert all(hnsw[p]["cos_sim"] == 1.0 for p in range(5))
