"""Broadcast-hint policy: forced ``F.broadcast()`` is allowed ONLY on
genuinely bounded sides — region (5 rows), nation (25), 1-row scalar /
post-HAVING aggregates, and the fixed probe set. Tables that grow with
scale factor (customer, supplier, part, per-key aggregates of the fact
table, per-document stats) must carry NO hint so AQE can size-gate the
join: a hard hint that is fine at sf0.1 is an executor OOM at 100 TB.

The assertion is on the ANALYZED LOGICAL plan's ResolvedHint nodes —
AQE may (and at test scale will) still choose a physical broadcast
join, which is exactly the intent.
"""

from __future__ import annotations

import pytest


def _hint_subtrees(df) -> list[str]:
    """Text of the subtree under each broadcast ResolvedHint node."""
    s = df._jdf.queryExecution().analyzed().toString()
    lines = s.splitlines()

    def depth(line: str) -> int:
        i = 0
        while i < len(line) and line[i] in " :+-":
            i += 1
        return i

    out = []
    for i, line in enumerate(lines):
        if "ResolvedHint" in line:
            d = depth(line)
            sub = []
            for nxt in lines[i + 1 :]:
                if nxt.strip() and depth(nxt) <= d:
                    break
                sub.append(nxt)
            out.append("\n".join(sub))
    return out


SF_SCALED = (
    "customer.parquet",
    "supplier.parquet",
    "part.parquet",
    "lineitem.parquet",
    "orders.parquet",
    "documents.parquet",
    "embeddings.parquet",
    "events.parquet",
)


def _queries():
    import __spark_entry__ as e

    return e.queries()


@pytest.mark.parametrize("key", sorted(_queries()))
def test_no_forced_broadcast_of_sf_scaled_tables(key, spark, sf_dir):
    df = _queries()[key](spark, sf_dir)
    for sub in _hint_subtrees(df):
        if "Aggregate" in sub:
            # 1-row scalar aggregates (q22 balance stats) and
            # post-HAVING filters (q18 big orders) are bounded by
            # construction even though they read sf-scaled inputs.
            continue
        bad = [t for t in SF_SCALED if t in sub]
        assert not bad, f"{key}: forced broadcast of sf-scaled {bad}"


def test_bounded_dims_still_hinted(spark, sf_dir):
    """The bounded dims keep their explicit hints (don't over-correct:
    nation/region need no statistics or AQE to broadcast)."""
    q = _queries()
    for key, n_hints in (("q5_local_supplier", 2), ("q10_returned_items", 1)):
        subs = _hint_subtrees(q[key](spark, sf_dir))
        assert len(subs) == n_hints, (key, subs)
        assert all("nation.parquet" in s or "region.parquet" in s for s in subs), key


def test_no_leaked_cache_after_lsh(spark, sf_dir):
    """dedup LSH queries must not leave session-lifetime cached RDDs
    behind (self-join reuse comes from ReuseExchange, not persist())."""
    from smart_city_data_pipeline_spark.operators.dedup import (
        dedup_minhash_lsh,
        embedding_srp_lsh,
    )

    dedup_minhash_lsh(spark, sf_dir).count()
    embedding_srp_lsh(spark, sf_dir).count()
    assert spark.sparkContext._jsc.getPersistentRDDs().size() == 0
