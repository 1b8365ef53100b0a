"""SCD2 dimension build + merge maintenance path (VERDICT r5 item 7)."""

from __future__ import annotations

from datetime import datetime

import pytest

from smart_city_data_pipeline_spark.operators.lakehouse import (
    SCD2_HIGH_TS,
    scd2_build_frame,
    scd2_dim,
    scd2_merge,
)

SCHEMA = "user_id long, event_type string, ts timestamp, event_id long"


def _t(m):
    return datetime(2026, 1, 1, 0, m)


@pytest.fixture(scope="module")
def history(spark):
    rows = [
        # key 1: A, A (collapses), B, A — three versions
        (1, "A", _t(0), 100), (1, "A", _t(5), 101),
        (1, "B", _t(10), 102), (1, "A", _t(20), 103),
        # key 2: single value, re-asserted — one open version
        (2, "X", _t(1), 200), (2, "X", _t(30), 201),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_build_collapses_and_versions(history):
    out = sorted(
        scd2_build_frame(history).collect(),
        key=lambda r: (r["entity_id"], r["version"]),
    )
    k1 = [r for r in out if r["entity_id"] == 1]
    assert [(r["attr_value"], r["version"]) for r in k1] == [
        ("A", 1), ("B", 2), ("A", 3)
    ]
    # intervals chain: valid_to of row v == valid_from of row v+1
    for a, b in zip(k1, k1[1:]):
        assert a["valid_to"] == b["valid_from"]
        assert not a["is_current"]
    assert k1[-1]["is_current"]
    assert str(k1[-1]["valid_to"]) == SCD2_HIGH_TS
    k2 = [r for r in out if r["entity_id"] == 2]
    assert len(k2) == 1 and k2[0]["is_current"]
    assert k2[0]["valid_from"] == _t(1)


def test_merge_equals_full_rebuild(spark, history):
    """Append batch folded into the dim ≡ building from full history."""
    batch = spark.createDataFrame(
        [
            (1, "C", _t(40), 104),          # real change → new version
            (2, "X", _t(45), 202),          # re-assertion → absorbed
            (3, "N", _t(50), 300),          # brand-new key
        ],
        SCHEMA,
    )
    dim = scd2_build_frame(history)
    merged = sorted(
        scd2_merge(dim, batch).collect(),
        key=lambda r: (r["entity_id"], r["version"]),
    )
    full = sorted(
        scd2_build_frame(history.unionByName(batch)).collect(),
        key=lambda r: (r["entity_id"], r["version"]),
    )
    assert [
        (r["entity_id"], r["attr_value"], r["valid_from"], r["valid_to"],
         r["is_current"], r["version"])
        for r in merged
    ] == [
        (r["entity_id"], r["attr_value"], r["valid_from"], r["valid_to"],
         r["is_current"], r["version"])
        for r in full
    ]
    # the re-assertion created no new version for key 2
    assert sum(1 for r in merged if r["entity_id"] == 2) == 1
    # the old current row for key 1 closed at the batch change's ts
    k1 = [r for r in merged if r["entity_id"] == 1]
    assert k1[-1]["attr_value"] == "C" and k1[-1]["is_current"]
    assert k1[-2]["valid_to"] == _t(40) and not k1[-2]["is_current"]


def test_merge_is_idempotent(spark, history):
    batch = spark.createDataFrame([(1, "C", _t(40), 104)], SCHEMA)
    once = scd2_merge(scd2_build_frame(history), batch)
    twice = scd2_merge(once, batch)
    a = sorted(map(tuple, once.collect()))
    b = sorted(map(tuple, twice.collect()))
    assert a == b


def test_corpus_dim_invariants(spark, sf_dir):
    rows = scd2_dim(spark, sf_dir).collect()
    assert rows
    by_key = {}
    for r in rows:
        by_key.setdefault(r["entity_id"], []).append(r)
    for key, grp in by_key.items():
        grp.sort(key=lambda r: r["version"])
        assert [r["version"] for r in grp] == list(range(1, len(grp) + 1))
        assert sum(r["is_current"] for r in grp) == 1
        for a, b in zip(grp, grp[1:]):
            assert a["valid_to"] == b["valid_from"], key  # no gaps/overlap
            assert a["attr_value"] != b["attr_value"], key  # collapsed
        assert str(grp[-1]["valid_to"]) == SCD2_HIGH_TS
