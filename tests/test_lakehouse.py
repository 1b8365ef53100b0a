"""Lakehouse operators: Morton interleave ground truth + profile
sanity (oracle parity is covered by test_oracle_parity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from smart_city_data_pipeline_spark.operators.lakehouse import (
    _MORTON_SPARK,
    PROFILE_COLS,
    Z_SHARDS,
    column_profile,
    zorder_codes,
)


def _morton_ref(bx: int, by: int) -> int:
    m = 0
    for i in range(8):
        m |= ((bx >> i) & 1) << (2 * i)
        m |= ((by >> i) & 1) << (2 * i + 1)
    return m


def test_morton_expr_matches_reference(spark):
    # Edge cases + a dense subgrid (bijectivity over it).
    pairs = [(0, 0), (255, 255), (255, 0), (0, 255), (170, 85), (1, 2)]
    pairs += [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(pairs, "bx int, by int").select(
        "bx", "by", F.expr(_MORTON_SPARK).cast("int").alias("morton")
    )
    rows = df.collect()
    assert len(rows) == len(pairs)
    seen = set()
    for r in rows:
        assert r["morton"] == _morton_ref(r["bx"], r["by"]), (r["bx"], r["by"])
        seen.add((r["bx"], r["by"], r["morton"]))
    # distinct (bx, by) -> distinct morton over the dense subgrid
    sub = {(x, y) for x in range(16) for y in range(16)}
    mords = {m for (x, y, m) in seen if (x, y) in sub}
    assert len(mords) == len(sub)


def test_zorder_shards_cover_and_order(spark, sf_dir):
    out = zorder_codes(spark, sf_dir).collect()
    assert out, "no codes produced"
    for r in out:
        assert 0 <= r["shard"] < Z_SHARDS
        # shard is the range bucket of morton: shard boundaries respect order
        assert r["shard"] == (r["morton"] * Z_SHARDS) // (4**8)


def test_column_profile_shape_and_counts(spark, sf_dir):
    rows = {r["col_name"]: r for r in column_profile(spark, sf_dir).collect()}
    assert set(rows) == {n for n, _, _, _ in PROFILE_COLS}
    n_rows = {r["n_rows"] for r in rows.values()}
    assert len(n_rows) == 1  # every column profiled over the same scan
    ev = rows["event_id"]
    assert ev["n_nulls"] == 0
    assert ev["n_distinct"] == next(iter(n_rows))  # primary key
    assert rows["event_type"]["min_str"] is not None
    assert rows["value"]["min_num"] is not None
