"""Watermarked stream-stream LEFT OUTER join (VERDICT r5 item 6):
null-padded no-match rows must appear ONLY after the global watermark
passes the left row's match window, and exactly once.

Phasing: a continuous memory-sink query driven by
``processAllAvailable()`` between file drops — phase 1 delivers the
early events (no eviction possible yet), later phases drop
far-future events on BOTH sides so the global watermark (min of the
two inputs) actually advances and state evicts.
"""

from __future__ import annotations

from datetime import datetime

import pytest

from smart_city_data_pipeline_spark.streaming.joins import (
    batch_equivalent_correlate,
    correlate_streams_outer,
)

L_SCHEMA = "user_id long, ts timestamp, event_id long"
R_SCHEMA = "user_id long, ts timestamp, value double"


def _t(h, m=0):
    return datetime(2026, 1, 1, h, m)


def test_outer_join_emits_nulls_only_after_watermark(spark, tmp_path):
    ldir, rdir = str(tmp_path / "l"), str(tmp_path / "r")
    # phase-1 data: l0 matches r0 inside the 10-min window; l1 (at
    # 00:30, after every right) never matches anything
    spark.createDataFrame(
        [(1, _t(0, 0), 100), (1, _t(0, 30), 101)], L_SCHEMA
    ).coalesce(1).write.mode("append").parquet(ldir)
    spark.createDataFrame([(1, _t(0, 2), 7.5)], R_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(rdir)

    lstream = spark.readStream.schema(L_SCHEMA).parquet(ldir)
    rstream = spark.readStream.schema(R_SCHEMA).parquet(rdir)
    q = (
        correlate_streams_outer(lstream, rstream)
        .writeStream.format("memory")
        .queryName("outer_join")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.table("outer_join").collect()
        # watermark still at phase-1 max → no eviction, no null row yet
        assert all(r["r_value"] is not None for r in rows)

        # phase 2: far-future rows on BOTH sides advance the global
        # watermark past l1.ts + window + watermark → l1 evicts
        spark.createDataFrame([(99, _t(2), 900)], L_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(ldir)
        spark.createDataFrame([(99, _t(2), 0.0)], R_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(rdir)
        q.processAllAvailable()
        # (eviction happens on the batch AFTER the watermark advances;
        # drive one more empty-ish cycle with a further advance)
        spark.createDataFrame([(98, _t(3), 901)], L_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(ldir)
        spark.createDataFrame([(98, _t(3), 0.0)], R_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(rdir)
        q.processAllAvailable()

        rows = spark.table("outer_join").collect()
    finally:
        q.stop()

    nulls = [r for r in rows if r["r_value"] is None]
    matched = [r for r in rows if r["r_value"] is not None]
    # l1's no-match row emitted exactly once, null-padded
    assert [(r["l_user"], r["l_event_id"]) for r in nulls].count((1, 101)) == 1
    l1 = next(r for r in nulls if r["l_event_id"] == 101)
    assert l1["r_ts"] is None and l1["r_value"] is None
    # l0 matched r0 and never shows as null
    assert {(r["l_event_id"], r["r_value"]) for r in matched} >= {(100, 7.5)}
    assert all(r["l_event_id"] != 100 for r in nulls)
    # the watermark-advancing dummies match each other (same ts both
    # sides) so they never null-pad: l1 is the ONLY null row
    assert len(nulls) == 1
    assert {(r["l_event_id"], r["r_value"]) for r in matched} >= {
        (900, 0.0), (901, 0.0)
    }


def test_outer_matched_subset_equals_batch_inner(spark, tmp_path):
    """On a fully-watermark-drained corpus the outer join's matched
    subset is the batch inner correlation exactly."""
    lrows = [(1, _t(0, 0), 1), (1, _t(0, 3), 2), (2, _t(0, 5), 3), (3, _t(0, 9), 4)]
    rrows = [(1, _t(0, 2), 1.0), (1, _t(0, 4), 2.0), (2, _t(0, 30), 3.0)]
    flushl = [(50, _t(5), 50), (51, _t(8), 51)]
    flushr = [(50, _t(5), 0.0), (51, _t(8), 0.0)]
    ldir, rdir = str(tmp_path / "l2"), str(tmp_path / "r2")
    spark.createDataFrame(lrows, L_SCHEMA).write.mode("append").parquet(ldir)
    spark.createDataFrame(rrows, R_SCHEMA).write.mode("append").parquet(rdir)
    lstream = spark.readStream.schema(L_SCHEMA).parquet(ldir)
    rstream = spark.readStream.schema(R_SCHEMA).parquet(rdir)
    q = (
        correlate_streams_outer(lstream, rstream)
        .writeStream.format("memory")
        .queryName("outer_join2")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        for i in range(2):
            spark.createDataFrame([flushl[i]], L_SCHEMA).write.mode(
                "append"
            ).parquet(ldir)
            spark.createDataFrame([flushr[i]], R_SCHEMA).write.mode(
                "append"
            ).parquet(rdir)
            q.processAllAvailable()
        got = spark.table("outer_join2").collect()
    finally:
        q.stop()
    matched = {
        (r["l_user"], r["l_event_id"], r["r_ts"], r["r_value"])
        for r in got
        if r["r_value"] is not None
    }
    want = {
        (r["l_user"], r["l_event_id"], r["r_ts"], r["r_value"])
        for r in batch_equivalent_correlate(
            spark.createDataFrame(lrows + flushl, L_SCHEMA),
            spark.createDataFrame(rrows + flushr, R_SCHEMA),
        ).collect()
    }
    assert matched == want
    # every original left row surfaced exactly once as matched-or-null
    # among the fully-drained ids
    drained = {1, 2, 3, 4}  # event_ids from phase 1 (windows long passed)
    seen = [r["l_event_id"] for r in got if r["l_event_id"] in drained]
    # l_event_id 1 matches twice (two rights in its window), 3 and 4
    # surface exactly once each as null rows
    assert sorted(seen) == [1, 1, 2, 3, 4]
    nulls = {r["l_event_id"] for r in got if r["r_value"] is None}
    assert {3, 4} <= nulls  # user 2's right is +25min away; user 3 has none


def test_full_outer_emits_both_sides_nulls_exactly_once(spark, tmp_path):
    """FULL outer: l1 (no right match) AND r1 (no left match) each
    emit one null-padded row after the global watermark evicts them
    (VERDICT r6 item 7)."""
    from smart_city_data_pipeline_spark.streaming.joins import (
        correlate_streams_full_outer,
    )

    ldir, rdir = str(tmp_path / "lf"), str(tmp_path / "rf")
    # l0@00:00 matches r0@00:02; l1@00:30 has no right in [l1, l1+10m];
    # r1@00:50 has no left in [r1-10m, r1]
    spark.createDataFrame(
        [(1, _t(0, 0), 100), (1, _t(0, 30), 101)], L_SCHEMA
    ).coalesce(1).write.mode("append").parquet(ldir)
    spark.createDataFrame(
        [(1, _t(0, 2), 7.5), (1, _t(0, 50), 8.5)], R_SCHEMA
    ).coalesce(1).write.mode("append").parquet(rdir)

    lstream = spark.readStream.schema(L_SCHEMA).parquet(ldir)
    rstream = spark.readStream.schema(R_SCHEMA).parquet(rdir)
    q = (
        correlate_streams_full_outer(lstream, rstream)
        .writeStream.format("memory")
        .queryName("full_outer_join")
        .option("checkpointLocation", str(tmp_path / "ckptf"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.table("full_outer_join").collect()
        # no eviction possible yet -> no null-padded rows
        assert all(
            r["r_value"] is not None and r["l_event_id"] is not None
            for r in rows
        )

        # two watermark-advancing waves on BOTH sides (the global
        # watermark is the min of the two; eviction lands the batch
        # after the advance)
        for h, uid, eid in ((3, 99, 900), (4, 98, 901)):
            spark.createDataFrame([(uid, _t(h), eid)], L_SCHEMA).coalesce(
                1
            ).write.mode("append").parquet(ldir)
            spark.createDataFrame([(uid, _t(h), 0.0)], R_SCHEMA).coalesce(
                1
            ).write.mode("append").parquet(rdir)
            q.processAllAvailable()
        rows = spark.table("full_outer_join").collect()
    finally:
        q.stop()

    left_nulls = [r for r in rows if r["r_value"] is None]
    right_nulls = [r for r in rows if r["l_event_id"] is None]
    matched = [
        r for r in rows
        if r["r_value"] is not None and r["l_event_id"] is not None
    ]
    # l1's no-match row exactly once, right side null-padded
    assert [(r["l_user"], r["l_event_id"]) for r in left_nulls].count((1, 101)) == 1
    assert all(r["r_ts"] is None and r["r_user"] is None for r in left_nulls)
    # r1's no-match row exactly once, left side null-padded
    assert [(r["r_user"], r["r_value"]) for r in right_nulls].count((1, 8.5)) == 1
    assert all(r["l_ts"] is None and r["l_user"] is None for r in right_nulls)
    # matched pair present on the matched side only; dummies match
    assert {(r["l_event_id"], r["r_value"]) for r in matched} >= {
        (100, 7.5), (900, 0.0), (901, 0.0)
    }
    assert len(left_nulls) == 1 and len(right_nulls) == 1


def test_right_outer_emits_right_nulls_exactly_once(spark, tmp_path):
    """Mirror of the left-outer phased contract: a right event with no
    left partner in its backward window is emitted null-padded on the
    LEFT columns, exactly once, only after the global watermark evicts
    it — and matched rows never reappear as nulls."""
    from smart_city_data_pipeline_spark.streaming.joins import (
        correlate_streams_right_outer,
    )

    ldir, rdir = str(tmp_path / "l"), str(tmp_path / "r")
    # phase 1: r0 (00:02) matches l0 (00:00) inside the 10-min forward
    # window; r1 (00:30) has no left row in [00:20, 00:30] — matchless
    spark.createDataFrame([(1, _t(0, 0), 100)], L_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(ldir)
    spark.createDataFrame(
        [(1, _t(0, 2), 7.5), (1, _t(0, 30), 9.9)], R_SCHEMA
    ).coalesce(1).write.mode("append").parquet(rdir)

    lstream = spark.readStream.schema(L_SCHEMA).parquet(ldir)
    rstream = spark.readStream.schema(R_SCHEMA).parquet(rdir)
    q = (
        correlate_streams_right_outer(lstream, rstream)
        .writeStream.format("memory")
        .queryName("right_outer_join")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.table("right_outer_join").collect()
        # no eviction yet → no null-padded row
        assert all(r["l_event_id"] is not None for r in rows)

        # advance the GLOBAL watermark on both sides, then once more so
        # the eviction batch actually runs
        for h in (2, 3):
            spark.createDataFrame([(99, _t(h), 900 + h)], L_SCHEMA).coalesce(
                1
            ).write.mode("append").parquet(ldir)
            spark.createDataFrame([(99, _t(h), 0.0)], R_SCHEMA).coalesce(
                1
            ).write.mode("append").parquet(rdir)
            q.processAllAvailable()

        rows = spark.table("right_outer_join").collect()
    finally:
        q.stop()

    nulls = [r for r in rows if r["l_event_id"] is None]
    matched = [r for r in rows if r["l_event_id"] is not None]
    # r1's no-match row emitted exactly once, left columns null
    assert [(r["r_user"], r["r_value"]) for r in nulls].count((1, 9.9)) == 1
    r1 = next(r for r in nulls if r["r_value"] == 9.9)
    assert r1["l_user"] is None and r1["l_ts"] is None
    assert len(nulls) == 1
    # r0 matched l0 and never null-pads
    assert {(r["l_event_id"], r["r_value"]) for r in matched} >= {(100, 7.5)}
    assert all(r["r_value"] != 7.5 for r in nulls)
