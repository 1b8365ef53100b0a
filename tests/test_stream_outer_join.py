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
