"""Streaming funnel ≡ batch window_funnel_strict: replaying the
history through adversarially-sliced micro-batches (events interleaved
ACROSS waves, late anchor-lowering deliveries) must reproduce the
batch frame's per-user rows exactly, each emitted exactly once on
watermark-proven finality."""

from __future__ import annotations

from datetime import datetime

from smart_city_data_pipeline_spark.operators.timeseries import (
    window_funnel_strict,
)
from smart_city_data_pipeline_spark.streaming.funnel import funnel_stream

EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)

FLUSH_USER = 999_999


def _drive(spark, tmp_path, waves, name):
    """Feed event waves one micro-batch at a time, then two flush
    waves (waves N+1 / N+2) that push the watermark past every funnel
    horizon so all users' timers fire; returns the emitted rows."""
    edir = str(tmp_path / "ev")

    def drop(rows):
        spark.createDataFrame(rows, EV_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(edir)

    drop(waves[0])
    stream = spark.readStream.schema(EV_SCHEMA).parquet(edir)
    q = (
        funnel_stream(stream)
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        for wave in waves[1:]:
            drop(wave)
            q.processAllAvailable()
        for i in range(2):
            drop(
                [
                    (
                        10_000_000 + i,
                        datetime(2026, 12, 1 + i),
                        FLUSH_USER,
                        "view",
                        0.0,
                        "{}",
                    )
                ]
            )
            q.processAllAvailable()
        return [
            r
            for r in spark.table(name).collect()
            if r["user_id"] != FLUSH_USER
        ]
    finally:
        q.stop()


def _batch_rows(spark, sf_dir):
    return {
        r["user_id"]: r for r in window_funnel_strict(spark, sf_dir).collect()
    }


def test_streamed_funnel_equals_batch_on_corpus(spark, sf_dir, tmp_path):
    """sf0.001 corpus sliced into 3 interleaved waves (event_id % 3, so
    each wave spans the whole time range and every user's stages cross
    batch boundaries out of order): final rows ≡ batch frame."""
    from smart_city_data_pipeline_spark.catalog import table

    ev = table(spark, sf_dir, "events")
    rows = [
        tuple(r)
        for r in ev.select(
            "event_id", "ts", "user_id", "event_type", "value", "props"
        ).collect()
    ]
    waves = [[r for r in rows if r[0] % 3 == k] for k in range(3)]
    got = {
        r["user_id"]: r
        for r in _drive(spark, tmp_path, waves, "funnel_corpus")
    }
    want = _batch_rows(spark, sf_dir)
    assert set(got) == set(want)
    for uid, w in want.items():
        g = got[uid]
        assert g["funnel_stage"] == w["funnel_stage"], uid
        for s in ("signup", "click", "purchase"):
            assert g[f"t_{s}"] == w[f"t_{s}"], (uid, s)


def test_late_anchor_lowering_requalifies_stage2(spark, tmp_path):
    """The semantic the per-stage-min fold gets wrong: wave 1 delivers
    signup@10:00 and click@09:30 (click unmatched under that anchor);
    wave 2 LATE-delivers signup@09:00 — the anchor drops and the same
    click now qualifies. The buffered twin must report stage 2."""
    t = lambda h, m: datetime(2024, 6, 1, h, m)  # noqa: E731
    waves = [
        [
            (1, t(10, 0), 7, "signup", 1.0, "{}"),
            (2, t(9, 30), 7, "click", 1.0, "{}"),
        ],
        [(3, t(9, 0), 7, "signup", 1.0, "{}")],
    ]
    [r] = _drive(spark, tmp_path, waves, "funnel_late_anchor")
    assert r["funnel_stage"] == 2
    assert r["t_signup"] == t(9, 0)
    assert r["t_click"] == t(9, 30)


def test_strictness_and_window_edges_across_batches(spark, tmp_path):
    """Same-timestamp stage events do not advance (strict >), events
    past the 1-day window do not count, stage order is event-time not
    arrival order, and a user with no stage events still emits its
    stage-0 row."""
    t0 = datetime(2024, 6, 1, 0, 0)
    waves = [
        [
            # user 1: click arrives BEFORE its signup (cross-batch,
            # event-time ordered) and purchase lands exactly at the
            # window edge (t1 + 1 day, inclusive)
            (1, datetime(2024, 6, 1, 5, 0), 1, "click", 1.0, "{}"),
            # user 2: click at the SAME timestamp as signup -> strict
            (2, t0, 2, "signup", 1.0, "{}"),
            (3, t0, 2, "click", 1.0, "{}"),
            # user 3: no stage events at all
            (4, t0, 3, "view", 1.0, "{}"),
        ],
        [
            (5, t0, 1, "signup", 1.0, "{}"),
            (6, datetime(2024, 6, 2, 0, 0), 1, "purchase", 1.0, "{}"),
            # user 2's purchase lands 25h after t1: outside the window
            (7, datetime(2024, 6, 2, 1, 0), 2, "purchase", 1.0, "{}"),
        ],
    ]
    got = {r["user_id"]: r for r in _drive(spark, tmp_path, waves, "funnel_edges")}
    assert got[1]["funnel_stage"] == 3  # signup -> click -> edge purchase
    assert got[1]["t_purchase"] == datetime(2024, 6, 2, 0, 0)
    assert got[2]["funnel_stage"] == 1  # same-ts click rejected, late purchase
    assert got[3]["funnel_stage"] == 0  # no stage events, row still emitted
