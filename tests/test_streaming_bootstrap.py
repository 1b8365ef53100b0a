"""Streaming bootstrap monitor: the two complete-mode moment legs
drained over two checkpointed waves + the shared finisher must equal
the batch poisson_bootstrap_ci over the union EXACTLY (integer-monoid
moments + deterministic draw — no tolerance)."""

from __future__ import annotations

from datetime import datetime

from smart_city_data_pipeline_spark.operators.stats import (
    poisson_bootstrap_ci,
)
from smart_city_data_pipeline_spark.streaming.bootstrap_monitor import (
    bootstrap_ci_from_moments,
    bootstrap_corpus_stream,
    bootstrap_replicate_stream,
)

EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)

_WAVE1 = [
    (i, datetime(2025, 4, 1, i % 24), i % 5, "click",
     1.0 if i % 2 == 0 else 99.0, "{}")
    for i in range(40)
] + [
    (500 + i, datetime(2025, 4, 1, i % 24), i % 5, "view", 7.5, "{}")
    for i in range(30)
]
_WAVE2 = [
    (1000 + i, datetime(2025, 4, 2, i % 24), i % 5, "click",
     2.0 if i % 3 == 0 else 50.0, "{}")
    for i in range(35)
]


def _drain(spark, leg_fn, edir, ckpt, qname):
    stream = spark.readStream.schema(EV_SCHEMA).parquet(edir)
    q = (
        leg_fn(stream)
        .writeStream.format("memory")
        .queryName(qname)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(qname)


def _rows(df):
    return sorted(
        (
            r["event_type"], r["n_events"], r["mean_value"],
            r["ci_lo"], r["ci_hi"],
        )
        for r in df.collect()
    )


def test_two_wave_stream_equals_batch_union_exactly(spark, tmp_path):
    edir = str(tmp_path / "ev_stream")

    spark.createDataFrame(_WAVE1, EV_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(edir)
    rep1 = _drain(
        spark, bootstrap_replicate_stream, edir,
        str(tmp_path / "ck_rep"), "boot_rep1",
    )
    full1 = _drain(
        spark, bootstrap_corpus_stream, edir,
        str(tmp_path / "ck_full"), "boot_full1",
    )
    b1 = str(tmp_path / "b1")
    spark.createDataFrame(_WAVE1, EV_SCHEMA).coalesce(1).write.parquet(
        b1 + "/events.parquet"
    )
    assert _rows(bootstrap_ci_from_moments(rep1, full1)) == _rows(
        poisson_bootstrap_ci(spark, b1)
    )

    # wave 2 appends; checkpointed restarts fold only the new files
    spark.createDataFrame(_WAVE2, EV_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(edir)
    rep2 = _drain(
        spark, bootstrap_replicate_stream, edir,
        str(tmp_path / "ck_rep"), "boot_rep2",
    )
    full2 = _drain(
        spark, bootstrap_corpus_stream, edir,
        str(tmp_path / "ck_full"), "boot_full2",
    )
    both = str(tmp_path / "b12")
    spark.createDataFrame(_WAVE1 + _WAVE2, EV_SCHEMA).coalesce(
        1
    ).write.parquet(both + "/events.parquet")
    assert _rows(bootstrap_ci_from_moments(rep2, full2)) == _rows(
        poisson_bootstrap_ci(spark, both)
    )
    # replicate state is |types| x B bounded
    assert rep2.count() <= 2 * 50
