"""Streaming ARCH monitor ≡ batch arch_lm_test: the polynomial-moment
expansion must reproduce the batch statistic bit for bit after any
delivery interleaving, and the binomial identities are pinned against
a direct z-series computation."""

from __future__ import annotations

from datetime import datetime

from smart_city_data_pipeline_spark.catalog import table
from smart_city_data_pipeline_spark.operators.stats import arch_lm_test
from smart_city_data_pipeline_spark.streaming.arch_monitor import (
    arch_finish,
    arch_fold,
    arch_monitor_stream,
)

EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)
FLUSH_SENSOR = 999_999


import pytest


@pytest.mark.parametrize(
    "ys",
    [
        [103, 250, 99, 987, 12, 12, 4031, 77, 240, 240, 9, 1500, 33],
        # negative-sum series: Spark DECIMAL DIV and DuckDB // truncate
        # toward zero (-7 DIV 2 = -3) while Python's // floors (-4);
        # arch_finish must match the engines, not Python (ADVICE r10)
        [-103, -250, 99, -987, 12, -12, -4031, 77, -240, 240, -9, -1500, 33],
    ],
)
def test_fold_and_finish_match_direct_z_series(ys):
    """The moment expansion around m = sum DIV n equals the direct
    z-series Gauss moments (independent reference computation)."""
    moments, _ = arch_fold([0] * 15, None, ys)
    n_pairs, lm, flag = arch_finish(moments)
    s = sum(ys)
    m = s // len(ys) if s >= 0 else -((-s) // len(ys))
    z = [(y - m) ** 2 for y in ys]
    pairs = list(zip(z[1:], z[:-1]))
    n = len(pairs)
    sx = sum(a for a, _ in pairs)
    sy = sum(b for _, b in pairs)
    sxy = sum(a * b for a, b in pairs)
    sxx = sum(a * a for a, _ in pairs)
    syy = sum(b * b for _, b in pairs)
    num = n * float(sxy) - float(sx) * float(sy)
    denx = n * float(sxx) - float(sx) * float(sx)
    deny = n * float(syy) - float(sy) * float(sy)
    from smart_city_data_pipeline_spark.functions.rounding import pround_py

    want = pround_py(n * (num * num) / (denx * deny))
    assert n_pairs == n
    assert lm == want
    assert flag == (n * (num * num) / (denx * deny) > 3.841459)


def test_streamed_arch_equals_batch(spark, sf_dir, tmp_path):
    """Corpus events in 3 interleaved waves (event_id % 3): after the
    watermark flush, every sensor's row equals batch arch_lm_test."""
    rows = [
        (
            int(r["event_id"]),
            r["ts"],
            int(r["user_id"]),
            r["event_type"],
            float(r["value"]),
            r["props"],
        )
        for r in table(spark, sf_dir, "events").collect()
    ]
    waves = [[r for r in rows if r[0] % 3 == k] for k in range(3)]
    src = str(tmp_path / "src")

    def drop(batch):
        spark.createDataFrame(batch, EV_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    drop(waves[0])
    stream = spark.readStream.schema(EV_SCHEMA).parquet(src)
    # the id-interleaved waves redeliver the WHOLE time range each
    # wave, so the lateness allowance must cover the full series (the
    # production contract: watermark = max out-of-orderness); the 2026
    # flush still advances the watermark past every 2024 reading
    q = (
        arch_monitor_stream(stream, watermark="400 days")
        .writeStream.format("memory")
        .queryName("archq")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        for w in waves[1:]:
            drop(w)
            q.processAllAvailable()
        for i in range(2):
            drop(
                [
                    (
                        10_000_000 + i,
                        datetime(2026, 6, 1 + i),
                        FLUSH_SENSOR,
                        "m",
                        1.0,
                        "",
                    )
                ]
            )
            q.processAllAvailable()
        last = {}
        for r in spark.table("archq").collect():
            last[r["sensor_id"]] = (
                r["n_pairs"], r["lm_stat"], r["arch_flag"]
            )
        last.pop(FLUSH_SENSOR, None)
    finally:
        q.stop()
    batch = {
        r["sensor_id"]: (r["n_pairs"], r["lm_stat"], r["arch_flag"])
        for r in arch_lm_test(spark, sf_dir).collect()
    }
    assert last == batch
    assert batch  # sensors exist
