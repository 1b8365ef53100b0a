"""Planted-data tests for arch_lm_test (volatility clustering flags,
homoskedastic doesn't; LM value vs an independent reference) and
dup_span_coverage (overlapping windows merge into position coverage)."""

from __future__ import annotations

from datetime import datetime, timedelta

from smart_city_data_pipeline_spark.operators.dedup import (
    SPAN_K,
    dup_span_coverage,
)
from smart_city_data_pipeline_spark.operators.stats import (
    ARCH_LM_CRIT,
    arch_lm_test,
)

T0 = datetime(2026, 1, 1)
EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _ref_lm(values):
    ys = [int(v * 100 + 0.5) for v in values]
    mbar = sum(ys) // len(ys)
    z = [(y - mbar) ** 2 for y in ys]
    pairs = list(zip(z[1:], z[:-1]))
    n = len(pairs)
    sx = sum(a for a, _ in pairs)
    sy = sum(b for _, b in pairs)
    sxy = sum(a * b for a, b in pairs)
    sxx = sum(a * a for a, _ in pairs)
    syy = sum(b * b for _, b in pairs)
    denx = n * sxx - sx * sx
    deny = n * syy - sy * sy
    if denx <= 0 or deny <= 0:
        return None
    num = n * sxy - sx * sy
    return n * (num * num) / (denx * deny)


def test_arch_flags_clustered_volatility(spark, tmp_path):
    # sensor 1: regime-switching noise (20 calm, 20 wild, repeated) —
    # squared deviations are strongly lag-correlated
    vals1 = []
    for blk in range(6):
        amp = 0.5 if blk % 2 == 0 else 30.0
        for i in range(20):
            vals1.append(100.0 + (amp if i % 2 == 0 else -amp))
    # sensor 2: constant |deviation| — z is constant, test degenerate
    vals2 = [100.0 + (5.0 if i % 2 == 0 else -5.0) for i in range(120)]
    rows = []
    for i, v in enumerate(vals1):
        rows.append((i, T0 + timedelta(minutes=i), 1, "m", v, ""))
    for i, v in enumerate(vals2):
        rows.append((1000 + i, T0 + timedelta(minutes=i), 2, "m", v, ""))
    d = str(tmp_path / "ev")
    spark.createDataFrame(rows, EV_SCHEMA).coalesce(1).write.parquet(
        d + "/events.parquet"
    )
    got = {r["sensor_id"]: r for r in arch_lm_test(spark, d).collect()}
    from smart_city_data_pipeline_spark.functions.rounding import pround_py

    want1 = _ref_lm(vals1)
    assert want1 is not None and want1 > ARCH_LM_CRIT
    assert got[1]["arch_flag"] is True
    assert got[1]["lm_stat"] == pround_py(want1)
    assert got[1]["n_pairs"] == len(vals1) - 1
    assert _ref_lm(vals2) is None  # degenerate by construction
    assert got[2]["lm_stat"] is None
    assert got[2]["arch_flag"] is None


def test_span_coverage_merges_overlapping_windows(spark, tmp_path):
    # a 20-token quote shared by docs 0 and 1 -> 13 duplicated windows
    # but exactly 20 covered positions; doc 2 is all-unique
    quote = " ".join(f"q{i}" for i in range(20))
    docs = [
        (0, f"alpha0 beta0 {quote} tail0 tail1", "en", "s", 0),
        (1, f"{quote} gammaX deltaX", "en", "s", 0),
        (2, " ".join(f"u{i}" for i in range(30)), "en", "s", 0),
    ]
    d = str(tmp_path / "docs")
    spark.createDataFrame(
        docs,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(d + "/documents.parquet")
    got = {r["doc_id"]: r for r in dup_span_coverage(spark, d).collect()}
    assert SPAN_K == 8
    assert got[0]["n_dup_positions"] == 20
    assert got[1]["n_dup_positions"] == 20
    assert got[2]["n_dup_positions"] == 0
    assert got[0]["n_tokens"] == 24
    from smart_city_data_pipeline_spark.functions.rounding import pround_py

    assert got[0]["coverage_share"] == pround_py(20 / 24)
