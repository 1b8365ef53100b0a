"""Point-in-time join strictness: a feature stamped AT the label
instant must NOT leak into the training row (the property the operator
exists for), while one microsecond earlier must."""

from __future__ import annotations

from datetime import datetime, timedelta

from smart_city_data_pipeline_spark.operators.timeseries import (
    pit_training_join,
)

EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)

T0 = datetime(2025, 6, 1, 12, 0, 0)


def _write(spark, tmp_path, rows):
    spark.createDataFrame(rows, EV_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_same_instant_feature_does_not_leak(spark, tmp_path):
    rows = [
        # user 1: error AT the label instant -> must NOT be visible
        (1, T0, 1, "error", 99.0, "{}"),
        (2, T0, 1, "purchase", 1.0, "{}"),
        # user 2: error one microsecond BEFORE the label -> visible
        (3, T0 - timedelta(microseconds=1), 2, "error", 42.0, "{}"),
        (4, T0, 2, "purchase", 1.0, "{}"),
        # user 3: view at the instant (not counted) + view before (counted)
        (5, T0 - timedelta(seconds=5), 3, "view", 1.0, "{}"),
        (6, T0, 3, "view", 1.0, "{}"),
        (7, T0, 3, "purchase", 1.0, "{}"),
    ]
    sf = _write(spark, tmp_path, rows)
    got = {r["event_id"]: r for r in pit_training_join(spark, sf).collect()}

    assert got[2]["last_error_value"] is None  # same-instant error hidden
    assert got[2]["secs_since_error"] is None
    assert got[4]["last_error_value"] == 42.0  # 1 microsecond earlier leaks in
    # epoch-second flooring puts the microsecond-earlier error in the
    # PREVIOUS second, so the floored gap reads 1 (not 0)
    assert got[4]["secs_since_error"] == 1
    assert got[7]["n_views_before"] == 1  # same-instant view not counted
