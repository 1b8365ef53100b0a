"""error_rate_wilson_ci vs an independent Python Wilson-interval
computation, plus the statistical property the interval exists for:
equal rates with unequal n get the same point estimate but the
small-n hour gets the strictly wider interval."""

from __future__ import annotations

import math
from datetime import datetime

from smart_city_data_pipeline_spark.functions.rounding import pround_py
from smart_city_data_pipeline_spark.operators.timeseries import (
    WILSON_Z,
    error_rate_wilson_ci,
)

EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)

# hour 3: 3 errors / 10 events; hour 15: 300 errors / 1000 events —
# identical 30% point estimate, wildly different certainty.
_PLANT = [
    (i, datetime(2025, 5, 1, 3, i % 60), i % 7,
     "error" if i < 3 else "click", 1.0, "{}")
    for i in range(10)
] + [
    (100 + i, datetime(2025, 5, 1, 15, i % 60), i % 7,
     "error" if i < 300 else "view", 1.0, "{}")
    for i in range(1000)
]


def _wilson(k, n):
    z = WILSON_Z
    p = k / n
    center = p + z * z / (2.0 * n)
    half = z * math.sqrt(p * (1.0 - p) / n + z * z / (4.0 * n * n))
    denom = 1.0 + z * z / n
    return (
        pround_py(p),
        pround_py((center - half) / denom),
        pround_py((center + half) / denom),
    )


def test_wilson_matches_reference_and_widens_with_small_n(spark, tmp_path):
    d = str(tmp_path / "ev")
    spark.createDataFrame(_PLANT, EV_SCHEMA).coalesce(1).write.parquet(
        d + "/events.parquet"
    )
    got = {
        r["hour_of_day"]: (
            r["n_events"], r["n_errors"], r["error_rate"],
            r["ci_lo"], r["ci_hi"],
        )
        for r in error_rate_wilson_ci(spark, d).collect()
    }
    assert got == {
        3: (10, 3) + _wilson(3, 10),
        15: (1000, 300) + _wilson(300, 1000),
    }
    # same point estimate, strictly wider interval for the small hour
    assert got[3][2] == got[15][2] == 0.3
    assert (got[3][4] - got[3][3]) > 2 * (got[15][4] - got[15][3])
    # Wilson never leaves [0, 1] even at the boundary rates
    assert 0.0 <= got[3][3] and got[3][4] <= 1.0
