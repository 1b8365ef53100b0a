"""Targeted steady-state bench of specific registry keys at sf0.1 —
the bench.py protocol (noop sink, clearCache between reps, min-of-N)
restricted to the keys named on the command line. Used when freezing
budgets for new/rewritten operators in the same commit as the change."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from smart_city_data_pipeline_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    keys = sys.argv[1:]

    import __spark_entry__ as e

    spark = get_spark("bench-keys")
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()
    qs["road_type_analytics"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    for _ in range(2):
        qs["frames_features_bmp"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    out = {}
    for k in keys:
        best = float("inf")
        for _ in range(runs):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            qs[k](spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        out[k] = round(best, 3)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
