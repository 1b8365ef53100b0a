"""Per-key profiler: time (min-of-N, noop sink), Spark job/stage counts,
and formatted plan dump for the named registry keys.

Run: python tools/profile_key.py [--plans DIR] key [key ...]

The job/stage counts come from the status tracker under a per-key job
group; they expose driver-loop structure (many jobs = many sequential
actions) that wall-clock alone hides.
"""

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
    args = sys.argv[1:]
    plans_dir = None
    if args and args[0] == "--plans":
        plans_dir = args[1]
        os.makedirs(plans_dir, exist_ok=True)
        args = args[2:]
    keys = args

    import __spark_entry__ as e

    spark = get_spark("profile-key")
    sc = spark.sparkContext
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()
    qs["road_type_analytics"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    for _ in range(2):
        qs["frames_features_bmp"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    out = {}
    for k in keys:
        best, jobs, stages = float("inf"), None, None
        for i in range(runs):
            spark.catalog.clearCache()
            group = f"profile:{k}:{i}"
            sc.setJobGroup(group, k)
            t0 = time.perf_counter()
            qs[k](spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            tracker = sc.statusTracker()
            ids = tracker.getJobIdsForGroup(group)
            if dt < best:
                best = dt
                jobs = len(ids)
                stages = sum(
                    len(tracker.getJobInfo(j).stageIds)
                    for j in ids
                    if tracker.getJobInfo(j) is not None
                )
            sc.setJobGroup("", "")
        out[k] = {"sec": round(best, 3), "jobs": jobs, "stages": stages}
        if plans_dir is not None:
            df = qs[k](spark, sf_dir)
            plan = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(plans_dir, f"{k}.txt"), "w") as f:
                f.write(plan)
        print(json.dumps({k: out[k]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
