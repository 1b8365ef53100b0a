"""Dump .explain('formatted') for named registry keys to plans/<dir>/<key>_<suffix>.txt."""
from __future__ import annotations

import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    keys = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from smart_city_data_pipeline_spark.session import get_spark

    import __spark_entry__ as e

    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()
    os.makedirs(out_dir, exist_ok=True)
    for k in keys:
        df = qs[k](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{k}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(k, "->", f"{k}_{suffix}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
