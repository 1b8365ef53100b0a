"""Bucketed co-located join: the fact⋈fact shuffle disappears."""

from __future__ import annotations

from pyspark.sql import functions as F

from smart_city_data_pipeline_spark.catalog import table
from smart_city_data_pipeline_spark.sources.bucketed import cobucketed_join, write_bucketed


def test_cobucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    write_bucketed(li, "li_bucketed", "l_orderkey", n_buckets=8)
    write_bucketed(orders, "orders_bucketed", "o_orderkey", n_buckets=8)
    try:
        joined = cobucketed_join(
            spark, "li_bucketed", "orders_bucketed", "l_orderkey", "o_orderkey"
        )
        # Forbid broadcast so the co-bucketed SortMergeJoin is exercised.
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: no shuffle either side
        # And it computes the right thing.
        expected = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
        assert joined.count() == expected
    finally:
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS orders_bucketed")
