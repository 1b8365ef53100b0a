"""The Jaccard document-frequency cap (production stop-shingle knob)
must be a no-op on this corpus where no shingle is frequent."""

from __future__ import annotations

from pyspark.sql import functions as F

from smart_city_data_pipeline_spark.operators.dedup import (
    _hashed_shingles,
    dedup_ngram_jaccard,
)


def test_df_cap_noop_on_rare_shingles(spark, sf_dir):
    max_df = (
        _hashed_shingles(spark, sf_dir)
        .groupBy("hs")
        .agg(F.count(F.lit(1)).alias("df"))
        .agg(F.max("df"))
        .collect()[0][0]
    )
    uncapped = sorted(map(tuple, dedup_ngram_jaccard(spark, sf_dir).collect()))
    capped = sorted(map(tuple, dedup_ngram_jaccard(spark, sf_dir, df_cap=max_df).collect()))
    assert capped == uncapped


def test_df_cap_drops_frequent_shingles(spark, sf_dir):
    # A cap of 1 keeps only unique shingles — candidate pairs (which need
    # a SHARED shingle, df >= 2) must vanish.
    assert dedup_ngram_jaccard(spark, sf_dir, df_cap=1).count() == 0
