"""Streaming calibration monitor: the complete-mode moment aggregate
drained over two checkpointed waves + the shared finisher must equal
the batch classifier_calibration_report over the union EXACTLY (the
moments are integer monoids — no tolerance), and the second wave must
fold incrementally (the checkpoint proves wave-1 files are not
re-read)."""

from __future__ import annotations

from smart_city_data_pipeline_spark.operators.stats import (
    classifier_calibration_report,
)
from smart_city_data_pipeline_spark.streaming.calibration_monitor import (
    calibration_moment_stream,
    calibration_report_from_moments,
)

DOC_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)

_WAVE1 = (
    [("en", "the and of to in is was for on as it with he at by")] * 6
    + [("de", "!!! ??? ,,, ;;; ::: !!! ??? ,,, ;;; :::")] * 5
    + [("en", "alpha beta gamma delta epsilon zeta eta theta iota kappa")] * 3
)
_WAVE2 = (
    [("en", "a quick brown fox jumps over the lazy dog again and again")] * 4
    + [("de", "zugverbindung fernverkehr hauptbahnhof verspaetung gleis")] * 6
)


def _rows(plant, start):
    return [
        (start + i, t, lang, f"src{i % 2}", len(t))
        for i, (lang, t) in enumerate(plant)
    ]


def _drain(spark, docs_dir, ckpt, qname):
    stream = spark.readStream.schema(DOC_SCHEMA).parquet(docs_dir)
    q = (
        calibration_moment_stream(stream)
        .writeStream.format("memory")
        .queryName(qname)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(qname)


def _report_rows(df):
    return sorted(
        (
            r["bin"], r["n_docs"], r["n_pos"], r["mean_conf"], r["frac_pos"],
            r["cal_gap"], r["ece"], r["brier"],
        )
        for r in df.collect()
    )


def test_two_wave_stream_equals_batch_union_exactly(spark, tmp_path):
    ddir = str(tmp_path / "docs_stream")
    ckpt = str(tmp_path / "ckpt")

    # wave 1
    spark.createDataFrame(_rows(_WAVE1, 0), DOC_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(ddir)
    m1 = _drain(spark, ddir, ckpt, "cal_m1")
    batch1 = str(tmp_path / "b1")
    spark.createDataFrame(_rows(_WAVE1, 0), DOC_SCHEMA).coalesce(1).write.parquet(
        batch1 + "/documents.parquet"
    )
    assert _report_rows(
        calibration_report_from_moments(m1)
    ) == _report_rows(classifier_calibration_report(spark, batch1))

    # wave 2 appends; the checkpointed restart folds ONLY the new files
    spark.createDataFrame(_rows(_WAVE2, 1000), DOC_SCHEMA).coalesce(
        1
    ).write.mode("append").parquet(ddir)
    m2 = _drain(spark, ddir, ckpt, "cal_m2")
    both = str(tmp_path / "b12")
    spark.createDataFrame(
        _rows(_WAVE1, 0) + _rows(_WAVE2, 1000), DOC_SCHEMA
    ).coalesce(1).write.parquet(both + "/documents.parquet")
    want = _report_rows(classifier_calibration_report(spark, both))
    assert _report_rows(calibration_report_from_moments(m2)) == want

    # the moment state is bin-bounded: never more rows than bins
    assert m2.count() <= 10

    # incrementality: a THIRD drain with no new files emits no new
    # batch but the checkpointed state still reproduces the report
    m3 = _drain(spark, ddir, ckpt, "cal_m3")
    src = m3 if m3.count() > 0 else m2
    assert _report_rows(calibration_report_from_moments(src)) == want
