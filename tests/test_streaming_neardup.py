"""Streaming near-dup ingest ≡ batch dedup_incremental: the corpus
delivered as ingest waves must produce exactly the batch probe's
answer on the matching split, generalize to multi-wave delivery (dups
against ALL prior waves), and stay byte-identical under crash replay."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from smart_city_data_pipeline_spark.catalog import table
from smart_city_data_pipeline_spark.operators.dedup import (
    INGEST_SPLIT_FRACTION,
    dedup_incremental,
    dedup_minhash_lsh,
)
from smart_city_data_pipeline_spark.streaming.neardup_ingest import (
    continuous_neardup_ingest,
    probe_and_index_micro_batch,
    read_dup_report,
)

DOC_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def _doc_rows(spark, sf_dir):
    return [
        (r["doc_id"], r["text"], r["lang"], r["source"], r["n_chars"])
        for r in table(spark, sf_dir, "documents").collect()
    ]


def _drive(spark, tmp_path, waves):
    src = str(tmp_path / "docs_src")
    root = str(tmp_path / "lake")

    def drop(rows):
        spark.createDataFrame(rows, DOC_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    drop(waves[0])
    stream = spark.readStream.schema(DOC_SCHEMA).parquet(src)
    q = continuous_neardup_ingest(stream, root, str(tmp_path / "ckpt"))
    q.awaitTermination()
    for wave in waves[1:]:
        drop(wave)
        q = continuous_neardup_ingest(stream, root, str(tmp_path / "ckpt"))
        q.awaitTermination()
    return {
        r["new_doc_id"]: (r["n_dups"], r["first_dup"])
        for r in read_dup_report(spark, root).collect()
    }


def _expected_from_offline(spark, sf_dir, wave_of):
    """Reference: the offline verified pair list, restricted to pairs
    whose members sit in STRICTLY different waves, grouped per later
    doc."""
    want = {}
    for r in dedup_minhash_lsh(spark, sf_dir).collect():
        a, b = r["doc_a"], r["doc_b"]  # a < b
        wa, wb = wave_of(a), wave_of(b)
        if wa == wb:
            continue
        new, old = (b, a) if wa < wb else (a, b)
        n, first = want.get(new, (0, None))
        want[new] = (n + 1, old if first is None else min(first, old))
    return want


def test_two_wave_stream_equals_batch_probe(spark, sf_dir, tmp_path):
    """Waves = (existing corpus, new batch) at the batch operator's
    own split: the stream's report rows ≡ dedup_incremental."""
    rows = _doc_rows(spark, sf_dir)
    split = math.ceil(max(r[0] for r in rows) * INGEST_SPLIT_FRACTION)
    waves = [
        [r for r in rows if r[0] < split],
        [r for r in rows if r[0] >= split],
    ]
    got = _drive(spark, tmp_path, waves)
    want = {
        r["new_doc_id"]: (r["n_dups"], r["first_dup"])
        for r in dedup_incremental(spark, sf_dir).collect()
    }
    assert got == want
    assert want  # the corpus has planted near-dups across the split


def test_multi_wave_probes_all_prior_waves(spark, sf_dir, tmp_path):
    """Three id-range waves: every wave's docs must dedup against the
    UNION of all earlier waves (and never within their own wave)."""
    rows = _doc_rows(spark, sf_dir)
    hi = max(r[0] for r in rows)
    b1, b2 = hi // 3, 2 * hi // 3

    def wave_of(doc_id):
        return 0 if doc_id <= b1 else (1 if doc_id <= b2 else 2)

    waves = [[r for r in rows if wave_of(r[0]) == k] for k in range(3)]
    got = _drive(spark, tmp_path, waves)
    want = _expected_from_offline(spark, sf_dir, wave_of)
    assert got == want
    assert want


def test_crash_replayed_batch_is_idempotent(spark, sf_dir, tmp_path):
    """Re-running a micro-batch (crash replay) must leave both lakes
    exactly as a single run: the report partition is rewritten, and
    the index holds each batch's band rows exactly once."""
    rows = _doc_rows(spark, sf_dir)
    split = math.ceil(max(r[0] for r in rows) * INGEST_SPLIT_FRACTION)
    old = spark.createDataFrame(
        [r for r in rows if r[0] < split], DOC_SCHEMA
    )
    new = spark.createDataFrame(
        [r for r in rows if r[0] >= split], DOC_SCHEMA
    )
    root = str(tmp_path / "lake")
    probe_and_index_micro_batch(spark, root, old, 0)
    probe_and_index_micro_batch(spark, root, new, 1)
    once = sorted(
        map(tuple, read_dup_report(spark, root).collect())
    )
    idx_once = (
        spark.read.parquet(root + "/band_index")
        .groupBy("batch_id")
        .count()
        .collect()
    )
    probe_and_index_micro_batch(spark, root, new, 1)  # crash replay
    again = sorted(map(tuple, read_dup_report(spark, root).collect()))
    idx_again = (
        spark.read.parquet(root + "/band_index")
        .groupBy("batch_id")
        .count()
        .collect()
    )
    assert again == once
    assert sorted(map(tuple, idx_again)) == sorted(map(tuple, idx_once))
    # and the replayed batch's report equals the batch operator's
    want = {
        r["new_doc_id"]: (r["n_dups"], r["first_dup"])
        for r in dedup_incremental(spark, sf_dir).collect()
    }
    got = {
        r["new_doc_id"]: (r["n_dups"], r["first_dup"])
        for r in read_dup_report(spark, root).collect()
    }
    assert got == want
