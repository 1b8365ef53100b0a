"""Independent Python ground truth for the session's numeric
operators. The DuckDB oracle proves cross-engine agreement, but both
sides were authored together — a bug mirrored into both SQL dialects
would pass it. These tests recompute char_entropy, bm25_scores,
robust_zscore, and acf_lags from the raw parquet in plain Python
(pyarrow + math, no Spark, no SQL) and compare under the same
``floor(x·1e4 + 0.5)/1e4`` rounding the operators use."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_DIR


def _ascii_tokens(text: str) -> list[str]:
    """Model the PRODUCT tokenizer exactly (ADVICE r5): Spark/DuckDB
    split ``trim(lower(text))`` on the ASCII-only ``\s+`` — Java/RE2
    ``\s`` never matches Unicode whitespace, ``trim`` strips spaces
    only, and a whitespace-only doc yields the single empty token
    (``max_word_len`` 0), unlike ``str.split()`` which is
    Unicode-aware and drops empties."""
    return re.split(r"\s+", text.lower().strip(" "), flags=re.ASCII)


def _pround(x: float) -> float:
    return math.floor(x * 10000.0 + 0.5) / 10000.0


@pytest.fixture(scope="module")
def docs():
    t = pq.read_table(f"{SF_DIR}/documents.parquet").to_pylist()
    return {r["doc_id"]: r for r in t}


@pytest.fixture(scope="module")
def events():
    return pq.read_table(f"{SF_DIR}/events.parquet").to_pylist()


def test_char_entropy_matches_python(spark, sf_dir, docs):
    from smart_city_data_pipeline_spark.operators.textops import char_entropy

    out = {r["doc_id"]: r for r in char_entropy(spark, sf_dir).collect()}
    assert set(out) == set(docs)
    for doc_id, row in docs.items():
        counts = Counter(row["text"])  # every char; no empties possible
        n = sum(counts.values())
        ent = -sum((c / n) * math.log(c / n) for c in sorted(counts.values()))
        got = out[doc_id]
        assert got["n_chars"] == n
        assert got["n_unique_chars"] == len(counts)
        assert abs(got["char_entropy"] - _pround(ent)) <= 1e-4, doc_id


def test_bm25_matches_python(spark, sf_dir, docs):
    from smart_city_data_pipeline_spark.operators.textops import (
        BM25_B,
        BM25_K1,
        BM25_QUERY,
        bm25_scores,
    )

    toks = {d: _ascii_tokens(r["text"]) for d, r in docs.items()}
    dl = {d: len(t) for d, t in toks.items()}
    n_docs = len(docs)
    avgdl = sum(dl.values()) / n_docs
    tf = {d: Counter(t for t in tt if t in BM25_QUERY) for d, tt in toks.items()}
    df = Counter(term for c in tf.values() for term in c)
    expected = {}
    for d, c in tf.items():
        if not c:
            continue
        s = 0.0
        for term, f in c.items():
            idf = math.log((n_docs - df[term] + 0.5) / (df[term] + 0.5) + 1.0)
            s += idf * f * (BM25_K1 + 1.0) / (
                f + BM25_K1 * (1.0 - BM25_B + BM25_B * dl[d] / avgdl)
            )
        expected[d] = (len(c), s)
    out = {r["doc_id"]: r for r in bm25_scores(spark, sf_dir).collect()}
    assert set(out) == set(expected)
    for d, (n_terms, s) in expected.items():
        assert out[d]["n_query_terms"] == n_terms, d
        assert abs(out[d]["bm25"] - _pround(s)) <= 2e-4, d


def _lower_median(values: list[int]) -> int:
    v = sorted(values)
    return v[(len(v) + 1) // 2 - 1]


def test_robust_zscore_matches_python(spark, sf_dir, events):
    from smart_city_data_pipeline_spark.operators.timeseries import (
        ROBUST_Z_CUT,
        ROBUST_Z_K,
        robust_zscore,
    )

    cents = defaultdict(list)
    by_event = {}
    for r in events:
        c = math.floor(r["value"] * 100 + 0.5)
        cents[r["event_type"]].append(c)
        by_event[r["event_id"]] = (r["event_type"], c)
    med = {t: _lower_median(v) for t, v in cents.items()}
    mad = {
        t: _lower_median([abs(c - med[t]) for c in v]) for t, v in cents.items()
    }
    expected = {}
    for eid, (t, c) in by_event.items():
        if mad[t] <= 0:
            continue
        z = _pround(ROBUST_Z_K * (c - med[t]) / mad[t])
        if abs(z) > ROBUST_Z_CUT:
            expected[eid] = z
    out = {r["event_id"]: r["robust_z"] for r in robust_zscore(spark, sf_dir).collect()}
    assert out == expected


def test_acf_lags_matches_python(spark, sf_dir, events):
    from smart_city_data_pipeline_spark.operators.timeseries import (
        ACF_LAGS,
        acf_lags,
    )

    from datetime import timezone

    series = defaultdict(dict)  # type -> hour_index -> (sum_cents, n)
    for r in events:
        # events.ts is naive micros; the engines treat it as UTC-naive,
        # so pin UTC here (a bare .timestamp() would apply local time).
        hr = r["ts"].replace(minute=0, second=0, microsecond=0, tzinfo=timezone.utc)
        he = int(hr.timestamp()) // 3600
        c = math.floor(r["value"] * 100 + 0.5)
        s, n = series[r["event_type"]].get(he, (0, 0))
        series[r["event_type"]][he] = (s + c, n + 1)
    expected = {}
    for t, pts in series.items():
        v = {he: (s * 128) // n for he, (s, n) in pts.items()}
        for lag in ACF_LAGS:
            pairs = [(v[he], v[he + lag]) for he in v if he + lag in v]
            nb = len(pairs)
            sx = sum(a for a, _ in pairs)
            sy = sum(b for _, b in pairs)
            sxy = sum(a * b for a, b in pairs)
            sxx = sum(a * a for a, _ in pairs)
            syy = sum(b * b for _, b in pairs)
            varx = nb * sxx - sx * sx
            vary = nb * syy - sy * sy
            acf = (
                _pround((nb * sxy - sx * sy) / math.sqrt(float(varx) * float(vary)))
                if varx > 0 and vary > 0
                else None
            )
            expected[(t, lag)] = (nb, acf)
    out = {
        (r["event_type"], r["lag"]): (r["n_pairs"], r["acf"])
        for r in acf_lags(spark, sf_dir).collect()
    }
    assert out == expected


def test_dup_ngram_chars_matches_python(spark, sf_dir, docs):
    from smart_city_data_pipeline_spark.operators.textops import (
        DUP_NGRAM_K,
        DUP_NGRAM_PCT,
        _DUP_SYNTH_2,
        _DUP_SYNTH_4,
        dup_ngram_chars,
    )

    out = {r["doc_id"]: r for r in dup_ngram_chars(spark, sf_dir).collect()}
    assert set(out) == set(docs)
    flagged_seen = 0
    for doc_id, row in docs.items():
        text = row["text"]
        if doc_id % 6 == 0:
            text += _DUP_SYNTH_2
        if doc_id % 24 == 0:
            text += _DUP_SYNTH_4
        tk = _ascii_tokens(text)
        grams = [
            " ".join(tk[i : i + DUP_NGRAM_K])
            for i in range(len(tk) - DUP_NGRAM_K + 1)
        ]
        counts = Counter(grams)
        total = sum(len(g) for g in grams)
        dup = sum(len(g) for g in grams if counts[g] >= 2)
        got = out[doc_id]
        assert got["n_grams"] == len(grams), doc_id
        assert got["total_gram_chars"] == total, doc_id
        assert got["dup_gram_chars"] == dup, doc_id
        if total:
            assert abs(got["dup_char_frac"] - _pround(dup / total)) <= 1e-4
        assert got["flagged"] == (dup * 100 > total * DUP_NGRAM_PCT), doc_id
        flagged_seen += got["flagged"]
    # the synthesized repetition must make BOTH branches real
    assert flagged_seen > 0
    assert any(
        0 < out[d]["dup_gram_chars"] and not out[d]["flagged"] for d in docs
    )


def test_compaction_plan_invariants(spark, sf_dir):
    from smart_city_data_pipeline_spark.operators.lakehouse import (
        COMPACT_TARGET_BYTES,
        compaction_plan,
    )

    rows = sorted(
        compaction_plan(spark, sf_dir).collect(), key=lambda r: r["bucket"]
    )
    assert rows
    # bins are consecutive in bucket order and monotonically increasing
    bins = [r["bin_id"] for r in rows]
    assert bins == sorted(bins)
    # per-bin aggregates match the member rows
    by_bin = defaultdict(list)
    for r in rows:
        by_bin[r["bin_id"]].append(r)
    for bin_id, members in by_bin.items():
        total = sum(r["est_bytes"] for r in members)
        for r in members:
            assert r["bin_bytes"] == total
            assert r["bin_parts"] == len(members)
        # a multi-partition bin only forms while under the target:
        # every member but the last starts below the next boundary, so
        # removing the last member must leave the bin under target
        if len(members) > 1:
            assert total - members[-1]["est_bytes"] < COMPACT_TARGET_BYTES


def test_gopher_word_stats_matches_python(spark, sf_dir, docs):
    from smart_city_data_pipeline_spark.operators.textops import (
        WORD_LEN_MAX,
        WORD_LEN_MIN,
        _WLEN_LONG,
        _WLEN_SHORT,
        gopher_word_stats,
    )

    out = {r["doc_id"]: r for r in gopher_word_stats(spark, sf_dir).collect()}
    assert set(out) == set(docs)
    hi = lo = 0
    for doc_id, row in docs.items():
        text = row["text"]
        if doc_id % 9 == 0:
            text += _WLEN_LONG
        if doc_id % 13 == 0:
            text += _WLEN_SHORT
        lens = [len(t) for t in _ascii_tokens(text)]
        total = sum(lens)
        got = out[doc_id]
        assert got["n_tokens"] == len(lens)
        assert got["total_word_chars"] == total
        assert got["max_word_len"] == max(lens)
        assert abs(got["mean_word_len"] - _pround(total / len(lens))) <= 1e-4
        want_flag = (
            total < WORD_LEN_MIN * len(lens) or total > WORD_LEN_MAX * len(lens)
        )
        assert got["flagged"] == want_flag, doc_id
        hi += total > WORD_LEN_MAX * len(lens)
        lo += total < WORD_LEN_MIN * len(lens)
    # the synthesized outliers must make BOTH flag branches real
    assert hi > 0 and lo > 0


def test_holt_linear_matches_python(spark, sf_dir, events):
    from smart_city_data_pipeline_spark.operators.timeseries import (
        HOLT_ALPHA,
        HOLT_BETA,
        HOLT_N,
        holt_linear,
    )

    got = {r["sensor_id"]: r for r in holt_linear(spark, sf_dir).collect()}
    series = defaultdict(list)
    for e in events:
        series[e["user_id"]].append((e["ts"], e["value"]))
    assert set(got) == set(series)
    for uid, pts in series.items():
        pts.sort()
        pts = pts[-HOLT_N:]
        l, b = float(pts[0][1]), 0.0
        for _, x in pts[1:]:
            ln = HOLT_ALPHA * float(x) + (1 - HOLT_ALPHA) * (l + b)
            b = HOLT_BETA * (ln - l) + (1 - HOLT_BETA) * b
            l = ln
        g = got[uid]
        assert g["n_used"] == len(pts)
        assert abs(g["level"] - _pround(l)) <= 1e-9, uid
        assert abs(g["trend"] - _pround(b)) <= 1e-9, uid
        assert abs(g["forecast_1"] - _pround(l + b)) <= 1e-9, uid


def test_rolling_quantile_matches_python(spark, sf_dir, events):
    from smart_city_data_pipeline_spark.operators.timeseries import (
        ROLL_Q_K,
        rolling_quantile,
    )

    out = rolling_quantile(spark, sf_dir).collect()
    series = defaultdict(list)
    for e in events:
        series[e["user_id"]].append((e["ts"], e["value"]))
    want = defaultdict(list)  # sensor -> multiset of (median, n) per row
    for uid, pts in series.items():
        pts.sort()
        vals = [float(v) for _, v in pts]
        for i in range(len(vals)):
            win = sorted(vals[max(0, i - ROLL_Q_K + 1) : i + 1])
            want[uid].append((win[(len(win) + 1) // 2 - 1], len(win)))
    got = defaultdict(list)
    for r in out:
        got[r["sensor_id"]].append((r["roll_median"], r["n_window"]))
    for uid in want:
        assert sorted(got[uid]) == sorted(want[uid]), uid
