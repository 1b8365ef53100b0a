"""Statistical drift / hypothesis-test audits over the corpus and the
event stream — the monitoring layer a production pipeline runs between
ingestion (reference ``pipline2/extract``) and training/serving:
two-sample KS tests for distribution drift and PSI (population
stability index) for scorecard-style bucket drift.

Exactness discipline: every statistic reduces to integer counts first
(one keyed aggregate over the raw stream), then the bounded
per-bucket/per-value table carries the arithmetic — cross-multiplied
BIGINT/DECIMAL comparisons for KS (no division until the final
display value), quantize-then-sum on the 2^20 grid for PSI's ln()
terms (the ``type_corr_matrix`` rule: floats are only compared after
order-independent integer aggregation).

Scale notes: the only full-stream work is the first groupBy; all
subsequent joins/windows run on tables bounded by |value domain| ×
|group count|, never by row count. Nothing here collects to the
driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from smart_city_data_pipeline_spark.catalog import table
from smart_city_data_pipeline_spark.functions.rounding import pround, pround_sql

# --------------------------------------------------------------------------
# Two-sample Kolmogorov–Smirnov drift test between language slices.
# --------------------------------------------------------------------------

# c(alpha=0.05)^2 scaled by 1e6: reject when D > 1.358 * sqrt((na+nb)/(na*nb))
# <=> M^2 * 1e6 > 1844164 * (na+nb) * na * nb  with M = max|cumA*nb - cumB*na|
# (all-integer — no sqrt, no division). The cross-multiply runs in
# DECIMAL(38,0) (HUGEINT in the oracle), exact to per-group counts ~1e18;
# the squared significance comparison is exact while M^2*1e6 fits
# DECIMAL(38,0) (M <~ 3e15 — comfortably past any real drift magnitude),
# and past that both engines fail loud (ANSI decimal overflow / HUGEINT
# range error), never silently wrap. Beyond those bounds, coarsen by
# sampling (documented contract, same posture as ols_trend's moment
# bounds).
KS_C2_1E6 = 1_844_164


def ks_length_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise two-sample KS test of the document-length distribution
    between every pair of languages — the distribution-drift audit a
    corpus build runs when one slice (a new crawl, a new language
    vertical) may have silently shifted lengths. Emits the exact KS
    statistic D and the alpha=0.05 reject flag per (lang_a, lang_b).

    Engine-exact construction: D = max_v |F_a(v) - F_b(v)| is computed
    as integer cross-multiplication max|cum_a*n_b - cum_b*n_a| over the
    DENSE value grid (distinct n_chars x langs, built by a broadcast
    cross join so both ECDFs are evaluated at every jump point of
    either sample), and the significance comparison squares that
    integer against c^2*(na+nb)*na*nb in DECIMAL(38,0) — the whole
    test is decided in integer arithmetic; doubles appear only in the
    displayed D.

    100 TB story: one keyed aggregate over the corpus, then every
    relation is bounded by |distinct lengths| x |langs| (~thousands).
    The langs dim is a broadcast literal-sized table; the pair join is
    an equi-join on the value key with a lang inequality filter.
    """
    docs = table(spark, sf_dir, "documents").select("lang", "n_chars")
    h = docs.groupBy("lang", "n_chars").agg(F.count(F.lit(1)).alias("cnt"))
    vals = docs.select("n_chars").distinct()
    langs = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    dense = (
        vals.crossJoin(F.broadcast(langs.select("lang")))
        .join(h, ["lang", "n_chars"], "left")
        .select(
            "lang", "n_chars", F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt")
        )
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = dense.select("lang", "n_chars", F.sum("cnt").over(w).alias("cum"))
    a, b = cum.alias("a"), cum.alias("b")
    la = langs.select(F.col("lang").alias("lang_a"), F.col("n").alias("n_a"))
    lb = langs.select(F.col("lang").alias("lang_b"), F.col("n").alias("n_b"))
    pairs = (
        a.join(
            b,
            (F.col("a.n_chars") == F.col("b.n_chars"))
            & (F.col("a.lang") < F.col("b.lang")),
        )
        .select(
            F.col("a.lang").alias("lang_a"),
            F.col("b.lang").alias("lang_b"),
            F.col("a.cum").alias("ca"),
            F.col("b.cum").alias("cb"),
        )
        .join(F.broadcast(la), "lang_a")
        .join(F.broadcast(lb), "lang_b")
    )
    def dec(c: Column) -> Column:
        return c.cast("decimal(38,0)")

    mx = (
        pairs.select(
            "lang_a",
            "lang_b",
            "n_a",
            "n_b",
            F.abs(
                dec(F.col("ca")) * dec(F.col("n_b"))
                - dec(F.col("cb")) * dec(F.col("n_a"))
            ).alias("diff"),
        )
        .groupBy("lang_a", "lang_b", "n_a", "n_b")
        .agg(F.max("diff").alias("m"))
    )

    return mx.select(
        "lang_a",
        "lang_b",
        "n_a",
        "n_b",
        pround(
            F.col("m").cast("double")
            / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
        ).alias("ks_d"),
        (
            dec(F.col("m")) * dec(F.col("m")) * F.lit(1_000_000).cast("decimal(38,0)")
            > F.lit(KS_C2_1E6).cast("decimal(38,0)")
            * dec(F.col("n_a") + F.col("n_b"))
            * dec(F.col("n_a"))
            * dec(F.col("n_b"))
        ).alias("reject_05"),
    )


# --------------------------------------------------------------------------
# PSI (population stability index) week-over-week bucket drift.
# --------------------------------------------------------------------------

PSI_BUCKET_CENTS = 2500  # 25.00-wide value buckets (value domain ~[0, 500])
PSI_SPLIT = "2024-01-16"  # expected = days 1-15, actual = days 16-30
PSI_Q = 1048576.0  # 2^20 term grid (quantize-then-sum rule)


def psi_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stability index per event type: bucket the reading
    value on a fixed cents grid, compare the first half-month
    (expected) against the second (actual), and sum the classic
    (p_a - p_e)*ln(p_a/p_e) contributions — the scorecard-monitoring
    statistic risk/fraud teams run on every model input. Buckets that
    are empty on either side are EXCLUDED from the sum and counted in
    ``n_onesided`` instead (the standard epsilon-clamp made
    deterministic: the report shows how much mass the clamp would have
    touched rather than inventing an epsilon).

    Stability classes decide on the INTEGER quantized sum (psi_q*10 <
    2^20 <=> psi < 0.1), so the stable/moderate/shifted verdict can
    never flip on a last-ulp disagreement.

    Shape: one conditional aggregate over the stream (bucket key in
    codegen, period split as two conditional SUMs — no second scan,
    no join between periods); everything after is arithmetic on the
    ~20-buckets-x-5-types table.
    """
    ev = table(spark, sf_dir, "events")
    bucket = F.floor(
        (F.col("value") * 100 + 0.5).cast("long") / F.lit(PSI_BUCKET_CENTS)
    ).alias("bucket")
    split = F.col("ts") < F.lit(PSI_SPLIT).cast("timestamp")
    per = (
        ev.select("event_type", bucket, split.alias("is_exp"))
        .groupBy("event_type", "bucket")
        .agg(
            F.sum(F.when(F.col("is_exp"), 1).otherwise(0)).alias("ce"),
            F.sum(F.when(~F.col("is_exp"), 1).otherwise(0)).alias("ca"),
        )
    )
    return psi_finish(per, ["event_type"])


def psi_finish(per: DataFrame, keys: list[str]) -> DataFrame:
    """Shared PSI finisher — the batch report and the streaming drift
    monitor import this one function, so the two paths cannot drift.
    ``per``: one row per (*keys, bucket) with exact integer counts
    ``ce`` (expected) and ``ca`` (actual). Totals ride window sums
    over the bucket-bounded table; terms quantize to the 2^20 grid per
    bucket; the verdict compares integers."""
    wt = Window.partitionBy(*keys)
    per = per.withColumn("ne", F.sum("ce").over(wt)).withColumn(
        "na", F.sum("ca").over(wt)
    )
    both = (F.col("ce") > 0) & (F.col("ca") > 0)
    pe = F.col("ce").cast("double") / F.col("ne").cast("double")
    pa = F.col("ca").cast("double") / F.col("na").cast("double")
    term = (pa - pe) * F.log(
        (F.col("ca") * F.col("ne")).cast("double")
        / (F.col("ce") * F.col("na")).cast("double")
    )
    tq = F.when(both, F.floor(term * F.lit(PSI_Q) + 0.5).cast("long")).otherwise(
        F.lit(0)
    )
    agg = per.groupBy(*keys).agg(
        F.max("ne").alias("n_expected"),
        F.max("na").alias("n_actual"),
        F.sum(F.when(both, 1).otherwise(0)).alias("n_buckets"),
        F.sum(F.when(both, 0).otherwise(1)).alias("n_onesided"),
        F.sum(tq).alias("psi_q"),
    )
    return agg.select(
        *keys,
        "n_expected",
        "n_actual",
        "n_buckets",
        "n_onesided",
        pround(F.col("psi_q").cast("double") / F.lit(PSI_Q)).alias("psi"),
        F.when(F.col("psi_q") * 10 < F.lit(int(PSI_Q)), "stable")
        .when(F.col("psi_q") * 4 < F.lit(int(PSI_Q)), "moderate")
        .otherwise("shifted")
        .alias("stability"),
    )


def psi_value_bucket(col: Column = None) -> Column:
    """The shared cents bucket key (batch report + streaming monitor)."""
    c = col if col is not None else F.col("value")
    return F.floor(
        (c * 100 + 0.5).cast("long") / F.lit(PSI_BUCKET_CENTS)
    )


QUERIES = {
    "ks_length_drift": ks_length_drift,
    "psi_drift_report": psi_drift_report,
}

ORACLES = {
    "ks_length_drift": f"""
        WITH h AS (
            SELECT lang, n_chars, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM documents GROUP BY 1, 2
        ),
        vals AS (SELECT DISTINCT n_chars FROM documents),
        langs AS (
            SELECT lang, CAST(COUNT(*) AS BIGINT) AS n
            FROM documents GROUP BY 1
        ),
        dense AS (
            SELECT l.lang, v.n_chars, COALESCE(h.cnt, 0) AS cnt
            FROM vals v CROSS JOIN (SELECT lang FROM langs) l
            LEFT JOIN h ON h.lang = l.lang AND h.n_chars = v.n_chars
        ),
        cum AS (
            SELECT lang, n_chars,
                   CAST(SUM(cnt) OVER (
                       PARTITION BY lang ORDER BY n_chars
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS cum
            FROM dense
        ),
        pairs AS (
            SELECT a.lang AS lang_a, b.lang AS lang_b,
                   la.n AS n_a, lb.n AS n_b,
                   ABS(CAST(a.cum AS HUGEINT) * lb.n
                       - CAST(b.cum AS HUGEINT) * la.n) AS diff
            FROM cum a
            JOIN cum b ON a.n_chars = b.n_chars AND a.lang < b.lang
            JOIN langs la ON la.lang = a.lang
            JOIN langs lb ON lb.lang = b.lang
        ),
        mx AS (
            SELECT lang_a, lang_b, n_a, n_b, MAX(diff) AS m
            FROM pairs GROUP BY 1, 2, 3, 4
        )
        SELECT lang_a, lang_b, n_a, n_b,
               {pround_sql(
                   'CAST(m AS DOUBLE)'
                   ' / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))'
               )}
                   AS ks_d,
               (CAST(m AS HUGEINT) * m * 1000000
                > CAST({KS_C2_1E6} AS HUGEINT) * (n_a + n_b) * n_a * n_b)
                   AS reject_05
        FROM mx
    """,
    "psi_drift_report": f"""
        WITH per AS (
            SELECT event_type,
                   CAST(FLOOR(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                              / {PSI_BUCKET_CENTS}) AS BIGINT) AS bucket,
                   CAST(SUM(CASE WHEN ts < TIMESTAMP '{PSI_SPLIT}'
                            THEN 1 ELSE 0 END) AS BIGINT) AS ce,
                   CAST(SUM(CASE WHEN ts < TIMESTAMP '{PSI_SPLIT}'
                            THEN 0 ELSE 1 END) AS BIGINT) AS ca
            FROM events GROUP BY 1, 2
        ),
        tot AS (
            SELECT *,
                   CAST(SUM(ce) OVER (PARTITION BY event_type) AS BIGINT) AS ne,
                   CAST(SUM(ca) OVER (PARTITION BY event_type) AS BIGINT) AS na
            FROM per
        ),
        terms AS (
            SELECT event_type, ne, na,
                   CASE WHEN ce > 0 AND ca > 0 THEN 1 ELSE 0 END AS both_f,
                   CASE WHEN ce > 0 AND ca > 0 THEN
                       CAST(FLOOR(
                           (CAST(ca AS DOUBLE) / CAST(na AS DOUBLE)
                            - CAST(ce AS DOUBLE) / CAST(ne AS DOUBLE))
                           * LN(CAST(ca * ne AS DOUBLE)
                                / CAST(ce * na AS DOUBLE))
                           * {PSI_Q} + 0.5) AS BIGINT)
                   ELSE 0 END AS tq
            FROM tot
        )
        SELECT event_type,
               CAST(MAX(ne) AS BIGINT) AS n_expected,
               CAST(MAX(na) AS BIGINT) AS n_actual,
               CAST(SUM(both_f) AS BIGINT) AS n_buckets,
               CAST(SUM(1 - both_f) AS BIGINT) AS n_onesided,
               {pround_sql(f'CAST(SUM(tq) AS DOUBLE) / {PSI_Q}')} AS psi,
               CASE WHEN SUM(tq) * 10 < {int(PSI_Q)} THEN 'stable'
                    WHEN SUM(tq) * 4 < {int(PSI_Q)} THEN 'moderate'
                    ELSE 'shifted' END AS stability
        FROM terms GROUP BY 1
    """,
}


# --------------------------------------------------------------------------
# HBOS: histogram-based outlier score (Goldstein & Dengel 2012).
# --------------------------------------------------------------------------

HBOS_BUCKET_CENTS = 2500  # value-histogram bin width (25.00)
HBOS_Q = 1048576.0  # 2^20 per-bin quantization grid
HBOS_TH = 9.0  # outlier threshold on the summed score (calibrated so
# both verdict branches are live: the typical uniform-ish event scores
# ~ln(20)+ln(24)+ln(5) ~ 7.8; sparse-bin events exceed 9)


def hbos_outlier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HBOS unsupervised outlier scoring: three univariate histograms
    (value bucket, hour-of-day, event type), per-event score =
    sum_f ln(1/p_f) — the linear-time outlier detector that needs no
    pair distances, which is exactly why it's the one that still runs
    at 100 TB (each histogram is ONE map-side-combinable aggregate;
    scoring is three equi-joins against bin tables bounded by bin
    count, which AQE broadcasts).

    Exactness: each bin's -ln(c/N) is quantized ONCE per bin (bounded
    rows) to the 2^20 grid; a per-event score is the INTEGER sum of
    three bin values; the outlier verdict compares integers
    (score_q > TH*2^20). N rides a window sum over the bin table
    itself, never a second scan of the stream."""
    ev = table(spark, sf_dir, "events")
    feats = ev.select(
        "event_id",
        F.floor(
            F.floor(F.col("value") * 100 + 0.5).cast("long")
            / F.lit(HBOS_BUCKET_CENTS)
        ).alias("vb"),
        F.hour("ts").alias("hr"),
        "event_type",
    )
    wall = Window.partitionBy(F.lit(1))

    def hist(col: str) -> DataFrame:
        h = feats.groupBy(col).agg(F.count(F.lit(1)).alias("c"))
        return h.select(
            col,
            F.floor(
                -F.log(
                    F.col("c").cast("double")
                    / F.sum("c").over(wall).cast("double")
                )
                * F.lit(HBOS_Q)
                + 0.5
            )
            .cast("long")
            .alias(f"lq_{col}"),
        )

    scored = (
        feats.join(hist("vb"), "vb")
        .join(hist("hr"), "hr")
        .join(hist("event_type"), "event_type")
        .select(
            "event_id",
            (F.col("lq_vb") + F.col("lq_hr") + F.col("lq_event_type")).alias(
                "score_q"
            ),
        )
    )
    return scored.select(
        "event_id",
        pround(F.col("score_q").cast("double") / F.lit(HBOS_Q)).alias(
            "hbos_score"
        ),
        (
            F.col("score_q") > F.lit(int(HBOS_TH * HBOS_Q))
        ).alias("is_outlier"),
    )


QUERIES["hbos_outlier_scores"] = hbos_outlier_scores

ORACLES["hbos_outlier_scores"] = f"""
    WITH feats AS (
        SELECT event_id,
               CAST(FLOOR(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                          / {HBOS_BUCKET_CENTS}) AS BIGINT) AS vb,
               EXTRACT(HOUR FROM ts) AS hr,
               event_type
        FROM events
    ),
    hv AS (
        SELECT vb, CAST(FLOOR(-LN(CAST(COUNT(*) AS DOUBLE)
                   / CAST(SUM(COUNT(*)) OVER () AS DOUBLE))
                   * {HBOS_Q} + 0.5) AS BIGINT) AS lq_vb
        FROM feats GROUP BY vb
    ),
    hh AS (
        SELECT hr, CAST(FLOOR(-LN(CAST(COUNT(*) AS DOUBLE)
                   / CAST(SUM(COUNT(*)) OVER () AS DOUBLE))
                   * {HBOS_Q} + 0.5) AS BIGINT) AS lq_hr
        FROM feats GROUP BY hr
    ),
    ht AS (
        SELECT event_type, CAST(FLOOR(-LN(CAST(COUNT(*) AS DOUBLE)
                   / CAST(SUM(COUNT(*)) OVER () AS DOUBLE))
                   * {HBOS_Q} + 0.5) AS BIGINT) AS lq_et
        FROM feats GROUP BY event_type
    ),
    scored AS (
        SELECT f.event_id, hv.lq_vb + hh.lq_hr + ht.lq_et AS score_q
        FROM feats f
        JOIN hv ON hv.vb = f.vb
        JOIN hh ON hh.hr = f.hr
        JOIN ht ON ht.event_type = f.event_type
    )
    SELECT event_id,
           {pround_sql(f'CAST(score_q AS DOUBLE) / {HBOS_Q}')}
               AS hbos_score,
           (score_q > {int(HBOS_TH * HBOS_Q)}) AS is_outlier
    FROM scored
"""


# --------------------------------------------------------------------------
# Two-proportion A/B test, decision in exact integer arithmetic.
# --------------------------------------------------------------------------

# chi-square(1df) / z^2 critical value at alpha=0.05, scaled by 1e4:
# significant iff (c1*n2 - c2*n1)^2 * N * 1e4 > 38415 * n1*n2*C*(N-C),
# all in DECIMAL(38,0)/HUGEINT (exact for per-arm counts to ~3e7;
# beyond that, test on a sample — the ks_length_drift posture).
AB_Z2_1E4 = 38_415


def ab_test_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion A/B significance test — the product-analytics
    primitive: users hash-split into arms (md5 — the deterministic
    bucketing a real experiment framework uses), conversion = the user
    produced at least one 'purchase' event, and the pooled two-
    proportion z-test decided ENTIRELY in integer arithmetic (the
    z² > 3.8415 comparison cross-multiplies exact counts in
    DECIMAL(38,0) — no sqrt, no division); the displayed z² and rates
    are single IEEE divisions of exact integers.

    Shape: one per-user conditional aggregate (arm key in codegen),
    one 2-row arm rollup, one 1-row final projection. Nothing after
    the first aggregate scales with the corpus."""
    from smart_city_data_pipeline_spark.functions.hashing import md5_long

    ev = table(spark, sf_dir, "events")
    # conversion = the user's FIRST event (by the unique (ts, event_id)
    # order) is a purchase — an activation-style metric that is sparse
    # per user ("ever purchased" saturates at 100% on long histories,
    # degenerating the pooled variance to zero).
    users = ev.groupBy("user_id").agg(
        (
            F.min_by("event_type", F.struct("ts", "event_id")) == "purchase"
        )
        .cast("int")
        .alias("converted")
    ).select(
        (
            md5_long(F.concat(F.lit("ab:"), F.col("user_id").cast("string")))
            % 2
        ).alias("arm"),
        "converted",
    )
    arms = users.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("converted").alias("c"),
    )
    a = arms.filter(F.col("arm") == 0).select(
        F.col("n").alias("n_a"), F.col("c").alias("conv_a")
    )
    b = arms.filter(F.col("arm") == 1).select(
        F.col("n").alias("n_b"), F.col("c").alias("conv_b")
    )
    j = a.crossJoin(b)

    def dec(c: Column) -> Column:
        return c.cast("decimal(38,0)")

    diff = F.col("conv_a") * F.col("n_b") - F.col("conv_b") * F.col("n_a")
    big_c = F.col("conv_a") + F.col("conv_b")
    big_n = F.col("n_a") + F.col("n_b")
    num = dec(diff) * dec(diff) * dec(big_n)
    den = dec(F.col("n_a")) * dec(F.col("n_b")) * dec(big_c) * dec(
        big_n - big_c
    )
    return j.select(
        "n_a",
        "conv_a",
        pround(F.col("conv_a").cast("double") / F.col("n_a").cast("double")).alias(
            "rate_a"
        ),
        "n_b",
        "conv_b",
        pround(F.col("conv_b").cast("double") / F.col("n_b").cast("double")).alias(
            "rate_b"
        ),
        pround(num.cast("double") / den.cast("double")).alias("z2"),
        (
            num * F.lit(10_000).cast("decimal(38,0)")
            > F.lit(AB_Z2_1E4).cast("decimal(38,0)") * den
        ).alias("significant_05"),
    )


QUERIES["ab_test_report"] = ab_test_report

from smart_city_data_pipeline_spark.functions.hashing import (  # noqa: E402
    md5_long_sql as _md5_sql,
)

ORACLES["ab_test_report"] = f"""
    WITH firsts AS (
        SELECT user_id, event_type FROM (
            SELECT user_id, event_type,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS rn
            FROM events
        ) WHERE rn = 1
    ),
    users AS (
        SELECT ({_md5_sql("'ab:' || CAST(user_id AS VARCHAR)")} % 2) AS arm,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                   AS converted
        FROM firsts
    ),
    arms AS (
        SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(converted) AS BIGINT) AS c
        FROM users GROUP BY 1
    ),
    j AS (
        SELECT a.n AS n_a, a.c AS conv_a, b.n AS n_b, b.c AS conv_b
        FROM (SELECT n, c FROM arms WHERE arm = 0) a
        CROSS JOIN (SELECT n, c FROM arms WHERE arm = 1) b
    ),
    t AS (
        SELECT *,
               CAST(conv_a * n_b - conv_b * n_a AS HUGEINT) AS diff,
               CAST(conv_a + conv_b AS HUGEINT) AS big_c,
               CAST(n_a + n_b AS HUGEINT) AS big_n
        FROM j
    )
    SELECT n_a, conv_a,
           {pround_sql('CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)')}
               AS rate_a,
           n_b, conv_b,
           {pround_sql('CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE)')}
               AS rate_b,
           {pround_sql(
               'CAST(diff * diff * big_n AS DOUBLE)'
               ' / CAST(CAST(n_a AS HUGEINT) * n_b * big_c'
               '        * (big_n - big_c) AS DOUBLE)'
           )} AS z2,
           (diff * diff * big_n * 10000
            > {AB_Z2_1E4} * CAST(n_a AS HUGEINT) * n_b * big_c
              * (big_n - big_c)) AS significant_05
    FROM t
"""


# --------------------------------------------------------------------------
# Decision-stump training: exact information-gain split search.
# --------------------------------------------------------------------------

STUMP_Q = 1048576.0  # 2^20 gain quantization grid


def decision_stump_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a decision stump in-engine: find the reading-value
    threshold with maximum information gain for predicting
    ``event_type = 'error'`` — the split-search primitive inside every
    tree/GBDT trainer, run the way a distributed trainer actually runs
    it (histogram aggregation, then the scan over candidate splits —
    XGBoost/LightGBM's approximate-histogram strategy, exact here
    because the cents domain is the histogram).

    Exactness: candidate statistics are cumulative INTEGER counts over
    the sorted cents histogram; each candidate's gain
    ``H(parent) - nl/N*H(left) - nr/N*H(right)`` is computed from
    exact integer ratios and quantized ONCE per candidate (no float
    summation anywhere); the argmax tie-breaks to the smallest
    threshold via struct-min. The winning stump, its class counts, and
    its gain are the single output row.

    100 TB story: ONE map-side-combinable histogram aggregate over the
    stream; the split scan is a window over the |distinct cents| table
    — the same shape trainers use because it never re-scans facts."""
    ev = table(spark, sf_dir, "events")
    hist = (
        ev.select(
            F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
            F.when(F.col("event_type") == "error", 1).otherwise(0).alias("y"),
        )
        .groupBy("cents")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("y").alias("pos"))
    )
    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        "cents",
        F.sum("n").over(w).alias("nl"),
        F.sum("pos").over(w).alias("pl"),
    )
    tot = hist.agg(
        F.sum("n").alias("nn"), F.sum("pos").alias("pp")
    )

    def ent(p: Column, n: Column) -> Column:
        """n-weighted entropy n*H(p/n) = -p*ln(p/n) - (n-p)*ln((n-p)/n),
        with 0*ln(0) = 0."""
        q = n - p
        t1 = F.when(
            p > 0,
            -p.cast("double")
            * F.log(p.cast("double") / n.cast("double")),
        ).otherwise(F.lit(0.0))
        t2 = F.when(
            q > 0,
            -q.cast("double")
            * F.log(q.cast("double") / n.cast("double")),
        ).otherwise(F.lit(0.0))
        return t1 + t2

    cand = cum.join(F.broadcast(tot)).filter(
        F.col("nl") < F.col("nn")  # a split must leave the right side non-empty
    )
    gain = (
        ent(F.col("pp"), F.col("nn"))
        - ent(F.col("pl"), F.col("nl"))
        - ent(F.col("pp") - F.col("pl"), F.col("nn") - F.col("nl"))
    ) / F.col("nn").cast("double")
    gq = F.floor(gain * F.lit(STUMP_Q) + 0.5).cast("long")
    best = cand.select(
        F.struct(
            (-gq).alias("ngq"),
            F.col("cents").alias("thr"),
            F.col("nl").alias("nl"),
            F.col("pl").alias("pl"),
            (F.col("nn") - F.col("nl")).alias("nr"),
            (F.col("pp") - F.col("pl")).alias("pr"),
        ).alias("s")
    ).agg(F.min("s").alias("b"))
    return best.select(
        F.col("b.thr").alias("threshold_cents"),
        F.col("b.nl").alias("n_left"),
        F.col("b.pl").alias("pos_left"),
        F.col("b.nr").alias("n_right"),
        F.col("b.pr").alias("pos_right"),
        pround((-F.col("b.ngq")).cast("double") / F.lit(STUMP_Q)).alias(
            "info_gain"
        ),
    )


QUERIES["decision_stump_train"] = decision_stump_train

ORACLES["decision_stump_train"] = f"""
    WITH hist AS (
        SELECT CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                    AS BIGINT) AS pos
        FROM events GROUP BY 1
    ),
    cum AS (
        SELECT cents,
               CAST(SUM(n) OVER win AS BIGINT) AS nl,
               CAST(SUM(pos) OVER win AS BIGINT) AS pl
        FROM hist
        WINDOW win AS (ORDER BY cents
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    tot AS (
        SELECT CAST(SUM(n) AS BIGINT) AS nn,
               CAST(SUM(pos) AS BIGINT) AS pp
        FROM hist
    ),
    cand AS (
        SELECT c.cents, c.nl, c.pl, t.nn, t.pp,
               t.nn - c.nl AS nr, t.pp - c.pl AS pr
        FROM cum c CROSS JOIN tot t
        WHERE c.nl < t.nn
    ),
    scored AS (
        SELECT *,
            CAST(FLOOR((
                (CASE WHEN pp > 0 THEN -CAST(pp AS DOUBLE)
                      * LN(CAST(pp AS DOUBLE) / CAST(nn AS DOUBLE))
                 ELSE 0.0 END
                 + CASE WHEN nn - pp > 0 THEN -CAST(nn - pp AS DOUBLE)
                        * LN(CAST(nn - pp AS DOUBLE) / CAST(nn AS DOUBLE))
                   ELSE 0.0 END)
                - (CASE WHEN pl > 0 THEN -CAST(pl AS DOUBLE)
                        * LN(CAST(pl AS DOUBLE) / CAST(nl AS DOUBLE))
                   ELSE 0.0 END
                   + CASE WHEN nl - pl > 0 THEN -CAST(nl - pl AS DOUBLE)
                          * LN(CAST(nl - pl AS DOUBLE) / CAST(nl AS DOUBLE))
                     ELSE 0.0 END)
                - (CASE WHEN pr > 0 THEN -CAST(pr AS DOUBLE)
                        * LN(CAST(pr AS DOUBLE) / CAST(nr AS DOUBLE))
                   ELSE 0.0 END
                   + CASE WHEN nr - pr > 0 THEN -CAST(nr - pr AS DOUBLE)
                          * LN(CAST(nr - pr AS DOUBLE) / CAST(nr AS DOUBLE))
                     ELSE 0.0 END)
            ) / CAST(nn AS DOUBLE) * {STUMP_Q} + 0.5) AS BIGINT) AS gq
        FROM cand
    ),
    best AS (
        SELECT MIN({{'ngq': -gq, 'thr': cents, 'nl': nl, 'pl': pl,
                     'nr': nr, 'pr': pr}}) AS b
        FROM scored
    )
    SELECT struct_extract(b, 'thr') AS threshold_cents,
           struct_extract(b, 'nl') AS n_left,
           struct_extract(b, 'pl') AS pos_left,
           struct_extract(b, 'nr') AS n_right,
           struct_extract(b, 'pr') AS pos_right,
           {pround_sql(
               f"CAST(-struct_extract(b, 'ngq') AS DOUBLE) / {STUMP_Q}"
           )} AS info_gain
    FROM best
"""


# --------------------------------------------------------------------------
# Split-conformal anomaly calibration on top of HBOS.
# --------------------------------------------------------------------------

CONF_ALPHA_NUM = 5  # alpha = 5/100: target 5% flag rate with the
CONF_ALPHA_DEN = 100  # (n+1)(1-alpha)/n finite-sample guarantee


def conformal_anomaly_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal calibration of the HBOS anomaly scores (Vovk et
    al.; the Lei et al. 2018 split recipe): fit nothing — take the
    md5 80% slice as calibration, set the threshold at the
    ceil((n_cal+1)(1-alpha))-th smallest calibration score, and flag
    the held-out 20%. The guarantee (flag rate <= alpha + 1/(n_cal+1)
    under exchangeability) is distribution-free — the honest way to
    turn ANY anomaly score into an alert budget.

    Exactness: scores are the integer-quantized HBOS sums
    (``hbos_outlier_scores``' construction re-derived over the SAME
    histograms — conformal calibration must score calibration and
    test points with the identical score function); the threshold is
    an integer ORDER STATISTIC (rank = ceil arithmetic on integers)
    picked from the score HISTOGRAM: the rank-r smallest calibration
    score is the smallest ``score_q`` whose cumulative count reaches
    r, identical to a row_number pick under any tie-break because
    ties share the score value; the output compares integer counts.

    Shape: histograms once over the full stream (the deployment
    reality: the score function is fit before the split), one keyed
    aggregate to the BOUNDED score grid (sums of three quantized
    -ln p terms — |grid| is score-resolution-bounded, never
    row-proportional), a cumulative window over that grid, a 1-row
    threshold broadcast, one filter + aggregate over the eval slice.
    No window ever sees data-proportional input (the
    length_outlier_filter histogram-cutoff idiom)."""
    from smart_city_data_pipeline_spark.functions.hashing import md5_long

    ev = table(spark, sf_dir, "events")
    feats = ev.select(
        "event_id",
        F.floor(
            F.floor(F.col("value") * 100 + 0.5).cast("long")
            / F.lit(HBOS_BUCKET_CENTS)
        ).alias("vb"),
        F.hour("ts").alias("hr"),
        "event_type",
        (
            md5_long(
                F.concat(F.lit("conf:"), F.col("event_id").cast("string"))
            )
            % 10
            < 8
        ).alias("is_cal"),
    )
    wall = Window.partitionBy(F.lit(1))

    def hist(col: str) -> DataFrame:
        h = feats.groupBy(col).agg(F.count(F.lit(1)).alias("c"))
        return h.select(
            col,
            F.floor(
                -F.log(
                    F.col("c").cast("double")
                    / F.sum("c").over(wall).cast("double")
                )
                * F.lit(HBOS_Q)
                + 0.5
            )
            .cast("long")
            .alias(f"lq_{col}"),
        )

    scored = (
        feats.join(hist("vb"), "vb")
        .join(hist("hr"), "hr")
        .join(hist("event_type"), "event_type")
        .select(
            "event_id",
            "is_cal",
            (F.col("lq_vb") + F.col("lq_hr") + F.col("lq_event_type")).alias(
                "score_q"
            ),
        )
    )
    cal = scored.filter("is_cal")
    n_cal = cal.agg(F.count(F.lit(1)).alias("n_cal"))
    # rank = ceil((n_cal+1)*(1-alpha)) via the positive-only form
    # (a+b-1)//b — DuckDB's integer // truncates toward zero on
    # negatives while floor(-a/b) floors, so the -floor(-a/b) ceil
    # idiom diverges across engines (session gotcha).
    rank_expr = F.floor(
        (
            (F.col("n_cal") + 1) * F.lit(CONF_ALPHA_DEN - CONF_ALPHA_NUM)
            + F.lit(CONF_ALPHA_DEN - 1)
        )
        / F.lit(CONF_ALPHA_DEN)
    ).cast("long")
    # Rank pick via the score-grid histogram: aggregate calibration
    # rows to per-score counts (bounded grid), cumulative window over
    # that grid only, then the rank-r order statistic is the row with
    # cum - c < rank <= cum. GLOBAL aggregate root over the single
    # rank-matched row, so the broadcast side is policy-provably 1 row
    # (the length_outlier_filter cutoff idiom) — a Filter/Project root
    # the checker can't bound.
    sc_hist = cal.groupBy("score_q").agg(F.count(F.lit(1)).alias("c"))
    wg = Window.orderBy("score_q").rowsBetween(
        Window.unboundedPreceding, 0
    )
    thr = (
        sc_hist.withColumn("cum", F.sum("c").over(wg))
        .join(F.broadcast(n_cal))
        .withColumn("rank", rank_expr)
        .filter(
            (F.col("cum") >= F.col("rank"))
            & (F.col("cum") - F.col("c") < F.col("rank"))
        )
        .agg(
            F.max("score_q").alias("thr_q"),
            F.max("n_cal").alias("n_cal"),
            F.max("rank").alias("thr_rank"),
        )
    )
    ev_slice = scored.filter(~F.col("is_cal"))
    return (
        ev_slice.join(F.broadcast(thr))
        .agg(
            F.max("n_cal").alias("n_cal"),
            F.max("thr_rank").alias("thr_rank"),
            F.count(F.lit(1)).alias("n_eval"),
            F.sum(
                F.when(F.col("score_q") > F.col("thr_q"), 1).otherwise(0)
            ).alias("n_flagged"),
            pround(
                F.max("thr_q").cast("double") / F.lit(HBOS_Q)
            ).alias("threshold"),
        )
        .select(
            "n_cal",
            "thr_rank",
            "threshold",
            "n_eval",
            "n_flagged",
            pround(
                F.col("n_flagged").cast("double")
                / F.col("n_eval").cast("double")
            ).alias("flag_rate"),
        )
    )


QUERIES["conformal_anomaly_rate"] = conformal_anomaly_rate

ORACLES["conformal_anomaly_rate"] = f"""
    WITH feats AS (
        SELECT event_id,
               CAST(FLOOR(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                          / {HBOS_BUCKET_CENTS}) AS BIGINT) AS vb,
               EXTRACT(HOUR FROM ts) AS hr,
               event_type,
               ({_md5_sql("'conf:' || CAST(event_id AS VARCHAR)")} % 10) < 8
                   AS is_cal
        FROM events
    ),
    hv AS (
        SELECT vb, CAST(FLOOR(-LN(CAST(COUNT(*) AS DOUBLE)
                   / CAST(SUM(COUNT(*)) OVER () AS DOUBLE))
                   * {HBOS_Q} + 0.5) AS BIGINT) AS lq_vb
        FROM feats GROUP BY vb
    ),
    hh AS (
        SELECT hr, CAST(FLOOR(-LN(CAST(COUNT(*) AS DOUBLE)
                   / CAST(SUM(COUNT(*)) OVER () AS DOUBLE))
                   * {HBOS_Q} + 0.5) AS BIGINT) AS lq_hr
        FROM feats GROUP BY hr
    ),
    ht AS (
        SELECT event_type, CAST(FLOOR(-LN(CAST(COUNT(*) AS DOUBLE)
                   / CAST(SUM(COUNT(*)) OVER () AS DOUBLE))
                   * {HBOS_Q} + 0.5) AS BIGINT) AS lq_et
        FROM feats GROUP BY event_type
    ),
    scored AS (
        SELECT f.event_id, f.is_cal,
               hv.lq_vb + hh.lq_hr + ht.lq_et AS score_q
        FROM feats f
        JOIN hv ON hv.vb = f.vb
        JOIN hh ON hh.hr = f.hr
        JOIN ht ON ht.event_type = f.event_type
    ),
    cal AS (
        SELECT score_q,
               ROW_NUMBER() OVER (ORDER BY score_q ASC, event_id ASC) AS rn
        FROM scored WHERE is_cal
    ),
    nc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cal FROM cal),
    thr AS (
        SELECT c.score_q AS thr_q, nc.n_cal, c.rn AS thr_rank
        FROM cal c, nc
        WHERE c.rn = ((nc.n_cal + 1) * {CONF_ALPHA_DEN - CONF_ALPHA_NUM}
                      + {CONF_ALPHA_DEN - 1}) // {CONF_ALPHA_DEN}
    )
    SELECT t.n_cal, t.thr_rank,
           {pround_sql(f'CAST(t.thr_q AS DOUBLE) / {HBOS_Q}')} AS threshold,
           CAST(COUNT(*) AS BIGINT) AS n_eval,
           CAST(SUM(CASE WHEN s.score_q > t.thr_q THEN 1 ELSE 0 END)
                AS BIGINT) AS n_flagged,
           {pround_sql(
               'CAST(SUM(CASE WHEN s.score_q > t.thr_q THEN 1 ELSE 0 END)'
               ' AS DOUBLE) / COUNT(*)'
           )} AS flag_rate
    FROM scored s CROSS JOIN thr t
    WHERE NOT s.is_cal
    GROUP BY 1, 2, 3
"""


# --------------------------------------------------------------------------
# 1-D Wasserstein (earth mover's) drift distance.
# --------------------------------------------------------------------------

W1_SPLIT = PSI_SPLIT  # same expected/actual halves as the PSI report


def wasserstein_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Earth-mover's distance between the first- and second-half value
    distributions per event type — the drift metric that reports HOW
    FAR the distribution moved in value units, where KS reports the
    max ECDF gap (significance) and PSI a bucketed divergence: the
    1-D Wasserstein-1 is the area between the ECDFs,
    W1 = Σ_v Δv · |F_a(v) - F_e(v)|, and with integer counts it is
    EXACT: Σ over the merged value grid of
    gap_width · |cum_e·n_a - cum_a·n_e| / (n_e·n_a) — every term an
    integer product until the single final division.

    Shape: one keyed aggregate to the (type, cents) histogram with
    conditional period sums, cumulative window over the value-bounded
    table, lead() for the gap width, one integer rollup — the KS
    construction with a sum instead of a max."""
    ev = table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + 0.5).cast("long")
    split = F.col("ts") < F.lit(W1_SPLIT).cast("timestamp")
    h = (
        ev.select("event_type", cents.alias("c"), split.alias("is_exp"))
        .groupBy("event_type", "c")
        .agg(
            F.sum(F.when(F.col("is_exp"), 1).otherwise(0)).alias("ce"),
            F.sum(F.when(~F.col("is_exp"), 1).otherwise(0)).alias("ca"),
        )
    )
    wt = Window.partitionBy("event_type")
    wo = (
        Window.partitionBy("event_type")
        .orderBy("c")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    won = Window.partitionBy("event_type").orderBy("c")
    cum = (
        h.withColumn("ne", F.sum("ce").over(wt))
        .withColumn("na", F.sum("ca").over(wt))
        .withColumn("cum_e", F.sum("ce").over(wo))
        .withColumn("cum_a", F.sum("ca").over(wo))
        .withColumn("nxt", F.lead("c").over(won))
        .filter(F.col("nxt").isNotNull())
    )
    term = (F.col("nxt") - F.col("c")) * F.abs(
        F.col("cum_e") * F.col("na") - F.col("cum_a") * F.col("ne")
    )
    agg = cum.groupBy("event_type").agg(
        F.max("ne").alias("n_expected"),
        F.max("na").alias("n_actual"),
        F.sum(term.cast("decimal(38,0)")).alias("w1_num"),
    )
    return agg.select(
        "event_type",
        "n_expected",
        "n_actual",
        pround(
            F.col("w1_num").cast("double")
            / (F.col("n_expected") * F.col("n_actual")).cast("double")
            / 100.0  # cents -> value units
        ).alias("w1_distance"),
    )


QUERIES["wasserstein_drift"] = wasserstein_drift

ORACLES["wasserstein_drift"] = f"""
    WITH h AS (
        SELECT event_type,
               CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c,
               CAST(SUM(CASE WHEN ts < TIMESTAMP '{W1_SPLIT}'
                        THEN 1 ELSE 0 END) AS BIGINT) AS ce,
               CAST(SUM(CASE WHEN ts < TIMESTAMP '{W1_SPLIT}'
                        THEN 0 ELSE 1 END) AS BIGINT) AS ca
        FROM events GROUP BY 1, 2
    ),
    cum AS (
        SELECT event_type, c,
               SUM(ce) OVER (PARTITION BY event_type) AS ne,
               SUM(ca) OVER (PARTITION BY event_type) AS na,
               SUM(ce) OVER cw AS cum_e,
               SUM(ca) OVER cw AS cum_a,
               LEAD(c) OVER (PARTITION BY event_type ORDER BY c) AS nxt
        FROM h
        WINDOW cw AS (PARTITION BY event_type ORDER BY c
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_type,
           CAST(MAX(ne) AS BIGINT) AS n_expected,
           CAST(MAX(na) AS BIGINT) AS n_actual,
           {pround_sql(
               'CAST(SUM(CAST((nxt - c) * ABS(cum_e * na - cum_a * ne)'
               ' AS HUGEINT)) AS DOUBLE)'
               ' / CAST(MAX(ne) * MAX(na) AS DOUBLE) / 100.0'
           )} AS w1_distance
    FROM cum WHERE nxt IS NOT NULL
    GROUP BY 1
"""


# Mann-Whitney significance: z0 = 1.96 = 49/25, z^2 > z0^2 decided by
# integer cross-multiplication (see mwu_zone_shift docstring).
MWU_Z0_NUM2 = 2401
MWU_Z0_DEN2 = 625


def mwu_zone_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U location-shift test between every event-type
    pair's hourly series — the DISTRIBUTION-FREE "does zone A read
    systematically higher than zone B" answer: `ks_length_drift` asks
    "are the shapes different", Spearman asks "do they co-move"; MWU
    asks the dashboard question "which one is higher", robust to the
    spike hours that drag a t-test around.

    Exactness: series points are the shared quantized integer hourly
    means; ranks over the MERGED per-pair sample use the doubled
    average-rank trick (2·avgrank = 2·rank + ties − 1, integers), so
    the doubled statistic ``u2 = 2·U_a = R2_a − 2·n_a·(n_a+1)/2`` is
    an exact BIGINT. The tie-corrected normal-approximation verdict is
    an integer cross-multiply — ``3·625·(u2 − n_a·n_b)²·n·(n−1) >
    2401·n_a·n_b·(n³ − n − Σ(t³−t))`` with every term
    DECIMAL(38,0)/HUGEINT (n = merged hourly buckets, bounded by 2×
    the calendar hour grid: n³ ≈ 1e18 at century scale, the full
    products ≤ ~1e33) — so no float boundary can flip a verdict. The
    reported z is the only float, spelled identically in the oracle.

    Shape: one hourly rollup (map-side combinable), the tiny distinct
    type×type pair table broadcast onto the rollup twice (side a /
    side b), two pair-keyed windows (rank + tie count), one keyed
    aggregate. Facts shuffle once; nothing quadratic touches them."""
    ev = table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    hourly = (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("bucket"),
            F.col("event_type"),
        )
        .agg(F.sum(cents).alias("s"), F.count(F.lit(1)).alias("n"))
        .select("event_type", F.expr("(s * 128) DIV n").alias("v"))
    )
    t1 = hourly.select(F.col("event_type").alias("type_a")).distinct()
    t2 = hourly.select(F.col("event_type").alias("type_b")).distinct()
    pairs = t1.join(t2, F.col("type_a") < F.col("type_b"))
    # no forced broadcast hint: the pair table is bounded by type
    # cardinality but derived from fact keys, so the broadcast-policy
    # checker can't bound it statically — AQE broadcasts it at runtime
    # from its actual (tiny) size instead.
    side_a = hourly.join(
        pairs, F.col("event_type") == F.col("type_a")
    ).select("type_a", "type_b", F.lit(1).alias("is_a"), "v")
    side_b = hourly.join(
        pairs, F.col("event_type") == F.col("type_b")
    ).select("type_a", "type_b", F.lit(0).alias("is_a"), "v")
    merged = side_a.unionByName(side_b)
    pw = ["type_a", "type_b"]
    wr = Window.partitionBy(*pw).orderBy("v")
    wt = Window.partitionBy(*pw, "v")
    ranked = merged.select(
        "type_a",
        "type_b",
        "is_a",
        (
            2 * F.rank().over(wr) + F.count(F.lit(1)).over(wt) - 1
        ).cast("long").alias("r2"),
        F.count(F.lit(1)).over(wt).cast("long").alias("tie_size"),
    )
    g = ranked.groupBy("type_a", "type_b").agg(
        F.sum("is_a").cast("long").alias("n_a"),
        F.sum(F.lit(1) - F.col("is_a")).cast("long").alias("n_b"),
        F.sum(F.col("is_a") * F.col("r2")).alias("r2_a"),
        # each member of a tie group carries tie_size, so the group of
        # size t contributes t·(t²−1) = Σ over members of (t²−1)
        F.sum(
            F.col("tie_size") * F.col("tie_size") - 1
        ).alias("tie_term"),
    )

    def dec(c):
        return c.cast("decimal(38,0)")

    n = F.col("n_a") + F.col("n_b")
    u2 = F.col("r2_a") - F.col("n_a") * (F.col("n_a") + 1)
    dev = dec(u2) - dec(F.col("n_a")) * dec(F.col("n_b"))
    var_num = (
        dec(n) * dec(n) * dec(n) - dec(n) - dec(F.col("tie_term"))
    )
    lhs = (
        F.lit(3 * MWU_Z0_DEN2).cast("decimal(38,0)")
        * dev
        * dev
        * dec(n)
        * dec(n - 1)
    )
    rhs = (
        F.lit(MWU_Z0_NUM2).cast("decimal(38,0)")
        * dec(F.col("n_a"))
        * dec(F.col("n_b"))
        * var_num
    )
    sig = (lhs > rhs) & (var_num > 0)
    verdict = (
        F.when(sig & (dev > 0), "a_high")
        .when(sig & (dev < 0), "b_high")
        .otherwise("ns")
    )
    z = F.when(
        (var_num > 0) & (F.col("n_a") > 0) & (F.col("n_b") > 0),
        dev.cast("double")
        * F.sqrt(F.lit(3.0))
        * F.sqrt(n.cast("double") - 1.0)
        / F.sqrt(F.col("n_a").cast("double") * F.col("n_b").cast("double"))
        / F.sqrt(var_num.cast("double") / n.cast("double")),
    )
    return g.select(
        "type_a",
        "type_b",
        "n_a",
        "n_b",
        u2.cast("long").alias("u2_a"),
        pround(z).alias("z_score"),
        verdict.alias("verdict"),
    )


QUERIES["mwu_zone_shift"] = mwu_zone_shift

ORACLES["mwu_zone_shift"] = f"""
    WITH hourly AS (
        SELECT event_type,
               (CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
                     AS BIGINT) * 128) // COUNT(*) AS v
        FROM events GROUP BY date_trunc('hour', ts), event_type
    ),
    pairs AS (
        SELECT a.type_a, b.type_b
        FROM (SELECT DISTINCT event_type AS type_a FROM hourly) a
        JOIN (SELECT DISTINCT event_type AS type_b FROM hourly) b
          ON a.type_a < b.type_b
    ),
    merged AS (
        SELECT p.type_a, p.type_b, 1 AS is_a, h.v
        FROM hourly h JOIN pairs p ON h.event_type = p.type_a
        UNION ALL
        SELECT p.type_a, p.type_b, 0, h.v
        FROM hourly h JOIN pairs p ON h.event_type = p.type_b
    ),
    ranked AS (
        SELECT type_a, type_b, is_a,
               CAST(2 * rank() OVER (PARTITION BY type_a, type_b ORDER BY v)
                    + COUNT(*) OVER (PARTITION BY type_a, type_b, v)
                    - 1 AS BIGINT) AS r2,
               CAST(COUNT(*) OVER (PARTITION BY type_a, type_b, v)
                    AS BIGINT) AS tie_size
        FROM merged
    ),
    g AS (
        SELECT type_a, type_b,
               CAST(SUM(is_a) AS BIGINT) AS n_a,
               CAST(SUM(1 - is_a) AS BIGINT) AS n_b,
               CAST(SUM(is_a * r2) AS BIGINT) AS r2_a,
               CAST(SUM(tie_size * tie_size - 1) AS BIGINT) AS tie_term
        FROM ranked GROUP BY 1, 2
    ),
    terms AS (
        SELECT type_a, type_b, n_a, n_b,
               CAST(n_a + n_b AS HUGEINT) AS n,
               CAST(r2_a - n_a * (n_a + 1) AS BIGINT) AS u2,
               CAST(r2_a - n_a * (n_a + 1) AS HUGEINT)
                   - CAST(n_a AS HUGEINT) * n_b AS dev,
               CAST(n_a + n_b AS HUGEINT) * (n_a + n_b) * (n_a + n_b)
                   - (n_a + n_b) - tie_term AS var_num
        FROM g
    )
    SELECT type_a, type_b, n_a, n_b, u2 AS u2_a,
           CASE WHEN var_num > 0 AND n_a > 0 AND n_b > 0 THEN {pround_sql(
               'CAST(dev AS DOUBLE) * sqrt(3.0)'
               ' * sqrt(CAST(n AS DOUBLE) - 1.0)'
               ' / sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))'
               ' / sqrt(CAST(var_num AS DOUBLE) / CAST(n AS DOUBLE))'
           )} END AS z_score,
           CASE WHEN var_num > 0
                 AND {3 * MWU_Z0_DEN2} * dev * dev * n * (n - 1)
                     > {MWU_Z0_NUM2} * CAST(n_a AS HUGEINT) * n_b * var_num
                THEN CASE WHEN dev > 0 THEN 'a_high'
                          WHEN dev < 0 THEN 'b_high'
                          ELSE 'ns' END
                ELSE 'ns' END AS verdict
    FROM terms
"""


# --------------------------------------------------------------------------
# Engle ARCH-effect LM test per sensor (volatility clustering).
# --------------------------------------------------------------------------

# chi^2(1) 95% critical value for LM = n*R^2 (Engle 1982, one lag).
ARCH_LM_CRIT = 3.841459
ARCH_MIN_PAIRS = 8


def arch_lm_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engle's LM test for ARCH effects, per sensor: does today's
    squared deviation predict tomorrow's (volatility clustering)? The
    screen a forecasting team runs before trusting constant-variance
    prediction intervals (`holt_linear`/`ols_trend` bands) on a
    sensor: regress z_t = e_t² on z_{t-1}; LM = n·R² ~ chi²(1) under
    homoskedasticity; LM over the 95% critical value flags the sensor
    for a variance-aware model.

    Exactness: residuals are demeaned on the INTEGER GRID — e_t =
    cents(value) − (Σcents DIV n), so z_t = e_t² is an exact integer
    bounded by the value range (never by n), and the six Gauss moments
    of the (z_t, z_{t-1}) pair series accumulate in DECIMAL(38,0)/
    HUGEINT (z² ≤ ~1.6e17 ⇒ exact past 1e20 rows per sensor). R² is
    single IEEE ops over nearest-doubles of identical integers on both
    engines; grid demeaning (vs exact-rational) is part of the spec —
    the LM statistic is asymptotically unchanged and every engine
    computes the identical integers.

    Shape: one keyed mean aggregate + one partitioned-window lag +
    one map-side-combinable moment aggregate — all keyed by sensor;
    the (ts, event_id) window order is total, so the lag pairing is
    deterministic under any physical row order."""
    ev = table(spark, sf_dir, "events")
    y = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    pts = ev.select(
        F.col("user_id").alias("sensor_id"),
        F.col("ts"),
        F.col("event_id"),
        y.alias("y"),
    )
    mbar = pts.groupBy("sensor_id").agg(
        F.expr("CAST(SUM(y) AS DECIMAL(38,0)) DIV COUNT(1)").alias("mbar")
    )
    w = Window.partitionBy("sensor_id").orderBy("ts", "event_id")
    z = (
        pts.join(mbar, "sensor_id")
        .select(
            "sensor_id",
            "ts",
            "event_id",
            ((F.col("y") - F.col("mbar")) * (F.col("y") - F.col("mbar")))
            .cast("long")
            .alias("z"),
        )
        .select(
            "sensor_id",
            F.col("z"),
            F.lag("z").over(w).alias("zp"),
        )
        .filter(F.col("zp").isNotNull())
    )
    d = "decimal(38,0)"
    g = z.groupBy("sensor_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(F.col("z").cast(d)).alias("sx"),
        F.sum(F.col("zp").cast(d)).alias("sy"),
        F.sum((F.col("z").cast(d) * F.col("zp").cast(d))).alias("sxy"),
        F.sum((F.col("z").cast(d) * F.col("z").cast(d))).alias("sxx"),
        F.sum((F.col("zp").cast(d) * F.col("zp").cast(d))).alias("syy"),
    )
    n = F.col("n_pairs").cast("double")
    num = n * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col(
        "sy"
    ).cast("double")
    denx = n * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col(
        "sx"
    ).cast("double")
    deny = n * F.col("syy").cast("double") - F.col("sy").cast("double") * F.col(
        "sy"
    ).cast("double")
    lm = F.when(
        (F.col("n_pairs") >= ARCH_MIN_PAIRS) & (denx > 0) & (deny > 0),
        n * (num * num) / (denx * deny),
    )
    return g.select(
        "sensor_id",
        "n_pairs",
        pround(lm).alias("lm_stat"),
        (lm > ARCH_LM_CRIT).alias("arch_flag"),
    )


QUERIES["arch_lm_test"] = arch_lm_test

ORACLES["arch_lm_test"] = f"""
    WITH pts AS (
        SELECT user_id AS sensor_id, ts, event_id,
               CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS y
        FROM events
    ),
    mbar AS (
        SELECT sensor_id,
               CAST(SUM(y) AS HUGEINT) // COUNT(1) AS mbar
        FROM pts GROUP BY 1
    ),
    z AS (
        SELECT sensor_id, z,
               LAG(z) OVER (PARTITION BY sensor_id
                            ORDER BY ts, event_id) AS zp
        FROM (
            SELECT p.sensor_id, p.ts, p.event_id,
                   CAST((p.y - m.mbar) * (p.y - m.mbar) AS BIGINT) AS z
            FROM pts p JOIN mbar m USING (sensor_id)
        )
    ),
    g AS (
        SELECT sensor_id,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               SUM(CAST(z AS HUGEINT)) AS sx,
               SUM(CAST(zp AS HUGEINT)) AS sy,
               SUM(CAST(z AS HUGEINT) * CAST(zp AS HUGEINT)) AS sxy,
               SUM(CAST(z AS HUGEINT) * CAST(z AS HUGEINT)) AS sxx,
               SUM(CAST(zp AS HUGEINT) * CAST(zp AS HUGEINT)) AS syy
        FROM z WHERE zp IS NOT NULL
        GROUP BY 1
    )
    SELECT sensor_id, n_pairs,
           {pround_sql(
               "CASE WHEN n_pairs >= " + str(ARCH_MIN_PAIRS)
               + " AND (CAST(n_pairs AS DOUBLE)*CAST(sxx AS DOUBLE)"
               + "      - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)) > 0"
               + " AND (CAST(n_pairs AS DOUBLE)*CAST(syy AS DOUBLE)"
               + "      - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE)) > 0"
               + " THEN CAST(n_pairs AS DOUBLE)"
               + "  * (CAST(n_pairs AS DOUBLE)*CAST(sxy AS DOUBLE)"
               + "     - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))"
               + "  * (CAST(n_pairs AS DOUBLE)*CAST(sxy AS DOUBLE)"
               + "     - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))"
               + " / ((CAST(n_pairs AS DOUBLE)*CAST(sxx AS DOUBLE)"
               + "     - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))"
               + "  * (CAST(n_pairs AS DOUBLE)*CAST(syy AS DOUBLE)"
               + "     - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE)))"
               + " END"
           )} AS lm_stat,
           CASE WHEN n_pairs >= {ARCH_MIN_PAIRS}
                 AND (CAST(n_pairs AS DOUBLE)*CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)) > 0
                 AND (CAST(n_pairs AS DOUBLE)*CAST(syy AS DOUBLE)
                      - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE)) > 0
           THEN (CAST(n_pairs AS DOUBLE)
                  * (CAST(n_pairs AS DOUBLE)*CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
                  * (CAST(n_pairs AS DOUBLE)*CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
                  / ((CAST(n_pairs AS DOUBLE)*CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
                   * (CAST(n_pairs AS DOUBLE)*CAST(syy AS DOUBLE)
                      - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE)))
                ) > {ARCH_LM_CRIT}
           END AS arch_flag
    FROM g
"""


# --------------------------------------------------------------------------
# Classifier-eval pair over the shipped quality classifier: reliability
# (calibration) and ranking (ROC) — the audits a corpus build runs on
# its keep/drop model before trusting its threshold. Ground truth is
# the deterministic `lang = 'en'` label: the classifier's dominant
# positive weight is English-stopword density, so the label is the
# construction-time proxy the model was pointed at (reference parity:
# the pipeline ships a fixed model artifact and never re-trains it —
# pipline/spark/jobs/traffic_batch_processing.py's fixed-threshold
# posture; see also quality_classifier_score).
# --------------------------------------------------------------------------

CAL_N_BINS = 10  # fixed 0.1-wide confidence bins on the [0,1] score


def qc_labeled_df(docs: DataFrame) -> DataFrame:
    """(s, y) per doc: the pround'd quality score recovered onto its
    exact 1e-4 integer grid (floor(q·10⁴+0.5) re-reads the grid index;
    the pround residual is ~1e-13 ≪ 0.5, so both engines agree
    exactly) and the binary English label. Works on a static OR
    streaming documents frame (pure projection) — shared with the
    streaming calibration monitor."""
    from smart_city_data_pipeline_spark.operators.textops import qc_score_col

    return docs.select(
        F.floor(qc_score_col(F.col("text")) * F.lit(10000.0) + F.lit(0.5))
        .cast("long")
        .alias("s"),
        # eqNullSafe: a NULL lang is a NEGATIVE, matching the oracle's
        # CASE WHEN lang = 'en' THEN 1 ELSE 0 END — a plain == would
        # NULL the label and silently drop the row from every moment
        # sum while the oracle keeps it (r11 review finding).
        F.col("lang").eqNullSafe(F.lit("en")).cast("long").alias("y"),
    )


def calibration_bin_moments(docs: DataFrame) -> DataFrame:
    """Per-confidence-bin integer moments (bin, n_docs, n_pos,
    conf_sum, sq_err) — every column a COMMUTATIVE integer sum, so the
    aggregate is a monoid any delivery order folds to the same value:
    the batch report and the streaming calibration monitor both build
    exactly this table (shared code — monitor and report cannot
    drift; the ``psi_monitor`` discipline)."""
    d = "decimal(38,0)"
    rows = qc_labeled_df(docs)
    err = F.col("s") - F.col("y") * F.lit(10000)
    return rows.groupBy(
        F.least(F.floor(F.col("s") / F.lit(1000)).cast("long"), F.lit(9)).alias(
            "bin"
        )
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("y").alias("n_pos"),
        F.sum(F.col("s").cast(d)).alias("conf_sum"),
        F.sum((err * err).cast(d)).alias("sq_err"),
    )


def calibration_finish(per: DataFrame) -> DataFrame:
    """Display finisher over the bounded bin-moments table: pround'd
    means, grid-exact gaps, corpus ECE/Brier — the identical IEEE
    sequence whether the moments came from one batch scan or a
    streaming fold."""
    d = "decimal(38,0)"
    mean_conf = pround(
        F.col("conf_sum").cast("double")
        / (F.lit(10000.0) * F.col("n_docs").cast("double"))
    )
    frac_pos = pround(
        F.col("n_pos").cast("double") / F.col("n_docs").cast("double")
    )
    b = per.select(
        "bin",
        "n_docs",
        "n_pos",
        "sq_err",
        mean_conf.alias("mean_conf"),
        frac_pos.alias("frac_pos"),
    ).withColumn(
        "gap_i",
        F.abs(
            F.floor(F.col("mean_conf") * F.lit(10000.0) + F.lit(0.5)).cast(
                "long"
            )
            - F.floor(F.col("frac_pos") * F.lit(10000.0) + F.lit(0.5)).cast(
                "long"
            )
        ),
    )
    tot = b.agg(
        F.sum("n_docs").alias("n_total"),
        F.sum((F.col("gap_i") * F.col("n_docs")).cast(d)).alias("ece_num"),
        F.sum("sq_err").alias("sq_tot"),
    )
    ece = pround(
        F.col("ece_num").cast("double")
        / (F.lit(10000.0) * F.col("n_total").cast("double"))
    )
    brier = pround(
        F.col("sq_tot").cast("double")
        / (F.lit(100000000.0) * F.col("n_total").cast("double"))
    )
    return (
        b.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            "n_docs",
            "n_pos",
            "mean_conf",
            "frac_pos",
            (F.col("gap_i").cast("double") / F.lit(10000.0)).alias("cal_gap"),
            ece.alias("ece"),
            brier.alias("brier"),
        )
    )


def classifier_calibration_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram + ECE + Brier score for the quality
    classifier: per 0.1-wide confidence bin, the mean predicted
    probability vs the observed positive rate, the per-bin |gap|, and
    the corpus-level expected calibration error and Brier score
    repeated on every row (Guo et al. 2017's ECE over equal-width
    bins). An over-confident filter model shows up here before it
    silently skews the keep set.

    Exactness: every moment is an integer sum on the 1e-4 score grid
    (Σs, Σy, Σ(s−10⁴y)² — DECIMAL(38,0) against 100 TB row counts);
    bin means are pround'd divisions of those integers; the ECE
    numerator Σ n_b·|gap_b| re-reads the pround'd means onto their 1e-4
    grid so it is again an exact integer. No raw-double summation
    anywhere (the markov_entropy_rate lesson).

    Scale shape: ONE full-scan keyed aggregate into ≤10 bin rows; the
    corpus totals are a 1-row broadcast back onto the bin table.
    """
    return calibration_finish(
        calibration_bin_moments(table(spark, sf_dir, "documents"))
    )


def roc_auc_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC curve + exact tie-aware AUC for the quality classifier: one
    row per DISTINCT score threshold (the operating points a filter
    could actually ship) with TPR / FPR / precision at "keep iff
    score ≥ threshold", plus the corpus AUC repeated on every row.
    AUC uses the rank-statistic identity AUC = Σ_s pos_s·(neg_below_s
    + neg_s/2) / (P·N) — ties contribute half, exactly the
    Mann-Whitney U convention (``mwu_zone_shift``'s statistic, read as
    a ranking metric).

    Exactness: the curve lives on the bounded 1e-4 score grid (≤10001
    distinct thresholds — output size is GRID-bounded, never
    row-proportional); every cumulative and the AUC numerator
    2·Σ pos·neg_below + Σ pos·neg are integer sums in DECIMAL(38,0)
    (P·N ≈ 10²⁴ at 100 TB), divided once at display.

    Scale shape: one full-scan keyed aggregate into the grid table;
    all windows are unpartitioned but GRID-bounded (allowlisted — the
    ``conformal_anomaly_rate`` class).
    """
    d = "decimal(38,0)"
    rows = qc_labeled_df(table(spark, sf_dir, "documents"))
    g = rows.groupBy("s").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("y").alias("pos")
    )
    g = g.withColumn("neg", F.col("n_docs") - F.col("pos"))
    w_ge = Window.orderBy(F.col("s").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_le = Window.orderBy(F.col("s").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.orderBy(F.col("s").asc()).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = g.select(
        "s",
        "n_docs",
        "pos",
        "neg",
        F.sum(F.col("pos").cast(d)).over(w_ge).alias("tp"),
        F.sum(F.col("neg").cast(d)).over(w_ge).alias("fp"),
        (F.sum(F.col("neg").cast(d)).over(w_le) - F.col("neg").cast(d)).alias(
            "neg_below"
        ),
        F.sum(F.col("pos").cast(d)).over(w_all).alias("p_tot"),
        F.sum(F.col("neg").cast(d)).over(w_all).alias("n_tot"),
    )
    numer2 = F.sum(
        (
            F.col("pos").cast(d)
            * (F.lit(2).cast(d) * F.col("neg_below") + F.col("neg").cast(d))
        )
    ).over(w_all)
    c = c.withColumn("numer2", numer2)
    auc = F.when(
        (F.col("p_tot") > 0) & (F.col("n_tot") > 0),
        pround(
            F.col("numer2").cast("double")
            / (
                F.lit(2.0)
                * F.col("p_tot").cast("double")
                * F.col("n_tot").cast("double")
            )
        ),
    )
    return c.select(
        (F.col("s").cast("double") / F.lit(10000.0)).alias("thr"),
        "n_docs",
        F.col("tp").cast("long").alias("n_pos_ge"),
        F.col("fp").cast("long").alias("n_neg_ge"),
        F.when(
            F.col("p_tot") > 0,
            pround(F.col("tp").cast("double") / F.col("p_tot").cast("double")),
        ).alias("tpr"),
        F.when(
            F.col("n_tot") > 0,
            pround(F.col("fp").cast("double") / F.col("n_tot").cast("double")),
        ).alias("fpr"),
        pround(
            F.col("tp").cast("double")
            / (F.col("tp") + F.col("fp")).cast("double")
        ).alias("precision"),
        auc.alias("auc"),
    )


QUERIES["classifier_calibration_report"] = classifier_calibration_report
QUERIES["roc_auc_report"] = roc_auc_report


def _qc_labeled_sql() -> str:
    from smart_city_data_pipeline_spark.operators.textops import _QC_Z_SQL

    return (
        "SELECT CAST(FLOOR((1.0 / (1.0 + exp(-("
        + _QC_Z_SQL
        + ")))) * 10000.0 + 0.5) AS BIGINT) AS s,"
        " CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y"
        " FROM documents"
    )


ORACLES["classifier_calibration_report"] = f"""
    WITH sc AS ({{_labeled}}),
    per AS (
        SELECT LEAST(s // 1000, 9) AS bin,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(y) AS BIGINT) AS n_pos,
               SUM(CAST(s AS HUGEINT)) AS conf_sum,
               SUM(CAST(s - y * 10000 AS HUGEINT)
                   * CAST(s - y * 10000 AS HUGEINT)) AS sq_err
        FROM sc GROUP BY 1
    ),
    b AS (
        SELECT bin, n_docs, n_pos, sq_err,
               {pround_sql(
                   'CAST(conf_sum AS DOUBLE)'
                   ' / (10000.0 * CAST(n_docs AS DOUBLE))'
               )} AS mean_conf,
               {pround_sql(
                   'CAST(n_pos AS DOUBLE) / CAST(n_docs AS DOUBLE)'
               )} AS frac_pos
        FROM per
    ),
    g AS (
        SELECT *,
               ABS(CAST(FLOOR(mean_conf * 10000.0 + 0.5) AS BIGINT)
                   - CAST(FLOOR(frac_pos * 10000.0 + 0.5) AS BIGINT))
                   AS gap_i
        FROM b
    ),
    tot AS (
        SELECT SUM(n_docs) AS n_total,
               SUM(CAST(gap_i AS HUGEINT) * CAST(n_docs AS HUGEINT))
                   AS ece_num,
               SUM(sq_err) AS sq_tot
        FROM g
    )
    SELECT bin, n_docs, n_pos, mean_conf, frac_pos,
           CAST(gap_i AS DOUBLE) / 10000.0 AS cal_gap,
           {pround_sql(
               'CAST(ece_num AS DOUBLE)'
               ' / (10000.0 * CAST(n_total AS DOUBLE))'
           )} AS ece,
           {pround_sql(
               'CAST(sq_tot AS DOUBLE)'
               ' / (100000000.0 * CAST(n_total AS DOUBLE))'
           )} AS brier
    FROM g CROSS JOIN tot
"""

ORACLES["roc_auc_report"] = f"""
    WITH sc AS ({{_labeled}}),
    g AS (
        SELECT s, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(y) AS BIGINT) AS pos,
               CAST(COUNT(*) - SUM(y) AS BIGINT) AS neg
        FROM sc GROUP BY s
    ),
    c AS (
        SELECT s, n_docs, pos, neg,
               SUM(CAST(pos AS HUGEINT)) OVER (ORDER BY s DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
               SUM(CAST(neg AS HUGEINT)) OVER (ORDER BY s DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fp,
               SUM(CAST(neg AS HUGEINT)) OVER (ORDER BY s ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - CAST(neg AS HUGEINT) AS neg_below,
               SUM(CAST(pos AS HUGEINT)) OVER () AS p_tot,
               SUM(CAST(neg AS HUGEINT)) OVER () AS n_tot
        FROM g
    ),
    c2 AS (
        SELECT *,
               SUM(CAST(pos AS HUGEINT)
                   * (2 * neg_below + CAST(neg AS HUGEINT))) OVER ()
                   AS numer2
        FROM c
    )
    SELECT CAST(s AS DOUBLE) / 10000.0 AS thr, n_docs,
           CAST(tp AS BIGINT) AS n_pos_ge,
           CAST(fp AS BIGINT) AS n_neg_ge,
           CASE WHEN p_tot > 0 THEN
               {pround_sql('CAST(tp AS DOUBLE) / CAST(p_tot AS DOUBLE)')}
           END AS tpr,
           CASE WHEN n_tot > 0 THEN
               {pround_sql('CAST(fp AS DOUBLE) / CAST(n_tot AS DOUBLE)')}
           END AS fpr,
           {pround_sql(
               'CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE)'
           )} AS precision,
           CASE WHEN p_tot > 0 AND n_tot > 0 THEN
               {pround_sql(
                   'CAST(numer2 AS DOUBLE)'
                   ' / (2.0 * CAST(p_tot AS DOUBLE) * CAST(n_tot AS DOUBLE))'
               )}
           END AS auc
    FROM c2
"""


def _fill_qc_labeled() -> None:
    lab = _qc_labeled_sql()
    for k in ("classifier_calibration_report", "roc_auc_report"):
        ORACLES[k] = ORACLES[k].replace("{_labeled}", lab)


_fill_qc_labeled()


# --------------------------------------------------------------------------
# Deterministic Poisson bootstrap — THE production bootstrap at scale
# (Chamandy et al., "Estimating Uncertainty for Massive Data Streams",
# Google 2012): resampling row i into replicate b with multinomial
# counts needs a global index; Poisson(1) weights need only the row
# itself, so the whole bootstrap is ONE pass, embarrassingly parallel,
# and here fully DETERMINISTIC — the weight is an md5-derived uniform
# on the 2^20 integer grid pushed through the Poisson(1) inverse CDF
# as a ladder of INTEGER thresholds (computed once, embedded as
# literals), so both engines draw the bit-identical "randomness".
# --------------------------------------------------------------------------

BOOT_B = 50  # replicates per group
# Poisson(1) CDF on the 2^20 grid: weight k iff u < threshold[k]
# (floor(CDF(k) * 2^20), k = 0..9; u >= last  =>  w = 10).
BOOT_POISSON_THRESH = (
    (0, 385749),
    (1, 771499),
    (2, 964373),
    (3, 1028665),
    (4, 1044738),
    (5, 1047952),
    (6, 1048488),
    (7, 1048565),
    (8, 1048574),
    (9, 1048575),
)


def bootstrap_replicate_moments(ev: DataFrame) -> DataFrame:
    """Per-(event_type, replicate) integer moments (n_eff = Σw,
    s = Σw·cents) under the deterministic md5 → Poisson(1) draw —
    every column a COMMUTATIVE integer sum, so the aggregate is a
    monoid any delivery order folds identically: the batch CI and the
    streaming bootstrap monitor both build exactly this table (the
    ``calibration_bin_moments`` discipline). Accepts a static OR
    streaming events frame (the draw is a pure projection)."""
    d = "decimal(38,0)"
    cents = F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long")
    rows = ev.select(
        "event_type", F.col("event_id").cast("string").alias("eid"),
        cents.alias("cents"),
    )
    # one md5 serves SIX 20-bit uniforms (both 60-bit halves of the
    # digest, three 20-bit slices each): hash per (event, hash-group
    # g = b DIV 6) — 6x fewer md5 evaluations than hashing per
    # (event, replicate), the dominant cost of the x B explode.
    n_groups = (BOOT_B + 5) // 6
    g = rows.select(
        "event_type",
        "cents",
        F.explode(
            F.array(*[F.lit(i) for i in range(n_groups)])
        ).alias("g"),
        "eid",
    )
    hex_ = F.md5(
        F.concat(F.col("eid"), F.lit(":"), F.col("g").cast("string"))
    )
    h1 = F.conv(F.substring(hex_, 1, 15), 16, 10).cast("long")
    h2 = F.conv(F.substring(hex_, 16, 15), 16, 10).cast("long")
    trip = F.array(
        *[
            F.struct(
                (F.col("g") * 6 + j).alias("b"),
                (
                    F.shiftright(h1 if j < 3 else h2, 20 * (j % 3))
                    % F.lit(1048576)
                ).alias("u"),
            )
            for j in range(6)
        ]
    )
    r = (
        g.select("event_type", "cents", F.explode(trip).alias("p"))
        .select(
            "event_type",
            "cents",
            F.col("p.b").alias("b"),
            F.col("p.u").alias("u"),
        )
        .filter(F.col("b") < BOOT_B)
    )
    w = F.lit(10)
    for k, t in reversed(BOOT_POISSON_THRESH):
        w = F.when(F.col("u") < t, F.lit(k)).otherwise(w)
    return (
        r.select("event_type", "b", w.alias("w"), "cents")
        .groupBy("event_type", "b")
        .agg(
            F.sum(F.col("w").cast(d)).alias("n_eff"),
            F.sum((F.col("w") * F.col("cents")).cast(d)).alias("s"),
        )
    )


def bootstrap_corpus_moments(ev: DataFrame) -> DataFrame:
    """Full-sample per-type integer moments (n_events, Σcents) — the
    un-resampled leg of the CI report; also a streaming-safe monoid."""
    d = "decimal(38,0)"
    cents = F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long")
    return ev.select("event_type", cents.alias("cents")).groupBy(
        "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("cents").cast(d)).alias("cs"),
    )


def bootstrap_ci_finish(rep: DataFrame, full: DataFrame) -> DataFrame:
    """Display finisher over the bounded |types|×B replicate table:
    drop empty replicates, rank by the 2²⁰-quantized replicate mean,
    pick the integer order-statistic endpoints, join the full-sample
    means — the identical IEEE sequence whether the moments came from
    one batch scan or a streaming fold."""
    d = "decimal(38,0)"
    rep = rep.filter(F.col("n_eff") > 0)
    mq = F.expr(f"CAST(s * CAST(1048576 AS {d}) DIV n_eff AS {d})")
    wr = Window.partitionBy("event_type").orderBy(
        F.col("mq").asc(), F.col("b").asc()
    )
    wt = Window.partitionBy("event_type")
    ranked = rep.select(
        "event_type",
        "b",
        "n_eff",
        "s",
        mq.alias("mq"),
    ).select(
        "*",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wt).alias("m"),
    )
    mean_b = pround(
        F.col("s").cast("double") / (F.lit(100.0) * F.col("n_eff").cast("double"))
    )
    # Both CI endpoints in ONE pass over the ranked table: the first
    # spelling filtered `ranked` twice (rn = lo-rank, rn = hi-rank) and
    # joined the two 1-row-per-type legs back — Spark planned each leg
    # as an independent subtree, so the ENTIRE replicate pipeline
    # (explode → md5 → ladder → aggregate → window) executed twice
    # (guide §7.2 "duplicated subtrees"; measured 2 scans+2 windows in
    # the plan). A conditional aggregate picks both order statistics
    # from one scan of the bounded |types|×B table; when m = 1 the two
    # ranks coincide and the same row serves both endpoints, exactly
    # as the join spelling did.
    is_lo = F.col("rn") == F.expr("(25 * m + 999) div 1000")
    is_hi = F.col("rn") == F.expr("(975 * m + 999) div 1000")
    ci = (
        ranked.filter(is_lo | is_hi)
        .groupBy("event_type")
        .agg(
            F.max(F.when(is_lo, mean_b)).alias("ci_lo"),
            F.max(F.when(is_hi, mean_b)).alias("ci_hi"),
        )
    )
    mean_full = pround(
        F.col("cs").cast("double")
        / (F.lit(100.0) * F.col("n_events").cast("double"))
    )
    return full.join(ci, "event_type").select(
        "event_type",
        "n_events",
        mean_full.alias("mean_value"),
        "ci_lo",
        "ci_hi",
    )


def poisson_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type mean reading with a deterministic Poisson-
    bootstrap 95% confidence interval: ``BOOT_B`` one-pass replicates,
    each row weighted Poisson(1) by its md5 draw, CI endpoints the
    ceil(2.5%·m)/ceil(97.5%·m) order statistics of the replicate means
    (m = replicates with any mass — integer ceils via (25m+999)//1000,
    never a double product).

    Exactness: the uniform, the inverse-CDF ladder, every replicate
    moment (Σw, Σw·cents in DECIMAL(38,0)/HUGEINT), and the rank key
    (the 2^20-quantized replicate mean, ties to lower b) are ALL
    integers — pround'd doubles appear only in the displayed means.

    Scale shape: one ×B explode (cheap literals + md5) into ONE keyed
    aggregate → the |types|×B replicate table; ranking is a window
    over that bounded table. No global index, no second pass — the
    property that makes Poisson bootstrap the 100 TB choice over
    multinomial resampling.
    """
    ev = table(spark, sf_dir, "events")
    return bootstrap_ci_finish(
        bootstrap_replicate_moments(ev), bootstrap_corpus_moments(ev)
    )


QUERIES["poisson_bootstrap_ci"] = poisson_bootstrap_ci


def _boot_oracle_sql() -> str:
    from smart_city_data_pipeline_spark.functions.hashing import md5_long_sql

    ladder = "CASE"
    for k, t in BOOT_POISSON_THRESH:
        ladder += f" WHEN u < {t} THEN {k}"
    ladder += " ELSE 10 END"
    n_groups = (BOOT_B + 5) // 6
    return f"""
    WITH rows0 AS MATERIALIZED (
        SELECT event_type, CAST(event_id AS VARCHAR) AS eid,
               CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS cents
        FROM events
    ),
    hashed AS MATERIALIZED (
        SELECT event_type, cents, g,
               md5(eid || ':' || CAST(g AS VARCHAR)) AS hx
        FROM rows0 CROSS JOIN (
            SELECT UNNEST(range({n_groups})) AS g
        ) gs
    ),
    halves AS MATERIALIZED (
        SELECT event_type, cents, g,
               CAST(('0x' || substr(hx, 1, 15)) AS BIGINT) AS h1,
               CAST(('0x' || substr(hx, 16, 15)) AS BIGINT) AS h2
        FROM hashed
    ),
    uni AS MATERIALIZED (
        -- one md5 serves six 20-bit uniforms (b = 6g + j): three
        -- slices of each 60-bit digest half
        SELECT event_type, cents, p.b AS b, p.u AS u
        FROM halves, UNNEST([
            {{'b': 6 * g, 'u': h1 % 1048576}},
            {{'b': 6 * g + 1, 'u': (h1 // 1048576) % 1048576}},
            {{'b': 6 * g + 2, 'u': (h1 // 1099511627776) % 1048576}},
            {{'b': 6 * g + 3, 'u': h2 % 1048576}},
            {{'b': 6 * g + 4, 'u': (h2 // 1048576) % 1048576}},
            {{'b': 6 * g + 5, 'u': (h2 // 1099511627776) % 1048576}}
        ]) AS t(p)
        WHERE p.b < {BOOT_B}
    ),
    drawn AS MATERIALIZED (
        SELECT event_type, b, cents, {ladder} AS w
        FROM uni
    ),
    rep AS MATERIALIZED (
        SELECT event_type, b,
               SUM(CAST(w AS HUGEINT)) AS n_eff,
               SUM(CAST(w AS HUGEINT) * CAST(cents AS HUGEINT)) AS s
        FROM drawn GROUP BY event_type, b
        HAVING SUM(w) > 0
    ),
    ranked AS MATERIALIZED (
        SELECT event_type, b, n_eff, s,
               ROW_NUMBER() OVER (
                   PARTITION BY event_type
                   ORDER BY s * CAST(1048576 AS HUGEINT) // n_eff ASC,
                            b ASC) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS m
        FROM rep
    ),
    lo AS (
        SELECT event_type,
               {pround_sql(
                   'CAST(s AS DOUBLE) / (100.0 * CAST(n_eff AS DOUBLE))'
               )} AS ci_lo
        FROM ranked WHERE rn = (25 * m + 999) // 1000
    ),
    hi AS (
        SELECT event_type,
               {pround_sql(
                   'CAST(s AS DOUBLE) / (100.0 * CAST(n_eff AS DOUBLE))'
               )} AS ci_hi
        FROM ranked WHERE rn = (975 * m + 999) // 1000
    ),
    full0 AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
               SUM(CAST(cents AS HUGEINT)) AS cs
        FROM rows0 GROUP BY event_type
    )
    SELECT f.event_type, f.n_events,
           {pround_sql(
               'CAST(cs AS DOUBLE) / (100.0 * CAST(n_events AS DOUBLE))'
           )} AS mean_value,
           lo.ci_lo, hi.ci_hi
    FROM full0 f
    JOIN lo ON f.event_type = lo.event_type
    JOIN hi ON f.event_type = hi.event_type
"""


ORACLES["poisson_bootstrap_ci"] = _boot_oracle_sql()
