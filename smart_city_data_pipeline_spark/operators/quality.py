"""Data-quality expectation suite.

The reference pipeline trusts its collectors blindly — bronze rows go
straight to silver (`pipline2/load/streaming_data_collector.py` writes
whatever arrives). A production lakehouse runs declarative expectation
suites (Great-Expectations / dbt-test style) between layers; this
module is that gate as a Spark-first operator: every rule is a
conditional aggregate over ONE scan of the fact table, so the whole
suite costs a single map-side-combinable pass at 100 TB — adding a
rule adds a column to the aggregate, not a scan.

Rules that need context beyond the row (referential integrity,
uniqueness) stay in the same pass: the registry check is a LEFT join
against the projected key column (AQE broadcasts it at runtime when
small), and uniqueness is a count-distinct inside the same aggregate.
Nothing here shuffles the fact table more than once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from smart_city_data_pipeline_spark.catalog import table
from smart_city_data_pipeline_spark.functions.rounding import pround, pround_sql

# (rule, tolerated violation %) — a rule passes when its violation
# percentage is <= its tolerance. Integrity rules tolerate nothing;
# range/enum rules tolerate a documented slice.
DQ_RULES: list[tuple[str, float]] = [
    ("event_id_not_null", 0.0),
    ("event_id_unique", 0.0),
    ("ts_in_range", 0.0),
    ("value_non_negative", 0.0),
    ("value_below_250", 30.0),
    # 10 % tolerance is BELOW the corpus's ~20 % 'error' share, so the
    # failing-rule branch is exercised (and hash-checked), not dead code
    ("event_type_allowed", 10.0),
    ("sensor_registered", 40.0),
    ("props_k_below_64", 40.0),
]

_DQ_ALLOWED_TYPES = ("click", "view", "purchase", "signup")


def row_rule_conditions() -> list[tuple[str, "F.Column"]]:
    """The ROW-LOCAL rule conditions (violation predicates), shared by
    the batch suite and the streaming monitor
    (streaming/dq_monitor.py). Excludes ``event_id_unique`` — a
    corpus-global rule: batch computes it as a count-distinct in the
    same aggregate; streaming delegates it to the dedup stream.
    Expects the registry key joined in as ``reg_key``."""
    k_val = F.get_json_object(F.col("props"), "$.k").cast("long")
    return [
        ("event_id_not_null", F.col("event_id").isNull()),
        (
            "ts_in_range",
            ~F.col("ts").between("2024-01-01", "2026-01-01")
            | F.col("ts").isNull(),
        ),
        ("value_non_negative", F.col("value") < 0),
        ("value_below_250", F.col("value") > 250),
        ("event_type_allowed", ~F.col("event_type").isin(*_DQ_ALLOWED_TYPES)),
        ("sensor_registered", F.col("reg_key").isNull()),
        ("props_k_below_64", k_val.isNull() | (k_val >= 64)),
    ]


def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the expectation suite against ``events`` and emit one row
    per rule: rows checked, violations, violation percentage, and the
    pass verdict against the rule's tolerance.

    Plan shape: events LEFT-joins the supplier registry's projected
    key column (AQE picks broadcast at runtime — no forced hint, the
    registry is SF-scaled), then ONE aggregate computes
    every rule's violation count as a conditional sum plus the
    uniqueness count-distinct; the single result row is exploded into
    the per-rule report. One fact scan, one broadcast join, one
    aggregate — no second pass however many rules are added.

    Violation percentages are exact-integer counts over a BIGINT
    total with one final double division, so the report hash-matches
    the oracle everywhere.
    """
    ev = table(spark, sf_dir, "events")
    reg = table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("reg_key")
    )
    # No forced broadcast: supplier is SF-scaled, so the hint is not
    # provably safe at 100 TB — AQE broadcasts the projected key column
    # at runtime when it is small (the doc_outlier_mahalanobis rule).
    joined = ev.join(reg, ev["user_id"] == reg["reg_key"], "left")

    def viol(cond) -> F.Column:
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long")

    agg = joined.agg(
        F.count(F.lit(1)).alias("n"),
        (F.count(F.lit(1)) - F.countDistinct("event_id")).alias(
            "v_event_id_unique"
        ),
        *[
            viol(cond).alias(f"v_{rule}")
            for rule, cond in row_rule_conditions()
        ],
    )
    viol_cols = [f"v_{rule}" for rule, _ in DQ_RULES]
    rows = F.array(
        *[
            F.struct(
                F.lit(rule).alias("rule"),
                F.lit(tol).alias("tol"),
                F.col(c).alias("viols"),
            )
            for (rule, tol), c in zip(DQ_RULES, viol_cols)
        ]
    )
    pct = F.col("r.viols").cast("double") * 100.0 / F.col("n").cast("double")
    return (
        agg.select(F.col("n"), F.explode(rows).alias("r"))
        .select(
            F.col("r.rule").alias("rule"),
            F.col("n").alias("n_checked"),
            F.col("r.viols").alias("n_violations"),
            pround(pct).alias("violation_pct"),
            (pct <= F.col("r.tol")).alias("passed"),
        )
    )


_DQ_CASES_SQL = {
    "event_id_not_null": "event_id IS NULL",
    "event_id_unique": None,  # count-distinct, handled separately
    "ts_in_range": (
        "NOT (ts BETWEEN '2024-01-01' AND '2026-01-01') OR ts IS NULL"
    ),
    "value_non_negative": "value < 0",
    "value_below_250": "value > 250",
    "event_type_allowed": (
        "event_type NOT IN ('click','view','purchase','signup')"
    ),
    "sensor_registered": "reg_key IS NULL",
    "props_k_below_64": (
        "CAST(json_extract_string(props, '$.k') AS BIGINT) IS NULL "
        "OR CAST(json_extract_string(props, '$.k') AS BIGINT) >= 64"
    ),
}


def _dq_oracle() -> str:
    branches = []
    for rule, tol in DQ_RULES:
        cond = _DQ_CASES_SQL[rule]
        if cond is None:
            expr = "CAST(agg.n - agg.n_distinct AS BIGINT)"
        else:
            expr = f"CAST(SUM(CASE WHEN {cond} THEN 1 ELSE 0 END) AS BIGINT)"
        branches.append(
            f"SELECT '{rule}' AS rule, CAST({tol} AS DOUBLE) AS tol,"
            f" {expr} AS viols FROM joined, agg GROUP BY agg.n, agg.n_distinct"
        )
    union = " UNION ALL ".join(branches)
    pct = "(CAST(r.viols AS DOUBLE) * 100.0 / CAST(agg.n AS DOUBLE))"
    return f"""
        WITH joined AS (
            SELECT e.*, s.s_suppkey AS reg_key
            FROM events e LEFT JOIN supplier s ON e.user_id = s.s_suppkey
        ),
        agg AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_distinct
            FROM joined
        ),
        rules AS ({union})
        SELECT r.rule,
               agg.n AS n_checked,
               r.viols AS n_violations,
               {pround_sql(pct)} AS violation_pct,
               ({pct} <= r.tol) AS passed
        FROM rules r, agg
    """


# Benford first-digit probabilities log10(1 + 1/d), as repr'd python
# doubles so the IDENTICAL binary64 literal lands in the Spark plan and
# the DuckDB oracle text.
BENFORD_P: dict[int, float] = {
    1: 0.3010299956639812,
    2: 0.17609125905568124,
    3: 0.12493873660829992,
    4: 0.09691001300805642,
    5: 0.07918124604762482,
    6: 0.06694678963061322,
    7: 0.05799194697768673,
    8: 0.05115252244738129,
    9: 0.04575749056067514,
}
BENFORD_CHI2_CRIT = 20.09  # chi-square df=8, alpha=0.01
_CHI2_Q = 65536.0  # 2^16 contribution grid (order-free exact sum)


def benford_digit_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-significant-digit conformance per zone — the
    classic tampered-meter / fabricated-reading detector (a sensor
    whose readings are invented tends to flat or round-number digit
    distributions; organic multi-scale measurements follow Benford).

    One row per (zone, digit 1-9): observed count, observed share,
    Benford expectation, and the ZONE-level chi-square replicated onto
    each row plus the violation flag (df=8, alpha=0.01).

    Spark-first / engine-exact shape: the fact scans once into a
    (zone, digit) count aggregate — map-side combinable, 9·|zones|
    result rows. The first digit comes from INTEGER math (leading
    char of floor(value·100 + 0.5), never log10, whose engine
    rounding at decade boundaries could flip a digit). Each digit's
    chi-square contribution ((obs − n·p)² / (n·p), binary64-identical
    in both engines given the shared literals) is quantized to a 2^16
    integer grid; the zone chi2 is the exact integer window sum — no
    float-accumulation order sensitivity.
    """
    ev = table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100.0 + 0.5).cast("long")
    obs = (
        ev.select(
            F.col("event_type").alias("zone"), cents.alias("cents")
        )
        .filter(F.col("cents") > 0)
        .select(
            "zone",
            F.substring(F.col("cents").cast("string"), 1, 1)
            .cast("int")
            .alias("digit"),
        )
        .groupBy("zone", "digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n_obs"))
    )
    grid = (
        obs.select("zone")
        .distinct()
        .crossJoin(
            spark.createDataFrame(
                [(d,) for d in range(1, 10)], "digit int"
            )
        )
    )
    full = grid.join(obs, ["zone", "digit"], "left").select(
        "zone",
        "digit",
        F.coalesce(F.col("n_obs"), F.lit(0).cast("long")).alias("n_obs"),
    )
    from pyspark.sql import Window

    wz = Window.partitionBy("zone")
    p = F.element_at(
        F.create_map(
            *[
                c
                for d in range(1, 10)
                for c in (F.lit(d), F.lit(BENFORD_P[d]))
            ]
        ),
        F.col("digit"),
    )
    n = F.sum("n_obs").over(wz).cast("double")
    exp_n = n * p
    contrib = (F.col("n_obs").cast("double") - exp_n) * (
        F.col("n_obs").cast("double") - exp_n
    ) / exp_n
    contrib_q = F.floor(contrib * F.lit(_CHI2_Q) + F.lit(0.5)).cast("long")
    chi2 = F.sum(contrib_q).over(wz).cast("double") / F.lit(_CHI2_Q)
    return full.select(
        "zone",
        "digit",
        "n_obs",
        pround(F.col("n_obs").cast("double") / n).alias("obs_share"),
        pround(p).alias("benford_p"),
        pround(chi2).alias("chi2_zone"),
        (chi2 > F.lit(BENFORD_CHI2_CRIT)).alias("benford_violated"),
    )


def _benford_oracle() -> str:
    p_case = " ".join(
        f"WHEN {d} THEN {BENFORD_P[d]!r}" for d in range(1, 10)
    )
    return f"""
        WITH obs AS (
            SELECT event_type AS zone,
                   CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS INTEGER)
                       AS digit,
                   CAST(COUNT(*) AS BIGINT) AS n_obs
            FROM (
                SELECT event_type,
                       CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS cents
                FROM events
            ) WHERE cents > 0
            GROUP BY 1, 2
        ),
        grid AS (
            SELECT z.zone, d.digit
            FROM (SELECT DISTINCT zone FROM obs) z,
                 (SELECT UNNEST(range(1, 10)) AS digit) d
        ),
        filled AS (
            SELECT g.zone, g.digit,
                   CAST(COALESCE(o.n_obs, 0) AS BIGINT) AS n_obs,
                   CAST(CASE g.digit {p_case} END AS DOUBLE) AS p
            FROM grid g LEFT JOIN obs o
              ON o.zone = g.zone AND o.digit = g.digit
        ),
        scored AS (
            SELECT *,
                   CAST(SUM(n_obs) OVER (PARTITION BY zone) AS DOUBLE) AS n,
                   CAST(FLOOR(
                       (CAST(n_obs AS DOUBLE)
                        - CAST(SUM(n_obs) OVER (PARTITION BY zone) AS DOUBLE) * p)
                       * (CAST(n_obs AS DOUBLE)
                        - CAST(SUM(n_obs) OVER (PARTITION BY zone) AS DOUBLE) * p)
                       / (CAST(SUM(n_obs) OVER (PARTITION BY zone) AS DOUBLE) * p)
                       * {_CHI2_Q} + 0.5) AS BIGINT) AS contrib_q
            FROM filled
        )
        SELECT zone, digit, n_obs,
               {pround_sql('CAST(n_obs AS DOUBLE) / n')} AS obs_share,
               {pround_sql('p')} AS benford_p,
               {pround_sql(
                   'CAST(SUM(contrib_q) OVER (PARTITION BY zone) AS DOUBLE)'
                   f' / {_CHI2_Q}'
               )} AS chi2_zone,
               (CAST(SUM(contrib_q) OVER (PARTITION BY zone) AS DOUBLE)
                / {_CHI2_Q} > {BENFORD_CHI2_CRIT}) AS benford_violated
        FROM scored
    """


K_ANON_THRESHOLDS = (2, 5, 10, 20)


def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit of the events table under release quasi-
    identifiers — the compliance question asked before any analytics
    export: "if we publish (zone, hour-of-day, reading bucket), how
    many rows are re-identifiable?"

    Quasi-identifier = (event_type, hour-of-day, 25-unit reading
    bucket). One row per k ∈ {2, 5, 10, 20}: equivalence classes,
    classes smaller than k, rows living in those classes, and the
    at-risk share — the k-anonymity curve an anonymization pipeline
    tunes its generalization hierarchy against (Sweeney 2002).

    Plan: ONE map-side-combinable groupBy of the fact into
    equivalence-class sizes (bounded by the QI grid: |zones|·24·11
    cells), then the tiny class-size table is cross-joined with the
    4-row threshold literal and aggregated — the fact scans once, the
    k-curve costs nothing more. Exact integer counts; one final
    double division.
    """
    ev = table(spark, sf_dir, "events")
    classes = (
        ev.groupBy(
            F.col("event_type").alias("zone"),
            F.hour(F.col("ts")).alias("hod"),
            F.floor(F.col("value") / 25.0).cast("long").alias("vbucket"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("sz"))
    )
    ks = spark.createDataFrame(
        [(k,) for k in K_ANON_THRESHOLDS], "k int"
    )
    return (
        classes.crossJoin(F.broadcast(ks))
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_classes"),
            F.sum(F.when(F.col("sz") < F.col("k"), 1).otherwise(0))
            .cast("long")
            .alias("n_small_classes"),
            F.sum(F.when(F.col("sz") < F.col("k"), F.col("sz")).otherwise(0))
            .cast("long")
            .alias("rows_at_risk"),
            F.sum("sz").cast("long").alias("n_rows"),
            F.min("sz").cast("long").alias("min_class_size"),
        )
        .select(
            "k",
            "n_classes",
            "n_small_classes",
            "rows_at_risk",
            "min_class_size",
            (F.col("min_class_size") >= F.col("k")).alias("k_anonymous"),
            pround(
                F.col("rows_at_risk").cast("double")
                / F.col("n_rows").cast("double")
            ).alias("risk_share"),
        )
    )


def _k_anonymity_oracle() -> str:
    ks = ", ".join(f"({k})" for k in K_ANON_THRESHOLDS)
    return f"""
        WITH classes AS (
            SELECT event_type AS zone,
                   EXTRACT(hour FROM ts) AS hod,
                   CAST(FLOOR(value / 25.0) AS BIGINT) AS vbucket,
                   CAST(COUNT(*) AS BIGINT) AS sz
            FROM events
            GROUP BY 1, 2, 3
        ),
        ks(k) AS (VALUES {ks}),
        g AS (
            SELECT k,
                   CAST(COUNT(*) AS BIGINT) AS n_classes,
                   CAST(SUM(CASE WHEN sz < k THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_small_classes,
                   CAST(SUM(CASE WHEN sz < k THEN sz ELSE 0 END) AS BIGINT)
                       AS rows_at_risk,
                   CAST(SUM(sz) AS BIGINT) AS n_rows,
                   CAST(MIN(sz) AS BIGINT) AS min_class_size
            FROM classes, ks
            GROUP BY k
        )
        SELECT CAST(k AS INTEGER) AS k, n_classes, n_small_classes,
               rows_at_risk, min_class_size,
               (min_class_size >= k) AS k_anonymous,
               {pround_sql(
                   'CAST(rows_at_risk AS DOUBLE) / CAST(n_rows AS DOUBLE)'
               )} AS risk_share
        FROM g
    """


QUERIES = {
    "dq_expectations": dq_expectations,
    "benford_digit_test": benford_digit_test,
    "k_anonymity_audit": k_anonymity_audit,
}

ORACLES = {
    "dq_expectations": _dq_oracle(),
    "benford_digit_test": _benford_oracle(),
    "k_anonymity_audit": _k_anonymity_oracle(),
}


L_DIV_THRESHOLDS = (2, 3, 5)


def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al. 2007) — the attack
    k-anonymity misses: a class can hold k rows yet leak if they all
    share ONE sensitive value (homogeneity attack). Same release
    quasi-identifiers as ``k_anonymity_audit``; sensitive attribute =
    the reporting sensor (user_id). One row per l ∈ {2, 3, 5}:
    classes with fewer than l DISTINCT sensitive values, rows living
    in them, worst-class diversity, and the verdict.

    Plan: one groupBy of the fact into (QI class → size, distinct
    sensitive) — countDistinct is exact and map-side partial over the
    QI-grid-bounded class table — then the l-curve rides a broadcast
    literal cross join exactly like the k-curve. Integer counts; one
    final division."""
    ev = table(spark, sf_dir, "events")
    classes = ev.groupBy(
        F.col("event_type").alias("zone"),
        F.hour(F.col("ts")).alias("hod"),
        F.floor(F.col("value") / 25.0).cast("long").alias("vbucket"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("sz"),
        F.countDistinct("user_id").cast("long").alias("div"),
    )
    ls = spark.createDataFrame([(l,) for l in L_DIV_THRESHOLDS], "l int")
    return (
        classes.crossJoin(F.broadcast(ls))
        .groupBy("l")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_classes"),
            F.sum(F.when(F.col("div") < F.col("l"), 1).otherwise(0))
            .cast("long")
            .alias("n_homogeneous"),
            F.sum(F.when(F.col("div") < F.col("l"), F.col("sz")).otherwise(0))
            .cast("long")
            .alias("rows_at_risk"),
            F.sum("sz").cast("long").alias("n_rows"),
            F.min("div").cast("long").alias("min_diversity"),
        )
        .select(
            "l",
            "n_classes",
            "n_homogeneous",
            "rows_at_risk",
            "min_diversity",
            (F.col("min_diversity") >= F.col("l")).alias("l_diverse"),
            pround(
                F.col("rows_at_risk").cast("double")
                / F.col("n_rows").cast("double")
            ).alias("risk_share"),
        )
    )


QUERIES["l_diversity_audit"] = l_diversity_audit

ORACLES["l_diversity_audit"] = f"""
    WITH classes AS (
        SELECT event_type AS zone,
               EXTRACT(HOUR FROM ts) AS hod,
               CAST(FLOOR(value / 25.0) AS BIGINT) AS vbucket,
               CAST(COUNT(*) AS BIGINT) AS sz,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS div
        FROM events GROUP BY 1, 2, 3
    ),
    ls AS (SELECT unnest(ARRAY{list(L_DIV_THRESHOLDS)}) AS l),
    g AS (
        SELECT l,
               CAST(COUNT(*) AS BIGINT) AS n_classes,
               CAST(SUM(CASE WHEN div < l THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_homogeneous,
               CAST(SUM(CASE WHEN div < l THEN sz ELSE 0 END) AS BIGINT)
                   AS rows_at_risk,
               CAST(SUM(sz) AS BIGINT) AS n_rows,
               CAST(MIN(div) AS BIGINT) AS min_diversity
        FROM classes CROSS JOIN ls
        GROUP BY 1
    )
    SELECT CAST(l AS INTEGER) AS l, n_classes, n_homogeneous,
           rows_at_risk, min_diversity,
           (min_diversity >= l) AS l_diverse,
           {pround_sql(
               'CAST(rows_at_risk AS DOUBLE) / CAST(n_rows AS DOUBLE)'
           )} AS risk_share
    FROM g
"""


# t-closeness thresholds as exact rationals (num, den)
T_CLOSE_THRESHOLDS = ((1, 5), (7, 20), (1, 2))


def t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (Li et al. 2007) — the attack l-diversity
    misses: a class can hold l distinct sensitive values yet leak if
    its sensitive DISTRIBUTION is skewed far from the table's
    (skewness attack). Same release quasi-identifiers as
    ``k_anonymity_audit``; sensitive attribute = the reporting sensor;
    distance = variational distance (the categorical EMD with unit
    ground distance), ½·Σ_s |p_class(s) − p_global(s)|. One row per
    t ∈ {0.20, 0.35, 0.50}: violating classes, rows in them, worst
    distance, verdict.

    All-integer exactness: d_c·2·n_c·N = Σ_{s∈c} |n_cs·N − n_s·n_c|
    + (N − Σ_{s∈c} n_s)·n_c (the second term folds every sensitive
    value ABSENT from the class), products in DECIMAL(38,0)/HUGEINT
    (n_cs·N passes BIGINT at ~1e10 rows); the t comparison
    cross-multiplies against the exact rational thresholds, so the
    verdict never touches a float. The reported distance is the one
    final double division.

    Plan: one keyed count to (QI class × sensor) cells, one keyed join
    against the per-sensor global counts, one class rollup over the
    QI-grid-bounded table, then the 3-row threshold literal cross join
    (the k/l-curve shape)."""
    ev = table(spark, sf_dir, "events")
    qi = [
        F.col("event_type").alias("zone"),
        F.hour(F.col("ts")).alias("hod"),
        F.floor(F.col("value") / 25.0).cast("long").alias("vbucket"),
    ]
    cs = ev.groupBy(*qi, F.col("user_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_cs")
    )
    glob = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_s")
    )
    tot = ev.agg(F.count(F.lit(1)).cast("long").alias("n_tot"))

    def dec(c):
        return c.cast("decimal(38,0)")

    per = cs.join(glob, "user_id").join(F.broadcast(tot))
    # two-pass: the |n_cs*N - n_s*n_c| term needs n_c, so aggregate
    # class sizes first, join back, then fold the distance numerator.
    sizes = cs.groupBy("zone", "hod", "vbucket").agg(
        F.sum("n_cs").alias("n_c")
    )
    d = (
        per.join(sizes, ["zone", "hod", "vbucket"])
        .groupBy("zone", "hod", "vbucket", "n_c", "n_tot")
        .agg(
            F.sum(
                F.abs(
                    dec(F.col("n_cs")) * dec(F.col("n_tot"))
                    - dec(F.col("n_s")) * dec(F.col("n_c"))
                )
            ).alias("present"),
            F.sum("n_s").alias("s_in_class"),
        )
        .select(
            "zone",
            "hod",
            "vbucket",
            "n_c",
            "n_tot",
            (
                F.col("present")
                + dec(F.col("n_tot") - F.col("s_in_class"))
                * dec(F.col("n_c"))
            ).alias("d_num"),
        )
    )
    ts = spark.createDataFrame(
        [(f"{n / d_:.2f}", n, d_) for n, d_ in T_CLOSE_THRESHOLDS],
        "t string, t_num int, t_den int",
    )
    dist = F.col("d_num").cast("double") / (
        2.0 * F.col("n_c").cast("double") * F.col("n_tot").cast("double")
    )
    violates = dec(F.col("d_num")) * dec(F.col("t_den")) > dec(
        F.lit(2)
    ) * dec(F.col("t_num")) * dec(F.col("n_c")) * dec(F.col("n_tot"))
    return (
        d.crossJoin(F.broadcast(ts))
        .groupBy("t")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_classes"),
            F.sum(F.when(violates, 1).otherwise(0))
            .cast("long")
            .alias("n_violating"),
            F.sum(F.when(violates, F.col("n_c")).otherwise(0))
            .cast("long")
            .alias("rows_at_risk"),
            F.sum("n_c").cast("long").alias("n_rows"),
            F.max(dist).alias("max_d"),
        )
        .select(
            "t",
            "n_classes",
            "n_violating",
            "rows_at_risk",
            (F.col("n_violating") == 0).alias("t_close"),
            pround(F.col("max_d")).alias("max_distance"),
            pround(
                F.col("rows_at_risk").cast("double")
                / F.col("n_rows").cast("double")
            ).alias("risk_share"),
        )
    )


QUERIES["t_closeness_audit"] = t_closeness_audit

_T_ROWS_SQL = " UNION ALL ".join(
    f"SELECT '{n / d_:.2f}' AS t, {n} AS t_num, {d_} AS t_den"
    for n, d_ in T_CLOSE_THRESHOLDS
)

ORACLES["t_closeness_audit"] = f"""
    WITH cs AS (
        SELECT event_type AS zone, EXTRACT(HOUR FROM ts) AS hod,
               CAST(FLOOR(value / 25.0) AS BIGINT) AS vbucket,
               user_id, CAST(COUNT(*) AS BIGINT) AS n_cs
        FROM events GROUP BY 1, 2, 3, 4
    ),
    gl AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_s
        FROM events GROUP BY 1
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tot FROM events),
    sizes AS (
        SELECT zone, hod, vbucket, CAST(SUM(n_cs) AS BIGINT) AS n_c
        FROM cs GROUP BY 1, 2, 3
    ),
    d AS (
        SELECT c.zone, c.hod, c.vbucket, z.n_c, t.n_tot,
               SUM(ABS(CAST(c.n_cs AS HUGEINT) * t.n_tot
                       - CAST(g.n_s AS HUGEINT) * z.n_c))
               + CAST(t.n_tot - SUM(g.n_s) AS HUGEINT) * z.n_c AS d_num
        FROM cs c
        JOIN gl g USING (user_id)
        JOIN sizes z ON z.zone = c.zone AND z.hod = c.hod
                    AND z.vbucket = c.vbucket
        CROSS JOIN tot t
        GROUP BY 1, 2, 3, 4, 5
    ),
    ts AS ({_T_ROWS_SQL}),
    g AS (
        SELECT ts.t,
               CAST(COUNT(*) AS BIGINT) AS n_classes,
               CAST(SUM(CASE WHEN d.d_num * ts.t_den
                                  > 2 * CAST(ts.t_num AS HUGEINT)
                                    * d.n_c * d.n_tot
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_violating,
               CAST(SUM(CASE WHEN d.d_num * ts.t_den
                                  > 2 * CAST(ts.t_num AS HUGEINT)
                                    * d.n_c * d.n_tot
                             THEN d.n_c ELSE 0 END) AS BIGINT)
                   AS rows_at_risk,
               CAST(SUM(d.n_c) AS BIGINT) AS n_rows,
               MAX(CAST(d.d_num AS DOUBLE)
                   / (2.0 * CAST(d.n_c AS DOUBLE)
                      * CAST(d.n_tot AS DOUBLE))) AS max_d
        FROM d CROSS JOIN ts
        GROUP BY 1
    )
    SELECT t, n_classes, n_violating, rows_at_risk,
           (n_violating = 0) AS t_close,
           {pround_sql('max_d')} AS max_distance,
           {pround_sql(
               'CAST(rows_at_risk AS DOUBLE) / CAST(n_rows AS DOUBLE)'
           )} AS risk_share
    FROM g
"""


SEQ_BLOCK = 4096  # event_id continuity audited per 4096-id block


def sequence_gap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion-LOSS detector over the event_id sequence: producers
    assign dense monotone ids, so any hole in the id space is a
    dropped batch, a crashed collector, or a silent filter — found per
    4096-id block (present vs expected counts, missing ids, id range
    seen) so the re-ingest can target exactly the damaged blocks
    instead of replaying the topic. `layer_reconciliation` checks
    bronze≡silver AFTER landing; this checks the landing itself
    against the id contract.

    Exactness: all counts integers; the last block's expected size
    comes from the 1-row max-id broadcast (layer_reconciliation
    discipline); duplicate ids would show as present > expected —
    surfaced, not clamped (the audit must not hide double-ingest).
    Shape: one keyed aggregate over blocks + one 1-row broadcast."""
    ev = table(spark, sf_dir, "events")
    blocks = ev.groupBy(
        F.expr(f"event_id DIV {SEQ_BLOCK}").alias("block_id")
    ).agg(
        F.count(F.lit(1)).alias("n_present"),
        F.countDistinct("event_id").alias("n_distinct"),
        F.min("event_id").alias("min_id"),
        F.max("event_id").alias("max_id"),
    )
    tot = ev.agg(F.max("event_id").alias("top_id"))
    j = blocks.join(F.broadcast(tot))
    expected = F.least(
        F.lit(SEQ_BLOCK).cast("long"),
        F.col("top_id") + 1 - F.col("block_id") * SEQ_BLOCK,
    )
    return j.select(
        F.col("block_id").cast("long").alias("block_id"),
        expected.alias("n_expected"),
        F.col("n_present").cast("long").alias("n_present"),
        (expected - F.col("n_distinct")).cast("long").alias("n_missing"),
        (F.col("n_present") - F.col("n_distinct")).cast("long").alias(
            "n_duplicated"
        ),
        "min_id",
        "max_id",
    )


QUERIES["sequence_gap_audit"] = sequence_gap_audit

ORACLES["sequence_gap_audit"] = f"""
    WITH blocks AS (
        SELECT event_id // {SEQ_BLOCK} AS block_id,
               CAST(COUNT(*) AS BIGINT) AS n_present,
               CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_distinct,
               MIN(event_id) AS min_id,
               MAX(event_id) AS max_id
        FROM events GROUP BY 1
    ),
    tot AS (SELECT MAX(event_id) AS top_id FROM events)
    SELECT b.block_id,
           LEAST({SEQ_BLOCK}, t.top_id + 1 - b.block_id * {SEQ_BLOCK})
               AS n_expected,
           b.n_present,
           LEAST({SEQ_BLOCK}, t.top_id + 1 - b.block_id * {SEQ_BLOCK})
               - b.n_distinct AS n_missing,
           b.n_present - b.n_distinct AS n_duplicated,
           b.min_id, b.max_id
    FROM blocks b CROSS JOIN tot t
"""
