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


QUERIES = {
    "dq_expectations": dq_expectations,
}

ORACLES = {
    "dq_expectations": _dq_oracle(),
}
