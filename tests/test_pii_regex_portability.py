"""PII regex portability: Spark (Java regex) and DuckDB (RE2) must
agree match-for-match on the scrub patterns, including the boundary
cases where regex dialects usually diverge. The oracle-parity gate
proves agreement on the synthetic corpus; this suite pins the
ADVERSARIAL cases (word boundaries, over-long digit runs, dotted
hosts, '@' without TLD) with hand-written expected counts so a regex
edit that silently changes semantics in ONE engine goes red here, not
as an opaque hash mismatch.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from smart_city_data_pipeline_spark.operators.textops import (
    PII_EMAIL_RE,
    PII_IP_RE,
    PII_PHONE_RE,
)

# (text, n_emails, n_phones, n_ips)
CASES = [
    ("plain words only", 0, 0, 0),
    ("a bob@x.com c", 1, 0, 0),
    ("first.last+tag@sub.domain.org end", 1, 0, 0),
    ("no tld bob@x stays", 0, 0, 0),
    ("double dots a..b@c.de ok", 1, 0, 0),  # class allows repeated dots
    ("call 555-1234 now", 0, 1, 0),
    ("x555-1234 glued", 0, 0, 0),  # \b blocks a leading word char
    ("longer 555-12345 run", 0, 0, 0),  # 5th digit breaks the \b
    ("two: 555-0000 555-9999", 0, 2, 0),
    ("ip 10.0.0.1 here", 0, 0, 1),
    ("ip 999.999.999.999 class-only", 0, 0, 1),  # {1,3} classes, no range check
    ("v 1.2.3.4.5 five parts", 0, 0, 1),  # first four octets match
    ("not1.2.3.4 glued head", 0, 0, 0),  # no \b between 't' and '1'
    ("mixed bob@x.com 555-1234 10.1.2.3", 1, 1, 1),
    ("email with ip user@10.0.0.1.com", 1, 0, 0),  # consumed by email first
]


@pytest.fixture(scope="module")
def pii_df(spark):
    df = spark.createDataFrame([(t,) for t, *_ in CASES], ["t"])
    n = lambda pat: F.size(F.regexp_extract_all(F.col("t"), F.lit(pat), 0))
    rows = df.select(
        "t",
        n(PII_EMAIL_RE).alias("e"),
        F.size(
            F.regexp_extract_all(
                F.regexp_replace(F.col("t"), PII_EMAIL_RE, "[EMAIL]"),
                F.lit(PII_PHONE_RE),
                0,
            )
        ).alias("p"),
        F.size(
            F.regexp_extract_all(
                F.regexp_replace(
                    F.regexp_replace(F.col("t"), PII_EMAIL_RE, "[EMAIL]"),
                    PII_PHONE_RE,
                    "[PHONE]",
                ),
                F.lit(PII_IP_RE),
                0,
            )
        ).alias("i"),
    ).collect()
    return {r["t"]: (r["e"], r["p"], r["i"]) for r in rows}


@pytest.mark.parametrize("text,ne,np_,ni", CASES)
def test_spark_matches_expected(pii_df, text, ne, np_, ni):
    assert pii_df[text] == (ne, np_, ni), text


@pytest.mark.parametrize("text,ne,np_,ni", CASES)
def test_duckdb_matches_expected(text, ne, np_, ni):
    con = duckdb.connect()
    got = con.execute(
        f"""
        SELECT len(regexp_extract_all(t, '{PII_EMAIL_RE}')),
               len(regexp_extract_all(
                   regexp_replace(t, '{PII_EMAIL_RE}', '[EMAIL]', 'g'),
                   '{PII_PHONE_RE}')),
               len(regexp_extract_all(
                   regexp_replace(
                       regexp_replace(t, '{PII_EMAIL_RE}', '[EMAIL]', 'g'),
                       '{PII_PHONE_RE}', '[PHONE]', 'g'),
                   '{PII_IP_RE}'))
        FROM (SELECT ? AS t)
        """,
        [text],
    ).fetchone()
    assert got == (ne, np_, ni), text
