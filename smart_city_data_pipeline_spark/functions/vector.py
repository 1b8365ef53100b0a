"""Vector math over ``array<float>`` embedding columns.

``F.zip_with`` + ``F.aggregate`` keep the arithmetic JVM-side — no
Python/Arrow crossing per row. Both engines fold left-to-right over the
array so doubles match bit-for-bit against the DuckDB oracle; outputs
are still rounded at the operator layer as the final guard.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _d(v: Column) -> Column:
    return v.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(_d(a), _d(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


# DuckDB twins. list_dot_product folds sequentially over DOUBLE[] after
# the cast, matching the Spark fold above.
def dot_sql(a: str, b: str) -> str:
    return f"list_dot_product(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[]))"


def cosine_sql(a: str, b: str) -> str:
    return f"({dot_sql(a, b)} / (sqrt({dot_sql(a, a)}) * sqrt({dot_sql(b, b)})))"
