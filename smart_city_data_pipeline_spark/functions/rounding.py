"""Engine-portable rounding.

Spark's ``round(double, n)`` routes through BigDecimal.valueOf (the
double's SHORTEST string representation) before HALF_UP rounding, so a
binary value like 0.148049999…  prints as "0.14805" and rounds UP to
0.1481, while engines that round the true binary value (DuckDB) give
0.1480. ``pround`` instead computes ``floor(x·10ⁿ + 0.5)/10ⁿ`` — every
step is a deterministic IEEE-754 op, so ANY engine evaluating the same
formula on the same double produces the identical result. All operator
outputs use this, with the matching ``pround_sql`` twin in the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def pround(c: Column, n: int = 4) -> Column:
    scale = float(10**n)
    return F.floor(c.cast("double") * scale + 0.5) / scale


def pround_sql(expr: str, n: int = 4) -> str:
    scale = float(10**n)
    return f"(FLOOR(CAST(({expr}) AS DOUBLE) * {scale} + 0.5) / {scale})"


# Exact-sum aggregates: double summation is order-dependent (Spark's
# partial aggregation vs DuckDB's sequential scan disagree in the last
# ulp, which flips rounding at .xxxx5 boundaries). Readings/prices have
# ≤2 decimals, so summing in DECIMAL is exact in both engines; the
# widened sum types differ (Spark DECIMAL(28,2) vs DuckDB DECIMAL(38,2))
# but the VALUES are equal, and the final cast to double is the nearest
# double of the same exact decimal — identical.


def sum_exact(c: Column) -> Column:
    return F.sum(c.cast("decimal(18,2)")).cast("double")


def avg_exact(c: Column) -> Column:
    return sum_exact(c) / F.count(F.lit(1))


def sum_exact_sql(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,2))) AS DOUBLE)"


def avg_exact_sql(expr: str) -> str:
    return f"({sum_exact_sql(expr)} / COUNT(*))"


def pround_py(x: float, n: int = 4) -> float:
    """Python-side twin of :func:`pround` for values computed inside
    Pandas-UDF partition walks: floor(x*10^n + 0.5)/10^n on IEEE
    doubles — the identical op sequence both engines run."""
    import math

    scale = float(10**n)
    return math.floor(float(x) * scale + 0.5) / scale
