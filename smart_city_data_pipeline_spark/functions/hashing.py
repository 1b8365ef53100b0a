"""Deterministic, engine-portable hashing.

Built on md5 so Spark and any ANSI-SQL oracle (DuckDB) compute the SAME
integers — Spark's ``hash()``/``xxhash64()`` are engine-specific so we
avoid them wherever a result is part of an output contract. 60-bit
positive values (15 hex chars) fit a signed 64-bit int in both engines.

Spark side: ``conv(substring(md5(s),1,15),16,10)`` → cast long.
DuckDB side: ``('0x' || substr(md5(s),1,15))::BIGINT``.
All JVM built-ins — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_long(col: Column) -> Column:
    """Stable 60-bit positive hash of a string column."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def md5_long_seeded(col: Column, seed: int) -> Column:
    """Seeded variant — distinct hash families for minhash."""
    return md5_long(F.concat(F.lit(f"s{seed}:"), col))


def md5_long_sql(expr: str) -> str:
    """DuckDB SQL equivalent of :func:`md5_long`."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def md5_long_seeded_sql(expr: str, seed: int) -> str:
    return md5_long_sql(f"'s{seed}:' || {expr}")
