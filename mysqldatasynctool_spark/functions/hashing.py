"""The engine-portable 60-bit md5 idiom, in one place.

md5 is the only hash both Spark and DuckDB (and MySQL, via CONV())
share; the low 15 hex chars (chars 18-32 = the low 60 bits) fit a
signed BIGINT. Every deterministic hash decision in the engine —
row checksums (operators/compare.py), sampling / sharding / splits
(operators/pipeline.py) — derives from these two builders so the
Spark expression and its oracle-SQL twin can never drift apart.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_low60(col: Column) -> Column:
    """Spark: low 60 bits of md5(string(col)) as BIGINT."""
    return F.conv(F.substring(F.md5(col.cast("string")), 18, 15), 16, 10).cast(
        "long"
    )


def md5_mod(col: Column, m: int) -> Column:
    """Spark: md5_low60 mod m — deterministic bucket assignment."""
    return md5_low60(col) % m


def duck_md5_low60(expr: str) -> str:
    """DuckDB twin of md5_low60 over an SQL expression string."""
    return f"CAST(concat('0x', substr(md5(CAST({expr} AS VARCHAR)), 18, 15)) AS BIGINT)"


def duck_md5_mod(expr: str, m: int) -> str:
    """DuckDB twin of md5_mod."""
    return f"({duck_md5_low60(expr)} % {m})"
