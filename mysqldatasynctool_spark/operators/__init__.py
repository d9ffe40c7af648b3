"""Operator library.

Each module exposes:

- ``QUERIES``: dict[name, callable(spark, sf_dir) -> DataFrame]
- ``ORACLES``: dict[name, str] — equivalent ANSI SQL for DuckDB, on the
  fixture views. Keys absent from ``ORACLES`` get the driver's weaker
  rows-only check (reserved for genuinely non-SQL-expressible ops).

Numeric discipline (why the DECIMAL casts): the driver hash-compares
values bit-for-bit. ``SUM(double)`` is order-dependent in the last
bits, and Spark/DuckDB will not add in the same order. Every aggregate
over a noisy double therefore casts to an exact DECIMAL *before* the
SUM (per-row double arithmetic is deterministic; the decimal sum is
exact and order-independent) and casts the total back to DOUBLE. AVGs
are expressed as decimal-sum / count in both engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def collect_registry() -> tuple[dict[str, QueryFn], dict[str, str]]:
    """Merge QUERIES/ORACLES from every operator module."""
    from . import (
        advanced,
        compare,
        dedup,
        events,
        migration,
        multimodal,
        relational,
        setops,
        similarity,
        textops,
        windows,
    )

    queries: dict[str, QueryFn] = {}
    oracles: dict[str, str] = {}
    for mod in (
        relational,
        advanced,
        windows,
        setops,
        events,
        migration,
        compare,
        dedup,
        similarity,
        textops,
        multimodal,
    ):
        q = getattr(mod, "QUERIES", {})
        o = getattr(mod, "ORACLES", {})
        dup = set(q) & set(queries)
        if dup:
            raise ValueError(f"duplicate query names: {dup}")
        queries.update(q)
        oracles.update(o)
    return queries, oracles
