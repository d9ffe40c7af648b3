"""Set operators (ABSENT in the reference — SURVEY.md §2B).

All are thin declarative wrappers over Catalyst's set-op planning:
UNION is a zero-shuffle concatenation; DISTINCT/INTERSECT/EXCEPT
shuffle once on the full row hash (partial dedup map-side first).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.fixtures import load


def _urgent_customers(spark, sf_dir):
    return (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("custkey"))
    )


def _f_status_customers(spark, sf_dir):
    return (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("custkey"))
    )


def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag semantics) of two order-derived key sets,
    re-aggregated so the result is deterministic."""
    u = _urgent_customers(spark, sf_dir).union(_f_status_customers(spark, sf_dir))
    return u.groupBy("custkey").agg(F.count("*").alias("n")).orderBy("custkey")


SETOP_UNION_ALL_ORACLE = """
SELECT custkey, COUNT(*) AS n FROM (
  SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
  UNION ALL
  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
) t
GROUP BY custkey ORDER BY custkey
"""


def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (set semantics): distinct union of the two key sets."""
    return (
        _urgent_customers(spark, sf_dir)
        .union(_f_status_customers(spark, sf_dir))
        .distinct()
        .orderBy("custkey")
    )


SETOP_UNION_DISTINCT_ORACLE = """
SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
UNION
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
ORDER BY custkey
"""


def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: customers with both an urgent and a finished order."""
    return (
        _urgent_customers(spark, sf_dir)
        .intersect(_f_status_customers(spark, sf_dir))
        .orderBy("custkey")
    )


SETOP_INTERSECT_ORACLE = """
SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
INTERSECT
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
ORDER BY custkey
"""


def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag difference): urgent-order keys minus finished-
    order keys, multiplicity preserved, re-aggregated for determinism."""
    d = _urgent_customers(spark, sf_dir).exceptAll(_f_status_customers(spark, sf_dir))
    return d.groupBy("custkey").agg(F.count("*").alias("n")).orderBy("custkey")


SETOP_EXCEPT_ALL_ORACLE = """
SELECT custkey, COUNT(*) AS n FROM (
  SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
  EXCEPT ALL
  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
) t
GROUP BY custkey ORDER BY custkey
"""


def setop_distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicates on a projection — distinct (status, priority)
    pairs with their first orderkey (deterministic via min)."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.min("o_orderkey").alias("first_orderkey"))
        .orderBy("o_orderstatus", "o_orderpriority")
    )


SETOP_DISTINCT_ROWS_ORACLE = """
SELECT o_orderstatus, o_orderpriority, MIN(o_orderkey) AS first_orderkey
FROM orders
GROUP BY o_orderstatus, o_orderpriority
ORDER BY o_orderstatus, o_orderpriority
"""


def setop_except_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (set difference, distinct semantics): urgent-order keys
    that never appear among finished-order keys — completes the
    set-op matrix alongside EXCEPT ALL's bag difference."""
    return (
        _urgent_customers(spark, sf_dir)
        .subtract(_f_status_customers(spark, sf_dir))
        .orderBy("custkey")
    )


SETOP_EXCEPT_DISTINCT_ORACLE = """
SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
ORDER BY custkey
"""


def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag intersection — min multiplicity per key),
    re-aggregated for determinism."""
    i = _urgent_customers(spark, sf_dir).intersectAll(
        _f_status_customers(spark, sf_dir)
    )
    return i.groupBy("custkey").agg(F.count("*").alias("n")).orderBy("custkey")


SETOP_INTERSECT_ALL_ORACLE = """
SELECT custkey, COUNT(*) AS n FROM (
  SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
  INTERSECT ALL
  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
) t
GROUP BY custkey ORDER BY custkey
"""


def setop_symmetric_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric difference ((A∖B) ∪ (B∖A)) with a side marker —
    the one set-algebra shape the matrix above didn't yet cover,
    expressed as a single full-outer anti pattern: one distinct pass
    per side, one full-outer join on the key, keep the rows missing a
    side. One shuffle per distinct + one co-partitioned join — never
    two separate subtracts (which would scan each side twice)."""
    a = _urgent_customers(spark, sf_dir).distinct().withColumn("in_a", F.lit(1))
    b = (
        _f_status_customers(spark, sf_dir)
        .distinct()
        .withColumnRenamed("custkey", "bk")
        .withColumn("in_b", F.lit(1))
    )
    j = a.join(b, a.custkey == b.bk, "full_outer")
    return (
        j.filter(F.col("in_a").isNull() | F.col("in_b").isNull())
        .select(
            F.coalesce("custkey", "bk").alias("custkey"),
            F.when(F.col("in_a").isNotNull(), "only_urgent")
            .otherwise("only_finished")
            .alias("side"),
        )
        .orderBy("custkey")
    )


SETOP_SYMMETRIC_DIFF_ORACLE = """
WITH a AS (SELECT DISTINCT o_custkey AS custkey FROM orders
           WHERE o_orderpriority = '1-URGENT'),
b AS (SELECT DISTINCT o_custkey AS custkey FROM orders
      WHERE o_orderstatus = 'F')
SELECT COALESCE(a.custkey, b.custkey) AS custkey,
       CASE WHEN a.custkey IS NOT NULL THEN 'only_urgent'
            ELSE 'only_finished' END AS side
FROM a FULL OUTER JOIN b ON a.custkey = b.custkey
WHERE a.custkey IS NULL OR b.custkey IS NULL
ORDER BY custkey
"""


QUERIES = {
    "setop_union_all": setop_union_all,
    "setop_union_distinct": setop_union_distinct,
    "setop_intersect": setop_intersect,
    "setop_except_all": setop_except_all,
    "setop_distinct_rows": setop_distinct_rows,
    "setop_except_distinct": setop_except_distinct,
    "setop_intersect_all": setop_intersect_all,
    "setop_symmetric_diff": setop_symmetric_diff,
}

ORACLES = {
    "setop_union_all": SETOP_UNION_ALL_ORACLE,
    "setop_union_distinct": SETOP_UNION_DISTINCT_ORACLE,
    "setop_intersect": SETOP_INTERSECT_ORACLE,
    "setop_except_all": SETOP_EXCEPT_ALL_ORACLE,
    "setop_distinct_rows": SETOP_DISTINCT_ROWS_ORACLE,
    "setop_except_distinct": SETOP_EXCEPT_DISTINCT_ORACLE,
    "setop_intersect_all": SETOP_INTERSECT_ALL_ORACLE,
    "setop_symmetric_diff": SETOP_SYMMETRIC_DIFF_ORACLE,
}
