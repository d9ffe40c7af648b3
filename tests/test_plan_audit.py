"""Blanket plan-shape guard over the ENTIRE query registry (102+
entries): no cartesian/nested-loop joins outside the explicitly
allowed ground-truth / tiny-dim / scalar-subquery set, and no
row-at-a-time Python UDFs anywhere (Arrow-batched paths only).

Per-query pins in test_plans.py protect specific headline plans; this
sweep makes sure a NEW operator cannot land with a 100 TB-hostile
plan unnoticed — adding one either fixes the plan or adds an
explicit justification to tools/plan_audit.py's allowlist (which a
reviewer sees in the diff).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SF = "/root/testdata/sf0.001"


def test_registry_plan_audit(spark):
    from tools.plan_audit import audit

    rows, violations, warnings = audit(spark, SF)
    assert len(rows) >= 100, "registry shrank unexpectedly"
    assert not violations, violations
    # unpushed-but-pushable is a review list, not a gate — but it must
    # stay bounded so a wholesale pushdown regression cannot hide in it
    assert len(warnings) <= 10, [n for n, _ in warnings]


def test_global_window_detector_positive(spark):
    """The detector must flag a real Window-over-empty-partitionBy
    plan (built live, not a canned string, so a Spark plan-format
    change breaks THIS test rather than silently blinding the cop)."""
    from pyspark.sql import Window, functions as F
    from tools.plan_audit import _has_global_window

    df = spark.range(100).withColumn(
        "rn", F.row_number().over(Window.orderBy("id"))
    )
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert _has_global_window(plan), plan


def test_global_window_detector_negative(spark):
    """Partitioned windows and empty-grouping aggregates (both also
    produce exchanges) must NOT trip the detector."""
    from pyspark.sql import Window, functions as F
    from tools.plan_audit import _has_global_window

    part = spark.range(100).withColumn(
        "rn", F.row_number().over(Window.partitionBy(F.col("id") % 10).orderBy("id"))
    )
    agg = spark.range(100).agg(F.sum("id").alias("s"))
    for df in (part, agg):
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "simple"
            )
        )
        assert not _has_global_window(plan), plan


def test_unpushed_pushable_detector():
    """Synthetic formatted-scan blocks: empty PushedFilters + an
    atomic column predicate in DataFilters must warn; a pushed scan or
    a complex-expression-only DataFilter must not."""
    from tools.plan_audit import _unpushed_pushable

    bad = (
        "(1) Scan parquet \n"
        "Output [2]: [a#1, b#2]\n"
        "Location: InMemoryFileIndex [file:/x/lineitem.parquet]\n"
        "PushedFilters: []\n"
        "DataFilters: [isnotnull(a#1), (a#1 >= 5)]\n"
    )
    assert _unpushed_pushable(bad), "atomic predicate with empty pushdown missed"
    pushed = bad.replace("PushedFilters: []", "PushedFilters: [IsNotNull(a)]")
    assert not _unpushed_pushable(pushed)
    complex_only = bad.replace(
        "DataFilters: [isnotnull(a#1), (a#1 >= 5)]",
        "DataFilters: [(hash(a#1, b#2) > 0)]",
    )
    assert not _unpushed_pushable(complex_only)
