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

    rows, violations = audit(spark, SF)
    assert len(rows) >= 100, "registry shrank unexpectedly"
    assert not violations, violations
