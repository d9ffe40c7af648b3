"""Round-15 additions: the skew-salted anomaly twin (VERDICT r14 item
6), the derived streaming state-partition sizing (item 5), and the
cell-count-scaled IVFPQ probe budget (item 2)."""

from __future__ import annotations

import re

from tests.conftest import SF_DIR, SF_SMALL


def _plan(spark, df, mode: str = "simple") -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def test_anomaly_salted_matches_unsalted(spark):
    """The salted twin must be RESULT-IDENTICAL to the unsalted form —
    same rows, same bit-exact doubles (both fold the same decimal(22,6)
    per-element casts into exact decimal sums)."""
    from mysqldatasynctool_spark.operators import events

    a = events.events_anomaly_zscore(spark, SF_DIR).collect()
    b = events.events_anomaly_salted(spark, SF_DIR).collect()
    assert len(a) > 0
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_anomaly_salted_windows_keyed_by_bucket(spark):
    """Plan pin: every per-EVENT window (the ones ordering by
    (ts, event_id)) must partition by (user_id, bucket) — never
    user_id alone — so a hot user spreads across its buckets. The only
    user_id-partitioned window is the carry pass over the PER-BUCKET
    tails frame (it orders by `bucket`, one array row per non-empty
    bucket — calendar-bounded for hot users)."""
    from mysqldatasynctool_spark.operators import events

    plan = _plan(spark, events.events_anomaly_salted(spark, SF_DIR))
    windows = re.findall(r"Window \[.*?\], \[(.*?)\], \[(.*?)\]", plan)
    assert windows, "expected Window nodes in the plan"
    for part, order in windows:
        if "bucket" not in part:
            # user-only partitioning allowed ONLY for the tails carry
            assert "user_id" in part and order.strip().startswith("bucket"), (
                part,
                order,
            )
        else:
            assert "user_id" in part, (part, order)


def test_size_state_partitions_model():
    """The sizing function must reproduce the measured fixture
    operating points (4 inner / 8 outer at ~100 k rows), clamp at both
    ends, and grow monotonically with volume."""
    from mysqldatasynctool_spark.streaming.jobs import (
        parquet_input_rows,
        size_state_partitions,
    )

    assert size_state_partitions(0) == 2  # floor
    assert size_state_partitions(100_000, outer=False) == 4
    assert size_state_partitions(100_002, outer=True) == 8  # +sentinels
    assert size_state_partitions(10_000_000_000) == 512  # cap
    vals = [size_state_partitions(n) for n in (0, 10**5, 10**6, 10**7, 10**8)]
    assert vals == sorted(vals)
    # the footer-metadata row counter agrees with the fixtures
    assert parquet_input_rows("/root/testdata/sf0.1") == 100_000
    assert parquet_input_rows(SF_SMALL) == 1_000
