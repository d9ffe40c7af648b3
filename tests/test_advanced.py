"""Oracle-gate tests for the advanced SQL-surface operators."""

from __future__ import annotations

import pytest

from mysqldatasynctool_spark.operators import advanced
from tests.conftest import assert_matches_oracle

ORACLE_KEYS = sorted(advanced.ORACLES)


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_matches_oracle(spark, duck, name):
    df = advanced.QUERIES[name](spark, "/root/testdata/sf0.01")
    assert df.count() > 0, f"{name} degenerate: 0 rows"
    assert_matches_oracle(df, advanced.ORACLES[name], duck)


def test_percentile_approx_runs(spark):
    df = advanced.QUERIES["agg_percentiles"](spark, "/root/testdata/sf0.01")
    rows = df.collect()
    assert len(rows) == 3
    for r in rows:
        # the GK sketch median must land inside the 1% bound the
        # oracle asserts
        assert r.within_tol
