"""Oracle-gate tests for the core relational operators."""

from __future__ import annotations

import pytest

from mysqldatasynctool_spark.operators import relational
from tests.conftest import assert_matches_oracle

ORACLE_KEYS = sorted(relational.ORACLES)


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_matches_oracle(spark, duck, name):
    df = relational.QUERIES[name](spark, "/root/testdata/sf0.01")
    assert_matches_oracle(df, relational.ORACLES[name], duck)


def test_approx_distinct_runs(spark):
    df = relational.QUERIES["agg_approx_distinct"](spark, "/root/testdata/sf0.01")
    rows = df.collect()
    assert len(rows) >= 1
    assert all(r.n_parts > 0 for r in rows)
    # the HLL estimate must sit inside the 5% bound the oracle asserts
    assert all(r.within_tol for r in rows)


def test_q1_fast_twin_approximates_exact(spark):
    exact = {
        (r.l_returnflag, r.l_linestatus): r
        for r in relational.QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.01").collect()
    }
    fast = {
        (r.l_returnflag, r.l_linestatus): r
        for r in relational.QUERIES["q1_pricing_summary_fast"](spark, "/root/testdata/sf0.01").collect()
    }
    assert exact.keys() == fast.keys()
    for k in exact:
        assert exact[k].count_order == fast[k].count_order
        assert abs(exact[k].sum_charge - fast[k].sum_charge) / exact[k].sum_charge < 1e-9


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
