"""Plan-shape and semantic gates for the extended TPC-H suite
(operators/tpch.py).  Correctness vs DuckDB is the driver's oracle
gate; these tests pin the 100 TB plan properties: dims broadcast,
EXISTS/NOT EXISTS as single-pass semi/anti joins, top-k as
TakeOrderedAndProject, and the scalar-threshold literal (no
BroadcastNestedLoopJoin anywhere).
"""

from __future__ import annotations

from mysqldatasynctool_spark.operators import tpch

SF = "/root/testdata/sf0.01"


def _plan(spark, df, mode: str = "simple") -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def test_q4_exists_is_semi_join(spark):
    plan = _plan(spark, tpch.q4_order_priority(spark, SF))
    assert "LeftSemi" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q7_both_nation_joins_broadcast(spark):
    plan = _plan(spark, tpch.q7_volume_shipping(spark, SF))
    # supplier, customer, nation x2 all broadcast; only li<->orders shuffles
    assert plan.count("BroadcastHashJoin") >= 4
    assert plan.count("SortMergeJoin") <= 1


def test_q8_all_dims_broadcast(spark):
    plan = _plan(spark, tpch.q8_market_share(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 6
    assert plan.count("SortMergeJoin") <= 1


def test_q10_topk_is_take_ordered(spark):
    plan = _plan(spark, tpch.q10_returned_items(spark, SF))
    assert "TakeOrderedAndProject" in plan


def test_q18_topk_is_take_ordered(spark):
    plan = _plan(spark, tpch.q18_large_volume_customers(spark, SF))
    assert "TakeOrderedAndProject" in plan


def test_q19_disjunction_prunes_part_side(spark):
    # the brand IN-set implied by the OR should partial-pushdown to the
    # part scan (Catalyst extracts common brand predicates as In())
    plan = _plan(spark, tpch.q19_disjunctive_predicates(spark, SF), "formatted")
    assert "PushedFilters" in plan


def test_q21_semi_and_anti_joins(spark):
    plan = _plan(spark, tpch.q21_waiting_supplier(spark, SF))
    assert "LeftSemi" in plan and "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q21_classic_never_pins_fact_broadcast(spark):
    """100 TB pin (VERDICT r6 watch-item): at sf0.01 AQE's size stats
    let it broadcast the two lineitem self-join projections — a fine
    runtime choice HERE, but it must stay a *choice*. With the
    broadcast threshold forced to 'everything is too big' (the
    100x-scale condition), the classic q21's semi/anti self-joins must
    fall back to shuffle joins: nothing in the query may PIN a
    fact-side broadcast. The only hinted broadcast is the supplier
    dim, which stays cluster-small at any SF (the documented
    production path for the full rewrite is q21_waiting_supplier_agg).
    """
    conf = spark.conf
    keys = (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    )
    saved = {k: conf.get(k, None) for k in keys}
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        plan = _plan(spark, tpch.q21_waiting_supplier(spark, SF))
        # the explicit supplier hint is the ONE permitted broadcast
        assert plan.count("BroadcastHashJoin") == 1
        assert "LeftSemi" in plan and "LeftAnti" in plan
        assert "BroadcastNestedLoopJoin" not in plan
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


def test_q22_threshold_is_literal_no_nested_loop(spark):
    plan = _plan(spark, tpch.q22_global_sales_opportunity(spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "LeftAnti" in plan


def test_q15_ties_included(spark):
    # rank()==1 keeps ALL max-revenue suppliers (vs row_number which
    # would drop ties nondeterministically)
    df = tpch.q15_top_supplier(spark, SF)
    rows = df.collect()
    assert len(rows) >= 1
    revs = {r["total_revenue"] for r in rows}
    assert len(revs) == 1  # all returned suppliers share the max


def test_q14_single_row_pct_bounds(spark):
    row = tpch.q14_promo_revenue(spark, SF).collect()[0]
    assert 0.0 <= row["promo_revenue_pct"] <= 100.0


def test_q21_agg_twin_matches_and_avoids_self_joins(spark):
    """The aggregation rewrite returns the identical result and its
    plan contains NO lineitem-sized self-join (one semi/anti pair in
    the original vs zero here; the per-order agg join is on the
    already-aggregated side)."""
    a = tpch.q21_waiting_supplier(spark, SF).collect()
    b = tpch.q21_waiting_supplier_agg(spark, SF).collect()
    assert [(r.s_name, r.numwait) for r in a] == [(r.s_name, r.numwait) for r in b]
    plan = _plan(spark, tpch.q21_waiting_supplier_agg(spark, SF))
    assert "LeftSemi" not in plan and "LeftAnti" not in plan


def test_q2_no_nested_loop_and_dims_broadcast(spark):
    plan = _plan(spark, tpch.q2_min_cost_supplier(spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # part/supplier/nation/region all broadcast onto the (part,supp) agg
    assert plan.count("BroadcastHashJoin") >= 4
    # window partitions by p_partkey — never a single-reducer empty-key window
    assert "TakeOrderedAndProject" in plan  # top-100 never global-sorts


def test_q6_pure_scan_no_join_filters_pushed(spark):
    plan = _plan(spark, tpch.q6_forecast_revenue(spark, SF), "formatted")
    assert "Join" not in plan
    assert "PushedFilters" in plan and "l_shipdate" in plan.split("PushedFilters")[1][:400]


def test_q11_threshold_is_literal_no_nested_loop(spark):
    plan = _plan(spark, tpch.q11_important_stock(spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Subquery" not in plan  # threshold folded as a decimal literal


def test_q13_zero_order_customers_survive(spark):
    # the outer join + double agg must conserve customers: every
    # customer lands in exactly one c_count bucket
    import duckdb

    rows = tpch.q13_customer_distribution(spark, SF).collect()
    total = sum(r["custdist"] for r in rows)
    ncust = duckdb.sql(f"SELECT COUNT(*) FROM '{SF}/customer.parquet'").fetchone()[0]
    assert total == ncust


def test_q20_semi_join_no_nested_loop(spark):
    plan = _plan(spark, tpch.q20_potential_promotion(spark, SF))
    assert "LeftSemi" in plan
    assert "BroadcastNestedLoopJoin" not in plan
