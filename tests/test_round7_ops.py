"""Semantic invariants for the round-7 operators (their value-level
correctness is the DuckDB oracle gate; these pin the properties the
oracle can't state — bounds, structural laws, negative controls)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mysqldatasynctool_spark.operators import advanced, events, graph, migration
from mysqldatasynctool_spark.operators import pipeline as pl
from mysqldatasynctool_spark.operators import similarity as sim

SF = "/root/testdata/sf0.01"


def test_triangle_count_bounds(spark):
    row = graph.graph_triangle_count(spark, SF).collect()[0]
    # mutual-kNN caps degree at TRI_K → edges ≤ n·k/2, and the
    # clustering coefficient is a ratio in [0, 1e6] ppm
    assert row.n_edges <= row.n_nodes * graph.TRI_K / 2
    assert 0 <= row.clustering_ppm <= 1_000_000
    # every triangle contains 3 wedges
    assert 3 * row.n_triangles <= row.n_wedges
    assert row.n_triangles > 0  # the fixture graph is dense enough


def test_ohlc_bars_order_invariants(spark):
    bars = events.events_ohlc_bars(spark, SF).collect()
    assert bars
    for b in bars:
        assert b.low <= b.open <= b.high
        assert b.low <= b.close <= b.high
        assert b.volume > 0
    ev_n = events.load(spark, SF, "events").count()
    assert sum(b.volume for b in bars) == ev_n


def test_linear_fit_passes_through_means(spark):
    """Least squares always passes through (mean x, mean y):
    mean_y == slope·mean_x + intercept (checked to rounding width)."""
    ev = events.load(spark, SF, "events")
    means = (
        ev.groupBy("event_type")
        .agg(
            F.avg(F.expr("CAST(unix_timestamp(ts) DIV 86400 AS BIGINT)")).alias("mx"),
            F.avg("value").alias("my"),
        )
        .collect()
    )
    mean_map = {r.event_type: (r.mx, r.my) for r in means}
    for r in advanced.agg_linear_fit(spark, SF).collect():
        mx, my = mean_map[r.event_type]
        assert abs(r.slope_per_day * mx + r.intercept - my) < 1e-2


def test_recursive_tree_depth_is_log2(spark):
    """parent(k) = k DIV 2 ⇒ the path from k to root 1 has exactly
    floor(log2(k)) hops (keys 0 and 1 are their own roots: depth 0)."""
    rows = advanced.sql_recursive_supplier_tree(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.depth_to_root == max(0, r.s_suppkey.bit_length() - 1)


def test_fk_discovery_negative_control(spark):
    rows = {
        (r.child, r.parent): r
        for r in migration.migration_fk_discovery(spark, SF).collect()
    }
    assert rows[("orders.o_custkey", "customer.c_custkey")].is_inclusion
    assert rows[("lineitem.l_suppkey", "supplier.s_suppkey")].is_inclusion
    neg = rows[("orders.o_orderkey", "customer.c_custkey")]
    assert not neg.is_inclusion
    assert neg.containment_ppm < 1_000_000


def test_dq_expectations_green_on_healthy_fixture(spark):
    rows = migration.migration_dq_expectations(spark, SF).collect()
    assert len(rows) == 5
    assert all(r.ok and r.n_violations == 0 for r in rows)


def test_dim_truncation_recall_bounded(spark):
    rows = sim.similarity_dim_truncation_audit(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.k == sim.TOP_K
        assert 0 <= r.n_overlap <= r.k
        assert r.recall_ppm == (1_000_000 * r.n_overlap) // r.k


def test_page_checksums_localize_drift(spark):
    """The page report must (a) go red ONLY where the planted drift
    lands, (b) cover every src row exactly once, (c) agree with the
    row-level diff about which pages are dirty."""
    from mysqldatasynctool_spark.operators import compare as cmp

    pages = {r.page: r for r in cmp.migration_page_checksums(spark, SF).collect()}
    diff = cmp.migration_row_diff(spark, SF).collect()
    dirty_from_rows = {r.o_orderkey // cmp.CHECK_PAGE_SIZE for r in diff}
    dirty_from_pages = {p for p, r in pages.items() if r.is_ok == "NO"}
    assert dirty_from_pages == dirty_from_rows
    src_n = migration.load(spark, SF, "orders").count()
    assert sum(r.src_cnt for r in pages.values()) == src_n


def test_funnel_conversion_monotone(spark):
    rows = events.events_funnel_conversion(spark, SF).collect()
    assert [r.step_no for r in rows] == [1, 2, 3]
    ns = [r.n_users for r in rows]
    assert ns[0] >= ns[1] >= ns[2] > 0  # users can only drop out
    assert rows[0].conv_from_prev_ppm == 1_000_000
    for r in rows:
        assert 0 < r.conv_from_start_ppm <= 1_000_000


def test_market_basket_lift_math(spark):
    rows = advanced.agg_market_basket(spark, SF).collect()
    assert len(rows) == advanced.MB_TOP
    lifts = [r.lift_ppm for r in rows]
    assert lifts == sorted(lifts, reverse=True)
    for r in rows:
        assert r.u < r.v
        # a pair can't co-occur more often than either item occurs
        assert r.n_pair <= min(r.n_u, r.n_v)


def test_leakage_safe_split_no_cross_split_pairs(spark):
    rows = pl.pipeline_leakage_safe_split(spark, SF).collect()
    assert {r.split for r in rows} <= {"train", "val", "test"}
    assert all(r.cross_split_pairs == 0 for r in rows)
    total = sum(r.n_docs for r in rows)
    assert total == pl.load(spark, SF, "documents").count()


def test_rfm_quintiles_balanced(spark):
    rows = advanced.agg_rfm_segmentation(spark, SF).collect()
    n_cust = migration.load(spark, SF, "customer").count()
    # every scored customer appears in exactly one cell
    total = sum(r.n_customers for r in rows)
    customers_with_orders = (
        migration.load(spark, SF, "orders").select("o_custkey").distinct().count()
    )
    assert total == customers_with_orders <= n_cust
    for r in rows:
        assert 1 <= r.r_score <= 5 and 1 <= r.f_score <= 5 and 1 <= r.m_score <= 5


def test_incremental_rollup_equals_full_recompute(spark):
    """The maintained view must equal the from-scratch hourly rollup —
    the merge rule's whole point."""
    inc = {
        r.hr: (r.n, round(r.sum_value, 6))
        for r in events.events_incremental_rollup(spark, SF).collect()
    }
    full = (
        events.load(spark, SF, "events")
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("hr"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(22,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .collect()
    )
    assert inc == {r.hr: (r.n, round(r.sum_value, 6)) for r in full}


def test_cusum_changepoint_rank_in_range(spark):
    rows = events.events_cusum_changepoint(spark, SF).collect()
    per_type = {
        r.event_type: r.n
        for r in events.load(spark, SF, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert {r.event_type for r in rows} == set(per_type)
    for r in rows:
        assert 1 <= r.change_rank <= per_type[r.event_type]
        assert r.max_abs_cusum_scaled >= 0


def test_drawdown_nonnegative_and_peak_monotone(spark):
    from mysqldatasynctool_spark.operators import windows as win

    rows = win.window_running_drawdown(spark, SF).collect()
    assert rows
    last_peak: dict = {}
    for r in rows:
        assert r.drawdown >= -1e-9
        assert r.running_peak >= r.running_balance - 1e-9
        if r.o_custkey in last_peak:
            assert r.running_peak >= last_peak[r.o_custkey] - 1e-9
        last_peak[r.o_custkey] = r.running_peak
    # the signed ledger must actually draw down somewhere
    assert any(r.drawdown > 0 for r in rows)


def test_cohort_ltv_conserves_orders(spark):
    from mysqldatasynctool_spark.operators import windows as win

    rows = win.agg_cohort_ltv(spark, SF).collect()
    assert sum(r.n_orders for r in rows) == migration.load(spark, SF, "orders").count()
    for r in rows:
        assert r.age_years >= 0


def test_markov_rows_sum_to_one(spark):
    rows = events.events_markov_transitions(spark, SF).collect()
    by_from: dict = {}
    for r in rows:
        by_from.setdefault(r.from_type, []).append(r)
    assert len(by_from) == 5
    for f, rs in by_from.items():
        assert sum(r.n for r in rs) == rs[0].n_from
        ppm = sum(r.p_ppm for r in rs)
        # floor-division ppm: sum in (1e6 - n_terms, 1e6]
        assert 1_000_000 - len(rs) < ppm <= 1_000_000


def test_mmr_rank1_is_top_relevance_and_picks_distinct(spark):
    mmr = sim.similarity_mmr_rerank(spark, SF).collect()
    by_q: dict = {}
    for r in mmr:
        by_q.setdefault(r.qid, []).append(r)
    top1 = {
        r.qid: r.neighbor_id
        for r in sim.similarity_topk_bruteforce(spark, SF).collect()
        if r.rank == 1
    }
    for qid, rs in by_q.items():
        assert [r.rank for r in sorted(rs, key=lambda x: x.rank)] == [1, 2, 3, 4, 5]
        assert len({r.vec_id for r in rs}) == 5
        # the first MMR pick has no diversity penalty -> pure argmax rel
        first = next(r for r in rs if r.rank == 1)
        assert first.vec_id == top1[qid]


def test_gini_bounded_and_ordering(spark):
    rows = advanced.agg_gini_concentration(spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0.0 <= r.gini < 1.0
        assert r.total_spend > 0 and r.n > 0


def test_burst_intervals_disjoint_and_above_rate(spark):
    bursts = advanced.events_burst_detection(spark, SF).collect()
    assert bursts
    # global hourly totals, recomputed from the fixture (ADVICE r7:
    # the margin check must compare against 1.25x the global mean,
    # not be vacuously > 0)
    hours = (
        events.load(spark, SF, "events")
        .groupBy(F.expr("CAST(unix_timestamp(ts) DIV 3600 AS BIGINT)"))
        .count()
    )
    total_hours = hours.count()
    total_events = hours.agg(F.sum("count")).collect()[0][0]
    prev_end = None
    for b in bursts:
        assert b.burst_end > b.burst_start
        if prev_end is not None:
            # maximal islands: consecutive bursts cannot touch
            assert b.burst_start > prev_end
        prev_end = b.burst_end
        # every flagged hour satisfies 4*n*H > 5*E, so each burst's
        # mean hourly rate beats 1.25x the global mean (exact integer
        # cross-multiplication, no float threshold)
        assert 4 * b.burst_events * total_hours > 5 * b.n_hours * total_events


def test_robust_outliers_bounded(spark):
    rows = advanced.agg_robust_outliers(spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.mad >= 0 and r.n > 0
        assert 0 <= r.n_outliers < r.n
        assert r.outlier_ppm == (1_000_000 * r.n_outliers) // r.n
