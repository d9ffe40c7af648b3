"""Executed-plan metric accounting (plans/metrics.py): the box-immune
cross-round signal. Shuffle/broadcast/spill byte counters summed off
the finalized (post-AQE) physical plan."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from mysqldatasynctool_spark.plans import executed_plan_metrics

SF_SMALL = "/root/testdata/sf0.001"
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")


def test_groupby_counts_one_shuffle(spark):
    df = (
        spark.range(0, 50_000)
        .selectExpr("id % 97 as k", "id as v")
        .groupBy("k")
        .agg(F.sum("v").alias("s"))
    )
    df.collect()
    m = executed_plan_metrics(df)
    assert m["num_shuffles"] == 1
    assert m["num_broadcasts"] == 0
    assert m["shuffle_bytes_written"] > 0
    # partial-agg emits up to 97 rows PER map task (8 tasks here)
    assert 97 <= m["shuffle_records_written"] <= 8 * 97
    # everything written was read back by the reduce side
    assert m["shuffle_bytes_read"] == m["shuffle_bytes_written"]
    assert m["nodes"] > 3


def test_broadcast_join_has_zero_shuffle_and_broadcast_bytes(spark):
    orders = spark.read.parquet(os.path.join(SF_SMALL, "orders.parquet"))
    cust = spark.read.parquet(os.path.join(SF_SMALL, "customer.parquet"))
    j = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey).select(
        "o_orderkey", "c_name"
    )
    j.collect()
    m = executed_plan_metrics(j)
    assert m["num_broadcasts"] == 1
    assert m["broadcast_bytes"] > 0
    assert m["num_shuffles"] == 0
    assert m["shuffle_bytes_written"] == 0
    # both parquet scans accounted, post-pruning file footprint
    assert m["scan_files"] == 2
    assert m["scan_files_bytes"] > 0


def test_shuffle_join_writes_more_than_broadcast_join(spark):
    """The metric orders the two physical strategies the way the 100-TB
    cost model does: hash-partitioning both sides costs shuffle bytes,
    broadcasting the small side costs none."""
    orders = spark.read.parquet(os.path.join(SF_SMALL, "orders.parquet"))
    cust = spark.read.parquet(os.path.join(SF_SMALL, "customer.parquet"))

    merge = orders.hint("merge").join(cust, orders.o_custkey == cust.c_custkey)
    merge.collect()
    m_merge = executed_plan_metrics(merge)

    bcast = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    bcast.collect()
    m_bcast = executed_plan_metrics(bcast)

    assert m_merge["num_shuffles"] == 2  # both sides exchange
    assert m_merge["shuffle_bytes_written"] > m_bcast["shuffle_bytes_written"] == 0


def test_unexecuted_df_reports_shape_only(spark):
    df = spark.range(0, 1000).groupBy((F.col("id") % 5).alias("k")).count()
    m = executed_plan_metrics(df)  # no action ran
    assert m["shuffle_bytes_written"] == 0
    assert m["shuffle_records_written"] == 0
    assert m["nodes"] >= 1


def test_reused_exchange_not_double_counted(spark):
    """Self-join on an aggregated frame: Spark reuses the exchange; the
    reuse must be counted as an event, not re-summed into the bytes."""
    base = (
        spark.range(0, 20_000)
        .selectExpr("id % 53 as k", "id as v")
        .groupBy("k")
        .agg(F.sum("v").alias("s"))
    )
    joined = base.alias("a").join(base.alias("b"), "k").where("a.s = b.s")
    joined.collect()
    m = executed_plan_metrics(joined)
    single = base.groupBy().count()  # unrelated; just need base's own volume
    # Re-run base alone to get one exchange's write volume for comparison.
    base2 = (
        spark.range(0, 20_000)
        .selectExpr("id % 53 as k", "id as v")
        .groupBy("k")
        .agg(F.sum("v").alias("s"))
    )
    base2.collect()
    m_base = executed_plan_metrics(base2)
    if m["reused_exchanges"] >= 1:
        # the reused side contributed 0 extra written bytes: total stays
        # in the band of one aggregation exchange + the join exchange(s),
        # strictly less than a naive 2x double-count of every exchange
        assert m["shuffle_bytes_written"] < 2 * max(
            m_base["shuffle_bytes_written"], 1
        ) + m["shuffle_bytes_read"]
    assert m["shuffle_bytes_written"] > 0
    _ = single  # silence lint


def test_bench_compare_consumes_plan_metrics(tmp_path, capsys):
    """A REGRESSED wall with unchanged shuffle volume is exonerated as
    environment; a changed volume is flagged as a plan change even
    though walls are noisy; changed exchange count flags plan shape."""
    import importlib
    import json
    import sys

    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools",
        ),
    )
    bc = importlib.import_module("bench_compare")

    def write(path, queries, runs, pm):
        rec = {
            "queries": queries,
            "runs": runs,
            "plan_metrics_by_query": pm,
        }
        with open(path, "w") as f:
            json.dump(rec, f)
        return str(path)

    pm = lambda sb, ns: {"shuffle_bytes_written": sb, "num_shuffles": ns}  # noqa: E731
    old = write(
        tmp_path / "old.json",
        {"qa": 1.0, "qb": 1.0},
        {"qa": [1.0, 1.1], "qb": [1.0, 1.1]},
        {"qa": pm(10_000_000, 2), "qb": pm(10_000_000, 2)},
    )
    new = write(
        tmp_path / "new.json",
        {"qa": 2.0, "qb": 2.0},
        {"qa": [2.0, 2.1], "qb": [2.0, 2.1]},
        # qa: same volume (environment); qb: 2x volume + extra shuffle
        {"qa": pm(10_100_000, 2), "qb": pm(20_000_000, 3)},
    )
    argv = sys.argv
    try:
        sys.argv = ["bench_compare.py", old, new]
        assert bc.main() == 0
    finally:
        sys.argv = argv
    out = capsys.readouterr().out
    assert "shuffle volume" in out  # common-set totals line
    qa = [ln for ln in out.splitlines() if ln.endswith("qa") or " qa" in ln]
    qb = [ln for ln in out.splitlines() if " qb" in ln]
    assert qa and "environment suspected" in qa[0]
    assert qb and "PLAN VOLUME CHANGE" in qb[0]
    assert "PLAN SHAPE CHANGE: 2 -> 3 shuffles" in qb[0]

    # a volume change must print even when the wall barely moved (the
    # 0.15s wall gate must not hide the box-immune signal — r17 review
    # finding), and post_sink_only rows get no volume verdicts at all
    old2 = write(
        tmp_path / "old2.json",
        {"qc": 1.0, "qd": 1.0},
        {"qc": [1.0], "qd": [1.0]},
        {
            "qc": pm(10_000_000, 2),
            "qd": {**pm(10_000_000, 2), "post_sink_only": True},
        },
    )
    new2 = write(
        tmp_path / "new2.json",
        {"qc": 1.05, "qd": 1.05},  # wall delta under the 0.15s gate
        {"qc": [1.05], "qd": [1.05]},
        {
            "qc": pm(30_000_000, 3),  # real plan change, quiet wall
            "qd": {**pm(30_000_000, 3), "post_sink_only": True},
        },
    )
    try:
        sys.argv = ["bench_compare.py", old2, new2]
        assert bc.main() == 0
    finally:
        sys.argv = argv
    out = capsys.readouterr().out
    qc = [ln for ln in out.splitlines() if " qc" in ln]
    assert qc and "PLAN VOLUME CHANGE" in qc[0] and "PLAN SHAPE CHANGE" in qc[0]
    assert not [ln for ln in out.splitlines() if " qd" in ln]


def test_bench_compare_sidecar_plan_metrics(tmp_path, capsys):
    """A record named like a round artifact but lacking
    plan_metrics_by_query picks volumes up from its
    BENCH_PLANMETRICS_r{N}.json sidecar."""
    import importlib
    import json
    import sys

    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools",
        ),
    )
    bc = importlib.import_module("bench_compare")

    old = tmp_path / "BENCH_LOCAL_r17.json"
    new = tmp_path / "BENCH_LOCAL_r18.json"
    json.dump(
        {"queries": {"qa": 1.0}, "runs": {"qa": [1.0, 1.1]}}, open(old, "w")
    )
    json.dump(
        {
            "queries": {"qa": 2.0},
            "runs": {"qa": [2.0, 2.1]},
            "plan_metrics_by_query": {
                "qa": {"shuffle_bytes_written": 1_000_000, "num_shuffles": 1}
            },
        },
        open(new, "w"),
    )
    json.dump(
        {
            "plan_metrics_by_query": {
                "qa": {"shuffle_bytes_written": 1_010_000, "num_shuffles": 1}
            }
        },
        open(tmp_path / "BENCH_PLANMETRICS_r17.json", "w"),
    )
    argv = sys.argv
    try:
        sys.argv = ["bench_compare.py", str(old), str(new)]
        assert bc.main() == 0
    finally:
        sys.argv = argv
    out = capsys.readouterr().out
    assert "read from sidecar BENCH_PLANMETRICS_r17.json" in out
    assert "environment suspected" in out  # volume ~unchanged, wall 2x


def test_bench_source_wires_plan_metrics():
    """The bench record must carry plan_metrics_by_query — greppable in
    source so a refactor can't silently drop the volume channel."""
    src = open(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "bench.py",
        )
    ).read()
    assert '"plan_metrics_by_query": plan_metrics_by_query' in src
    assert "executed_plan_metrics(mdf)" in src


def test_project_volume_and_recommend_conf():
    """Linear projection + partition recommendation: 100 TB from a
    10 MB fixture measurement, with broadcast ceiling warnings."""
    from mysqldatasynctool_spark.plans import (
        project_volume,
        recommend_conf,
        size_report,
    )

    m = {
        "shuffle_bytes_written": 1_000_000,
        "shuffle_bytes_read": 1_000_000,
        "shuffle_records_written": 500,
        "spill_bytes": 0,
        "broadcast_bytes": 2_000,
        "scan_files_bytes": 10_000_000,
        "num_shuffles": 2,
        "num_broadcasts": 1,
        "reused_exchanges": 0,
        "nodes": 20,
        "scan_files": 3,
    }
    p = project_volume(m, 1e7)  # 10M x -> 100 TB corpus class
    assert p["shuffle_bytes_written"] == 10_000_000_000_000
    assert p["num_shuffles"] == 2  # shape invariant
    # 2 KB broadcast at fixture -> 20 GB projected: both ceilings blown
    assert any("executor budget" in w for w in p["warnings"])

    conf = recommend_conf(p)
    n = conf["spark.sql.shuffle.partitions"]
    # 10 TB shuffle / 128 MiB -> ~74.5k partitions, rounded to x32
    assert 74_000 < n <= 78_000 and n % 32 == 0
    assert conf["projected_partition_bytes"] <= 128 * 1024 * 1024

    # small volumes clamp to the floor
    small = recommend_conf(project_volume(m, 1.0))
    assert small["spark.sql.shuffle.partitions"] == 32

    rep = size_report(m, m["scan_files_bytes"], 1e14)
    assert rep["projected"]["scale_ratio"] == 1e7
    assert rep["recommended"]["spark.sql.shuffle.partitions"] == n

    # spill at measured scale warns
    p2 = project_volume({**m, "spill_bytes": 1}, 10.0)
    assert any("spills at measured scale" in w for w in p2["warnings"])

    import pytest as _pytest

    with _pytest.raises(ValueError):
        project_volume(m, 0)
    with _pytest.raises(ValueError):
        size_report(m, 0, 1e14)


def test_lsh_shuffle_volume_scales_linearly(spark):
    """The scale CONTRACT of the banded MinHash-LSH dedup, now
    asserted in measured bytes instead of prose: growing the corpus
    x4 must grow the shuffle volume ~x4 (banded equi-join, one row
    per (doc, band)), never ~x16 (an all-pairs or cross-join shape).
    Uses the same seeded stress-corpus builder as the x10..x300
    harness, so the planted-duplicate structure is realistic."""
    import shutil
    import sys as _sys

    _sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools",
        ),
    )
    from lsh_stress import build_stress_corpus

    from mysqldatasynctool_spark.operators import (
        dedup as D,
        teardown_caches,
    )

    base = (
        spark.read.parquet(os.path.join(SF_SMALL, "documents.parquet"))
        .toPandas()
    )

    def volume(factor: int) -> dict:
        # constant planted count at both factors so the volume delta
        # is purely corpus-driven (factor=2 only leaves 100 synth docs)
        out_dir, _ = build_stress_corpus(
            base, factor=factor, seed=8, n_planted=50
        )
        try:
            spark.catalog.clearCache()
            teardown_caches()
            df = D.dedup_minhash_lsh(spark, out_dir)
            df._jdf.queryExecution().toRdd().count()
            return executed_plan_metrics(df)
        finally:
            shutil.rmtree(out_dir, ignore_errors=True)

    m2, m8 = volume(2), volume(8)
    assert m2["shuffle_bytes_written"] > 0
    ratio = m8["shuffle_bytes_written"] / m2["shuffle_bytes_written"]
    # corpus x4: linear => ~4 (planted-dup structure adds jitter);
    # quadratic would be ~16. 7 is the generous linear ceiling.
    assert 2.0 <= ratio <= 7.0, f"shuffle volume ratio {ratio:.2f}"
    # plan shape must not change with scale
    assert m8["num_shuffles"] == m2["num_shuffles"]
    assert m8["spill_bytes"] == 0


def test_ann_shuffle_volume_scales_linearly(spark):
    """Same contract for the ANN flagship: the ivfpq funnel's serving
    plan must shuffle ~linearly in the corpus (cell-bucketed
    shortlist), never quadratically (all-pairs). Training happens per
    corpus (separate jobs, not in this plan); the measured frame is
    the served top-k query itself."""
    import shutil
    import sys as _sys

    _sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools",
        ),
    )
    from ann_stress import build_stress_corpus

    from mysqldatasynctool_spark.operators import (
        reset_trained_state,
        similarity as S,
        teardown_caches,
    )

    base = (
        spark.read.parquet(os.path.join(SF_SMALL, "embeddings.parquet"))
        .toPandas()
    )

    def volume(factor: int) -> dict:
        out_dir, _ = build_stress_corpus(base, factor=factor, seed=8, n_planted=10)
        try:
            spark.catalog.clearCache()
            teardown_caches()
            reset_trained_state()
            df = S.similarity_ivfpq_topk(spark, out_dir)
            df._jdf.queryExecution().toRdd().count()
            return executed_plan_metrics(df)
        finally:
            shutil.rmtree(out_dir, ignore_errors=True)

    m2, m8 = volume(2), volume(8)
    written = (m2["shuffle_bytes_written"], m8["shuffle_bytes_written"])
    moved2 = m2["shuffle_bytes_written"] + m2["broadcast_bytes"]
    moved8 = m8["shuffle_bytes_written"] + m8["broadcast_bytes"]
    assert moved2 > 0
    # corpus x4: the funnel's data movement must stay ~linear (<= 7x),
    # never the ~16x of an all-pairs shape. Shuffle-only if the plan
    # shuffles; otherwise the broadcast side carries the volume.
    ratio = moved8 / moved2
    assert ratio <= 7.0, f"ANN data-movement ratio {ratio:.2f} ({written})"
    assert m8["spill_bytes"] == 0


def test_no_spill_on_heaviest_entries(spark):
    """Zero-spill canary: the registry's top-volume entries (per the
    committed SHUFFLE_AUDIT ranking) must not spill at sf0.01 — a
    nonzero spill at fixture scale is the early warning that the same
    plan OOM-spills at cluster scale."""
    import __spark_entry__ as entry

    from mysqldatasynctool_spark.operators import teardown_caches

    queries = entry.queries()
    heavy = [
        "agg_approx_distinct",
        "events_sliding_distinct_approx",
        "q21_waiting_supplier_agg",
        "agg_weighted_median",
        "q2_min_cost_supplier",
    ]
    for name in heavy:
        spark.catalog.clearCache()
        teardown_caches()
        df = queries[name](spark, SF_DIR)
        df._jdf.queryExecution().toRdd().count()
        m = executed_plan_metrics(df)
        assert m["spill_bytes"] == 0, f"{name} spilled {m['spill_bytes']}b"
        assert m["shuffle_bytes_written"] > 0  # non-degenerate check


def test_registry_query_yields_metrics(spark):
    """The surface works on a real registry entry end-to-end (q3:
    join-heavy, aggregated) — this is exactly what bench.py records."""
    import __spark_entry__ as entry

    df = entry.queries()["q3_shipping_priority"](spark, SF_SMALL)
    df.collect()
    m = executed_plan_metrics(df)
    assert m["shuffle_bytes_written"] > 0
    assert m["num_shuffles"] >= 1
    assert m["scan_files"] >= 2
