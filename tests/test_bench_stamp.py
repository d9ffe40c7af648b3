"""Round-stamp and fixture-rebalance guards (VERDICT r10 items 2 & 7).

The bench record stamp mis-named round 10's local record
``BENCH_LOCAL_r11.json`` because the driver's end-of-round sequence is
correctness → bench → write BENCH_r{N}.json, and the old stamp did an
unconditional max(correctness)+1. The fixed rule: if ``BENCH_r{N}.json``
(the driver's own record of round N's bench) already exists we are
mid-round N+1; if not, we ARE round N's end-of-round bench.

The ``_rebalance`` guard is the one piece of fixture-only physics in the
operator path (RoundRobin exchanges visible in every headline plan): at
production partition counts it must pass frames through untouched.
"""
import importlib.util
import json
import os

import pytest

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench_into(tmp_path, correctness_rounds, bench_rounds):
    """Import bench.py as if it lived in a repo dir containing the
    given record files (the stamp globs next to its own __file__)."""
    src = open(os.path.join(HERE, "bench.py")).read()
    mod_dir = tmp_path / "repo"
    mod_dir.mkdir()
    (mod_dir / "bench.py").write_text(src)
    for n in correctness_rounds:
        (mod_dir / f"CORRECTNESS_r{n:02d}.json").write_text("{}")
    for n in bench_rounds:
        (mod_dir / f"BENCH_r{n:02d}.json").write_text("{}")
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", mod_dir / "bench.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize(
    "correctness,bench,expect",
    [
        # end of round 10: CORRECTNESS_r10 just written, BENCH_r10 not
        # yet — this IS round 10's bench (the r10 mis-stamp scenario)
        ([9, 10], [9], 10),
        # mid round 11: the driver already recorded BENCH_r10
        ([9, 10], [9, 10], 11),
        ([], [], 0),  # fresh repo
    ],
)
def test_round_stamp(tmp_path, monkeypatch, correctness, bench, expect):
    monkeypatch.delenv("SPARK_GRAFT_ROUND", raising=False)
    mod = _load_bench_into(tmp_path, correctness, bench)
    assert mod._current_round() == expect


def test_round_stamp_env_override(tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_ROUND", "7")
    mod = _load_bench_into(tmp_path, [10], [10])
    assert mod._current_round() == 7


def test_env_class_verdicts():
    """r19 (VERDICT r18 item 6): the BENCH_JSON line carries an
    environment verdict derived from the probe samples. Each scenario
    below is a documented contamination shape from the committed r18
    records; the classifier must name it."""
    import bench

    cpu_quiet = {"start": 0.11, "end": 0.12}
    io_quiet = {"start": 0.02, "end": 0.03}
    pq = {f"q{i}": 0.12 for i in range(20)}
    ioq = {f"q{i}": 0.02 for i in range(20)}
    v = bench._env_class(cpu_quiet, io_quiet, pq, ioq)
    assert v["env_class"] == "quiet" and v["env_hot_queries"] == []
    # the r18 driver-record shape: run-level brackets clean, a burst
    # puts a third of the per-query io probes 5x over baseline
    ioq_burst = dict(ioq, **{f"q{i}": 0.15 for i in range(7)})
    v = bench._env_class(cpu_quiet, io_quiet, pq, ioq_burst)
    assert v["env_class"] == "partially_contended"
    assert len(v["env_hot_queries"]) == 7
    # the r18d shape: cpu probe ~0.26 through the whole run
    pq_hot = {f"q{i}": 0.26 for i in range(20)}
    v = bench._env_class({"start": 0.26, "end": 0.25}, io_quiet, pq_hot, ioq)
    assert v["env_class"] == "cpu_contended"
    # the r18e shape: disk ~5x degraded, cpu flat
    ioq_slow = {f"q{i}": 0.14 for i in range(20)}
    v = bench._env_class(cpu_quiet, {"start": 0.143, "end": 0.12}, pq, ioq_slow)
    assert v["env_class"] == "disk_degraded"
    # both at once
    v = bench._env_class(
        {"start": 0.26, "end": 0.25}, {"start": 0.143, "end": 0.12}, pq_hot, ioq_slow
    )
    assert v["env_class"] == "cpu_contended+disk_degraded"


def test_local_record_names_match_driver_records():
    """Every committed BENCH_LOCAL_r{N} must have a driver BENCH_r{N}
    peer (same round), so tools/bench_compare.py resolves both sides —
    the exact breakage the r10 mis-stamp caused. Exception: the
    HIGHEST-numbered local record may legitimately precede its peer
    (bench.py writes it mid-round; the driver writes BENCH_r{N} only
    at end of round).

    Naming convention (pinned after BENCH_LOCAL_r17b.json crashed the
    old int() parse — VERDICT r17 item 1): local records match
    ``BENCH_LOCAL_r(\\d+)([a-z]?)\\.json``. A letter suffix marks an
    intentional same-round extra record (e.g. a post-fix re-run) and
    is EXCLUDED from the must-match-driver-record check — only the
    primary (suffixless) record per round needs a driver peer. Any
    other filename shape under the prefix is a test failure, not a
    silent skip."""
    import re

    pat = re.compile(r"^BENCH_LOCAL_r(\d+)([a-z]?)\.json$")
    rounds = []
    for f in os.listdir(HERE):
        if not (f.startswith("BENCH_LOCAL_r") and f.endswith(".json")):
            continue
        m = pat.match(f)
        assert m, (
            f"{f} violates the BENCH_LOCAL_r<N>[a-z].json naming "
            "convention (see docstring)"
        )
        if not m.group(2):  # suffixed extras are exempt from peering
            rounds.append(int(m.group(1)))
    rounds.sort()
    for n in rounds[:-1]:
        assert os.path.exists(
            os.path.join(HERE, f"BENCH_r{n:02d}.json")
        ), f"BENCH_LOCAL_r{n:02d}.json has no driver-side peer"


def test_plan_dumps_cover_every_headline_entry():
    """The committed PLANS_HEADLINE*.md dumps must contain a `## name`
    section for EVERY bench.HEADLINE entry — r13 shipped with three
    headline entries missing from both dumps because the dumps were
    regenerated mid-round, before the entries were added (VERDICT r13
    item 1). This gate makes that drift a test failure: after touching
    HEADLINE or any plan-affecting code, re-run tools/dump_plans.py."""
    import bench

    for fname in ("PLANS_HEADLINE.md", "PLANS_HEADLINE_SF0.1.md"):
        path = os.path.join(HERE, fname)
        assert os.path.exists(path), f"{fname} missing — run tools/dump_plans.py"
        sections = {
            line[3:].strip()
            for line in open(path)
            if line.startswith("## ")
        }
        missing = [n for n in bench.HEADLINE if n not in sections]
        assert not missing, (
            f"{fname} lacks sections for {missing} — "
            "regenerate with tools/dump_plans.py"
        )


def test_rebalance_passthrough_on_multi_partition_input(spark, tmp_path):
    """Production shape: a table already split across enough partitions
    (many files/rowgroups) must NOT be repartitioned — _rebalance's
    fixture fix may only fire on the single-rowgroup fixture trap."""
    from mysqldatasynctool_spark.sources.fixtures import (
        REBALANCE_MIN_BYTES,
        _rebalance,
    )

    path = str(tmp_path / "multi.parquet")
    # enough partitions that parts*4 > defaultParallelism, and enough
    # bytes on disk to clear the small-table skip
    target = spark.sparkContext.defaultParallelism
    n_parts = target  # target*4 > target always
    # random longs defeat parquet RLE so the directory clears the
    # small-table size skip for real
    spark.range(0, 300_000).selectExpr(
        "id", "cast(rand(7) * 9e17 as long) AS noise"
    ).repartition(n_parts).write.parquet(path)
    size = sum(
        os.path.getsize(os.path.join(path, f))
        for f in os.listdir(path)
        if not f.startswith((".", "_"))
    )
    assert size >= REBALANCE_MIN_BYTES, "fixture too small for the guard test"
    df = spark.read.parquet(path)
    out = _rebalance(spark, df, path)
    assert out is df, "multi-partition input must pass through untouched"


def test_rebalance_skips_small_tables(spark, tmp_path):
    from mysqldatasynctool_spark.sources.fixtures import _rebalance

    path = str(tmp_path / "tiny.parquet")
    spark.range(0, 10).coalesce(1).write.parquet(path)
    df = spark.read.parquet(path)
    assert _rebalance(spark, df, path) is df
