"""Streaming-state EVICTION contract (VERDICT r17 item 7).

`streaming/observe.progress_report` can warn on unbounded state growth
— but a warning nobody asserts is advisory. These tests make bounded
state a CI contract for the two state-heavy streaming families
(dedup-within-watermark, interval stream-stream join): replay the
events corpus as ≥3 time-ordered micro-batches
(`stage_events_time_split`, watermark advancing between batches) and
require the recorded progress to show real eviction with no
growth-signature warning. Dropping a watermark (here: swapping
`dropDuplicatesWithinWatermark` for plain `dropDuplicates`) turns the
contract red — demonstrated below on the exact same paced input.

Why the paced replay matters: over the single-file staging the whole
corpus lands in one data micro-batch, eviction never happens *during*
the run, and a missing watermark is observationally identical to a
working one. Time-split replay is the fixture-scale stand-in for a
production topic where the watermark advances between polls.
"""

import pytest

SF = "/root/testdata/sf0.001"
N_FILES = 6


def _paced_run(spark, build, name, n_files=N_FILES):
    from mysqldatasynctool_spark.streaming import (
        progress_report,
        read_events_stream,
        run_to_memory_sink,
        stage_events_time_split,
    )

    staged = stage_events_time_split(SF, n_files=n_files)
    captured: list = []
    df = run_to_memory_sink(
        build(lambda: read_events_stream(spark, staged, max_files_per_trigger=1)),
        name,
        output_mode="append",
        progress_out=captured,
    )
    rows = df.count()
    return rows, progress_report(captured)


def test_time_split_staging_shape(spark):
    """The replay harness itself: n time-ordered files, all corpus
    rows + the 2 sentinel rows, batches advance the watermark."""
    import os

    from mysqldatasynctool_spark.streaming import stage_events_time_split

    staged = stage_events_time_split(SF, n_files=N_FILES)
    files = sorted(os.listdir(os.path.join(staged, "events.parquet")))
    assert len(files) == N_FILES
    import pyarrow.parquet as pq

    tables = [
        pq.read_table(os.path.join(staged, "events.parquet", f))
        for f in files
    ]
    assert sum(t.num_rows for t in tables) == 1000 + 2  # corpus + sentinels
    # time-ordered: each file's max ts <= next file's min ts
    import pyarrow.compute as pc

    for a, b in zip(tables, tables[1:]):
        assert pc.max(a["ts"]).as_py() <= pc.min(b["ts"]).as_py()


def test_dedup_within_watermark_evicts_state(spark):
    """Bounded-state contract, dedup family: across >=3 micro-batches
    the watermark must EVICT dedup state (rows removed), the rows
    series must not carry the unbounded-growth signature, and the
    report must be warning-free."""
    from mysqldatasynctool_spark.streaming import (
        streaming_dedup_within_watermark,
    )

    rows, rep = _paced_run(
        spark,
        lambda mk: streaming_dedup_within_watermark(mk()),
        "ctr_dedup",
    )
    assert rows > 0
    assert rep["n_batches"] >= 3
    ops = rep["state_operators"]
    assert ops, "dedup run recorded no state operators"
    evicted = sum(
        op["rows_removed"] + op["rows_dropped_by_watermark"] for op in ops
    )
    assert evicted > 0, (
        "watermark never evicted dedup state across "
        f"{rep['n_batches']} batches — bounded-state contract broken"
    )
    assert rep["warnings"] == []
    assert not any(op.get("state_growth_warning") for op in ops)


def test_stream_stream_join_evicts_state(spark):
    """Bounded-state contract, interval-join family: both sides'
    join state must shrink as the watermark passes the interval."""
    from mysqldatasynctool_spark.streaming import streaming_funnel_join

    rows, rep = _paced_run(
        spark,
        lambda mk: streaming_funnel_join(mk(), mk()),
        "ctr_funnel",
    )
    assert rows > 0
    assert rep["n_batches"] >= 3
    ops = rep["state_operators"]
    assert ops, "join run recorded no state operators"
    evicted = sum(
        op["rows_removed"] + op["rows_dropped_by_watermark"] for op in ops
    )
    assert evicted > 0, (
        "watermark never evicted join state across "
        f"{rep['n_batches']} batches — bounded-state contract broken"
    )
    assert rep["warnings"] == []
    assert not any(op.get("state_growth_warning") for op in ops)


def test_dropped_watermark_turns_contract_red(spark):
    """The negative control the contract exists for: the SAME paced
    input deduped WITHOUT a watermark (plain dropDuplicates = what a
    dropped `withWatermark` degrades to) must (a) evict nothing and
    (b) trip the growth warning — i.e. the assertions above would
    fail exactly as intended."""
    from pyspark.sql import functions as F

    rows, rep = _paced_run(
        spark,
        lambda mk: mk()
        .filter(F.col("user_id") >= 0)
        .dropDuplicates(["user_id", "event_type"]),
        "ctr_nowm",
    )
    assert rows > 0
    assert rep["n_batches"] >= 3
    ops = rep["state_operators"]
    assert ops
    assert (
        sum(op["rows_removed"] + op["rows_dropped_by_watermark"] for op in ops)
        == 0
    )
    assert any(op.get("state_growth_warning") for op in ops)
    assert rep["warnings"] and "zero eviction" in rep["warnings"][0]
