"""Round-12 hardening tests (r11 verdict items 2/5/8 + advice):

- registry-level ANN cache teardown actually releases the persisted
  assignment frame (verdict item 2);
- ``_assign_cells(centroids=...)`` is an explicit assign-only contract
  (advice, medium — no reliance on cache-call ordering);
- the horizon staging rewrites INT96 events fixtures instead of
  refusing them, and the left-outer streaming runner is value-correct
  on such a fixture (verdict item 5);
- the staging cache is keyed on source mtime/size and its temp dirs
  are removable (advice, low).

(The verdict-item-8 ``_rebalance`` pass-through guard already exists:
tests/test_bench_stamp.py::test_rebalance_passthrough_on_multi_partition_input.)
"""

from __future__ import annotations

import os
import shutil

from conftest import SF_SMALL, assert_matches_oracle


def test_teardown_releases_persisted_ann_frame(spark):
    from mysqldatasynctool_spark.operators import teardown_caches
    from mysqldatasynctool_spark.operators import similarity as sim

    # populate the cache the way bench/driver runs do
    sim.similarity_ivfpq_topk(spark, SF_SMALL).count()
    assert sim._PERSISTED_WITH_CELLS, "ivfpq run should cache one frame"
    frame = next(iter(sim._PERSISTED_WITH_CELLS.values()))
    assert frame.storageLevel.useMemory, "cached frame should be persisted"

    # the bench.py between-queries hygiene sequence
    spark.catalog.clearCache()
    released = teardown_caches()

    assert released >= 1
    assert not sim._PERSISTED_WITH_CELLS, "no entry may survive teardown"
    assert not frame.storageLevel.useMemory, "frame must be unpersisted"
    # idempotent: a second teardown is a no-op, not an error
    assert teardown_caches() == 0


def test_assign_cells_explicit_centroids_assigns_only(spark):
    from mysqldatasynctool_spark.operators import similarity as sim

    emb = sim._vecs(spark, SF_SMALL).limit(20)
    fake = [(7, [1.0] * sim.EMBED_DIM)]
    before_keys = set(sim._TRAINED_CENTS)
    assigned, cents = sim._assign_cells(spark, emb, probes=1, centroids=fake)
    rows = assigned.select("cells").collect()
    # every vector lands in the single provided cell — proof the call
    # used the passed centroids rather than training its own
    assert rows and all(r.cells == [7] for r in rows)
    assert cents is fake
    # and nothing was trained or cached as a side effect
    assert set(sim._TRAINED_CENTS) == before_keys


def _write_int96_events(spark, dest_dir: str) -> str:
    """Copy the sf0.001 events fixture re-encoded as INT96 (Spark's own
    legacy parquet timestamp output) into ``dest_dir/events.parquet``."""
    from mysqldatasynctool_spark.sources.fixtures import load

    events = load(spark, SF_SMALL, "events")  # ts normalized to TIMESTAMP
    prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
    try:
        events.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(dest_dir, "events.parquet")
        )
    finally:
        spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
    return dest_dir


def test_stage_horizon_rewrites_int96(spark, duck, tmp_path):
    from mysqldatasynctool_spark.streaming.jobs import (
        _probe_ts_unit,
        stage_events_with_horizon,
    )

    sf_dir = _write_int96_events(spark, str(tmp_path))
    assert _probe_ts_unit(f"{sf_dir}/events.parquet") == "int96"

    staged = stage_events_with_horizon(sf_dir)
    # the staged copy is int64-annotated (µs), i.e. on the standard
    # TIMESTAMP_NTZ read path — the rewrite, not a refusal
    assert _probe_ts_unit(f"{staged}/events.parquet") == "us"


def test_streaming_left_join_on_int96_fixture(spark, duck, tmp_path):
    """The full left-outer runner on an INT96-encoded events fixture
    must match the batch LEFT JOIN oracle over the ORIGINAL fixture —
    byte encoding is an ingestion detail, never a semantics change."""
    from mysqldatasynctool_spark.operators.streamruns import (
        STREAMING_FUNNEL_JOIN_LEFT_ORACLE,
        streaming_run_funnel_join_left,
    )

    sf_dir = _write_int96_events(spark, str(tmp_path))
    out = streaming_run_funnel_join_left(spark, sf_dir)
    assert_matches_oracle(
        out, STREAMING_FUNNEL_JOIN_LEFT_ORACLE, duck, sf_dir=SF_SMALL
    )


def test_stage_horizon_cache_keys_on_source_identity(spark, tmp_path):
    from mysqldatasynctool_spark.streaming import jobs

    src = str(tmp_path / "fixture")
    os.makedirs(src)
    shutil.copy(f"{SF_SMALL}/events.parquet", f"{src}/events.parquet")

    first = jobs.stage_events_with_horizon(src)
    assert jobs.stage_events_with_horizon(src) == first, "same bytes reuse"

    # a regenerated fixture (new mtime) must get a FRESH staging — the
    # r11 advice scenario where a stale copy would be graded against a
    # fresh batch oracle
    st = os.stat(f"{src}/events.parquet")
    os.utime(f"{src}/events.parquet", ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000_000))
    second = jobs.stage_events_with_horizon(src)
    assert second != first

    # cleanup hook removes every staged dir and empties the cache
    jobs._cleanup_horizon_staged()
    assert not jobs._HORIZON_STAGED
    assert not os.path.isdir(first) and not os.path.isdir(second)


def test_tune_embedded_derby_sets_engine_properties(spark):
    """The embedded-Derby engine sizing must be set in the JVM before
    boot and be a once-only no-op afterwards (engine properties are
    read at boot; see sinks.tune_embedded_derby)."""
    from mysqldatasynctool_spark.sources import sinks

    sinks.tune_embedded_derby()
    jvm_sys = spark._jvm.java.lang.System
    assert jvm_sys.getProperty("derby.storage.pageCacheSize") == "8000"
    assert jvm_sys.getProperty("derby.storage.logBufferSize") == "1048576"
    assert sinks._DERBY_TUNED
    # idempotent re-entry
    sinks.tune_embedded_derby()
