"""The migration pipeline — the reference's default command
(startDataTransfer, /root/reference/cmd/root.go:58-208) as one
orchestration: discover → plan → copy → verify.

Where the reference runs a goroutine per page and a channel-semaphore
pool (root.go:104-147), each table here is ONE Spark job whose
partitions are the pages; Spark's scheduler is the pool. Tables
themselves are submitted from a thread pool bounded by maxParallel
(the reference's semaphore semantics at table granularity — with
thousands of small tables, per-table job overlap is the throughput
lever; Spark's scheduler interleaves the concurrent jobs' tasks).
Per-table failures are caught per-thread (the reference's
errDataCount analogue, root.go:48-56, counts failed objects).
"""

from __future__ import annotations

import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass

from pyspark.sql import SparkSession

from .catalog import discover_parquet_tables
from .config import SyncConfig
from .operators.compare import compare_tables
from .sources.fixtures import load
from .sources.sinks import write_parquet


@dataclass
class TableReport:
    """Per-object run report (the reference's gotable summary row:
    Object/BeginTime/EndTime/FailedTotal/ElapsedTime, root.go:161-207)."""

    table: str
    rows: int
    elapsed_s: float
    ok: bool
    error: str | None = None


def migrate_directory(
    spark: SparkSession,
    src_dir: str,
    dest_dir: str,
    cfg: SyncConfig | None = None,
    tables: list[str] | None = None,
) -> tuple[list[TableReport], object]:
    """Parquet→parquet migration over the fixture layout, exercising
    the same phases as the JDBC path (which swaps load/write_parquet
    for jdbc.read_table/sinks.write_jdbc):

    1. catalog discovery + exclusion        (ops #1-#2)
    2. partition planning per PK            (ops #3-#6)
    3. copy, one Spark job per table        (ops #9, #11-#12)
    4. count+checksum verification          (op #14, upgraded)

    Returns (per-table reports, verdict DataFrame).
    """
    cfg = cfg or SyncConfig()
    discovered = tables or discover_parquet_tables(src_dir)
    todo = [t for t in discovered if t not in set(cfg.exclude)]

    def copy_one(t: str) -> TableReport:
        t0 = time.monotonic()
        try:
            df = load(spark, src_dir, t)
            # No partition planning here: parquet scans are already
            # split by file/rowgroup. The JDBC path is where plans
            # matter — jdbc.read_table(plan=plan_table(..., pk,
            # boundaries=sample_boundaries(...))) as exercised by
            # tests/test_jdbc_roundtrip.py; sampling boundaries for a
            # parquet copy would be a pure-waste shuffle.
            write_parquet(df, f"{dest_dir}/{t}.parquet")
            # row count from the just-written dest: parquet counts are
            # footer metadata — no second scan of the source
            n = spark.read.parquet(f"{dest_dir}/{t}.parquet").count()
            return TableReport(t, n, time.monotonic() - t0, True)
        except Exception as exc:  # noqa: BLE001 — per-object failure accounting
            return TableReport(t, 0, time.monotonic() - t0, False, str(exc))

    # maxParallel bounds how many table copy JOBS are in flight at
    # once (reference root.go:104-147); submission order is preserved
    # in the report list regardless of completion order
    with ThreadPoolExecutor(max_workers=min(cfg.max_parallel, max(1, len(todo)))) as pool:
        reports = list(pool.map(copy_one, todo))
    copied = [r.table for r in reports if r.ok]

    src_dfs = {t: load(spark, src_dir, t) for t in copied}
    dest_dfs = {t: load(spark, dest_dir, t) for t in copied}
    verdict = compare_tables(spark, src_dfs, dest_dfs)
    return reports, verdict
