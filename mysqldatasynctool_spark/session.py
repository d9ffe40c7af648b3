"""SparkSession factory tuned for this engine.

Local test runs use ``local[N]`` (one JVM); the same configuration keys
are the ones that matter on a real multi-executor cluster — AQE for
runtime re-planning (adaptive shuffle-partition coalescing, skew-join
splitting, broadcast demotion), UTC session timezone so results are
oracle-comparable, and Arrow for any Pandas-UDF path.

Scale notes (100 TB / 1000 executors):
- ``spark.sql.shuffle.partitions`` here is sized for local runs; on a
  cluster leave it large (or rely on AQE coalescing) — AQE shrinks
  post-shuffle partitions to ``advisoryPartitionSizeInBytes`` so the
  same code runs unchanged at any scale factor.
- ``spark.sql.files.maxPartitionBytes`` (default 128m) governs scan
  parallelism; 100 TB / 128 MB ~ 800k scan tasks, which Spark handles
  fine; do not collapse input partitioning by hand.
- skew: ``spark.sql.adaptive.skewJoin.enabled`` is on; hot keys in
  joins are split at runtime instead of hand-salting.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "mysqldatasynctool_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(cpus)
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # long sessions run many queries that localCheckpoint small
        # intermediates (LSH candidate sets, shingle tables); the
        # ContextCleaner only drops those blocks after a JVM GC notices
        # the references died — force one periodically so block-manager
        # memory can't ratchet up across a 100-query session
        .config("spark.cleaner.periodicGC.interval", "2min")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        # JDK-17 GCLocker hazard on allocation-heavy aggregates
        # (HLL sketches, wide hash maps) under JNI-critical sections
        # (parquet/arrow): the default 2 retries turns a transient
        # GC-blocked allocation into a SPURIOUS OutOfMemoryError that
        # kills the executor thread with most of the heap free
        # (observed: sf0.1 sweep died on a 1 MB ByteBuffer with 20+ GB
        # unused after "Retried waiting for GCLocker too often").
        # Raising the retry budget makes the allocation wait out the
        # critical section instead of lying about heap exhaustion.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:+UnlockDiagnosticVMOptions "
            "-XX:GCLockerRetryAllocationCount=100",
        )
    )
    # live-endpoint activation: point SPARK_GRAFT_JARS at a JDBC
    # driver jar (e.g. mysql-connector-j) and the live-MySQL tests /
    # CLI runs pick it up without code changes (README "Live-MySQL
    # activation")
    jars = os.environ.get("SPARK_GRAFT_JARS")
    if jars:
        builder = builder.config("spark.jars", jars)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
