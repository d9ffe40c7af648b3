"""Parquet fixture source (the test-time stand-in for JDBC scans).

The reference discovers tables from ``information_schema.tables``
(/root/reference/cmd/root.go:222-241) and reads them with generated
SELECTs; here the equivalent scan source is a directory of parquet
tables. Reads are lazy — Catalyst pushes filters and prunes columns
into the parquet scan, which is the property the reference's
hand-built pagination was approximating.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Tables the driver fixtures provide (TESTDATA.md / FIXTURES.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


#: tables below this on-disk size skip rebalancing (broadcast-bound
#: dims; spreading 5 rows over 32 tasks only adds scheduling overhead)
REBALANCE_MIN_BYTES = 512 * 1024


def _rebalance(spark: SparkSession, df: DataFrame, path: str) -> DataFrame:
    """Fix the single-rowgroup parallelism trap: each fixture table is
    ONE parquet file with ONE rowgroup, so the scan yields ONE
    non-empty partition and every scan-stage computation (row digests,
    regex, tokenization, hashing) runs on a single core no matter how
    many the session has. Repartition CPU-relevant tables up to the
    session's parallelism — shuffling a few MB to unlock a 32x-wider
    map stage.

    At production scale this is a NO-OP by construction: real datasets
    have many files/rowgroups, so the partition count clears the
    target/4 guard and the frame passes through untouched (blanket
    repartitioning there would be an expensive anti-pattern — this
    mirrors the standard fix for 'few huge gzip files' inputs).
    """
    import os

    try:
        size = (
            os.path.getsize(path)
            if os.path.isfile(path)
            else sum(
                os.path.getsize(os.path.join(path, f))
                for f in os.listdir(path)
                if not f.startswith((".", "_"))
            )
        )
    except OSError:
        return df
    if size < REBALANCE_MIN_BYTES:
        return df
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() * 4 > target:
        return df
    return df.repartition(target)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table as a DataFrame.

    ``events.ts`` normalization: the driver has shipped the column as
    both parquet TIMESTAMP(NANOS) and TIMESTAMP(MICROS) across rounds,
    and Spark reads those very differently — nanos is rejected by the
    vectorized reader ([PARQUET_TYPE_ILLEGAL]) unless read as a long,
    and tz-less micros becomes TIMESTAMP_NTZ (which refuses
    ``cast("long")`` and silently ignores the session time zone).
    Normalize ALL variants to a plain UTC TIMESTAMP here, the single
    ingestion choke point, so every downstream consumer sees one dtype:

    - ``bigint`` (nanos-as-long): exact integer DIV 1000 → micros
      (double division would lose precision at 1e18 ns; matches
      DuckDB's nanos→micros truncation).
    - ``timestamp_ntz`` (micros, no tz): cast to ``timestamp``. The
      session TZ is pinned UTC below, so the wall-clock fields are
      reinterpreted as UTC instants — identical epoch semantics to the
      DuckDB oracle.
    """
    # timestamp→epoch casts and F.window arithmetic assume UTC; the
    # harness may hand us a session with a different default, so pin
    # it here (runtime-settable, affects only this session)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return _rebalance(spark, df, path)
    return _rebalance(spark, spark.read.parquet(path), path)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every fixture table; also registers each as a temp view so
    ``spark.sql`` queries can refer to them by name."""
    out = {}
    for name in TABLES:
        df = load(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
