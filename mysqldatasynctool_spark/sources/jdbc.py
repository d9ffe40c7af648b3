"""JDBC source — the production scan path (fixtures use parquet).

Replaces the reference's per-page goroutines + pooled connections
(/root/reference/cmd/root.go:133-147, cmd/app.go:34-78): Spark opens
one connection per partition task, so ``numPartitions`` bounds
concurrency the way the reference's semaphore pool did
(root.go:104-106).

No MySQL exists in the test container; these functions are exercised
for option-wiring (unit tests assert the reader config), and run for
real when a JDBC URL + driver jar are present.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..config import Endpoint
from ..plans.partitioning import PartitionPlan


def read_table(
    spark: SparkSession,
    endpoint: Endpoint,
    table: str,
    plan: PartitionPlan | None = None,
    custom_sql: str | None = None,
    fetch_size: int = 10_000,
) -> DataFrame:
    """Partitioned JDBC read of one table (or custom-SQL passthrough).

    - custom SQL (the reference's ``-s`` mode, root.go:95-96, 291-293)
      becomes a derived-table scan: ``(SELECT ...) q`` — Catalyst still
      pushes filters/projections into the outer query;
    - a 'range' plan maps to partitionColumn/bounds;
    - a 'predicates' plan maps to spark.read.jdbc(predicates=[...]).
    """
    src = f"({custom_sql}) q" if custom_sql else table
    if plan is None or plan.mode == "single":
        # the single-connection full scan is exactly where streaming
        # fetch matters most — without it Connector/J materializes the
        # whole result set in executor memory
        return spark.read.jdbc(
            endpoint.jdbc_url,
            src,
            properties={**endpoint.jdbc_properties, "fetchsize": str(fetch_size)},
        )
    if plan.mode == "range":
        return spark.read.jdbc(
            endpoint.jdbc_url,
            src,
            column=plan.partition_column,
            lowerBound=plan.lower_bound,
            upperBound=plan.upper_bound,
            numPartitions=plan.num_partitions,
            properties={**endpoint.jdbc_properties, "fetchsize": str(fetch_size)},
        )
    return spark.read.jdbc(
        endpoint.jdbc_url,
        src,
        predicates=list(plan.predicates),
        properties={**endpoint.jdbc_properties, "fetchsize": str(fetch_size)},
    )


def probe_schema(spark: SparkSession, endpoint: Endpoint, sql: str):
    """Zero-row schema probe: the reference wraps the query in
    ``select * from (<q>) aa where 1=0`` (root.go:280-318); a JDBC
    DataFrame's schema is already resolved lazily without fetching
    rows, so .schema IS the probe."""
    return read_table(spark, endpoint, table="", custom_sql=sql).schema
