"""REAL JDBC round-trip against embedded Derby (the JDBC database
bundled with Spark) — exercises the production read/write path the
MySQL deployment uses: partitioned reads (range bounds AND composite
predicates), batched writes, and checksum verification, with no mocks.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mysqldatasynctool_spark.config import Endpoint
from mysqldatasynctool_spark.operators.compare import compare_tables
from mysqldatasynctool_spark.plans.partitioning import (
    composite_pk_predicates,
    plan_table,
    sample_boundaries,
)
from mysqldatasynctool_spark.sources.fixtures import load
from mysqldatasynctool_spark.sources.jdbc import read_table
from mysqldatasynctool_spark.sources.sinks import write_jdbc

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def derby(tmp_path_factory):
    db = tmp_path_factory.mktemp("derby") / "db"
    return Endpoint(
        url_override=f"jdbc:derby:{db};create=true",
        driver="org.apache.derby.iapi.jdbc.AutoloadedDriver",
    )


def test_write_then_partitioned_read_range(spark, derby):
    orders = load(spark, SF, "orders")
    write_jdbc(orders, derby, "ORDERS_RT", batch_row_size=500, truncate=False)

    plan = plan_table(
        "ORDERS_RT",
        ["o_orderkey"],
        page_size=500,
        max_parallel=4,
        row_count=orders.count(),
        pk_min=orders.agg(F.min("o_orderkey")).collect()[0][0],
        pk_max=orders.agg(F.max("o_orderkey")).collect()[0][0],
    )
    back = read_table(spark, derby, "ORDERS_RT", plan=plan)
    assert back.rdd.getNumPartitions() == plan.num_partitions > 1
    assert back.count() == orders.count()

    # content equality via the engine's own checksum compare
    verdict = compare_tables(
        spark,
        {"orders": orders.select("o_orderkey", "o_custkey", "o_totalprice")},
        {"orders": back.select("o_orderkey", "o_custkey", "o_totalprice")},
    ).collect()
    assert verdict[0].is_ok == "YES"


def test_composite_predicate_read(spark, derby):
    li = load(spark, SF, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    write_jdbc(li, derby, "LINEITEM_RT", batch_row_size=1000, truncate=False)

    pk = ["l_orderkey", "l_linenumber"]
    boundaries = sample_boundaries(li, pk, 1500)
    preds = composite_pk_predicates(pk, boundaries, quote='"')
    plan = plan_table("LINEITEM_RT", pk, 1500, 8, boundaries=boundaries, quote='"')
    back = read_table(spark, derby, "LINEITEM_RT", plan=plan)
    # one JDBC partition per predicate; predicates tile by VALUE, so
    # even duplicate key tuples (the fixture's composite key is not
    # unique) land exactly once — full multiset equality via checksum
    assert back.rdd.getNumPartitions() == len(preds)
    assert back.count() == li.count()
    verdict = compare_tables(spark, {"lineitem": li}, {"lineitem": back}).collect()
    assert verdict[0].is_ok == "YES"


def test_custom_sql_passthrough(spark, derby):
    """The reference's -s mode (custom SELECT defines the row-set,
    root.go:95-96, 291-293) over a real JDBC connection."""
    back = read_table(
        spark,
        derby,
        table="",
        custom_sql='SELECT "o_orderkey", "o_totalprice" FROM ORDERS_RT WHERE "o_totalprice" > 300000',
    )
    assert [c.lower() for c in back.columns] == ["o_orderkey", "o_totalprice"]
    n_direct = (
        load(spark, SF, "orders").filter(F.col("o_totalprice") > 300000).count()
    )
    assert back.count() == n_direct


def test_schema_probe_is_lazy(spark, derby):
    """Zero-row schema probe (root.go:280-318): resolving the schema
    must not require fetching rows — .schema on the lazy frame."""
    df = read_table(spark, derby, "ORDERS_RT")
    names = [f.name.lower() for f in df.schema.fields]
    assert "o_orderkey" in names and "o_orderdate" in names


def test_migrate_jdbc_db_to_db(spark, tmp_path_factory):
    """Full DB→DB pipeline (the reference's actual job shape,
    root.go:375-507): seed a source Derby from fixtures, run
    migrate_jdbc (plan → partitioned JDBC read → batched JDBC write →
    checksum verify), assert every table lands verified YES."""
    from mysqldatasynctool_spark.migrate import jsonify_nested, migrate_jdbc

    drv = "org.apache.derby.iapi.jdbc.AutoloadedDriver"
    src_db = tmp_path_factory.mktemp("derby_src") / "db"
    dest_db = tmp_path_factory.mktemp("derby_dest") / "db"
    src = Endpoint(url_override=f"jdbc:derby:{src_db};create=true", driver=drv)
    dest = Endpoint(url_override=f"jdbc:derby:{dest_db};create=true", driver=drv)

    # one table per plan mode: range (single numeric PK), composite
    # predicates (lineitem, NON-unique composite key), nested→JSON
    # (embeddings array column), tiny dim
    tables = {
        "orders": ["o_orderkey"],
        "lineitem": ["l_orderkey", "l_linenumber"],
        "embeddings": ["vec_id"],
        "region": ["r_regionkey"],
    }
    for t in tables:
        write_jdbc(jsonify_nested(load(spark, SF, t)), src, t, truncate=True)

    reports, verdict = migrate_jdbc(spark, src, dest, tables, page_size=500)

    assert all(r.ok for r in reports), [(r.table, r.error) for r in reports]
    rows = verdict.collect()
    assert len(rows) == len(tables)
    assert all(r.is_ok == "YES" for r in rows), [
        (r.table_name, r.is_ok) for r in rows
    ]
    # the partitioned read must actually partition the big tables
    back = spark.read.format("jdbc").options(
        url=dest.jdbc_url, dbtable="orders", driver=drv
    ).load()
    assert back.count() == load(spark, SF, "orders").count()
