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


def test_migrate_jdbc_string_pk(spark, tmp_path_factory):
    """Single-column NON-numeric PK: the range planner needs numeric
    arithmetic, so a string PK must route to lexicographic boundary
    predicates instead of raising TypeError and failing the table
    (the reference handles every PK type, root.go:347-371)."""
    from mysqldatasynctool_spark.migrate import migrate_jdbc

    drv = "org.apache.derby.iapi.jdbc.AutoloadedDriver"
    src_db = tmp_path_factory.mktemp("derby_src_s") / "db"
    dest_db = tmp_path_factory.mktemp("derby_dest_s") / "db"
    src = Endpoint(url_override=f"jdbc:derby:{src_db};create=true", driver=drv)
    dest = Endpoint(url_override=f"jdbc:derby:{dest_db};create=true", driver=drv)

    cust = load(spark, SF, "customer").select(
        "c_name", "c_nationkey", "c_acctbal"
    )
    write_jdbc(cust, src, "cust_by_name", truncate=True)

    reports, verdict = migrate_jdbc(
        spark, src, dest, {"cust_by_name": ["c_name"]}, page_size=50
    )
    assert all(r.ok for r in reports), [(r.table, r.error) for r in reports]
    assert all(r.is_ok == "YES" for r in verdict.collect())
    back = read_table(spark, dest, "cust_by_name")
    assert back.count() == cust.count()


def test_check_ident_rejects_injection():
    from mysqldatasynctool_spark.migrate import _check_ident

    _check_ident("orders")
    _check_ident("myschema.orders")
    for bad in ('orders"; DROP TABLE x--', "a b", "t;", 'x"y', "",
                "a#b"):  # '#' starts a MySQL comment: FROM a#b reads 'a'
        with pytest.raises(ValueError):
            _check_ident(bad)


def test_missing_table_error_classifier():
    from mysqldatasynctool_spark.ddl import _is_missing_table_error

    assert _is_missing_table_error(Exception("ERROR 42Y55: 'DROP TABLE' cannot be performed on 'T' because it does not exist"))
    assert _is_missing_table_error(Exception("Table/View 'T' does not exist."))
    assert _is_missing_table_error(Exception("Unknown table 'db.t'"))
    assert not _is_missing_table_error(Exception("ERROR 40XL1: A lock could not be obtained"))
    chained = Exception("java wrapper")
    chained.__cause__ = Exception("ERROR 42X05: Table/View 'Q' not found")
    assert _is_missing_table_error(chained)
    # MySQL 1146 phrasing
    assert _is_missing_table_error(Exception("Table 'db.t' doesn't exist"))
    # NON-table "not found" errors must NOT classify as missing-table:
    # compareDb would silently report every table as DestIsExist=NO
    assert not _is_missing_table_error(
        Exception("ERROR XJ004: Database 'nosuch/db' not found.")
    )
    assert not _is_missing_table_error(
        Exception("java.lang.ClassNotFoundException: com.mysql.cj.jdbc.Driver not found")
    )
    assert not _is_missing_table_error(
        Exception("File not found: /tmp/x.parquet")
    )


def test_migrate_jdbc_string_pk_varchar_pages(spark, tmp_path_factory):
    """String PK stored as VARCHAR (the MySQL-realistic case): the
    range probe still degrades (MIN works but lo is a str, not a
    number), and lexicographic boundary predicates must EXECUTE on the
    source — comparisons against a VARCHAR are legal SQL, so this
    exercises tier 2 for real rather than the full-scan fallback."""
    from mysqldatasynctool_spark.migrate import migrate_jdbc

    drv = "org.apache.derby.iapi.jdbc.AutoloadedDriver"
    src_db = tmp_path_factory.mktemp("derby_src_v") / "db"
    dest_db = tmp_path_factory.mktemp("derby_dest_v") / "db"
    src = Endpoint(url_override=f"jdbc:derby:{src_db};create=true", driver=drv)
    dest = Endpoint(url_override=f"jdbc:derby:{dest_db};create=true", driver=drv)

    cust = load(spark, SF, "customer").select("c_name", "c_nationkey", "c_acctbal")
    write_jdbc(
        cust, src, "cust_vc", truncate=True, column_types="c_name VARCHAR(40)"
    )

    # sanity: tier-2 predicates against the VARCHAR column are
    # executable on this source (would raise for CLOB)
    from mysqldatasynctool_spark.plans.partitioning import (
        composite_pk_predicates as cpp,
        sample_boundaries as sb,
    )

    narrow = read_table(spark, src, "cust_vc").select("c_name")
    bounds = sb(narrow, ["c_name"], 50)
    assert len(bounds) > 1
    plan = plan_table("cust_vc", ["c_name"], 50, 8, boundaries=bounds, quote='"')
    paged = read_table(spark, src, "cust_vc", plan=plan)
    assert paged.rdd.getNumPartitions() == len(cpp(["c_name"], bounds, quote='"'))
    assert paged.count() == cust.count()

    reports, verdict = migrate_jdbc(
        spark, src, dest, {"cust_vc": ["c_name"]}, page_size=50
    )
    assert all(r.ok for r in reports), [(r.table, r.error) for r in reports]
    assert all(r.is_ok == "YES" for r in verdict.collect())


def test_migrate_jdbc_resume_skips_verified(spark, tmp_path_factory):
    """resume=True: a rerun re-verifies each destination table via one
    src-union-dest checksum job and SKIPS the write when it matches —
    same idempotency contract as migrate_directory's --resume."""
    import time as _time

    from mysqldatasynctool_spark.migrate import jsonify_nested, migrate_jdbc

    drv = "org.apache.derby.iapi.jdbc.AutoloadedDriver"
    src_db = tmp_path_factory.mktemp("derby_src_r") / "db"
    dest_db = tmp_path_factory.mktemp("derby_dest_r") / "db"
    src = Endpoint(url_override=f"jdbc:derby:{src_db};create=true", driver=drv)
    dest = Endpoint(url_override=f"jdbc:derby:{dest_db};create=true", driver=drv)
    tables = {"orders": ["o_orderkey"], "region": ["r_regionkey"]}
    for t in tables:
        write_jdbc(jsonify_nested(load(spark, SF, t)), src, t, truncate=True)

    r1, v1 = migrate_jdbc(spark, src, dest, tables, page_size=500)
    assert all(r.ok for r in r1)

    # corrupt one dest table; the resume run must recopy ONLY that one
    jconn = spark._jvm.java.sql.DriverManager.getConnection(
        f"jdbc:derby:{dest_db}"
    )
    st = jconn.createStatement()
    st.execute('DELETE FROM region WHERE "r_regionkey" = 0')
    st.close()
    jconn.close()

    # count actual dest writes: the verified table must be SKIPPED,
    # the corrupted one recopied — r.ok alone can't distinguish a
    # broken resume that recopies everything
    import mysqldatasynctool_spark.sources.sinks as sinks_mod

    written = []
    real_write = sinks_mod.write_jdbc

    def counting_write(df, endpoint, table, **kw):
        written.append(table)
        return real_write(df, endpoint, table, **kw)

    sinks_mod.write_jdbc = counting_write
    try:
        r2, v2 = migrate_jdbc(spark, src, dest, tables, page_size=500, resume=True)
    finally:
        sinks_mod.write_jdbc = real_write
    assert all(r.ok for r in r2), [(r.table, r.error) for r in r2]
    assert all(r.is_ok == "YES" for r in v2.collect())
    assert written == ["region"], written
    by_table = {r.table: r for r in r2}
    assert by_table["region"].rows == load(spark, SF, "region").count()


def test_writer_parallelism_clamp():
    """Embedded Derby (in-process page cache, serialized batch writes)
    clamps to ONE writer; client/server URLs keep the requested bound.
    Measured basis: 600k-row write, 1 writer 7.8s vs 32 writers 14.6s."""
    from mysqldatasynctool_spark.config import Endpoint
    from mysqldatasynctool_spark.sources.sinks import writer_parallelism

    emb = Endpoint(url_override="jdbc:derby:/tmp/x;create=true", driver="d")
    net = Endpoint(url_override="jdbc:derby://host:1527/db", driver="d")
    my = Endpoint(url_override="jdbc:mysql://host:3306/db", driver="d")
    assert writer_parallelism(emb, 30) == 1
    assert writer_parallelism(emb, None) == 1
    assert writer_parallelism(net, 30) == 30
    assert writer_parallelism(my, 30) == 30
    assert writer_parallelism(my, None) is None


def test_bulk_load_roundtrip_tricky_values(spark, tmp_path):
    """The CSV stage + SYSCS_IMPORT_TABLE path must round-trip the
    values that break naive CSV: embedded commas/quotes, NULL vs empty
    string, unicode, negative/scientific doubles, timestamps."""
    import datetime

    from mysqldatasynctool_spark.config import Endpoint
    from mysqldatasynctool_spark.sources.sinks import (
        bulk_load,
        supports_bulk_load,
        write_jdbc,
    )

    drv = "org.apache.derby.iapi.jdbc.AutoloadedDriver"
    ep = Endpoint(url_override=f"jdbc:derby:{tmp_path}/bulkdb;create=true", driver=drv)
    rows = [
        (1, "plain", 1.5, datetime.datetime(1997, 3, 1, 12, 30, 45)),
        (2, "with,comma", -2.25, datetime.datetime(2001, 12, 31, 23, 59, 59)),
        (3, 'say "hi"', 1e-8, datetime.datetime(1995, 1, 1, 0, 0, 0)),
        (4, None, None, None),
        (5, "", 0.0, datetime.datetime(2000, 2, 29, 6, 0, 0)),
        (6, "unié中", 12345678.901, datetime.datetime(1999, 9, 9, 9, 9, 9)),
    ]
    df = spark.createDataFrame(rows, "id long, s string, x double, ts timestamp")
    assert supports_bulk_load(ep, df)
    bulk_load(df, ep, "tricky")
    back = spark.read.jdbc(ep.jdbc_url, "tricky", properties=ep.jdbc_properties)
    got = {r.id: (r.s, r.x, r.ts) for r in back.collect()}
    want = {r[0]: (r[1], r[2], r[3]) for r in rows}
    # Documented staging-format limitation (same as LOAD DATA INFILE):
    # unquoted empty == NULL, so a true empty string needs the quoted
    # form — Spark's emptyValue default writes "" quoted, keeping the
    # distinction. Assert exact equality including that case.
    assert got == want
    # binary columns are gated OFF the bulk path
    bdf = spark.createDataFrame([(1, bytearray(b"\x00\x01"))], "id long, payload binary")
    assert not supports_bulk_load(ep, bdf)
    # networked endpoints are gated off
    assert not supports_bulk_load(
        Endpoint(url_override="jdbc:derby://h:1527/db", driver=drv), df
    )


def test_migrate_jdbc_bulk_mode_verifies(spark, tmp_path):
    """migrate_jdbc(bulk=True) routes eligible tables through the
    bulk-load path and the checksum verdict still comes back YES —
    the format round-trip is guarded by content checksums, not trust."""
    from mysqldatasynctool_spark.config import Endpoint
    from mysqldatasynctool_spark.migrate import jsonify_nested, migrate_jdbc
    from mysqldatasynctool_spark.sources.fixtures import load
    from mysqldatasynctool_spark.sources.sinks import write_jdbc

    drv = "org.apache.derby.iapi.jdbc.AutoloadedDriver"
    src = Endpoint(url_override=f"jdbc:derby:{tmp_path}/bsrc;create=true", driver=drv)
    dest = Endpoint(url_override=f"jdbc:derby:{tmp_path}/bdst;create=true", driver=drv)
    write_jdbc(
        jsonify_nested(load(spark, "/root/testdata/sf0.001", "orders")),
        src,
        "orders",
        truncate=True,
    )
    reports, verdict = migrate_jdbc(
        spark, src, dest, {"orders": ["o_orderkey"]}, bulk=True
    )
    assert all(r.ok for r in reports)
    rows = verdict.collect()
    assert len(rows) == 1 and rows[0].is_ok == "YES"
    assert rows[0].src_cnt == rows[0].dest_cnt > 0
