"""DDL replication fidelity against a REAL database (embedded Derby).

The reference replays SHOW CREATE TABLE verbatim and trusts MySQL to
reproduce types exactly (tablemeta.go:41-96). Live MySQL is
unavailable in this sandbox, so this suite validates the same
contract end-to-end as far as the sandbox allows: for EVERY fixture
table, generate the schema-derived CREATE (ddl.create_table_sql),
execute the reference's replay sequence (FK-off/drop/create
semantics, Derby dialect) over a real JDBC connection, then read the
table back through Spark's JDBC source and assert type-for-type
Catalyst schema equality.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from mysqldatasynctool_spark.catalog import FIXTURE_PRIMARY_KEYS
from mysqldatasynctool_spark.config import Endpoint
from mysqldatasynctool_spark.ddl import create_table_sql, replicate_ddl
from mysqldatasynctool_spark.sources.fixtures import load

SF = "/root/testdata/sf0.001"
TABLES = sorted(FIXTURE_PRIMARY_KEYS)


def _connect(spark, url):
    """The package's own PEP-249 shim (sources.jdbc.dbapi_connection)
    pointed at embedded Derby — the same bridge the live-MySQL suite
    uses, so its cursor/execute/commit/rollback protocol is exercised
    in-sandbox on every run, not only behind `-m live`."""
    from mysqldatasynctool_spark.sources.jdbc import dbapi_connection

    return dbapi_connection(spark, Endpoint(url_override=url, driver="org.apache.derby.iapi.jdbc.AutoloadedDriver"))


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    db = tmp_path_factory.mktemp("derby_ddl") / "db"
    url = f"jdbc:derby:{db};create=true"
    # force driver registration in the JVM before DriverManager use
    spark._jvm.java.lang.Class.forName("org.apache.derby.iapi.jdbc.AutoloadedDriver")
    return url


def expected_roundtrip_type(dt: T.DataType) -> T.DataType:
    """What a Catalyst type must come back as after CREATE + JDBC read.

    Scalars round-trip exactly; nested types are stored as JSON text
    (CLOB on Derby, JSON on MySQL) so they return as StringType — the
    documented lossy edge, re-parsed with from_json on demand.
    Timestamps come back NTZ: Derby TIMESTAMP (like MySQL DATETIME)
    stores zoneless wall-clock, so the instant/wall-clock distinction
    is a property of the column definition, not round-trippable."""
    if isinstance(dt, (T.ArrayType, T.MapType, T.StructType)):
        return T.StringType()
    if isinstance(dt, T.TimestampType):
        return T.TimestampNTZType()
    return dt


@pytest.mark.parametrize("table", TABLES)
def test_ddl_roundtrip_schema_fidelity(spark, derby_url, table):
    src = load(spark, SF, table)
    pk = FIXTURE_PRIMARY_KEYS[table]
    name = f"ddl_rt_{table}"

    # run the replay TWICE: the second pass exercises the
    # drop-existing branch the reference always hits on re-migration
    for _ in range(2):
        stmts = replicate_ddl(
            name,
            lambda: _connect(spark, derby_url),
            schema=src.schema,
            primary_key=pk,
            dialect="derby",
        )
    assert stmts[0].startswith("drop table")
    assert stmts[-1].startswith("CREATE TABLE")

    back = spark.read.format("jdbc").options(
        url=derby_url,
        dbtable=f'"{name}"',
        driver="org.apache.derby.iapi.jdbc.AutoloadedDriver",
        # Derby TIMESTAMP is zoneless; read it back as NTZ to match
        # the fixtures' source type
        preferTimestampNTZ="true",
    ).load()

    assert [f.name for f in back.schema.fields] == [
        f.name for f in src.schema.fields
    ]
    for sf_field, rt_field in zip(src.schema.fields, back.schema.fields):
        want = expected_roundtrip_type(sf_field.dataType)
        assert rt_field.dataType == want, (
            f"{table}.{sf_field.name}: wrote {sf_field.dataType}, "
            f"round-tripped {rt_field.dataType}, expected {want}"
        )
    # PK columns must come back NOT NULL — asserted through the
    # database's own metadata (Spark's JDBC reader flattens JDBC
    # nullability to nullable=True, so it can't carry this check)
    jconn = spark._jvm.java.sql.DriverManager.getConnection(derby_url)
    try:
        rs = jconn.getMetaData().getColumns(None, None, name, None)
        nullability = {}
        while rs.next():
            nullability[rs.getString("COLUMN_NAME")] = rs.getString("IS_NULLABLE")
    finally:
        jconn.close()
    assert nullability, f"no column metadata for {name}"
    for c in pk:
        assert nullability[c] == "NO", f"{table}.{c} PK lost NOT NULL"


def test_mysql_dialect_statements_unchanged():
    """The MySQL replay sequence stays reference-verbatim (FK toggle +
    drop-if-exists + charset suffix) — the Derby dialect must not leak
    into it."""
    s = T.StructType([T.StructField("id", T.LongType()), T.StructField("t", T.StringType())])
    sql = create_table_sql("t", s, primary_key=["id"], dialect="mysql")
    assert "`id` BIGINT" in sql and "`t` LONGTEXT" in sql
    assert sql.endswith("DEFAULT CHARSET=utf8mb4")
    d = create_table_sql("t", s, primary_key=["id"], dialect="derby")
    assert '"id" BIGINT NOT NULL' in d and '"t" CLOB' in d
    assert "CHARSET" not in d
