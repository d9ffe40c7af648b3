"""DDL replication — the reference's createTable surface.

The reference replays the literal ``SHOW CREATE TABLE`` output on the
destination, with FK checks off and a drop-if-exists first
(/root/reference/cmd/tablemeta.go:41-96). Spark has no primitive for
verbatim DDL, so this module provides both halves (SURVEY.md §2A #10):

- ``create_table_sql``: schema-derived DDL from a StructType (the
  Spark-native path — what ``df.write.jdbc`` would create, made
  explicit and testable without a live MySQL);
- ``replicate_ddl``: the verbatim-replay path behind a connection
  interface; needs a live DB-API connection (e.g.
  mysql-connector-python on the driver) and raises cleanly without
  one. The statement sequence matches the reference exactly.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import types as T

# Catalyst → MySQL column type (reverse of typemap.mysql_to_catalyst).
_TO_MYSQL: dict[type, str] = {
    T.ByteType: "TINYINT",
    T.ShortType: "SMALLINT",
    T.IntegerType: "INT",
    T.LongType: "BIGINT",
    T.FloatType: "FLOAT",
    T.DoubleType: "DOUBLE",
    T.BooleanType: "BOOLEAN",
    T.DateType: "DATE",
    T.TimestampType: "DATETIME(6)",
    T.BinaryType: "LONGBLOB",
    T.StringType: "LONGTEXT",
}


def mysql_column_type(dt: T.DataType) -> str:
    if isinstance(dt, T.DecimalType):
        return f"DECIMAL({dt.precision},{dt.scale})"
    if isinstance(dt, T.VarcharType):
        return f"VARCHAR({dt.length})"
    if isinstance(dt, (T.ArrayType, T.MapType, T.StructType)):
        return "JSON"  # nested types serialize as JSON text on MySQL
    return _TO_MYSQL.get(type(dt), "LONGTEXT")


def create_table_sql(
    table: str, schema: T.StructType, primary_key: list[str] | None = None
) -> str:
    """Schema-derived CREATE TABLE (utf8mb4, like the reference's
    forced utf8 connections, app.go:41).

    String columns that participate in the PRIMARY KEY become
    VARCHAR(255) — MySQL rejects keys over TEXT/BLOB without a length
    (error 1170), so LONGTEXT is only used for non-key strings.
    """
    pk_set = set(primary_key or [])
    cols = []
    for f in schema.fields:
        ty = mysql_column_type(f.dataType)
        if f.name in pk_set and ty in ("LONGTEXT", "LONGBLOB"):
            ty = "VARCHAR(255)" if ty == "LONGTEXT" else "VARBINARY(255)"
        cols.append(f"  `{f.name}` {ty}" + ("" if f.nullable else " NOT NULL"))
    if primary_key:
        cols.append("  PRIMARY KEY (" + ", ".join(f"`{c}`" for c in primary_key) + ")")
    body = ",\n".join(cols)
    return (
        f"CREATE TABLE `{table}` (\n{body}\n) "
        "DEFAULT CHARSET=utf8mb4"
    )


def replication_statements(table: str, create_sql: str) -> list[str]:
    """The exact replay sequence of the reference
    (tablemeta.go:60-90): FK checks off → drop cascade → create."""
    return [
        "SET FOREIGN_KEY_CHECKS = 0",  # tablemeta.go:60-69
        f"drop table if exists `{table}` cascade",  # tablemeta.go:71-75
        create_sql,  # tablemeta.go:77-90 (verbatim SHOW CREATE output)
    ]


def replicate_ddl(
    table: str,
    connection_factory: Callable[[], object] | None,
    show_create_sql: str | None = None,
    schema: T.StructType | None = None,
    primary_key: list[str] | None = None,
) -> list[str]:
    """Replay DDL on the destination. Returns the statements executed.

    ``connection_factory`` must yield a DB-API connection; without one
    (this container has no MySQL client or server) the statement list
    is still built and returned for inspection, and execution raises.
    """
    if show_create_sql is None:
        if schema is None:
            raise ValueError("need show_create_sql or a schema")
        show_create_sql = create_table_sql(table, schema, primary_key)
    stmts = replication_statements(table, show_create_sql)
    if connection_factory is None:
        raise NotImplementedError(
            "verbatim DDL replay needs a live destination connection; "
            "statements built: " + "; ".join(s.split("\n")[0] for s in stmts)
        )
    conn = connection_factory()
    try:
        cur = conn.cursor()
        for s in stmts:
            cur.execute(s)
        conn.commit()  # tablemeta.go:91-94
    except Exception:
        conn.rollback()
        raise
    return stmts
