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

import re as _re
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
    # MySQL DATETIME stores wall-clock (no zone) — NTZ is the faithful
    # Catalyst source type for it (fixtures load timestamps as NTZ)
    T.TimestampNTZType: "DATETIME(6)",
    T.BinaryType: "LONGBLOB",
    T.StringType: "LONGTEXT",
}


# Catalyst → Derby column type — the sandbox-testable dialect (Derby
# is the JDBC database bundled with Spark). Lets the reference's replay
# sequence (tablemeta.go:60-94) execute against a REAL database in CI,
# validating round-trip type fidelity where live MySQL is unavailable.
_TO_DERBY: dict[type, str] = {
    T.ByteType: "SMALLINT",  # Derby has no TINYINT
    T.ShortType: "SMALLINT",
    T.IntegerType: "INTEGER",
    T.LongType: "BIGINT",
    T.FloatType: "REAL",  # Derby FLOAT defaults to FLOAT(53) = DOUBLE
    T.DoubleType: "DOUBLE",
    T.BooleanType: "BOOLEAN",
    T.DateType: "DATE",
    T.TimestampType: "TIMESTAMP",
    T.TimestampNTZType: "TIMESTAMP",  # Derby TIMESTAMP is zoneless
    T.BinaryType: "BLOB",
    T.StringType: "CLOB",
}


def mysql_column_type(dt: T.DataType) -> str:
    if isinstance(dt, T.DecimalType):
        return f"DECIMAL({dt.precision},{dt.scale})"
    if isinstance(dt, T.VarcharType):
        return f"VARCHAR({dt.length})"
    if isinstance(dt, (T.ArrayType, T.MapType, T.StructType)):
        return "JSON"  # nested types serialize as JSON text on MySQL
    return _TO_MYSQL.get(type(dt), "LONGTEXT")


def derby_column_type(dt: T.DataType) -> str:
    if isinstance(dt, T.DecimalType):
        return f"DECIMAL({dt.precision},{dt.scale})"
    if isinstance(dt, T.VarcharType):
        return f"VARCHAR({dt.length})"
    if isinstance(dt, (T.ArrayType, T.MapType, T.StructType)):
        return "CLOB"  # nested types serialize as JSON text
    return _TO_DERBY.get(type(dt), "CLOB")


#: dialect → (column-type fn, identifier quote, table-options suffix,
#: key-column type for unbounded text/binary, supports IF EXISTS +
#: session FK toggle)
_DIALECTS = {
    "mysql": (mysql_column_type, "`", " DEFAULT CHARSET=utf8mb4", {
        "LONGTEXT": "VARCHAR(255)",
        "LONGBLOB": "VARBINARY(255)",
    }, True),
    "derby": (derby_column_type, '"', "", {
        "CLOB": "VARCHAR(255)",
        "BLOB": "VARCHAR (255) FOR BIT DATA",
    }, False),
}


#: markers identifying a "table does not exist" error across the
#: dialects this layer emulates DROP IF EXISTS for: Derby SQLStates
#: 42Y55 (DROP on missing table) / 42X05 (table/view not found),
#: MySQL 1051 "Unknown table". The bare phrases "not found" /
#: "does not exist" are deliberately NOT matched on their own —
#: Derby XJ004 "Database 'x' not found" (bad dest path, missing
#: ;create=true) and wrapped driver-class-not-found errors contain
#: them, and classifying those as missing-table makes compareDb
#: silently report every table as DestIsExist=NO instead of failing.
#: The phrase only counts when the words "table" or "view" appear
#: shortly before it (Derby: "Table/View 'T' does not exist";
#: MySQL 1146: "Table 'db.t' doesn't exist").
_MISSING_TABLE_SQLSTATES = ("42y55", "42x05")
_MISSING_TABLE_PHRASES = ("unknown table",)

_TABLE_SCOPED_MISSING = _re.compile(
    r"\b(?:table|view)\b[^;]{0,80}?"
    r"(?:not found|does not exist|doesn't exist)"
)


def _is_missing_table_error(exc: Exception) -> bool:
    """True when a failed DROP means only that the table wasn't there.
    DB-API drivers wrap server errors differently, so this matches on
    SQLState/message text through the whole exception chain."""
    seen: list[str] = []
    cur = exc
    while cur is not None and len(seen) < 5:
        try:
            seen.append(str(cur).lower())
        except Exception:  # noqa: BLE001 — a __str__ that throws
            break
        # getattr with defaults: the chain crosses into py4j
        # JavaObjects, whose dynamic __getattr__ RAISES for absent
        # members (including __cause__) instead of returning None
        cur = getattr(cur, "__cause__", None) or getattr(
            cur, "java_exception", None
        )
    blob = " ".join(seen)
    if any(m in blob for m in _MISSING_TABLE_SQLSTATES):
        return True
    if any(m in blob for m in _MISSING_TABLE_PHRASES):
        return True
    return bool(_TABLE_SCOPED_MISSING.search(blob))


def create_table_sql(
    table: str,
    schema: T.StructType,
    primary_key: list[str] | None = None,
    dialect: str = "mysql",
) -> str:
    """Schema-derived CREATE TABLE (utf8mb4, like the reference's
    forced utf8 connections, app.go:41).

    String columns that participate in the PRIMARY KEY become
    VARCHAR(255) — MySQL rejects keys over TEXT/BLOB without a length
    (error 1170), so LONGTEXT is only used for non-key strings; same
    rule on Derby, whose PK columns additionally must be NOT NULL.
    """
    col_type, q, suffix, key_remap, _ = _DIALECTS[dialect]
    pk_set = set(primary_key or [])
    cols = []
    for f in schema.fields:
        ty = col_type(f.dataType)
        if f.name in pk_set:
            ty = key_remap.get(ty, ty)
        not_null = (not f.nullable) or (dialect == "derby" and f.name in pk_set)
        cols.append(f"  {q}{f.name}{q} {ty}" + (" NOT NULL" if not_null else ""))
    if primary_key:
        cols.append(
            "  PRIMARY KEY (" + ", ".join(f"{q}{c}{q}" for c in primary_key) + ")"
        )
    body = ",\n".join(cols)
    return f"CREATE TABLE {q}{table}{q} (\n{body}\n){suffix}"


def replication_statements(
    table: str, create_sql: str, dialect: str = "mysql"
) -> list[str]:
    """The exact replay sequence of the reference
    (tablemeta.go:60-90): FK checks off → drop cascade → create.

    Derby has no session-level FK toggle and no IF EXISTS, so its
    sequence is drop (missing-table error tolerated by the executor)
    → create."""
    _, q, _, _, full_seq = _DIALECTS[dialect]
    if not full_seq:
        return [f'drop table {q}{table}{q}', create_sql]
    return [
        "SET FOREIGN_KEY_CHECKS = 0",  # tablemeta.go:60-69
        f"drop table if exists {q}{table}{q} cascade",  # tablemeta.go:71-75
        create_sql,  # tablemeta.go:77-90 (verbatim SHOW CREATE output)
    ]


def replicate_ddl(
    table: str,
    connection_factory: Callable[[], object] | None,
    show_create_sql: str | None = None,
    schema: T.StructType | None = None,
    primary_key: list[str] | None = None,
    dialect: str = "mysql",
) -> list[str]:
    """Replay DDL on the destination. Returns the statements executed.

    ``connection_factory`` must yield a DB-API connection; without one
    (this container has no MySQL client or server) the statement list
    is still built and returned for inspection, and execution raises.
    On dialects without DROP IF EXISTS (Derby) the drop of a
    not-yet-existing table is tolerated — same net semantics as the
    reference's drop-if-exists (tablemeta.go:71-75).
    """
    if show_create_sql is None:
        if schema is None:
            raise ValueError("need show_create_sql or a schema")
        show_create_sql = create_table_sql(table, schema, primary_key, dialect)
    stmts = replication_statements(table, show_create_sql, dialect)
    if connection_factory is None:
        raise NotImplementedError(
            "verbatim DDL replay needs a live destination connection; "
            "statements built: " + "; ".join(s.split("\n")[0] for s in stmts)
        )
    drop_tolerated = not _DIALECTS[dialect][4]
    conn = connection_factory()
    try:
        cur = conn.cursor()
        for s in stmts:
            if drop_tolerated and s.startswith("drop table"):
                try:
                    cur.execute(s)
                except Exception as exc:
                    # tolerate ONLY missing-table (the IF EXISTS
                    # semantics being emulated); anything else — lock
                    # timeout, permissions, dependent FK — must surface,
                    # not silently leave stale data under the new load
                    if not _is_missing_table_error(exc):
                        conn.rollback()
                        raise
                    conn.rollback()  # clear the failed-statement txn state
                continue
            cur.execute(s)
        conn.commit()  # tablemeta.go:91-94
    except Exception:
        conn.rollback()
        raise
    return stmts
