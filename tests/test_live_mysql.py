"""Live-MySQL validation — the env-gated surface VERDICT r6 item 6
asks to make discoverable. Everything here is `-m live` (deselected by
default; see pytest.ini): it validates the MySQL-dialect behavior that
embedded Derby cannot — verbatim SHOW CREATE replay fidelity
(AUTO_INCREMENT / charsets, reference tablemeta.go:41-96) and a real
MySQL→MySQL migration with checksum verify.

Activation (README "Live-MySQL activation"):

    docker run -d --name graft-mysql -p 3306:3306 \
      -e MYSQL_ROOT_PASSWORD=graft \
      -e MYSQL_DATABASE=graft_src mysql:8
    # plus an empty dest schema:
    #   mysql -h127.0.0.1 -uroot -pgraft \
    #     -e 'CREATE DATABASE graft_dest'
    export SPARK_GRAFT_JARS=/path/to/mysql-connector-j-8.x.jar
    export SPARK_GRAFT_MYSQL_HOST=127.0.0.1
    export SPARK_GRAFT_MYSQL_USER=root
    export SPARK_GRAFT_MYSQL_PASSWORD=graft
    python -m pytest tests/test_live_mysql.py -m live -q
"""

from __future__ import annotations

import os

import pytest

from mysqldatasynctool_spark.config import Endpoint

pytestmark = pytest.mark.live

HOST = os.environ.get("SPARK_GRAFT_MYSQL_HOST")
PORT = int(os.environ.get("SPARK_GRAFT_MYSQL_PORT", "3306"))
USER = os.environ.get("SPARK_GRAFT_MYSQL_USER", "root")
PASSWORD = os.environ.get("SPARK_GRAFT_MYSQL_PASSWORD", "")
SRC_DB = os.environ.get("SPARK_GRAFT_MYSQL_SRC_DB", "graft_src")
DEST_DB = os.environ.get("SPARK_GRAFT_MYSQL_DEST_DB", "graft_dest")

SF = "/root/testdata/sf0.001"


def _endpoint(db: str) -> Endpoint:
    if not HOST:
        pytest.fail(
            "live-MySQL tests need SPARK_GRAFT_MYSQL_HOST (+USER/"
            "PASSWORD) and SPARK_GRAFT_JARS pointing at "
            "mysql-connector-j; see this file's docstring"
        )
    return Endpoint(
        host=HOST, port=PORT, database=db, username=USER, password=PASSWORD
    )


def test_live_verbatim_ddl_replay_fidelity(spark):
    """The reference's core DDL story (tablemeta.go:41-96): SHOW CREATE
    TABLE output from the source replays VERBATIM on the destination —
    AUTO_INCREMENT, charset/collation, and key clauses survive, which
    schema-derived DDL cannot guarantee. Compare the dest's own SHOW
    CREATE against the source's, modulo the AUTO_INCREMENT counter
    (a data artifact, not schema)."""
    import re

    from mysqldatasynctool_spark.ddl import replicate_ddl
    from mysqldatasynctool_spark.sources.jdbc import dbapi_connection

    src = dbapi_connection(spark, _endpoint(SRC_DB))
    cur = src.cursor()
    cur.execute("DROP TABLE IF EXISTS ddl_fidelity")
    cur.execute(
        "CREATE TABLE ddl_fidelity ("
        " id BIGINT NOT NULL AUTO_INCREMENT,"
        " name VARCHAR(64) CHARACTER SET utf8mb4 COLLATE utf8mb4_bin,"
        " payload BLOB,"
        " ts DATETIME(3) DEFAULT CURRENT_TIMESTAMP(3),"
        " PRIMARY KEY (id), KEY idx_name (name)"
        ") ENGINE=InnoDB DEFAULT CHARSET=utf8mb4"
    )
    cur.execute("INSERT INTO ddl_fidelity (name) VALUES ('a'), ('b')")
    src.commit()
    show = cur.execute("SHOW CREATE TABLE ddl_fidelity").fetchall()[0][1]
    src.close()

    replicate_ddl(
        "ddl_fidelity",
        lambda: dbapi_connection(spark, _endpoint(DEST_DB)),
        show_create_sql=show,
        dialect="mysql",
    )

    dest = dbapi_connection(spark, _endpoint(DEST_DB))
    got = dest.cursor().execute("SHOW CREATE TABLE ddl_fidelity").fetchall()[0][1]
    dest.close()
    strip = lambda s: re.sub(r"AUTO_INCREMENT=\d+ ?", "", s)  # noqa: E731
    assert strip(got) == strip(show)


def test_live_mysql_to_mysql_migrate_with_verify(spark):
    """The reference's default job on its actual dialect: fixture
    tables seeded into MySQL src, migrate_jdbc src→dest (partition
    plans from the PK, batched INSERT writes, checksum verify both
    sides) — every verdict row must be YES."""
    from mysqldatasynctool_spark.migrate import jsonify_nested, migrate_jdbc
    from mysqldatasynctool_spark.sources.fixtures import load
    from mysqldatasynctool_spark.sources.sinks import write_jdbc

    tables = {"region": ["r_regionkey"], "orders": ["o_orderkey"]}
    src_ep, dest_ep = _endpoint(SRC_DB), _endpoint(DEST_DB)
    for t in tables:
        write_jdbc(jsonify_nested(load(spark, SF, t)), src_ep, t, truncate=True)

    reports, verdict = migrate_jdbc(spark, src_ep, dest_ep, tables)
    assert all(r.ok for r in reports), [(r.table, r.error) for r in reports]
    rows = verdict.collect()
    assert rows and all(r.is_ok == "YES" for r in rows), rows


def test_live_batched_insert_rewrite_throughput(spark):
    """rewriteBatchedStatements=true (Endpoint.jdbc_url) is the JDBC
    analogue of the reference's hand-built multi-VALUES batches
    (root.go:435-469) — sanity-check it round-trips a 60k-row orders
    copy and the dest count matches. (A timing assertion would be
    box-dependent; count fidelity is the invariant.)"""
    from mysqldatasynctool_spark.sources.fixtures import load
    from mysqldatasynctool_spark.sources.jdbc import read_table
    from mysqldatasynctool_spark.sources.sinks import write_jdbc

    src = load(spark, SF, "orders")
    ep = _endpoint(DEST_DB)
    write_jdbc(src, ep, "orders_bulk_probe", truncate=True)
    got = read_table(spark, ep, "orders_bulk_probe").count()
    assert got == src.count()
