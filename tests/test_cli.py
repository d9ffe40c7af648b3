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
