"""CSV / JSON-lines source round-trips + corrupt-record quarantine."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from mysqldatasynctool_spark.sources.files import (
    CORRUPT_COL,
    read_csv,
    read_jsonl,
    write_csv,
    write_jsonl,
)
from mysqldatasynctool_spark.sources.fixtures import load

SF = "/root/testdata/sf0.001"

NATION_SCHEMA = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]
)


def test_csv_roundtrip(spark, tmp_path):
    nation = load(spark, SF, "nation")
    path = str(tmp_path / "nation_csv")
    write_csv(nation, path)
    back = read_csv(spark, path, NATION_SCHEMA).drop(CORRUPT_COL)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, nation.collect()))


def test_jsonl_roundtrip(spark, tmp_path):
    nation = load(spark, SF, "nation")
    path = str(tmp_path / "nation_json")
    write_jsonl(nation, path)
    back = read_jsonl(spark, path, NATION_SCHEMA).drop(CORRUPT_COL)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, nation.collect()))


def test_corrupt_records_quarantined_not_dropped(spark, tmp_path):
    p = tmp_path / "bad.jsonl"
    p.write_text(
        '{"n_nationkey": 1, "n_name": "A", "n_regionkey": 0}\n'
        "THIS IS NOT JSON\n"
        '{"n_nationkey": 2, "n_name": "B", "n_regionkey": 1}\n'
    )
    df = read_jsonl(spark, str(p), NATION_SCHEMA)
    rows = df.collect()
    assert len(rows) == 3  # nothing silently dropped
    bad = [r for r in rows if r[CORRUPT_COL] is not None]
    assert len(bad) == 1 and "NOT JSON" in bad[0][CORRUPT_COL]
    # caveat pinned here: filtering on the corrupt column then count()
    # lets column pruning re-parse with an empty schema and count raw
    # lines — materialize first (files.py documents this)
    good = [r for r in rows if r[CORRUPT_COL] is None]
    assert len(good) == 2 and {r.n_name for r in good} == {"A", "B"}
