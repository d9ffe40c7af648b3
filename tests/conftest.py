"""Shared pytest fixtures: one SparkSession per test session, plus the
local DuckDB-oracle comparison gate mirroring the driver's check
(row count + column names + order-insensitive value comparison)."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mysqldatasynctool_spark.session import get_spark
from mysqldatasynctool_spark.sources.fixtures import TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    cpus = os.environ.get("SPARK_GRAFT_TEST_CPUS", "8")
    s = get_spark(app_name="tests", master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for sf_dir in {SF_DIR, SF_SMALL}:
        schema = sf_dir.rstrip("/").rsplit("/", 1)[-1].replace(".", "_")
        con.execute(f"CREATE SCHEMA IF NOT EXISTS {schema}")
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {schema}.{t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
    yield con
    con.close()


def _norm(v):
    """Normalize a cell for cross-engine comparison."""
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # exact float identity is the goal; repr keeps full precision
        return repr(v)
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    return v


def rows_key(cols, rows):
    """Order-insensitive multiset of rows with columns sorted by name."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_norm(r[i]) for i in order) for r in rows),
        key=repr,
    )


def assert_matches_oracle(spark_df, sql, duck, sf_dir=SF_DIR):
    """The local stand-in for the driver's CORRECTNESS gate."""
    schema = sf_dir.rstrip("/").rsplit("/", 1)[-1].replace(".", "_")
    duck.execute(f"SET schema '{schema}'")
    oracle = duck.execute(sql)
    o_cols = [d[0] for d in oracle.description]
    o_rows = oracle.fetchall()

    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]

    assert sorted(s_cols) == sorted(o_cols), f"columns differ: {s_cols} vs {o_cols}"
    assert len(s_rows) == len(o_rows), f"row count differs: {len(s_rows)} vs {len(o_rows)}"
    sk = rows_key(s_cols, s_rows)
    ok = rows_key(o_cols, o_rows)
    mismatches = [(a, b) for a, b in zip(sk, ok) if a != b]
    if mismatches:
        # dump BOTH full sides for post-mortem (zip misalignment after
        # one divergent row makes the inline "first 3" misleading —
        # the SET difference in the dump is the real signal)
        import json
        import tempfile

        fd, dump = tempfile.mkstemp(prefix="oracle_mismatch_", suffix=".json")
        with open(fd, "w") as f:
            json.dump(
                {
                    "spark_only": [repr(r) for r in set(sk) - set(ok)],
                    "oracle_only": [repr(r) for r in set(ok) - set(sk)],
                    "spark": [repr(r) for r in sk],
                    "oracle": [repr(r) for r in ok],
                },
                f,
                indent=1,
            )
        raise AssertionError(
            f"{len(mismatches)} zip-misaligned rows; set diff: "
            f"{len(set(sk) - set(ok))} spark-only / "
            f"{len(set(ok) - set(sk))} oracle-only; full dump: {dump}; "
            f"first 3: {mismatches[:3]}"
        )
