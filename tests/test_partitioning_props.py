"""Property-based tests (hypothesis) for partition-predicate
generation — SURVEY.md §7 flags keyspace tiling as the riskiest
correctness property: every row must satisfy EXACTLY one predicate,
for any boundary set, any key width, any data distribution.

Evaluated with DuckDB (fast per-example SQL) rather than Spark so
hypothesis can run hundreds of examples; the Spark-side semantics of
the same predicate strings are covered by
tests/test_migration.py::test_composite_predicates_tile_keyspace.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from mysqldatasynctool_spark.plans.partitioning import (
    composite_pk_predicates,
    page_queries,
)

keys2 = st.tuples(st.integers(-1000, 1000), st.integers(-1000, 1000))
keys3 = st.tuples(
    st.integers(-50, 50), st.integers(-50, 50), st.integers(-50, 50)
)


def _tile_check(pk_cols, rows, boundaries):
    preds = composite_pk_predicates(pk_cols, boundaries)
    con = duckdb.connect()
    cols = ", ".join(pk_cols)
    values = ", ".join("(" + ", ".join(str(v) for v in r) + ")" for r in rows)
    con.execute(f"CREATE TABLE t({', '.join(c + ' BIGINT' for c in pk_cols)})")
    if rows:
        con.execute(f"INSERT INTO t({cols}) VALUES {values}")
    matches = con.execute(
        "SELECT " + " + ".join(f"CAST(({p}) AS INT)" for p in preds) + " AS m FROM t"
    ).fetchall()
    con.close()
    assert all(m[0] == 1 for m in matches), (
        f"tiling violated: {[m[0] for m in matches if m[0] != 1][:5]} "
        f"(boundaries={boundaries[:3]}...)"
    )
    return len(preds)


@settings(max_examples=150, deadline=None)
@given(
    rows=st.lists(keys2, min_size=0, max_size=60),
    boundary_pool=st.lists(keys2, min_size=0, max_size=10, unique=True),
)
def test_two_column_tiling(rows, boundary_pool):
    boundaries = sorted(set(boundary_pool))
    n = _tile_check(["a", "b"], rows, boundaries)
    assert n == len(boundaries) + 1


@settings(max_examples=75, deadline=None)
@given(
    rows=st.lists(keys3, min_size=0, max_size=40),
    boundary_pool=st.lists(keys3, min_size=0, max_size=6, unique=True),
)
def test_three_column_tiling(rows, boundary_pool):
    boundaries = sorted(set(boundary_pool))
    _tile_check(["x", "y", "z"], rows, boundaries)


@settings(max_examples=100, deadline=None)
@given(
    total_rows=st.integers(0, 100_000),
    page_size=st.integers(1, 50_000),
)
def test_page_queries_cover_rowspace(total_rows, page_size):
    """The emulated page SQLs must cover [0, total_rows) exactly, plus
    the reference's deliberate one trailing empty page."""
    qs = page_queries("t", ["id"], total_rows, page_size)
    pages = (total_rows + page_size - 1) // page_size
    assert len(qs) == pages + 1
    # offsets advance by exactly page_size and start at 0
    offsets = [int(q.split("LIMIT ")[1].split(",")[0]) for q in qs]
    assert offsets == [i * page_size for i in range(pages + 1)]
    assert offsets[-1] >= total_rows  # trailing page is empty


@pytest.mark.parametrize(
    "boundaries",
    [
        [(0, 0)],
        [(0, 0), (0, 1)],  # adjacent boundaries differing in last key
        [(-5, 100), (-5, 101), (0, -999)],
    ],
)
def test_adjacent_boundary_edges(boundaries):
    """Rows exactly ON boundaries land in exactly one partition."""
    rows = [b for b in boundaries] + [(b[0], b[1] + 1) for b in boundaries]
    _tile_check(["a", "b"], rows, boundaries)


def test_string_keys_quote_escaping():
    preds = composite_pk_predicates(["name"], [("O'Brien",)])
    assert "O''Brien" in preds[0]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(name VARCHAR)")
    con.execute("INSERT INTO t VALUES ('O''Brien'), ('A'), ('Z')")
    m = con.execute(
        "SELECT " + " + ".join(f"CAST(({p}) AS INT)" for p in preds) + " FROM t"
    ).fetchall()
    assert all(x[0] == 1 for x in m)


#: string keys incl. quotes/backslashes/unicode — the r5 string-PK
#: paging path must tile these exactly like integers
str_keys = st.tuples(
    st.text(
        alphabet=st.characters(
            blacklist_categories=("Cs",), blacklist_characters="\x00"
        ),
        min_size=0,
        max_size=8,
    ),
    st.integers(-100, 100),
)


def _tile_check_str(pk_cols, rows, boundaries):
    from mysqldatasynctool_spark.plans.partitioning import _sql_lit

    preds = composite_pk_predicates(pk_cols, boundaries)
    con = duckdb.connect()
    con.execute(f"CREATE TABLE t(a VARCHAR, b BIGINT)")
    for r in rows:
        con.execute("INSERT INTO t VALUES (?, ?)", list(r))
    matches = con.execute(
        "SELECT " + " + ".join(f"CAST(({p}) AS INT)" for p in preds) + " AS m FROM t"
    ).fetchall()
    con.close()
    assert all(m[0] == 1 for m in matches)
    return len(preds)


@settings(max_examples=100, deadline=None)
@given(
    rows=st.lists(str_keys, min_size=0, max_size=40),
    boundary_pool=st.lists(str_keys, min_size=0, max_size=8, unique=True),
)
def test_string_key_tiling(rows, boundary_pool):
    """Tiling must hold for (VARCHAR, BIGINT) composite keys — quotes
    and unicode in the boundary values must round-trip through
    _sql_lit without breaking exactly-one semantics.

    Caveat encoded here: SQL string comparison is collation-dependent,
    so boundaries must be sorted by the SAME collation the database
    compares with. DuckDB compares binary (codepoint) — matching
    Python's tuple sort — which is also why sample_boundaries sorts
    driver-side only for SPACING, never for correctness."""
    boundaries = sorted(set(boundary_pool))
    n = _tile_check_str(["a", "b"], rows, boundaries)
    assert n == len(boundaries) + 1
