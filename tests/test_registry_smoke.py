"""Sub-second registry smoke gate (VERDICT r9 item 6).

Round 9 was lost to a half-landed refactor whose only symptom was an
import-time NameError inside an oracle f-string: `import
__spark_entry__` raised, so the driver recorded 0/192 correctness rows
and the bench produced no timings. This gate is the cheapest possible
tripwire: it needs no SparkSession and no data, so it runs (and fails)
in well under a second, and `pytest tests/test_registry_smoke.py` is
the post-edit habit that makes that class of loss impossible to commit.
"""

import re


def test_registry_imports_and_is_complete():
    import __spark_entry__ as e

    queries = e.queries()
    oracles = e.oracle_sql()
    assert len(queries) >= 200, f"registry shrank: {len(queries)} queries"
    assert set(oracles) <= set(queries), "oracle for unknown query"
    missing = set(queries) - set(oracles)
    assert not missing, f"queries without oracles: {sorted(missing)}"
    for name, fn in queries.items():
        assert callable(fn), f"{name} is not callable"


def test_oracles_are_resolved_sql():
    """Every oracle is a non-empty SQL string with no leftover Python
    interpolation artifacts (a deleted constant inside an f-string
    raises at import, but a plain-string `{VAR}` survives silently —
    catch that too)."""
    import __spark_entry__ as e

    for name, sql in e.oracle_sql().items():
        assert isinstance(sql, str) and sql.strip(), f"{name}: empty oracle"
        assert re.search(r"\bSELECT\b", sql, re.I), f"{name}: not SQL"
        leftover = re.findall(r"\{[A-Za-z_][A-Za-z_0-9]*\}", sql)
        assert not leftover, f"{name}: uninterpolated placeholders {leftover}"
