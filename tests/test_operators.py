"""Oracle-gate tests for windows / setops / events operator modules.

Every oracle-backed query must hash-match DuckDB at sf0.01 AND return
a non-degenerate (>0 rows) result — a 0-row match is a trivial pass.
"""

from __future__ import annotations

import pytest

from mysqldatasynctool_spark.operators import events, setops, windows
from tests.conftest import assert_matches_oracle

CASES = [
    (mod, name)
    for mod in (windows, setops, events)
    for name in sorted(mod.ORACLES)
]


@pytest.mark.parametrize(
    "mod,name", CASES, ids=[name for _, name in CASES]
)
def test_matches_oracle(spark, duck, mod, name):
    df = mod.QUERIES[name](spark, "/root/testdata/sf0.01")
    assert df.count() > 0, f"{name} degenerate: 0 rows"
    assert_matches_oracle(df, mod.ORACLES[name], duck)
