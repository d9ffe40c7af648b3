"""Union the per-round driver CORRECTNESS_r*.json records against the
current registry: which queries have a green driver row from ANY
round, which are red, and which have never been checked.

The driver checks ~50 queries per round in registration order;
`operators/__init__.VERIFY_PRIORITY` front-loads the ones that need a
record, so green coverage accumulates across rounds. Run this at the
start of a round to decide the next rotation.

Usage: python tools/correctness_union.py
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    from mysqldatasynctool_spark.operators import collect_registry

    queries, oracles = collect_registry()
    best: dict[str, str] = {}  # query -> "green" | "rows_only" | "red"
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rec = json.load(open(path))
        rnd = os.path.basename(path)
        for name, row in rec.items():
            if row.get("err") == "no_oracle" and row.get("spark_rows") is not None:
                verdict = "rows_only"
            elif row.get("rows_match") and row.get("schema_match") and row.get("hash_match"):
                verdict = "green"
            else:
                verdict = "red"
            # keep the best verdict seen across rounds
            rank = {"green": 2, "rows_only": 1, "red": 0}
            if name not in best or rank[verdict] > rank[best[name]]:
                best[name] = verdict
        print(f"read {rnd}: {len(rec)} rows")

    green = [q for q in queries if best.get(q) == "green"]
    rows_only = [q for q in queries if best.get(q) == "rows_only"]
    red = [q for q in queries if best.get(q) == "red"]
    never = [q for q in queries if q not in best]
    print(f"\nregistry: {len(queries)} queries ({len(oracles)} oracle-backed)")
    print(f"driver-green (any round): {len(green)}")
    print(f"rows-only by design:      {len(rows_only)}  {rows_only}")
    if red:
        print(f"RED (latest-best):        {len(red)}  {red}")
    if never:
        print(f"NEVER driver-checked:     {len(never)}  {never}")
    print(
        "\nrotation hint: put NEVER + RED entries first in VERIFY_PRIORITY "
        "(keep it at exactly 50 names)."
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
