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


def _git_ts(*args: str) -> int | None:
    """Unix timestamp from `git log -1 --format=%ct <args>`, or None."""
    import subprocess

    try:
        out = subprocess.run(
            ["git", "log", "-1", "--format=%ct", *args],
            cwd=REPO,
            capture_output=True,
            text=True,
            timeout=30,
        ).stdout.strip()
        return int(out) if out else None
    except Exception:  # noqa: BLE001 — no git → skip staleness
        return None


def _func_ts(fn) -> int | None:
    """Newest commit timestamp touching the FUNCTION's own source
    span (git blame), not its whole module — so editing one query in
    a 1000-line operator file no longer marks its 18 siblings stale.

    Deliberate under-approximation: a change to a shared helper
    (fixtures.load, _dec, a module-level oracle constant) does not
    blame into the function span. That drift is covered by the local
    tri-scale simulator sweep after every edit session; this signal
    decides ROTATION PRIORITY, where function-granularity is the
    right risk ordering.
    """
    import inspect
    import subprocess

    try:
        lines, start = inspect.getsourcelines(fn)
        path = inspect.getsourcefile(fn)
    except (OSError, TypeError):
        return None
    if path is None:
        return None
    rel = os.path.relpath(path, REPO)
    try:
        out = subprocess.run(
            [
                "git",
                "blame",
                "-L",
                f"{start},{start + len(lines) - 1}",
                "--porcelain",
                "--",
                rel,
            ],
            cwd=REPO,
            capture_output=True,
            text=True,
            timeout=60,
        ).stdout
    except Exception:  # noqa: BLE001 — no git → fall back to module ts
        return None
    ts = [
        int(line.split()[1])
        for line in out.splitlines()
        if line.startswith("committer-time ")
    ]
    return max(ts) if ts else None


def main() -> int:
    from mysqldatasynctool_spark.operators import collect_registry

    queries, oracles = collect_registry()
    best: dict[str, str] = {}  # query -> "green" | "rows_only" | "red"
    last_green_rec: dict[str, str] = {}  # query -> newest green record file
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
            if verdict == "green":
                last_green_rec[name] = rnd  # sorted iteration → newest wins
        print(f"read {rnd}: {len(rec)} rows")

    green = [q for q in queries if best.get(q) == "green"]
    rows_only = [q for q in queries if best.get(q) == "rows_only"]
    red = [q for q in queries if best.get(q) == "red"]
    never = [q for q in queries if q not in best]

    # STALE-GREEN: the query's OWN function body changed in git AFTER
    # its newest green record landed — the green row validates code
    # that no longer exists. Function-granular via git blame (r7; was
    # module-granular, which marked all 19 siblings stale on any
    # single-query edit); falls back to the module timestamp when
    # blame can't resolve the span.
    stale: list[str] = []
    rec_ts_cache: dict[str, int | None] = {}
    file_ts_cache: dict[str, int | None] = {}
    for q in green:
        rnd = last_green_rec[q]
        if rnd not in rec_ts_cache:
            rec_ts_cache[rnd] = _git_ts("--", rnd)
        fts = _func_ts(queries[q])
        if fts is None:
            mod = sys.modules[queries[q].__module__].__file__
            rel = os.path.relpath(mod, REPO)
            if rel not in file_ts_cache:
                file_ts_cache[rel] = _git_ts("--", rel)
            fts = file_ts_cache[rel]
        rts = rec_ts_cache[rnd]
        if rts is not None and fts is not None and fts > rts:
            stale.append(q)

    print(f"\nregistry: {len(queries)} queries ({len(oracles)} oracle-backed)")
    print(f"driver-green (any round): {len(green)}")
    print(f"rows-only by design:      {len(rows_only)}  {rows_only}")
    if red:
        print(f"RED (latest-best):        {len(red)}  {red}")
    if never:
        print(f"NEVER driver-checked:     {len(never)}  {never}")
    if stale:
        print(
            f"STALE-GREEN (code changed after last green record): "
            f"{len(stale)}"
        )
        for q in stale:
            print(f"  {q}  (last green: {last_green_rec[q]})")

    # rows-only queries that NOW have an oracle registered: a fresh
    # driver row would upgrade them from rows-only to hash-green
    upgraded = [q for q in rows_only if q in oracles]
    if upgraded:
        print(f"rows-only but NOW oracle-backed (front-load): {upgraded}")

    # ready-to-paste rotation: never + red + newly-oracle-backed +
    # stale first, then greens oldest-record-first, capped at the
    # driver's 50-slot window
    ordered = [q for q in queries if q in never] + red
    ordered += [q for q in upgraded if q not in ordered]
    # stale re-checks oldest-green-first: an r01 green has survived the
    # most unvalidated module edits, so it is the riskiest row
    ordered += [
        q
        for q in sorted(stale, key=lambda q: last_green_rec[q])
        if q not in ordered
    ]
    rest = sorted(
        (q for q in green if q not in ordered),
        key=lambda q: last_green_rec[q],
    ) + [q for q in rows_only if q not in ordered]
    rotation = (ordered + rest)[:50]
    print(f"\nsuggested VERIFY_PRIORITY rotation ({len(rotation)} names):")
    for q in rotation:
        print(f'    "{q}",')
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
