"""Shuffle-volume regression GATE (VERDICT r17 item 4).

`tools/shuffle_audit.py` measures plan volume; `tools/bench_compare.py`
labels "PLAN VOLUME CHANGE" rows — but until this gate nothing FAILED
when a rewrite quietly grew an operator's shuffle. At 100 TB the
shuffle write is the network bill, and it is plan x data — the same
number on any box — so a measured growth is a plan regression, not
noise, and deserves a red gate.

Rule: a registry entry REGRESSES when its fresh `shuffle_bytes_written`
at sf0.01 exceeds the committed SHUFFLE_AUDIT.json baseline by BOTH
  * more than ``--threshold`` (default 1.20, i.e. +20%) relatively, AND
  * more than ``--floor`` bytes absolutely (default 65536 — relative
    ratios on KB-scale shuffles are AQE/stats noise, not plans),
UNLESS the CHANGELOG carries an explicit waiver line naming it::

    volume-waiver: <query_name> — <why the growth is intended>

A bare prose mention is NOT a waiver (old rounds discuss most query
names somewhere); the ``volume-waiver:`` prefix is required so waiving
is a deliberate, greppable act. Entries with no baseline row (newly
registered) are reported as NEW, never failed. Shrinkage never fails.

Usage:
    python tools/volume_gate.py --fresh SHUFFLE_AUDIT_NEW.json \
        [--baseline SHUFFLE_AUDIT.json] [--changelog CHANGELOG.md]
exits 1 on any unwaived regression. `tools/shuffle_audit.py --out ...`
runs this gate automatically against the committed baseline.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DEFAULT_THRESHOLD = 1.20
DEFAULT_FLOOR = 65536


def waived_names(changelog_text: str) -> set[str]:
    """Names carrying an explicit ``volume-waiver: <name>`` line."""
    return set(
        re.findall(r"volume-waiver:\s*([A-Za-z0-9_]+)", changelog_text)
    )


def compare_audits(
    baseline: dict,
    fresh: dict,
    changelog_text: str = "",
    threshold: float = DEFAULT_THRESHOLD,
    floor: int = DEFAULT_FLOOR,
) -> dict:
    """Pure gate logic (unit-tested without Spark).

    Returns ``{"regressions": [...], "waived": [...], "new": [...],
    "shrunk": [...]}`` where each regression row carries name,
    old/new bytes and the ratio. Only ``regressions`` should fail CI.
    """
    base_q = baseline.get("by_query", baseline)
    fresh_q = fresh.get("by_query", fresh)
    waivers = waived_names(changelog_text)
    out: dict[str, list] = {
        "regressions": [],
        "waived": [],
        "new": [],
        "shrunk": [],
    }
    for name, row in sorted(fresh_q.items()):
        vn = int(row.get("shuffle_bytes_written", 0))
        if name not in base_q:
            out["new"].append({"name": name, "new_bytes": vn})
            continue
        vo = int(base_q[name].get("shuffle_bytes_written", 0))
        grew = vn > vo * threshold and vn - vo > floor
        rec = {
            "name": name,
            "old_bytes": vo,
            "new_bytes": vn,
            "ratio": round(vn / vo, 3) if vo else None,
        }
        if grew:
            out["waived" if name in waivers else "regressions"].append(rec)
        elif vo and vn < vo * (2 - threshold):
            out["shrunk"].append(rec)
    return out


def _fmt(rec: dict) -> str:
    r = f"{rec['ratio']:.2f}x" if rec.get("ratio") else "0 -> nonzero"
    return (
        f"  {rec['name']}: {rec['old_bytes'] / 1e6:.2f} -> "
        f"{rec['new_bytes'] / 1e6:.2f} MB ({r})"
    )


def run_gate(
    fresh_path: str,
    baseline_path: str,
    changelog_path: str,
    threshold: float = DEFAULT_THRESHOLD,
    floor: int = DEFAULT_FLOOR,
) -> int:
    if not os.path.exists(baseline_path):
        print(f"volume gate: no baseline at {baseline_path} — skipped")
        return 0
    baseline = json.load(open(baseline_path))
    fresh = json.load(open(fresh_path))
    text = (
        open(changelog_path).read() if os.path.exists(changelog_path) else ""
    )
    res = compare_audits(baseline, fresh, text, threshold, floor)
    if res["new"]:
        print(
            f"volume gate: {len(res['new'])} new entries (no baseline): "
            + ", ".join(r["name"] for r in res["new"])
        )
    if res["shrunk"]:
        print(f"volume gate: {len(res['shrunk'])} entries shrank >=20%:")
        for rec in res["shrunk"]:
            print(_fmt(rec))
    if res["waived"]:
        print(f"volume gate: {len(res['waived'])} regressions WAIVED in CHANGELOG:")
        for rec in res["waived"]:
            print(_fmt(rec))
    if res["regressions"]:
        print(
            f"volume gate: FAIL — {len(res['regressions'])} unwaived "
            f"shuffle regressions (> +{(threshold - 1) * 100:.0f}% and "
            f"> {floor} B) vs {os.path.basename(baseline_path)}; add a "
            "'volume-waiver: <name> — reason' line to CHANGELOG.md if "
            "the growth is intended:"
        )
        for rec in res["regressions"]:
            print(_fmt(rec))
        return 1
    print("volume gate: PASS — no unwaived shuffle regressions")
    return 0


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--fresh", required=True)
    ap.add_argument(
        "--baseline", default=os.path.join(REPO, "SHUFFLE_AUDIT.json")
    )
    ap.add_argument(
        "--changelog", default=os.path.join(REPO, "CHANGELOG.md")
    )
    ap.add_argument("--threshold", type=float, default=DEFAULT_THRESHOLD)
    ap.add_argument("--floor", type=int, default=DEFAULT_FLOOR)
    args = ap.parse_args()
    return run_gate(
        args.fresh, args.baseline, args.changelog, args.threshold, args.floor
    )


if __name__ == "__main__":
    raise SystemExit(main())
