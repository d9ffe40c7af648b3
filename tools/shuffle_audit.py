"""Registry-wide MEASURED shuffle/spill audit.

`tools/plan_audit.py` checks plan SHAPE (no cartesian products, no
row-UDFs, pruned scans); this tool measures plan VOLUME: every
`queries()` entry is executed once and its executed-plan SQL metrics
(shuffle bytes written/read, spill, broadcast bytes, exchange counts —
see mysqldatasynctool_spark/plans/metrics.py) are summed and ranked.

Why volume deserves its own audit: at 100 TB the shuffle write is the
cluster's network+disk bill, and it is a plan x data quantity — the
same number on a quiet or a thrashing box. Ranking entries by
shuffle bytes PER scanned byte surfaces the operators whose cost grows
fastest with the corpus; a nonzero spill at fixture scale is an
early-warning sign that the same plan OOM-spills at cluster scale.

Execution is JVM-side (`queryExecution().toRdd().count()`): every row
of every operator materializes, nothing crosses to the driver.

Usage:
    python tools/shuffle_audit.py [--sf-dir /root/testdata/sf0.01]
        [--out SHUFFLE_AUDIT.json] [--names a,b,c] [--top 25]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mysqldatasynctool_spark.operators import (  # noqa: E402
    collect_registry,
    reset_trained_state,
    teardown_caches,
)
from mysqldatasynctool_spark.plans import executed_plan_metrics  # noqa: E402
from mysqldatasynctool_spark.session import get_spark  # noqa: E402


def audit_query(spark, fn, sf_dir: str) -> dict:
    """Execute one registry callable and return its plan-volume row."""
    df = fn(spark, sf_dir)
    t0 = time.monotonic()
    rows = df._jdf.queryExecution().toRdd().count()
    wall = round(time.monotonic() - t0, 3)
    m = executed_plan_metrics(df)
    m["result_rows"] = int(rows)
    m["wall_s"] = wall  # indicative only — single run, no probe bracket
    scanned = m.get("scan_files_bytes", 0)
    m["shuffle_per_scanned_byte"] = (
        round(m["shuffle_bytes_written"] / scanned, 4) if scanned else None
    )
    # production-shape volume: total minus the RoundRobin rebalance
    # class (fixture single-row-group physics — a many-row-group
    # production layout never runs those exchanges)
    m["operator_shuffle_bytes"] = (
        m["shuffle_bytes_written"] - m.get("rebalance_bytes", 0)
    )
    # entries carrying an in-query exact verification twin (a
    # within_tol column) measure operator + verification volume; at
    # production scale only the operator runs. The label keeps the
    # ranking honest: agg_approx_distinct's 5.9 MB at sf0.01 is 88%
    # countDistinct-twin expand — the HLL side alone shuffles 0.7 MB.
    m["verification_carrying"] = "within_tol" in df.columns
    return m


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--out", default=None, help="write the full JSON report here")
    ap.add_argument("--names", default=None, help="comma-separated subset")
    ap.add_argument("--top", type=int, default=25, help="table rows to print")
    ap.add_argument(
        "--no-gate",
        action="store_true",
        help="skip the volume-regression gate vs the committed "
        "SHUFFLE_AUDIT.json (tools/volume_gate.py)",
    )
    args = ap.parse_args()

    spark = get_spark(app_name="shuffle_audit")
    queries, _ = collect_registry()
    names = sorted(queries) if not args.names else args.names.split(",")

    by_query: dict[str, dict] = {}
    errors: dict[str, str] = {}
    for name in names:
        if name not in queries:
            errors[name] = "unknown query"
            continue
        # same per-entry cache hygiene as bench.py: no entry may
        # inherit another family's persisted frames, and the ANN
        # family's trained dicts reset so volumes include each entry's
        # own build work exactly once
        spark.catalog.clearCache()
        teardown_caches()
        reset_trained_state()
        try:
            by_query[name] = audit_query(spark, queries[name], args.sf_dir)
        except Exception as exc:  # noqa: BLE001 — isolate per entry
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]

    tot = {
        k: sum(m[k] for m in by_query.values())
        for k in (
            "shuffle_bytes_written",
            "shuffle_bytes_read",
            "spill_bytes",
            "broadcast_bytes",
            "num_shuffles",
            "num_broadcasts",
            "reused_exchanges",
        )
    }
    report = {
        "sf_dir": args.sf_dir,
        "n_queries": len(by_query),
        "totals": tot,
        "spillers": sorted(
            n for n, m in by_query.items() if m["spill_bytes"] > 0
        ),
        "verification_carrying": sorted(
            n for n, m in by_query.items() if m.get("verification_carrying")
        ),
        "by_query": by_query,
    }
    if errors:
        report["errors"] = errors

    ranked = sorted(
        by_query.items(),
        key=lambda kv: kv[1]["shuffle_bytes_written"],
        reverse=True,
    )
    print(
        f"{'shuffleMB':>10} {'read MB':>8} {'spillMB':>8} {'bcastMB':>8} "
        f"{'#sh':>3} {'#bc':>3} {'sh/scan':>8}  query"
    )
    for name, m in ranked[: args.top]:
        r = m["shuffle_per_scanned_byte"]
        vc = " [verification-carrying]" if m.get("verification_carrying") else ""
        print(
            f"{m['shuffle_bytes_written'] / 1e6:10.2f} "
            f"{m['shuffle_bytes_read'] / 1e6:8.2f} "
            f"{m['spill_bytes'] / 1e6:8.2f} "
            f"{m['broadcast_bytes'] / 1e6:8.2f} "
            f"{m['num_shuffles']:3d} {m['num_broadcasts']:3d} "
            f"{(f'{r:8.3f}' if r is not None else '       -')}  {name}{vc}"
        )
    print(
        f"\ntotals over {len(by_query)} entries: "
        f"shuffle {tot['shuffle_bytes_written'] / 1e6:.1f} MB written / "
        f"{tot['shuffle_bytes_read'] / 1e6:.1f} MB read, "
        f"spill {tot['spill_bytes'] / 1e6:.1f} MB, "
        f"broadcast {tot['broadcast_bytes'] / 1e6:.1f} MB, "
        f"{tot['num_shuffles']} shuffles / {tot['num_broadcasts']} "
        f"broadcasts / {tot['reused_exchanges']} reused exchanges"
    )
    if report.get("spillers"):
        print(f"spillers at fixture scale: {', '.join(report['spillers'])}")
    if errors:
        print(f"errors ({len(errors)}): {errors}")
    gate_rc = 0
    if not args.no_gate and not args.names:
        # regression GATE (VERDICT r17 item 4): compare this fresh
        # full-registry sweep against the COMMITTED baseline before
        # (over)writing it. Subset runs (--names) skip the gate — a
        # partial sweep can't stand in for the registry.
        from volume_gate import run_gate

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        baseline = os.path.join(repo, "SHUFFLE_AUDIT.json")
        if os.path.exists(baseline):
            import tempfile

            with tempfile.NamedTemporaryFile(
                "w", suffix=".json", delete=False
            ) as tf:
                json.dump(report, tf)
                fresh_path = tf.name
            try:
                gate_rc = run_gate(
                    fresh_path, baseline, os.path.join(repo, "CHANGELOG.md")
                )
            finally:
                os.unlink(fresh_path)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1, sort_keys=True)
        print(f"wrote {args.out}")
    return 1 if errors else gate_rc


if __name__ == "__main__":
    raise SystemExit(main())
