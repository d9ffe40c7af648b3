"""Diff two bench records (BENCH_r{N}.json) on their common query set:
per-query delta, common-set totals, and noise-aware flagging.

Usage: python tools/bench_compare.py BENCH_r06.json BENCH_r07.json
       python tools/bench_compare.py r7 r8   # round shorthand

A bare ``r{N}`` token resolves to the repo-root record for that round,
preferring the builder's complete BENCH_LOCAL_r{N}.json (written by
bench.py itself each round) over the driver's BENCH_r{N}.json (whose
tail may be truncated).

Handles both record shapes the driver has produced: a plain bench JSON
line, or the wrapper {"tail": "<last stdout chunk>"} — in the wrapper
the authoritative per-query numbers are reconstructed from the "runs"
map (min of each run list), which survives truncation of the earlier
keys.

A query is flagged REGRESSED only when it slowed >25% AND the new time
exceeds every recorded run of the old record (i.e. it is outside the
old record's own observed noise band) — this box swings individual
runs 2-5x under contention, so a bare percentage is not evidence.
"""

from __future__ import annotations

import json
import sys


def _resolve(token: str) -> str:
    """Map ``r{N}`` to a repo-root record path (BENCH_LOCAL preferred);
    anything else is taken as a literal path."""
    import os
    import re

    m = re.fullmatch(r"r(\d+)", token)
    if not m:
        return token
    n = int(m.group(1))
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for pat in (f"BENCH_LOCAL_r{n:02d}.json", f"BENCH_r{n:02d}.json"):
        p = os.path.join(root, pat)
        if os.path.exists(p):
            return p
    raise SystemExit(f"no bench record found for round {n}")


def load_queries(path: str) -> tuple[dict[str, float], dict[str, list[float]]]:
    rec = json.load(open(path))
    if "queries" in rec and rec.get("queries"):
        runs = rec.get("runs", {}) or {}
        return dict(rec["queries"]), {k: list(v) for k, v in runs.items()}
    tail = rec.get("tail", "")
    # balanced-brace extraction of the "runs" map from a tail fragment
    i = tail.find('"runs": {')
    if i >= 0:
        start = tail.index("{", i)
        depth = 0
        for j in range(start, len(tail)):
            if tail[j] == "{":
                depth += 1
            elif tail[j] == "}":
                depth -= 1
                if depth == 0:
                    runs = json.loads(tail[start : j + 1])
                    return {k: min(v) for k, v in runs.items()}, runs
        raise SystemExit(f"{path}: unbalanced runs map")
    # the driver may truncate the tail INSIDE the runs map (r7 did) —
    # salvage every complete `"name": [floats]` fragment; the diff
    # then covers the visible common set and reports the rest as
    # added/removed (which is exactly why bench.py now commits the
    # full record per round as BENCH_LOCAL_r{N}.json)
    import re

    frags = re.findall(r'"([a-z0-9_]+)":\s*\[([0-9.,\s]+)\]', tail)
    runs = {
        k: [float(x) for x in v.split(",") if x.strip()] for k, v in frags
    }
    if not runs:
        raise SystemExit(f"{path}: no queries and no runs map in tail")
    print(
        f"note: {path} tail is truncated — recovered {len(runs)} "
        "per-query run lists from fragments"
    )
    return {k: min(v) for k, v in runs.items()}, runs


def _sidecar_plan_metrics(record_path: str) -> dict:
    """Plan-metrics fallback for records that predate the in-record
    `plan_metrics_by_query` field (r17's committed BENCH_LOCAL was
    written before the channel existed): look for
    BENCH_PLANMETRICS_r{N}.json next to the record — a
    tools/shuffle_audit.py sweep of the headline set reshaped to
    {"plan_metrics_by_query": {...}}. Volumes are plan x data, so a
    sidecar measured on a different day is still the same number."""
    import os
    import re

    m = re.search(r"BENCH(?:_LOCAL)?_r(\d+[a-z]?)\.json$", record_path)
    if not m:
        return {}
    # committed sidecars use the round string verbatim and unpadded
    # (BENCH_PLANMETRICS_r17.json); tolerate a zero-padded variant too
    # rather than silently dropping the volume channel (ADVICE r17)
    d = os.path.dirname(record_path) or "."
    n = m.group(1).rstrip("abcdefghijklmnopqrstuvwxyz")
    cands = [
        os.path.join(d, f"BENCH_PLANMETRICS_r{m.group(1)}.json"),
        os.path.join(d, f"BENCH_PLANMETRICS_r{n}.json"),
        os.path.join(d, f"BENCH_PLANMETRICS_r{int(n):02d}.json"),
    ]
    p = next((c for c in cands if os.path.exists(c)), None)
    if p is None:
        return {}
    try:
        rec = json.load(open(p))
        pm = rec.get("plan_metrics_by_query") or {}
        if pm:
            print(f"note: plan metrics for {os.path.basename(record_path)} "
                  f"read from sidecar {os.path.basename(p)}")
        return pm
    except Exception:  # noqa: BLE001 — sidecar is additive
        return {}


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    old_path, new_path = _resolve(sys.argv[1]), _resolve(sys.argv[2])
    old_q, old_runs = load_queries(old_path)
    new_q, new_runs = load_queries(new_path)
    # box-speed calibration context (r12+ records carry cpu_probe):
    # if the probe moved with the workload, attribute the delta to the
    # box before reading any per-query ratio as a plan change
    probes_new: dict[str, float] = {}
    probe_med = None
    io_probes_new: dict[str, float] = {}
    io_probe_med = None
    burst_new: dict[str, dict] = {}
    burst_old: dict[str, dict] = {}
    brackets_new: dict[str, list] = {}
    io_base_new = None
    stat_new: dict[str, str] = {}
    pm_new: dict[str, dict] = {}
    pm_old: dict[str, dict] = {}
    try:
        new_rec = json.load(open(new_path))
        # r17+: executed-plan SQL-metric sums — plan x data quantities,
        # deterministic up to compression jitter, so they split wall
        # drift into "plan volume changed" vs "environment" directly
        pm_new = (
            new_rec.get("plan_metrics_by_query")
            or _sidecar_plan_metrics(new_path)
        )
        # r17+: the bench statistic rejects burst-bracketed samples and
        # records the rejections — consume them so cross-round deltas
        # auto-exonerate disk bursts instead of reading them as plans
        burst_new = new_rec.get("burst_rejections") or {}
        brackets_new = new_rec.get("io_bracket_by_run") or {}
        io_base_new = new_rec.get("io_probe_baseline")
        stat_new = new_rec.get("stat_by_query") or {}
        probes_new = new_rec.get("probe_by_query") or {}
        if probes_new:
            vals = sorted(probes_new.values())
            m = len(vals) // 2
            # true median for even counts too (r12 advice: vals[n//2]
            # over-picks the upper middle and skews burst attribution)
            probe_med = (
                vals[m] if len(vals) % 2 else (vals[m - 1] + vals[m]) / 2
            )
        # NEW-record io extraction lives ABOVE old-record parsing for
        # the same reason probes_new does: a malformed OLD record must
        # not swallow the new record's disk-burst evidence
        io_probes_new = new_rec.get("io_probe_by_query") or {}
        if io_probes_new:
            vals = sorted(io_probes_new.values())
            m = len(vals) // 2
            io_probe_med = (
                vals[m] if len(vals) % 2 else (vals[m - 1] + vals[m]) / 2
            )
        old_rec = json.load(open(old_path))
        pm_old = (
            old_rec.get("plan_metrics_by_query")
            or _sidecar_plan_metrics(old_path)
        )
        burst_old = old_rec.get("burst_rejections") or {}
        so = old_rec.get("query_stat", "min_of_runs(pre-r12)")
        sn = new_rec.get("query_stat", "min_of_runs(pre-r12)")
        if so != sn:
            print(
                f"note: statistic changed {so} -> {sn} — medians read "
                "slightly above minima at identical plans"
            )
        po = old_rec.get("cpu_probe")
        pn = new_rec.get("cpu_probe")
        if po and pn:
            ro = (po["start"] + po["end"]) / 2
            rn = (pn["start"] + pn["end"]) / 2
            print(
                f"cpu probe (64 MiB md5): {ro:.3f}s -> {rn:.3f}s "
                f"({(rn / ro - 1) * 100:+.1f}% box-speed shift)"
            )
        # disk-speed bracket (r16+ records carry io_probe): the r15
        # drift hid here — I/O-heavy entries slowed 30-50% while the
        # CPU probe stayed flat. Records from before r16 simply skip
        # the line (field absent), keeping old-vs-new comparisons
        # readable.
        io_o = old_rec.get("io_probe")
        io_n = new_rec.get("io_probe")
        if io_n:
            if io_o:
                ro = (io_o["start"] + io_o["end"]) / 2
                rn = (io_n["start"] + io_n["end"]) / 2
                print(
                    f"io probe (16 fsync + cold 16 MiB read): "
                    f"{ro:.3f}s -> {rn:.3f}s "
                    f"({(rn / ro - 1) * 100:+.1f}% disk-speed shift)"
                )
            else:
                print(
                    "io probe (new record only): "
                    f"start {io_n['start']:.3f}s end {io_n['end']:.3f}s"
                    " — no old-record bracket to compare"
                )
        # single-row-group fixture tax (r17+ records carry layout_ab):
        # a cross-round move in the scan-heavy block should be read
        # next to the layout ratio, not as plan drift
        la_o = (old_rec.get("layout_ab") or {}).get("median_ratio")
        la_n = (new_rec.get("layout_ab") or {}).get("median_ratio")
        if la_n is not None:
            print(
                "layout tax (driver rg1 vs bounded-rg median ratio): "
                + (f"{la_o}x -> " if la_o is not None else "")
                + f"{la_n}x"
            )
        # core-count bracket (r18+ records carry `cpus`): walls are
        # NOT comparable across core counts (fixture-scale runs are
        # task-scheduling-bound — the 8-core r18c total BEATS the
        # 32-core one), and raw shuffle bytes differ by the fixture
        # rebalance exchange, which only fires above its partition
        # threshold. Volume verdicts below go rebalance-net whenever
        # both records carry the split, which makes them hold across
        # core counts too.
        cc_o, cc_n = old_rec.get("cpus"), new_rec.get("cpus")
        if cc_o is not None and cc_n is not None and cc_o != cc_n:
            print(
                f"CORE COUNTS DIFFER ({cc_o} -> {cc_n}): wall deltas "
                "are not comparable; read only the rebalance-net "
                "volume channel"
            )
    except Exception:  # noqa: BLE001 — context line is additive
        pass
    common = sorted(set(old_q) & set(new_q))
    t_old = sum(old_q[k] for k in common)
    t_new = sum(new_q[k] for k in common)
    print(
        f"common set ({len(common)} queries): "
        f"{t_old:.1f}s -> {t_new:.1f}s ({(t_new / t_old - 1) * 100:+.1f}%)"
    )
    # shuffle-volume totals over the common set (r17+ both sides): the
    # wall total above is plan x data x box; this one is plan x data
    def _vol_pair(o: dict, n: dict) -> tuple:
        """(old, new, net) volume for one query. Production-shape
        (written minus RoundRobin rebalance — fixture-layout physics,
        same subtraction shuffle_audit.py makes, and the only form
        that holds across CORE COUNTS: the rebalance exchange fires
        only above its partition threshold, so raw bytes differ ~100x
        between an 8- and a 32-core record of identical code) — but
        ONLY when BOTH records carry the rebalance split (r18+);
        an asymmetric subtraction against an r17-era record would
        fabricate exactly the false deltas this channel exists to
        rule out. Cross-core caveat: netting removes the FIXTURE term
        only; AQE legitimately re-plans at different core counts
        (e.g. q3 runs 3 shuffles at 32 cores, 2 at 8 after a
        broadcast conversion) and those remaining deltas are real
        plan differences the flags SHOULD surface."""
        net = "rebalance_bytes" in o and "rebalance_bytes" in n
        vo = o.get("shuffle_bytes_written", 0)
        vn = n.get("shuffle_bytes_written", 0)
        if net:
            vo -= o.get("rebalance_bytes", 0)
            vn -= n.get("rebalance_bytes", 0)
        return vo, vn, net

    pm_common = [k for k in common if k in pm_new and k in pm_old]
    if pm_common:
        pairs = [_vol_pair(pm_old[k], pm_new[k]) for k in pm_common]
        sb_old = sum(p[0] for p in pairs)
        sb_new = sum(p[1] for p in pairs)
        all_net = all(p[2] for p in pairs)
        if sb_old:
            print(
                f"shuffle volume ({len(pm_common)} queries with plan "
                f"metrics): {sb_old / 1e6:.1f} MB -> {sb_new / 1e6:.1f} MB "
                f"({(sb_new / sb_old - 1) * 100:+.1f}%) — box-immune"
                + (", net of fixture rebalance" if all_net else "")
            )
    added = sorted(set(new_q) - set(old_q))
    gone = sorted(set(old_q) - set(new_q))
    if added:
        print(f"added ({len(added)}): {', '.join(added)}")
    if gone:
        print(f"removed ({len(gone)}): {', '.join(gone)}")
    def _volume_flags(k: str) -> str:
        """PLAN VOLUME / PLAN SHAPE verdicts from the box-immune
        metrics — computed independently of the wall delta so a plan
        regression that barely moves the fixture wall still prints
        (the whole point of the channel). Rows whose metrics price
        only the post-sink result sort (streaming entries,
        `post_sink_only`) get no volume verdicts — their cost signal
        is streaming_state_by_query, not exchange bytes."""
        if k not in pm_new or k not in pm_old:
            return ""
        if pm_new[k].get("post_sink_only") or pm_old[k].get("post_sink_only"):
            return ""
        s = ""
        vo, vn, _ = _vol_pair(pm_old[k], pm_new[k])
        # absolute noise floor (r18): two SAME-CODE runs of
        # similarity_lsh_bucketed measured 0.01 vs 0.15 MB net at
        # sf0.1 (AQE partition-count wobble on a kilobyte-scale
        # exchange), which the ratio test amplifies to "+1027%".
        # Sub-quarter-MB volumes carry no plan signal at this scale;
        # a genuine regression that grows PAST the floor still fires
        # (the test below keys on max(vo, vn)).
        if max(vo, vn) < 250_000:
            vo = vn = 0
        if vo == 0 and vn > 0:
            # a shuffle APPEARED (e.g. an AQE broadcast demotion) —
            # the case the flag most wants to explain; '+inf%' would
            # bury it in formatting noise (ADVICE r17)
            s += (
                f" [PLAN VOLUME CHANGE: shuffle appeared "
                f"(0 -> {vn / 1e6:.2f} MB)]"
            )
        elif max(vo, vn) > 0:
            vr = vn / vo
            if not 0.8 <= vr <= 1.2:
                s += (
                    f" [PLAN VOLUME CHANGE: shuffle "
                    f"{vo / 1e6:.2f} -> {vn / 1e6:.2f} MB"
                    f" ({(vr - 1) * 100:+.0f}%)]"
                )
        ns_o = pm_old[k].get("num_shuffles")
        ns_n = pm_new[k].get("num_shuffles")
        if ns_o is not None and ns_n is not None and ns_o != ns_n:
            s += f" [PLAN SHAPE CHANGE: {ns_o} -> {ns_n} shuffles]"
        return s

    rows = sorted(common, key=lambda k: old_q[k] - new_q[k])
    print(f"\n{'delta':>8} {'ratio':>6}  query")
    for k in rows:
        d = new_q[k] - old_q[k]
        vol_flag = _volume_flags(k)
        if abs(d) < 0.15 and not vol_flag:
            continue
        ratio = new_q[k] / old_q[k] if old_q[k] else float("inf")
        regressed = (
            ratio > 1.25
            and k in old_runs
            and new_q[k] > max(old_runs[k])
        )
        flag = "  REGRESSED (outside old noise band)" if regressed else ""
        # burst attribution: the new record samples box speed right
        # before each query — a flagged row whose own sample ran >33%
        # over the run's median probe was measured DURING a host
        # contention burst, not after a plan change
        if (
            regressed
            and probe_med
            and probes_new.get(k, 0) > 1.33 * probe_med
        ):
            flag += f" [box burst during sample: probe {probes_new[k]:.3f}s vs median {probe_med:.3f}s]"
        # same attribution for the DISK channel — the one the CPU
        # probe is blind to (r15's entire drift was this shape)
        if (
            regressed
            and io_probe_med
            and io_probes_new.get(k, 0) > 1.5 * io_probe_med
        ):
            flag += (
                f" [disk burst during sample: io probe "
                f"{io_probes_new[k]:.3f}s vs median {io_probe_med:.3f}s]"
            )
        # the CPU probe cannot see I/O-side bursts; the run arrays can:
        # if the new record's BEST run still lands inside the old
        # record's observed band, the plan still reaches its old speed
        # and only the sampling around it was inflated
        if (
            regressed
            and k in new_runs
            and k in old_runs
            and new_runs[k]
            and old_runs[k]
            and min(new_runs[k]) <= max(old_runs[k])
        ):
            flag += (
                f" [best run {min(new_runs[k]):.2f}s inside old band "
                f"(max {max(old_runs[k]):.2f}s) — sampling, not plan]"
            )
        # burst-suppression labels (r17): the record's own statistic
        # dropped these samples — the printed number is already clean
        # of them, and the rejection is visible here, not silent
        for tag, burst in (("new", burst_new), ("old", burst_old)):
            if k in burst:
                flag += (
                    f" [burst-suppressed in {tag} record: rejected runs "
                    f"{burst[k]['rejected_runs']} "
                    f"walls {burst[k].get('rejected_walls')}]"
                )
        # plan-volume verdicts (r17+ both sides): shuffle bytes are a
        # property of plan x data, not the box — a regressed wall whose
        # shuffle volume is unchanged is environment by construction; a
        # changed volume IS a plan change regardless of wall noise
        # (computed above the wall gate so it prints even on rows whose
        # fixture wall barely moved)
        flag += vol_flag
        if (
            regressed
            and not vol_flag
            and k in pm_new
            and k in pm_old
            and not pm_new[k].get("post_sink_only")
            and not pm_old[k].get("post_sink_only")
        ):
            vo, vn, _ = _vol_pair(pm_old[k], pm_new[k])
            if max(vo, vn) > 0:
                vr = vn / vo if vo else float("inf")
                flag += (
                    f" [plan volume unchanged (shuffle "
                    f"{vn / 1e6:.2f} MB, {(vr - 1) * 100:+.1f}%) — "
                    "environment suspected]"
                )
        # whole-window degradation: every sample the new statistic KEPT
        # was still bracketed by a >2x-idle disk (the min-kept
        # fallback) — the delta is the disk's, not the plan's
        if regressed and io_base_new and brackets_new.get(k):
            rej = set(burst_new.get(k, {}).get("rejected_runs", []))
            # COLD_STEADY entries exclude run0 from their statistic
            # BEFORE the burst filter sees it, so rejected_runs can
            # never contain 0 — a quiet cold bracket must not mask
            # whole-window degradation of the steady samples the
            # number was actually computed from
            if stat_new.get(k, "").startswith("steady_median_excl_cold_run0"):
                rej.add(0)
            kept_br = [
                max(b)
                for i, b in enumerate(brackets_new[k])
                if i not in rej
            ]
            if kept_br and min(kept_br) > 2 * io_base_new:
                flag += (
                    " [disk degraded across ALL kept samples"
                    f" (min bracket {min(kept_br):.3f}s vs idle"
                    f" {io_base_new:.3f}s) — attributable to disk,"
                    " not plan]"
                )
        print(f"{d:+8.3f} {ratio:5.2f}x  {k}{flag}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
