"""Skew stress for the anomaly-zscore pair (r15): generate an events
corpus with ONE pathological hot user owning a large share of the
rows — the 100 TB failure mode the salted twin exists for — and time
``events_anomaly_zscore`` (per-user window: the hot user serializes
through one task) against ``events_anomaly_salted`` (hour-bucket salt
+ bounded carry), asserting result identity on the way.

Corpus (numpy.RandomState(seed)-deterministic): ``n_rows`` events over
``days`` days; ``hot_share`` of rows belong to user 1 (uniform over the
whole span — dense buckets, the regime the carry decomposition is
built for); the rest spread over ``n_users`` normal users. Values are
lognormal with occasional spikes so the z-score filter keeps a
non-trivial row set.

Standalone: python tools/anomaly_skew_stress.py [n_rows] [hot_share]
[runs] [--isolate]  (defaults 2_000_000 rows, 0.30 hot share — ~20 s
per variant on 32 threads). Prints one JSON line with walls and row
counts.

``--isolate`` (r16 verdict item 5) runs EACH VARIANT in its own fresh
subprocess/SparkSession over a shared corpus, so neither variant's
median inherits the other's session history (page-cache layout, JIT
state, shuffle-dir occupancy, storage-memory pressure): the r16 mixed-
order data showed salted samples [211, 130, 18] s after an unsalted
warm-up while the salted-only session had no such mode. The identity
check still runs once in the parent session. The per-variant entry
point is the internal ``--variant NAME --dir D`` mode.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_VARIANTS = ("unsalted", "salted")


def _variant_fns():
    from mysqldatasynctool_spark.operators.events import (
        events_anomaly_salted,
        events_anomaly_zscore,
    )

    return {"unsalted": events_anomaly_zscore, "salted": events_anomaly_salted}


def build_skewed_events(n_rows: int, hot_share: float, seed: int = 8) -> str:
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.RandomState(seed)
    n_hot = int(n_rows * hot_share)
    n_users = 5000
    user = np.concatenate(
        [
            np.ones(n_hot, dtype=np.int64),
            rng.randint(2, n_users + 2, size=n_rows - n_hot).astype(np.int64),
        ]
    )
    span_us = 30 * 24 * 3600 * 1_000_000
    base = np.int64(1_704_067_200_000_000)  # 2024-01-01 UTC, micros
    ts = base + rng.randint(0, span_us, size=n_rows).astype(np.int64)
    value = rng.lognormal(0.0, 1.0, size=n_rows)
    spikes = rng.rand(n_rows) < 0.01
    value[spikes] *= 25.0
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(1, n_rows + 1, dtype=np.int64),
            "user_id": user,
            "event_type": np.where(spikes, "purchase", "click"),
            "ts": ts.astype("datetime64[us]"),
            "value": np.round(value, 6),
        }
    )
    out_dir = tempfile.mkdtemp(prefix="anomaly_skew_")
    # bounded row groups (r16, same fix as ann/lsh_stress): pyarrow's
    # 1 Mi-row default gave this 4 M-row corpus only 4 row groups =
    # 4 scan tasks on a 32-core box. Both variants shared the layout,
    # so the r15 RELATIVE salting win stands; absolute walls were
    # scan-bounded.
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False),
        os.path.join(out_dir, "events.parquet"),
        row_group_size=100_000,
    )
    return out_dir


def _io_probe() -> float:
    """bench.py's disk probe (same file-size/fsync recipe) so the
    skew walls carry the same quiet-box evidence as bench records."""
    import bench  # repo root is on sys.path (header insert)

    return bench._io_probe()


def run_variant(spark, out_dir: str, name: str, runs: int = 1) -> dict:
    """Time ONE variant over an existing corpus. r18 (VERDICT item 3):
    every timed run is BRACKETED by the bench io probe and the first
    run is a WARMUP (fresh-JVM JIT + first parquet read measured 6-30x
    the steady wall in the isolated subprocesses — r17's contaminated
    medians were exactly this). The reported wall is the median of the
    post-warmup runs whose probe bracket stays <=2x the subprocess's
    pre-Spark idle probe; if fewer than 2 runs survive, the median of
    all post-warmup runs is reported and flagged. The unit the
    ``--isolate`` mode runs in its own subprocess."""
    fn = _variant_fns()[name]
    idle = _io_probe()
    samples: list = []
    brackets: list = []
    count = None
    for _ in range(max(1, runs) + 1):  # +1 = the warmup run
        p0 = _io_probe()
        t0 = time.monotonic()
        count = fn(spark, out_dir).count()
        wall = round(time.monotonic() - t0, 3)
        p1 = _io_probe()
        samples.append(wall)
        brackets.append([round(p0, 4), round(p1, 4)])
    timed = samples[1:]
    timed_brackets = brackets[1:]
    clean = [
        w
        for w, (a, b) in zip(timed, timed_brackets)
        if max(a, b) <= 2.0 * idle
    ]
    use = clean if len(clean) >= 2 else timed
    s = sorted(use)
    m = len(s) // 2
    wall = s[m] if len(s) % 2 else round((s[m - 1] + s[m]) / 2, 3)
    return {
        "variant": name,
        "wall": wall,
        "runs": timed,
        "warmup_run": samples[0],
        "io_idle": round(idle, 4),
        "io_brackets": timed_brackets,
        "burst_rejected": len(timed) - len(clean) if len(clean) >= 2 else 0,
        "stat": "median_clean" if len(clean) >= 2 else "median_all_degraded",
        "rows": count,
    }


def _run_variant_subprocess(out_dir: str, name: str, runs: int) -> dict:
    """Fresh python + fresh SparkSession for one variant — no session
    history shared with the other variant or the parent."""
    proc = subprocess.run(
        [
            sys.executable,
            os.path.abspath(__file__),
            "--variant",
            name,
            "--dir",
            out_dir,
            "--runs",
            str(runs),
        ],
        capture_output=True,
        text=True,
        timeout=3600,
    )
    for line in reversed(proc.stdout.splitlines()):
        if line.startswith("VARIANT_JSON: "):
            return json.loads(line[len("VARIANT_JSON: ") :])
    raise RuntimeError(
        f"variant subprocess {name!r} produced no VARIANT_JSON "
        f"(rc={proc.returncode}): {proc.stderr[-500:]}"
    )


def run_stress(
    spark,
    n_rows: int = 2_000_000,
    hot_share: float = 0.30,
    seed: int = 8,
    runs: int = 1,
    isolate: bool = False,
) -> dict:
    """``runs`` > 1 reports the MEDIAN wall per variant with the raw
    samples alongside (r16: single-sample walls on the sandbox box
    swing ±3× under disk bursts — one 4M/60% pair read 0.87× and its
    identical re-run 6.0×; a median-of-3 is the same discipline
    bench.py adopted in r11 for the same reason). ``isolate=True``
    times each variant in a fresh subprocess/SparkSession (r16 verdict
    item 5 — cross-variant session interference put a cold-start mode
    in mixed-order samples); the parent session only builds the corpus
    and runs the identity check."""
    out_dir = build_skewed_events(n_rows, hot_share, seed)
    try:
        report: dict = {
            "n_rows": n_rows,
            "hot_share": hot_share,
            "seed": seed,
            "isolation": "subprocess-per-variant" if isolate else "shared-session",
        }
        walls: dict = {}
        counts: dict = {}
        all_runs: dict = {}
        detail: dict = {}
        for name in _VARIANTS:
            row = (
                _run_variant_subprocess(out_dir, name, runs)
                if isolate
                else run_variant(spark, out_dir, name, runs)
            )
            walls[name] = row["wall"]
            counts[name] = row["rows"]
            all_runs[name] = row["runs"]
            detail[name] = {
                k: row[k]
                for k in (
                    "warmup_run",
                    "io_idle",
                    "io_brackets",
                    "burst_rejected",
                    "stat",
                )
                if k in row
            }
        report["runs"] = all_runs
        report["probe_detail"] = detail
        # identity on the skewed corpus, not just the fixture: compare
        # result hashes via a full subtract both ways (cheap relative
        # to the windows themselves)
        fns = _variant_fns()
        a = fns["unsalted"](spark, out_dir)
        b = fns["salted"](spark, out_dir)
        diff = a.exceptAll(b).count() + b.exceptAll(a).count()
        report.update(
            {
                "rows_flagged": counts,
                "wall_sec": walls,
                "speedup": round(walls["unsalted"] / walls["salted"], 3)
                if walls["salted"]
                else None,
                "result_identical": diff == 0,
            }
        )
        return report
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


def main() -> int:
    from mysqldatasynctool_spark.session import get_spark

    argv = sys.argv[1:]
    if "--variant" in argv:
        # internal per-variant entry point (fresh process = fresh
        # SparkSession): time one variant over an existing corpus
        name = argv[argv.index("--variant") + 1]
        out_dir = argv[argv.index("--dir") + 1]
        runs = int(argv[argv.index("--runs") + 1]) if "--runs" in argv else 1
        spark = get_spark(app_name=f"anomaly_skew_{name}")
        spark.sparkContext.setLogLevel("ERROR")
        row = run_variant(spark, out_dir, name, runs)
        print("VARIANT_JSON: " + json.dumps(row, sort_keys=True))
        return 0

    isolate = "--isolate" in argv
    pos = [a for a in argv if not a.startswith("--")]
    n_rows = int(pos[0]) if len(pos) > 0 else 2_000_000
    hot_share = float(pos[1]) if len(pos) > 1 else 0.30
    runs = int(pos[2]) if len(pos) > 2 else 1
    spark = get_spark(app_name="anomaly_skew_stress")
    spark.sparkContext.setLogLevel("ERROR")
    report = run_stress(
        spark, n_rows=n_rows, hot_share=hot_share, runs=runs, isolate=isolate
    )
    print("ANOMALY_SKEW_JSON: " + json.dumps(report, sort_keys=True))
    return 0 if report["result_identical"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
