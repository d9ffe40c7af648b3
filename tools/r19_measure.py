"""Round-19 optimization harness: isolate + time named registry queries
with the noop sink (guide §1.4) and dump their formatted plans
(guide §7.2) into plans/r19/.

Usage:
    python tools/r19_measure.py time  q1_pricing_summary dedup_minhash_lsh ...
    python tools/r19_measure.py plan  before q1_pricing_summary ...
    python tools/r19_measure.py plan  after  q1_pricing_summary ...

`time` prints per-query walls (warmup + 3 timed noop runs, median) with
the same cache hygiene as bench.py. `plan <tag>` writes
plans/r19/<name>_<tag>.txt with explain("formatted") — the committed
evidence the optimization round's claims are checked against.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mysqldatasynctool_spark.operators import (  # noqa: E402
    collect_registry,
    reset_trained_state,
    teardown_caches,
)
from mysqldatasynctool_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PLANS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r19"
)


def _median(xs):
    s = sorted(xs)
    m = len(s) // 2
    return s[m] if len(s) % 2 else round((s[m - 1] + s[m]) / 2, 3)


def main() -> None:
    mode = sys.argv[1]
    if mode == "plan":
        tag, names = sys.argv[2], sys.argv[3:]
    else:
        tag, names = "", sys.argv[2:]
    spark = get_spark(app_name="r19_measure")
    queries, _ = collect_registry()
    if names == ["HEADLINE"]:
        from bench import HEADLINE

        names = [n for n in HEADLINE if n in queries]
    os.makedirs(PLANS_DIR, exist_ok=True)
    out = {}
    for name in names:
        spark.catalog.clearCache()
        teardown_caches()
        reset_trained_state()
        fn = queries[name]
        if mode == "plan":
            df = fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            path = os.path.join(PLANS_DIR, f"{name}_{tag}.txt")
            with open(path, "w") as f:
                f.write(plan)
            print(f"wrote {path}")
            continue
        spark.sparkContext.setJobDescription(f"r19:{name}")
        runs = []
        for i in range(4):  # run 0 = warmup/cold, kept visible
            t0 = time.monotonic()
            fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
            runs.append(round(time.monotonic() - t0, 3))
        out[name] = {"cold": runs[0], "steady": _median(runs[1:]), "runs": runs}
        print(f"{name}: steady={out[name]['steady']} runs={runs}", flush=True)
    if mode == "time":
        import json

        print("R19_MEASURE: " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
