"""Measured shuffle/spill accounting from the EXECUTED physical plan.

Why this exists: wall-clock is a property of plan × data × box, and
rounds 14–17 proved the box term dominates cross-round comparisons on
a bursty disk (see CHANGELOG "the drift question"). SQL metrics are a
property of plan × data only — ``shuffleBytesWritten`` for a given
query at a given scale factor is deterministic up to compression
jitter, so a cross-round diff of measured shuffle volume separates
"the plan changed" from "the disk was slow" with no statistics at all.
At 100 TB the same numbers ARE the cost model: shuffle bytes is the
cluster's network+disk bill, spill bytes is the executor-memory
pressure signal, broadcast bytes bounds driver/executor memory for
map-side joins.

Mechanics: after an action has run, every node of the executed plan
carries SQLMetric accumulators (the numbers the Spark UI's SQL tab
shows). This module walks the finalized plan via the py4j handle —
through ``AdaptiveSparkPlanExec.executedPlan()`` (the AQE-final tree)
and ``*QueryStageExec.plan()`` (materialized stages) — and sums the
interesting counters. ``ReusedExchangeExec`` nodes share the original
exchange's accumulators, so they are counted as reuse events, not
re-summed (double-counting would misprice exchange reuse, which is
exactly the optimization the metric should reward).

The reference tool has no equivalent surface (its unit of work is one
INSERT batch, /root/reference/cmd/root.go:394-459); this is the
Spark-native observability the 100-TB contract needs.
"""

from __future__ import annotations

from typing import Any, Dict

from pyspark.sql import DataFrame

# SQLMetric name -> output key it accumulates into. Names verified on
# pyspark 4.1.x executed plans (ShuffleExchangeExec / BroadcastExchangeExec
# / FileSourceScanExec / HashAggregateExec|SortExec).
_SUM_METRICS = {
    "shuffleBytesWritten": "shuffle_bytes_written",
    "shuffleRecordsWritten": "shuffle_records_written",
    "localBytesRead": "shuffle_bytes_read",
    "remoteBytesRead": "shuffle_bytes_read",
    "spillSize": "spill_bytes",
    "numFiles": "scan_files",
    "filesSize": "scan_files_bytes",
}

_EMPTY: Dict[str, Any] = {
    "shuffle_bytes_written": 0,
    "shuffle_records_written": 0,
    "shuffle_bytes_read": 0,
    "spill_bytes": 0,
    "broadcast_bytes": 0,
    "scan_files": 0,
    "scan_files_bytes": 0,
    "num_shuffles": 0,
    "num_broadcasts": 0,
    "num_file_scans": 0,
    "reused_exchanges": 0,
    "rebalance_bytes": 0,
    "nodes": 0,
}


def _node_metrics(jplan) -> Dict[str, int]:
    """Read a plan node's SQLMetric map as {name: value}."""
    vals: Dict[str, int] = {}
    it = jplan.metrics().iterator()
    while it.hasNext():
        kv = it.next()
        vals[kv._1()] = kv._2().value()
    return vals


def _walk(jplan, acc: Dict[str, Any]) -> None:
    name = jplan.getClass().getSimpleName()
    acc["nodes"] += 1

    if name == "ReusedExchangeExec":
        # Shares the original exchange's accumulators — count the
        # reuse, do not re-sum (and do not recurse: the child IS the
        # original exchange node).
        acc["reused_exchanges"] += 1
        return

    vals = _node_metrics(jplan)
    for metric, key in _SUM_METRICS.items():
        if metric in vals and vals[metric] > 0:
            acc[key] += int(vals[metric])

    if name.startswith("FileSourceScan") or name.startswith("BatchScan"):
        # scan_files_bytes sums PER SCAN NODE: a table read through
        # two non-reused scans (self-join) contributes its bytes
        # twice. num_file_scans lets consumers (planVolume) flag
        # when the summed footprint may exceed the on-disk corpus.
        acc["num_file_scans"] += 1
    if name.startswith("ShuffleExchange"):
        acc["num_shuffles"] += 1
        # RoundRobin exchanges are REBALANCE physics, not operator
        # semantics: in this repo they come from the fixture
        # single-row-group repartition (sources/fixtures._rebalance),
        # which a production many-row-group layout never runs.
        # Attributed separately (still included in the totals) so
        # volume analysis can subtract the fixture-only share —
        # agg_weighted_median's 2.47 MB at sf0.01 is 60% this class.
        try:
            if "RoundRobinPartitioning" in jplan.outputPartitioning().toString():
                acc["rebalance_bytes"] += int(
                    vals.get("shuffleBytesWritten", 0) or 0
                )
        except Exception:
            pass  # partitioning accessor is informational only
    elif name.startswith("BroadcastExchange"):
        acc["num_broadcasts"] += 1
        # dataSize exists on ShuffleExchangeExec too (serialized map
        # output) — only the broadcast one is "broadcast bytes".
        acc["broadcast_bytes"] += int(vals.get("dataSize", 0) or 0)

    # Descend. AQE root and materialized query stages wrap their real
    # subtree behind accessors rather than children().
    if name == "AdaptiveSparkPlanExec":
        _walk(jplan.executedPlan(), acc)
        return
    if name.endswith("QueryStageExec"):
        _walk(jplan.plan(), acc)
        return

    children = jplan.children()
    for i in range(children.size()):
        _walk(children.apply(i), acc)

    # Scalar/IN/DPP subqueries hang off the node, not children().
    try:
        subs = jplan.subqueries()
        for i in range(subs.size()):
            _walk(subs.apply(i), acc)
    except Exception:
        pass  # not every node type exposes subqueries via py4j


def executed_plan_metrics(df: DataFrame) -> Dict[str, Any]:
    """Sum executed-plan SQL metrics for a materialized DataFrame.

    Call AFTER an action (collect/count/write) has run the exact
    ``df`` object you pass — the accumulators live on that plan
    instance. On a never-executed df the counters are simply 0 (the
    walk still succeeds and reports plan shape).

    Returns (all byte values are bytes)::

        shuffle_bytes_written / shuffle_records_written — map-output
            volume across every exchange: THE cluster network bill.
        shuffle_bytes_read — reducer-side fetch (local+remote).
        spill_bytes — sort/agg disk spill: executor-memory pressure.
        broadcast_bytes — serialized broadcast relations.
        scan_files / scan_files_bytes — post-pruning file-source scan
            footprint (file sizes, not column-pruned bytes).
        rebalance_bytes — the subset of shuffle_bytes_written moved
            by RoundRobin (rebalance) exchanges: fixture-layout
            physics here, not operator cost; subtract for the
            production-shape volume.
        num_shuffles / num_broadcasts / reused_exchanges / nodes —
            plan-shape counts from the EXECUTED tree (post-AQE, so an
            AQE broadcast-demotion shows up here even when the
            analyzed plan said SortMergeJoin).
    """
    acc = dict(_EMPTY)
    _walk(df._jdf.queryExecution().executedPlan(), acc)
    return acc
