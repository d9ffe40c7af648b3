"""Streaming-state observability: the micro-batch counterpart of
``plans/metrics.py``.

A batch plan's cost signal is shuffle volume; a streaming job's is
STATE — rows held, memory used, watermark eviction keeping both
bounded. Structured Streaming already reports all of it per
micro-batch (``StreamingQueryProgress.stateOperators``: the numbers
the reference tool has no analogue for, since its unit of work is a
finite INSERT loop); this module reduces a query's progress history to
the few numbers an operator watches at 100 TB:

- throughput (input rows, processed rows/s, batch durations),
- per-state-operator extent (rows total, memory, shuffle partitions),
- eviction evidence (rows removed + rows dropped by watermark), and
- the one derived WARNING that matters: state rows never shrinking
  (net growth, plateaus allowed — no-data micro-batches are routine)
  across batches with ZERO eviction observed — the
  missing/ineffective-watermark signature that ends in an executor
  OOM at scale (a fixed corpus drained in few batches legitimately
  grows state, hence the minimum-batch guard).

Session-sizing loop: ``size_state_partitions(rows_per_trigger)``
(jobs.py) picks the partition count BEFORE first start from the
expected volume; this report measures what the state actually did, so
the next deployment's ``rows_per_trigger`` estimate is data, not a
guess.
"""

from __future__ import annotations

from typing import Any, Dict, List

#: batches needed before monotone state growth counts as evidence —
#: below this a bounded backfill legitimately grows state every batch
MIN_BATCHES_FOR_GROWTH_SIGNAL = 3


def _as_dict(p: Any) -> Dict[str, Any]:
    """Normalize one progress entry: dict | StreamingQueryProgress
    (asDict) | object with a .json payload."""
    if isinstance(p, dict):
        return p
    try:
        return p.asDict()
    except Exception:
        import json

        raw = p.json() if callable(getattr(p, "json", None)) else p.json
        return json.loads(raw)


def _progress_dicts(src: Any) -> List[Dict[str, Any]]:
    """Accept a StreamingQuery (recentProgress — retained after
    stop()) or an explicit list of progress entries."""
    if hasattr(src, "recentProgress"):
        src = src.recentProgress
    return [_as_dict(p) for p in src]


def progress_report(src: Any) -> Dict[str, Any]:
    """Reduce a streaming query's progress history to an ops report.

    Returns::

        n_batches, input_rows, avg_processed_rows_per_s,
        max_batch_duration_ms, last_watermark,
        state_operators: [{operator, rows_total_last, rows_updated,
            rows_removed, rows_dropped_by_watermark,
            memory_used_bytes_max, num_shuffle_partitions,
            rows_total_series}],
        warnings: [..]

    ``rows_total_series`` is kept verbatim (one int per batch) — it is
    the raw evidence behind the growth warning, same discipline as the
    bench record keeping every raw run.
    """
    ps = _progress_dicts(src)
    if not ps:
        # full key set even when empty — consumers diff these records
        # across rounds, and a schema that depends on capture success
        # reads as spurious drift
        return {
            "n_batches": 0,
            "input_rows": 0,
            "avg_processed_rows_per_s": None,
            "max_batch_duration_ms": 0,
            "last_watermark": None,
            "state_operators": [],
            "warnings": [],
        }
    rates = [
        float(p["processedRowsPerSecond"])
        for p in ps
        if p.get("processedRowsPerSecond")
    ]
    # per-operator series keyed by position (operator order is stable
    # within one query's lifetime)
    n_ops = max(len(p.get("stateOperators") or []) for p in ps)
    ops: List[Dict[str, Any]] = []
    warnings: List[str] = []
    for i in range(n_ops):
        rows_series: List[int] = []
        name = f"op{i}"
        updated = removed = dropped = 0
        mem_max = parts = 0
        for p in ps:
            so = p.get("stateOperators") or []
            if i >= len(so):
                continue
            d = _as_dict(so[i])
            name = d.get("operatorName") or name
            rows_series.append(int(d.get("numRowsTotal", 0)))
            updated += int(d.get("numRowsUpdated", 0))
            removed += int(d.get("numRowsRemoved", 0))
            dropped += int(d.get("numRowsDroppedByWatermark", 0))
            mem_max = max(mem_max, int(d.get("memoryUsedBytes", 0)))
            parts = int(d.get("numShufflePartitions", 0)) or parts
        op = {
            "operator": name,
            "rows_total_last": rows_series[-1] if rows_series else 0,
            "rows_total_series": rows_series,
            "rows_updated": updated,
            "rows_removed": removed,
            "rows_dropped_by_watermark": dropped,
            "memory_used_bytes_max": mem_max,
            "num_shuffle_partitions": parts,
        }
        # NON-DECREASING with net growth, not strictly monotone: Spark
        # routinely injects no-data micro-batches (watermark flushes),
        # so a plateau batch is the common case — a leak that pauses
        # for one idle batch must still warn. Any DECREASE is eviction
        # evidence and breaks the signature on its own.
        growing = (
            len(rows_series) >= MIN_BATCHES_FOR_GROWTH_SIGNAL
            and rows_series[-1] > rows_series[0]
            and all(b >= a for a, b in zip(rows_series, rows_series[1:]))
        )
        if growing and removed == 0 and dropped == 0:
            op["state_growth_warning"] = True
            warnings.append(
                f"state operator '{name}': rows never shrank "
                f"({rows_series[0]} -> {rows_series[-1]}) with zero "
                "eviction — check the watermark covers this operator "
                "(unbounded state OOMs at scale)"
            )
        ops.append(op)
    last_wm = None
    for p in reversed(ps):
        wm = (p.get("eventTime") or {}).get("watermark")
        if wm:
            last_wm = wm
            break
    return {
        "n_batches": len(ps),
        "input_rows": sum(int(p.get("numInputRows", 0)) for p in ps),
        "avg_processed_rows_per_s": (
            round(sum(rates) / len(rates), 1) if rates else None
        ),
        "max_batch_duration_ms": max(
            int(p.get("batchDuration", 0)) for p in ps
        ),
        "last_watermark": last_wm,
        "state_operators": ops,
        "warnings": warnings,
    }
