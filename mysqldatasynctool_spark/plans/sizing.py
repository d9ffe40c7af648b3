"""Project measured plan volume to a target corpus and recommend the
shuffle configuration that keeps partitions in executor memory.

The pipeline this closes: ``layoutProbe`` bounds the scan side
(sources/files.py), ``executed_plan_metrics`` measures what the plan
actually moved at fixture scale (plans/metrics.py), and this module
answers the question both exist for — "what does this query cost at
100 TB, and what do I set ``spark.sql.shuffle.partitions`` to?"

Scaling model (documented, not hidden):

- ``shuffle_bytes_written`` / ``shuffle_bytes_read`` / ``spill_bytes``
  scale LINEARLY with the scanned bytes. For joins, sorts, and
  row-preserving exchanges this is exact; for aggregations whose
  map-side combine caps per-key output it is an UPPER bound (the true
  exponent is below 1 once partial aggregation saturates the key
  space) — an upper bound is the safe direction to size memory with.
- ``broadcast_bytes`` scales linearly by default because at fixture
  scale we cannot see which side of the join the user will grow; the
  report carries a ``broadcast_ceiling`` warning the moment the
  projection crosses the autoBroadcastJoinThreshold class (10 MiB
  default) and again at the executor-memory class (1 GiB) where a
  broadcast join stops being a plan and starts being an OOM. If the
  broadcast side is a true dimension table (nation, region), the
  projection overstates it — the warning text says so.
- ``scan_files_bytes`` scales linearly by construction (it IS the
  corpus definition).

None of this replaces running at scale; it replaces sizing a cluster
by folklore. Every number traces to a measured metric and a stated
exponent.
"""

from __future__ import annotations

import math
from typing import Any, Dict

#: the planner's default broadcast cutoff (spark.sql.autoBroadcastJoinThreshold)
BROADCAST_PLAN_CEILING = 10 * 1024 * 1024
#: past this a broadcast relation contends with executor heap itself
BROADCAST_MEMORY_CEILING = 1 << 30

_LINEAR_KEYS = (
    "shuffle_bytes_written",
    "shuffle_bytes_read",
    "shuffle_records_written",
    "spill_bytes",
    "broadcast_bytes",
    "scan_files_bytes",
)


def project_volume(metrics: Dict[str, Any], scale_ratio: float) -> Dict[str, Any]:
    """Scale a measured ``executed_plan_metrics`` dict by
    ``scale_ratio`` (target corpus bytes / measured corpus bytes).

    Returns the projected dict plus ``scale_ratio`` and a ``warnings``
    list (broadcast ceilings, spill-at-source). Plan-shape counts
    (num_shuffles/num_broadcasts/nodes) are invariant and copied."""
    if scale_ratio <= 0:
        raise ValueError(f"scale_ratio must be positive, got {scale_ratio}")
    out: Dict[str, Any] = {"scale_ratio": scale_ratio, "warnings": []}
    for k in _LINEAR_KEYS:
        if k in metrics:
            out[k] = int(metrics[k] * scale_ratio)
    for k in ("num_shuffles", "num_broadcasts", "reused_exchanges", "nodes", "scan_files"):
        if k in metrics:
            out[k] = metrics[k]

    bc = out.get("broadcast_bytes", 0)
    if bc > BROADCAST_MEMORY_CEILING:
        out["warnings"].append(
            f"broadcast side projects to {bc / 2**30:.1f} GiB — past any "
            "sane executor budget; plan on a shuffle join (or bucketed "
            "co-location) for the growing side. If the broadcast side "
            "is a fixed dimension table this projection overstates it."
        )
    elif bc > BROADCAST_PLAN_CEILING:
        out["warnings"].append(
            f"broadcast side projects to {bc / 2**20:.1f} MiB — above "
            "the default autoBroadcastJoinThreshold (10 MiB); Catalyst "
            "will demote the join unless the threshold is raised "
            "deliberately. If the broadcast side is a fixed dimension "
            "table this projection overstates it."
        )
    if metrics.get("spill_bytes", 0) > 0:
        out["warnings"].append(
            "plan already spills at measured scale — treat the "
            "projected spill as a floor and raise partition counts "
            "first (spill grows superlinearly once sorts overflow)."
        )
    return out


def recommend_conf(
    projected: Dict[str, Any],
    target_partition_bytes: int = 128 * 1024 * 1024,
    min_partitions: int = 32,
    max_partitions: int = 200_000,
) -> Dict[str, Any]:
    """Shuffle-partition recommendation for a projected volume.

    ``spark.sql.shuffle.partitions`` = projected shuffle write /
    ``target_partition_bytes`` (128 MiB default — big enough to
    amortize task overhead, small enough that a reducer's working set
    fits executor memory with room for hash tables), clamped to
    [min_partitions, max_partitions] and rounded up to the next
    multiple of ``min_partitions`` so partition counts stay divisible
    by common executor-core counts. AQE coalescing shrinks an
    overestimate at runtime; an UNDERestimate (the failure mode this
    function exists to prevent) it cannot fix without spill."""
    sb = projected.get("shuffle_bytes_written", 0)
    raw = sb / target_partition_bytes if sb else 0
    n = max(min_partitions, math.ceil(raw))
    n = min(max_partitions, math.ceil(n / min_partitions) * min_partitions)
    return {
        "spark.sql.shuffle.partitions": n,
        "target_partition_bytes": target_partition_bytes,
        "projected_shuffle_bytes": sb,
        "projected_partition_bytes": int(sb / n) if n else 0,
        "aqe_note": (
            "leave spark.sql.adaptive.enabled=true — AQE coalesces an "
            "overestimate for free; it cannot split an underestimate "
            "without having already spilled"
        ),
    }


def size_report(
    metrics: Dict[str, Any],
    measured_corpus_bytes: int,
    target_corpus_bytes: float,
    target_partition_bytes: int = 128 * 1024 * 1024,
) -> Dict[str, Any]:
    """One-call report: measured -> projected -> recommended conf."""
    if measured_corpus_bytes <= 0:
        raise ValueError(
            "measured_corpus_bytes must be positive — pass the measured "
            "scan_files_bytes (or the known input size) of the run the "
            "metrics came from"
        )
    ratio = target_corpus_bytes / measured_corpus_bytes
    projected = project_volume(metrics, ratio)
    return {
        "measured": {k: metrics.get(k, 0) for k in _LINEAR_KEYS},
        "measured_corpus_bytes": measured_corpus_bytes,
        "target_corpus_bytes": int(target_corpus_bytes),
        "projected": projected,
        "recommended": recommend_conf(
            projected, target_partition_bytes=target_partition_bytes
        ),
    }
