"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

Each query executes its FULL plan into the noop sink (no driver
collect, no result materialization cost) — wall time measures the
distributed pipeline, which is what scales.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mysqldatasynctool_spark.operators import collect_registry
from mysqldatasynctool_spark.plans import executed_plan_metrics
from mysqldatasynctool_spark.session import get_spark

#: headline set: the flagship + one representative per operator family
#: (the quadratic ground-truth ops are excluded by design — their
#: scalable twins are in).
HEADLINE = [
    "q1_pricing_summary",
    "q1_pricing_summary_fast",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q7_volume_shipping",
    "q18_large_volume_customers",
    "q21_waiting_supplier",
    "agg_distinct",
    "window_topk_per_group",
    "text_unigram_perplexity",
    "graph_pagerank_purchases",
    "graph_triangle_count",
    "events_ohlc_bars",
    "events_anomaly_zscore",
    # r15: its skew-salted twin timed side-by-side (same output, same
    # oracle) so the salting overhead at fixture scale stays visible
    "events_anomaly_salted",
    "events_sessionization",
    "events_sliding_window",
    # r17: sliding distinct via HLL sketch merge over tumbling buckets
    # (the sketch-cube pattern) timed next to its event-fan-out twin
    "events_sliding_distinct_sketch_merge",
    "events_asof_join",
    "events_asof_join_salted",
    "join_asof_nearest",
    "agg_weighted_median",
    "events_hypertable_rollup",
    # a REAL Structured Streaming run (file source -> watermarked agg
    # -> memory sink) timed per round: streaming-layer throughput is a
    # first-class number, not just its batch twin's
    "streaming_run_ohlc",
    # the stream-stream interval join run: state-bounded join
    # throughput as its own per-round number
    "streaming_run_funnel_join",
    "events_interval_overlap_join",
    "join_bloom_pruned_semi",
    "migration_compare_checksums",
    "migration_cdc_apply",
    "text_pii_scrub",
    "dedup_minhash_lsh",
    "dedup_minhash_containment",
    "dedup_simhash",
    "dedup_embedding_lsh",
    "dedup_paragraph_exact",
    "dedup_substring_spans",
    # recall/precision vs exact ground truth at the LARGEST fixture
    # scale, tracked per round — the LSH quality story, not just its
    # speed (verdict r6 item 5)
    "dedup_lsh_recall_report",
    "text_heavy_hitters",
    "similarity_topk_bruteforce",
    "similarity_lsh_bucketed",
    "similarity_ivf_pandas",
    "similarity_lsh_multiprobe",
    # the trained IVF-PQ funnel capstone (Lloyd cells + codebook at
    # the derived probes/shortlist operating point — the
    # row that proves the r11 recall fix didn't buy its 0.40→0.90
    # with runaway wall time)
    "similarity_ivfpq_topk",
    "similarity_mmr_ann",
    # r12: radius retrieval — the threshold-bounded (not rank-bounded)
    # bucket join's timing next to the top-k rows
    "similarity_range_search",
    "text_token_stats",
    "text_quality_score",
    "text_token_count_bpe",
    # r11: BM25 lexical retrieval — the inverted-index pattern's
    # posting-list join timing, tracked alongside the ANN rows
    "text_bm25_topk",
    "multimodal_decode_features",
    "multimodal_frame_sample",
    "multimodal_phash_dedup",
    "pipeline_global_shuffle",
    # r11 late additions: cluster curation (topic profiling + balanced
    # subsample, both riding the shared trained-cell assignment) and
    # the 6-scan power-iteration spectral audit — multi-pass iterative
    # aggregate throughput as its own number
    "similarity_cluster_topics",
    "pipeline_cluster_balanced_sample",
    "similarity_pca_power_iteration",
    # index-maintenance throughput: two assignment scans (train-on-base
    # + assign-only) and the drift join
    "similarity_incremental_index",
    # r19 addition (additive only — the optimization-round contract
    # allows new entries, never removals/renames): the hybrid
    # retrieval capstone composes the TF-first lexical side with the
    # multiprobe ANN side and an RRF fusion join — the round-19
    # rewrite target whose regression this row would catch
    "similarity_hybrid_rrf",
]


def _cpu_probe_once() -> float:
    """One fixed-work single-thread sample: 64 MiB of md5 (~0.12 s,
    pure compute, no allocation churn, no Spark)."""
    import hashlib

    blob = bytes(range(256)) * 4096  # 1 MiB
    t0 = time.monotonic()
    h = hashlib.md5()
    for _ in range(64):
        h.update(blob)
    h.hexdigest()
    return round(time.monotonic() - t0, 4)


#: probe-owned 16 MiB scratch file for the cold-read leg — deliberately
#: NOT a fixture file: evicting lineitem.parquet from page cache to
#: measure it would slow the very queries the probe is calibrating.
_IO_PROBE_PATH: str | None = None


def _io_probe_file() -> str:
    """Create (once per process) the probe's own 16 MiB scratch file
    ON THE WORKLOAD DISK — in the repo directory, not
    tempfile.gettempdir(): on many hosts /tmp is tmpfs, where fsync
    is a no-op and the "cold read" measures RAM, silently voiding the
    drift-attribution evidence this probe exists to provide. The repo
    dir is where spark-warehouse/derby/local records live, so it is
    the device the workload actually writes. fsync'd so a page-cache
    eviction forces a real device read. Removed at exit."""
    global _IO_PROBE_PATH
    if _IO_PROBE_PATH is None:
        import atexit
        import tempfile

        here = os.path.dirname(os.path.abspath(__file__))
        fd, path = tempfile.mkstemp(
            prefix=".bench_io_probe_", suffix=".bin", dir=here
        )
        blob = bytes(range(256)) * 4096  # 1 MiB
        with os.fdopen(fd, "wb") as f:
            for _ in range(16):
                f.write(blob)
            f.flush()
            os.fsync(f.fileno())
        atexit.register(lambda: os.path.exists(path) and os.remove(path))
        _IO_PROBE_PATH = path
    return _IO_PROBE_PATH


#: every `_io_probe_once` sample taken this process, in order — the
#: running MEDIAN is the run's typical probe level (see
#: `io_probe_baseline`) and is the baseline `select_unburst_runs`
#: rejects against. On a uniformly degraded box every sample is high,
#: the median is high, no run is rejected, and the run-level io_probe
#: bracket carries the cross-round attribution instead — exactly the
#: division of labor the r16 replay adjudication established.
_IO_SAMPLES: list[float] = []


def _io_probe_once() -> float:
    """One fixed-work DISK sample (~0.02-0.05 s idle on this box):
    16 × (64 KiB write + fsync) — the latency class that bounds
    streaming state commits and parquet sink finalization — plus one
    COLD 16 MiB read (page cache dropped via posix_fadvise DONTNEED
    first), the class that bounds scan-heavy queries when the cache
    is under pressure. One number per sample: the sum of both legs'
    wall time. posix_fadvise is Linux-only (r16 advice): elsewhere
    the eviction is skipped and the read leg measures the page cache
    — the probe stays comparable within a run, just not across OSes.
    """
    path = _io_probe_file()
    chunk = bytes(range(256)) * 256  # 64 KiB
    t0 = time.monotonic()
    with open(path, "r+b") as f:
        for _ in range(16):
            f.seek(0)
            f.write(chunk)
            os.fsync(f.fileno())
        # evict, then force a real device read of the full 16 MiB
        if hasattr(os, "posix_fadvise"):
            os.posix_fadvise(f.fileno(), 0, 0, os.POSIX_FADV_DONTNEED)
        f.seek(0)
        while f.read(1 << 20):
            pass
    wall = round(time.monotonic() - t0, 4)
    _IO_SAMPLES.append(wall)
    return wall


def io_probe_baseline() -> float:
    """The run's typical-probe-level estimate: the MEDIAN of every
    io-probe sample taken so far this process. Not the minimum —
    measured on this box, samples taken right after a Spark query
    land 1.5-2.5x the quiet-moment minimum (the disk is still
    flushing shuffle/noop traffic), so a min-based baseline plus the
    2x threshold rejected 36 of 40 headline entries in the shakeout
    run. The median is the level MOST samples sit at; a burst (r16's
    0.0875 s vs ~0.013 typical ≈ 6x) clears 2x median decisively,
    ordinary post-query elevation does not. On a >50%-bursty run the
    median inflates and rejection gracefully disables — uniform
    degradation is the run-level io_probe bracket's job to attribute,
    not the per-sample filter's."""
    import statistics

    return statistics.median(_IO_SAMPLES) if _IO_SAMPLES else 0.0


def select_unburst_runs(
    walls: list[float],
    brackets: list[tuple[float, float]] | list[list[float]],
    baseline: float,
    ratio: float = 2.0,
    min_kept: int = 2,
) -> tuple[list[int], list[int]]:
    """Split run indices into (kept, rejected) by disk-burst evidence.

    A wall sample is burst-contaminated when EITHER of its bracketing
    `_io_probe_once` samples exceeds ``ratio × baseline``: the pair
    straddles the timed run, so a degraded pre- or post-probe means
    the disk was degraded for part of the window the wall was measured
    in. This is the r16 verdict item 1 fix: committed
    similarity_lsh_multiprobe landed on 2.429 s out of runs
    [7.855, 22.092, 2.429, 1.612, 1.922] because the median straddled
    two burst-eaten samples the probes had already recorded as such —
    the statistic now USES the evidence instead of just filing it.

    Never rejects below ``min_kept`` kept samples: if fewer would
    survive, the filter DISABLES itself and keeps every run (plain
    median). When every sample in the query's window is bracketed
    above the threshold, bracket magnitude no longer discriminates
    samples — the first committed record with a pick-lowest-bracket
    fallback kept events_sessionization's two SLOWEST runs (1.92/1.74
    vs a 1.43-1.59 tail) because probe noise, not wall quality, chose
    them. Whole-window degradation is the per-query io probe's job to
    attribute, not the per-sample filter's.
    """
    if baseline <= 0:
        return list(range(len(walls))), []
    flagged = {
        i for i, b in enumerate(brackets) if max(b) > ratio * baseline
    }
    kept = [i for i in range(len(walls)) if i not in flagged]
    if len(kept) < min_kept:
        return list(range(len(walls))), []
    rejected = sorted(flagged)
    return kept, rejected


#: the scan-heavy TPC-H headline block the layout A/B measures — the
#: entries whose walls are bounded by parquet scan parallelism
LAYOUT_AB_QUERIES = [
    "q1_pricing_summary",
    "q1_pricing_summary_fast",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q7_volume_shipping",
    "q18_large_volume_customers",
    "q21_waiting_supplier",
]

#: 20k rows/group ≈ 30 groups for sf0.1 lineitem — enough tasks to
#: feed 32 cores without per-group overhead dominating at fixture scale
LAYOUT_AB_ROW_GROUP = 20_000


def _layout_ab_block(spark, queries, sf_dir: str, median_fn) -> dict:
    """Measure the single-row-group fixture tax (r16 verdict item 3):
    rewrite the TPC-H tables with bounded row groups into a temp copy,
    layoutProbe-verify both layouts, and time the 7-query headline
    block on each with runs interleaved A,B,A,B (same-box, same-
    minute — a disk drift lands on both sides). Returns the per-query
    walls + ratios; the caller records them as ``layout_ab`` so
    cross-round totals stop silently absorbing a layout artifact of
    the driver's fixtures."""
    import shutil as _sh
    import tempfile as _tf

    import pyarrow.parquet as _pq

    from mysqldatasynctool_spark.sources.files import (
        parquet_scan_parallelism,
    )

    tables = [
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
    ]
    copy_dir = _tf.mkdtemp(prefix="bench_layout_ab_")
    try:
        for t in tables:
            _pq.write_table(
                _pq.read_table(os.path.join(sf_dir, f"{t}.parquet")),
                os.path.join(copy_dir, f"{t}.parquet"),
                row_group_size=LAYOUT_AB_ROW_GROUP,
            )
        probe = {
            tag: parquet_scan_parallelism(
                os.path.join(d, "lineitem.parquet"), target_parallelism=32
            )
            for tag, d in (("driver", sf_dir), ("bounded", copy_dir))
        }
        per_q: dict[str, dict] = {}
        for name in LAYOUT_AB_QUERIES:
            spark.catalog.clearCache()
            walls: dict[str, list[float]] = {"driver": [], "bounded": []}
            for _ in range(3):
                for tag, d in (("driver", sf_dir), ("bounded", copy_dir)):
                    t0 = time.monotonic()
                    queries[name](spark, d).write.mode("overwrite").format(
                        "noop"
                    ).save()
                    walls[tag].append(round(time.monotonic() - t0, 3))
            dm = median_fn(walls["driver"])
            bm = median_fn(walls["bounded"])
            per_q[name] = {
                "driver_rg1": dm,
                "bounded_rg20k": bm,
                "ratio": round(dm / max(bm, 1e-9), 2),
                "runs_driver": walls["driver"],
                "runs_bounded": walls["bounded"],
            }
        ratios = sorted(q["ratio"] for q in per_q.values())
        return {
            "row_group_size": LAYOUT_AB_ROW_GROUP,
            "lineitem_layout": probe,
            "queries": per_q,
            "median_ratio": ratios[len(ratios) // 2],
        }
    finally:
        _sh.rmtree(copy_dir, ignore_errors=True)


def _io_probe() -> float:
    """Fixed-work disk calibration: median-of-3 of `_io_probe_once`.
    Recorded at the START and END of every bench run and once per
    headline query (``io_probe_by_query``), exactly like `_cpu_probe`
    — closing the r15 attribution gap: that round's +27% committed
    drift sat entirely in I/O-heavy entries while the CPU probe stayed
    FLAT, so disk interference could be claimed but not PROVEN. With
    both probes bracketing the run, a cross-round delta is
    attributable three ways: cpu probe moved → slower box; io probe
    moved on flat cpu → disk contention (the r15 shape); both flat →
    the plans changed, go profile."""
    walls = [_io_probe_once() for _ in range(3)]
    return sorted(walls)[1]


def _cpu_probe() -> float:
    """Fixed-work single-thread CPU calibration: median-of-3 wall time
    of the 64 MiB md5 sample. Recorded at the START and END of every
    bench run so a cross-round delta can be attributed: if the probe
    moved with the workload, the BOX was slower, not the plans — the
    disambiguation the r11 record lacked when its +30.7% turned out to
    be session contention. Additionally ONE sample is taken right
    before each headline query (``probe_by_query``): this box shows
    minute-scale contention BURSTS that inflate a handful of adjacent
    queries while the run-level bracket stays clean, and the per-query
    sample is what lets a flagged row be attributed to the burst
    instead of the plan."""
    walls = [_cpu_probe_once() for _ in range(3)]
    return sorted(walls)[1]


#: Quiet-band ceilings for the two probes on this box, from the
#: committed records: cpu_probe read 0.102-0.155 across every quiet
#: BENCH_LOCAL_r12..r18 run (the r18d contended run read 0.263, 2.5x
#: the idle band); _io_probe_once read ~0.018-0.035 quiet (the r18e
#: degraded-disk run started at 0.143, ~5x). Each threshold sits
#: ~1.3-1.7x above the top of the observed quiet band so a busy but
#: healthy box still classifies quiet while the documented
#: contamination shapes (r18's 13 phantom regressions) do not.
CPU_PROBE_QUIET_MAX = 0.18
IO_PROBE_QUIET_MAX = 0.06


def _env_class(
    cpu_probe: dict, io_probe: dict, probe_by_query: dict, io_probe_by_query: dict
) -> dict:
    """Environment verdict for the BENCH_JSON tail (VERDICT r18 item
    6): the one-line record previously carried the probe brackets but
    no CLASSIFICATION, so PERF comparisons ingested contaminated walls
    silently. Derived purely from probe samples the record already
    carries (recomputable from any historical record); additive only —
    the timed loop and existing keys are untouched.

    ``env_class``: quiet | cpu_contended | disk_degraded |
    cpu_contended+disk_degraded | partially_contended (medians quiet
    but >25% of per-query probes ran hot — the r18 shape, where q1's
    io bracket read 5-10x baseline while the run-level bracket stayed
    clean). ``env_hot_queries`` names the hot rows so a flagged wall
    is attributable without the full committed record."""
    import statistics

    cpu_samples = [cpu_probe["start"], cpu_probe["end"], *probe_by_query.values()]
    io_samples = [io_probe["start"], io_probe["end"], *io_probe_by_query.values()]
    cpu_med = statistics.median(cpu_samples)
    io_med = statistics.median(io_samples)
    hot = sorted(
        set(q for q, v in probe_by_query.items() if v > CPU_PROBE_QUIET_MAX)
        | set(q for q, v in io_probe_by_query.items() if v > IO_PROBE_QUIET_MAX)
    )
    cpu_hot = cpu_med > CPU_PROBE_QUIET_MAX
    io_hot = io_med > IO_PROBE_QUIET_MAX
    if cpu_hot and io_hot:
        cls = "cpu_contended+disk_degraded"
    elif cpu_hot:
        cls = "cpu_contended"
    elif io_hot:
        cls = "disk_degraded"
    elif len(hot) > max(2, len(probe_by_query) // 10):
        # calibrated against two labeled shapes: the r18 driver record
        # (6/59 io-hot rows, 13 phantom wall regressions) and this
        # round's final run (6/59 io-hot, bench_compare attributes all
        # of them to disk) — both must classify partially_contended,
        # while ≤2-3 stray hot probes on a quiet run must not
        cls = "partially_contended"
    else:
        cls = "quiet"
    return {
        "env_class": cls,
        "env_cpu_probe_median": round(cpu_med, 4),
        "env_io_probe_median": round(io_med, 4),
        "env_hot_queries": hot,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("/", 1)[-1].replace("sf", "")
    probe_start = _cpu_probe()
    io_probe_start = _io_probe()
    spark = get_spark(app_name="bench")
    queries, _ = collect_registry()
    # The registry's q1_pricing_summary_fast is the oracle-gated form
    # (float sums + in-query within_tol audit vs the exact decimals —
    # one pass, 15 measures). The BENCH row of that name keeps timing
    # the unwrapped pure-float production aggregation, same
    # computation as every prior round, so the series stays
    # comparable and the decimal/float cost ratio stays measured.
    from mysqldatasynctool_spark.operators.relational import (
        q1_pricing_summary_fast_raw,
    )

    queries = {**queries, "q1_pricing_summary_fast": q1_pricing_summary_fast_raw}

    #: query name -> error string; a broken query must cost its own
    #: row here, never the whole round's record (round 4 lost ALL
    #: numbers to one AnalysisException before this isolation existed)
    failed: dict[str, str] = {}

    # JVM/codegen warmup outside the timed region
    try:
        queries["q1_pricing_summary"](spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
    except Exception as exc:  # noqa: BLE001 — warmup is best-effort
        failed["_warmup"] = f"{type(exc).__name__}: {exc}"[:300]

    # MEDIAN-of-3 per query (r11 verdict item 1): single runs on this
    # box swing ±2x (GC / page-cache noise), and the old best-of-2
    # with an adaptive third run could not DISAMBIGUATE a uniform
    # ~1.8x session-contention inflation from a real plan regression
    # (r11's driver record read +30.7% for exactly that reason). The
    # median of three is robust to one outlier in either direction
    # and is an honest central estimate, not a lucky minimum; every
    # raw run stays in `runs` so any recorded number remains
    # attributable after the fact.
    from mysqldatasynctool_spark.operators import (
        reset_trained_state,
        teardown_caches,
    )

    def _median(xs: list[float]) -> float:
        s = sorted(xs)
        m = len(s) // 2
        return s[m] if len(s) % 2 else round((s[m - 1] + s[m]) / 2, 3)

    timings: dict[str, float] = {}
    all_runs: dict[str, list[float]] = {}
    #: metric -> {table -> {"plan"/"copy"/"verify": sec}} (best run)
    phase_split: dict[str, dict] = {}
    #: trained-ANN rows: cold (first call trains / repopulates caches)
    #: vs steady (median of the cached-call repeats) — records the
    #: amortization as a fact instead of a runs-array inference
    #: (r11 verdict item 7)
    COLD_STEADY = {
        "similarity_ivfpq_topk",
        "similarity_ivf_pandas",
        "similarity_cluster_topics",
        "similarity_incremental_index",
        "pipeline_cluster_balanced_sample",
    }
    cold_steady: dict[str, dict] = {}
    #: per-entry statistic overrides (COLD_STEADY rows report the
    #: steady median; everything else uses the top-level query_stat)
    stat_by_query: dict[str, str] = {}
    #: per-query box-speed sample taken just before each query's runs
    probe_by_query: dict[str, float] = {}
    #: per-query DISK-speed sample, same placement — the r15 drift sat
    #: in I/O-heavy entries on a flat CPU probe; this is the evidence
    #: channel that can see it
    io_probe_by_query: dict[str, float] = {}
    #: per-RUN disk brackets, name -> [[pre, post], ...] aligned with
    #: `runs` — the raw evidence behind every burst rejection
    io_bracket_by_run: dict[str, list] = {}
    #: name -> rejection metadata for entries whose statistic excluded
    #: burst-contaminated samples (r16 verdict item 1)
    burst_rejections: dict[str, dict] = {}
    #: name -> executed-plan SQL-metric sums (shuffle/spill/broadcast
    #: bytes, exchange counts) from ONE untimed post-run execution.
    #: These are plan x data quantities — deterministic up to
    #: compression jitter, immune to the box's disk — so cross-round
    #: wall drift can be split into "plan volume changed" vs
    #: "environment" without replay experiments (r14-r17's recurring
    #: adjudication, now in-record).
    plan_metrics_by_query: dict[str, dict] = {}
    #: streaming entries only: measured state extent / eviction /
    #: throughput per round (streaming/observe.py over the metrics
    #: pass's run) — the stream twin of plan_metrics_by_query
    streaming_state_by_query: dict[str, dict] = {}
    for name in HEADLINE:
        # cache hygiene BETWEEN queries (never between a query's own
        # runs — within-query reuse is the amortization being
        # measured): no headline row may inherit another family's
        # persisted frames or pay their storage-memory pressure
        spark.catalog.clearCache()
        teardown_caches()
        if name in COLD_STEADY:
            # true cold (r12 advice): teardown_caches deliberately
            # keeps the driver-side trained dicts, and the whole ANN
            # family shares cache_key=sf_dir — without this reset
            # every COLD_STEADY entry after the first reports a
            # train-free "cold" and the amortization rows are
            # incomparable across entries
            reset_trained_state()
        # median-of-3 (r12 advice): one noisy 0.12 s sample could tag
        # a genuine plan regression as a box burst; three samples cost
        # ~0.35 s/query and make the attribution trustworthy
        probe_by_query[name] = sorted(_cpu_probe_once() for _ in range(3))[1]
        io_samples = [_io_probe_once() for _ in range(3)]
        io_probe_by_query[name] = sorted(io_samples)[1]
        runs: list[float] = []
        # per-RUN disk brackets (r16 verdict item 1): sample the io
        # probe between consecutive runs so every wall sample carries
        # (pre, post) disk evidence; the newest pre-query sample seeds
        # the chain, so N runs cost N extra probe samples, not 2N
        bracket_samples: list[float] = [io_samples[-1]]
        # COLD_STEADY rows need >=3 STEADY samples: with 3 total runs
        # "steady" degenerates to a 2-sample MEAN, and one host burst
        # poisons it — r12's committed ivfpq steady 11.65 s was
        # exactly mean(18.2 burst, 5.1) while the query's honest
        # steady state measures ~3.3 s on an idle box (r12 verdict
        # item 1; runs [7.624, 5.093, 18.2] in BENCH_LOCAL_r12)
        base_runs = 4 if name in COLD_STEADY else 3

        def _timed_run() -> None:
            t0 = time.monotonic()
            queries[name](spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            runs.append(round(time.monotonic() - t0, 3))
            bracket_samples.append(_io_probe_once())

        # the statistic's view of the runs: COLD_STEADY drops run0
        # (the training-inclusive cold sample, reported separately in
        # ann_cold_vs_steady) BEFORE any burst logic sees it — cold >
        # 2x steady is the expected amortization shape, not a burst
        def _stat_view() -> tuple[int, list[float], list[list[float]]]:
            off = 1 if name in COLD_STEADY else 0
            walls = runs[off:]
            brs = [
                [bracket_samples[i], bracket_samples[i + 1]]
                for i in range(off, len(runs))
            ]
            return off, walls, brs

        try:
            for _ in range(base_runs):
                _timed_run()
            # bounded adaptive extension, now TWO-criteria (r16 verdict
            # item 1): keep adding samples (max 6/7 total) while either
            # (a) the burst filter has rejected below 3 kept samples —
            # the "re-run" half of reject-or-re-run — or (b) the median
            # of the KEPT set still reads >2x its fastest run (the
            # 5-20x host CPU-steal spikes the r12-era extension caught;
            # judged burst-filtered so a rejected 22 s outlier no
            # longer burns extension samples twice).
            while len(runs) < (7 if name in COLD_STEADY else 6):
                off, walls, brs = _stat_view()
                kept, _rej = select_unburst_runs(
                    walls, brs, io_probe_baseline()
                )
                kw = [walls[i] for i in kept]
                if len(kw) >= 3 and _median(kw) <= 2 * min(kw):
                    break
                _timed_run()
        except Exception as exc:  # noqa: BLE001 — isolate per query
            failed[name] = f"{type(exc).__name__}: {exc}"[:300]
            continue
        all_runs[name] = runs
        off, walls, brs = _stat_view()
        io_bracket_by_run[name] = [
            [bracket_samples[i], bracket_samples[i + 1]]
            for i in range(len(runs))
        ]
        kept, rej = select_unburst_runs(walls, brs, io_probe_baseline())
        kept_walls = [walls[i] for i in kept]
        # COLD_STEADY headline medians EXCLUDE runs[0] (r13 advice) and
        # both modes now EXCLUDE burst-rejected samples (r16 verdict
        # item 1). stat_by_query records the per-entry statistic so
        # cross-round comparisons know exactly what each number is.
        timings[name] = _median(kept_walls)
        stat = "steady_median_excl_cold_run0" if name in COLD_STEADY else "median"
        if rej:
            rej_abs = [i + off for i in rej]  # indices into `runs`
            stat += f"_excl_burst_runs{rej_abs}".replace(" ", "")
            burst_rejections[name] = {
                "rejected_runs": rej_abs,
                "rejected_walls": [runs[i] for i in rej_abs],
                "io_baseline": io_probe_baseline(),
                "threshold_x": 2.0,
                "reason": "io_bracket>2x_idle_baseline",
            }
        if name in COLD_STEADY or rej:
            stat_by_query[name] = stat
        if name in COLD_STEADY:
            cold_steady[name] = {
                "cold": runs[0],
                "steady": _median(kept_walls),
            }
        # ONE untimed execution of the df's OWN plan instance to read
        # its SQL metrics (the timed noop writes execute a separate
        # write QueryExecution whose accumulators we can't reach from
        # the df handle). toRdd().count() materializes every row
        # JVM-side — no Arrow/driver transfer — on the query's warmed
        # caches, so the volumes reflect the same steady state the
        # median wall does. Best-effort: a py4j hiccup costs this row's
        # plan_metrics, never the wall numbers.
        # snapshot the FINAL TIMED run's streaming progress before the
        # metrics pass re-runs the stream: streamruns._progress clears
        # the capture list on entry, so a metrics-pass failure after
        # that clear would otherwise erase evidence that already
        # existed (r17 review finding)
        from mysqldatasynctool_spark.operators import streamruns

        prog_snapshot = list(streamruns.RUN_PROGRESS.get(name) or [])
        try:
            mdf = queries[name](spark, sf_dir)
            mdf._jdf.queryExecution().toRdd().count()
            pm = executed_plan_metrics(mdf)
            if prog_snapshot or streamruns.RUN_PROGRESS.get(name):
                # streaming entries return a post-sink memory-table
                # frame — these volumes price the result-set sort, NOT
                # the streaming job (whose cost signal is the state
                # report below); the flag tells bench_compare to keep
                # its plan-volume verdicts off these rows
                pm["post_sink_only"] = True
            plan_metrics_by_query[name] = pm
        except Exception:  # noqa: BLE001 — metrics are supplementary
            pass
        # streaming rows: reduce the raw micro-batch progress to the
        # state/eviction ops report (the stream twin of plan_metrics:
        # rows held, memory, watermark eviction, unbounded-growth
        # warning). Prefer the metrics pass's fresh capture; fall back
        # to the final timed run's snapshot.
        try:
            from mysqldatasynctool_spark.streaming.observe import (
                progress_report,
            )

            prog = streamruns.RUN_PROGRESS.get(name) or prog_snapshot
            if prog:
                streaming_state_by_query[name] = progress_report(prog)
        except Exception:  # noqa: BLE001 — supplementary
            pass
    # release the last family's caches before the migrate blocks
    spark.catalog.clearCache()
    teardown_caches()

    # Index-artifact lifecycle demo (r13 verdict item 5): train once,
    # save the parquet index, then cold-start a "restarted driver"
    # (reset_trained_state wipes dicts AND persisted frames — the
    # in-process stand-in for a fresh driver, whose bit-identity to a
    # real fresh process is unit-proven) from the artifact and time the
    # first query. Prediction: load skips the 3 Lloyd/codebook training
    # scans; the first call still pays ONE assignment+encode scan to
    # rebuild the persisted frames, so cold_with_artifact ≈ the r12
    # steady shape (~3 s), far under the ~13 s train-inclusive cold.
    try:
        import shutil as _sh
        import tempfile as _tf

        from mysqldatasynctool_spark.operators import similarity as _S

        reset_trained_state()
        t0 = time.monotonic()
        queries["similarity_ivfpq_topk"](spark, sf_dir).write.mode(
            "overwrite"
        ).format("noop").save()
        train_cold = round(time.monotonic() - t0, 3)
        adir = _tf.mkdtemp(prefix="bench_annidx_")
        try:
            apath = os.path.join(adir, "index")
            fpath = os.path.join(adir, "frames")
            n_idx_rows = _S.save_trained_index(spark, apath)
            frame_counts = _S.save_index_frames(spark, fpath, sf_dir)
            # knobs-only restart: centroids/codebooks load from the
            # KB-scale artifact; the first query still pays ONE
            # assignment + encode scan to rebuild the frames
            reset_trained_state()  # driver-restart stand-in
            spark.catalog.clearCache()
            t1 = time.monotonic()
            _S.load_trained_index(spark, apath)
            queries["similarity_ivfpq_topk"](spark, sf_dir).write.mode(
                "overwrite"
            ).format("noop").save()
            cwk = round(time.monotonic() - t1, 3)
            # full-index restart (r14): frames too — the FAISS
            # index-file story complete; first query ≈ steady cost
            reset_trained_state()
            spark.catalog.clearCache()
            t2 = time.monotonic()
            _S.load_trained_index(spark, apath)
            _S.load_index_frames(spark, fpath)
            queries["similarity_ivfpq_topk"](spark, sf_dir).write.mode(
                "overwrite"
            ).format("noop").save()
            cwa = round(time.monotonic() - t2, 3)
        finally:
            _sh.rmtree(adir, ignore_errors=True)
        cold_steady.setdefault("similarity_ivfpq_topk", {}).update(
            {
                "cold_with_artifact": cwa,
                "cold_with_knobs_only_artifact": cwk,
                "cold_with_artifact_train_cold": train_cold,
                "index_artifact_rows": n_idx_rows,
                "index_frame_rows": frame_counts,
            }
        )
        spark.catalog.clearCache()
        teardown_caches()
    except Exception as exc:  # noqa: BLE001 — lifecycle row is additive
        failed["_ann_artifact"] = f"{type(exc).__name__}: {exc}"[:300]

    # the reference's core job: full-DB copy + checksum verification
    # (BASELINE.md "TableData" + "compareDb" phases in one number)
    import shutil
    import tempfile

    from mysqldatasynctool_spark.migrate import migrate_directory

    # best-of-3 (queries are best-of-2): this one metric swung
    # [7.91, 11.85] in r3 — the extra run separates steady-state from
    # GC/page-cache outliers. Fresh dest each run; the first run
    # additionally pays one-time digest-codegen for every table schema.
    n_bad = 0
    try:
        runs = []
        dir_phases = []
        # per-run disk sample for the migrate blocks too (r17: the one
        # entry class WITHOUT the io channel regressed 1.8x on uniform
        # per-table phase inflation — environment by every other
        # signal, but unattributable in-record without this)
        mig_io: list[float] = []
        for _ in range(3):
            mig_io.append(_io_probe_once())
            dest = tempfile.mkdtemp(prefix="bench_migrate_")
            t0 = time.monotonic()
            elapsed = None
            try:
                reports, verdict = migrate_directory(spark, sf_dir, dest)
                # reassigned (not +=) per run: both runs see the same
                # data, so the failure state is identical — summing
                # would double it
                n_bad = sum(1 for r in verdict.collect() if r.is_ok != "YES") + sum(
                    1 for r in reports if not r.ok
                )
                # stop the clock BEFORE cleanup: rmtree of an sf-sized
                # parquet copy is FS noise, not migration work, and
                # timing it breaks comparability with prior rounds
                elapsed = round(time.monotonic() - t0, 3)
            finally:
                # a crashed run must not leave a partial sf-sized
                # parquet copy in /tmp
                shutil.rmtree(dest, ignore_errors=True)
            runs.append(elapsed)
            dir_phases.append({r.table: r.phases for r in reports if r.phases})
        all_runs["migrate_full_db_with_verify"] = runs
        timings["migrate_full_db_with_verify"] = min(runs)
        io_probe_by_query["migrate_full_db_with_verify"] = sorted(mig_io)[
            len(mig_io) // 2
        ]
        # per-table copy/verify wall-time from the BEST run — r6 moved
        # +23% on this metric with no code change; the split makes any
        # future drift attributable (fused scan+write vs verify
        # re-read) instead of an opaque total
        phase_split["migrate_full_db_with_verify"] = dir_phases[
            runs.index(min(runs))
        ]
    except Exception as exc:  # noqa: BLE001
        failed["migrate_full_db_with_verify"] = f"{type(exc).__name__}: {exc}"[:300]

    # DB→DB through REAL JDBC (embedded Derby) — the reference's
    # actual job shape (root.go:375-507): plan partitions from the
    # source PK, partitioned JDBC read, batched JDBC write, checksum
    # verify both sides. One table per plan mode: range (orders,
    # single numeric PK), composite boundary predicates (lineitem),
    # tiny dim (region). Source seeding is setup, not timed.
    from mysqldatasynctool_spark.config import Endpoint
    from mysqldatasynctool_spark.migrate import jsonify_nested, migrate_jdbc
    from mysqldatasynctool_spark.sources.fixtures import load
    from mysqldatasynctool_spark.sources.sinks import write_jdbc

    drv = "org.apache.derby.iapi.jdbc.AutoloadedDriver"
    jdbc_tables = {
        "orders": ["o_orderkey"],
        "lineitem": ["l_orderkey", "l_linenumber"],
        "region": ["r_regionkey"],
    }
    derby_root = tempfile.mkdtemp(prefix="bench_derby_")
    try:
        src_ep = Endpoint(
            url_override=f"jdbc:derby:{derby_root}/src;create=true", driver=drv
        )
        for t in jdbc_tables:
            write_jdbc(jsonify_nested(load(spark, sf_dir, t)), src_ep, t, truncate=True)
        runs = []
        run_phases = []
        jdbc_bad = 0
        mig_io = []
        for i in range(3):
            # unconditional 3 runs (r12: the adaptive skip saved ~15 s
            # but left the headline metric resting on 2 samples — a
            # [18.2s, 14.5s] burst pair recorded 14.5 where the third
            # sample lands ~12.5; same 3-sample floor as the directory
            # migrate)
            mig_io.append(_io_probe_once())
            dest_ep = Endpoint(
                url_override=f"jdbc:derby:{derby_root}/dest{i};create=true", driver=drv
            )
            t0 = time.monotonic()
            reports, verdict = migrate_jdbc(spark, src_ep, dest_ep, jdbc_tables)
            # reassigned per run, not accumulated — both runs migrate
            # the same tables, so += would count one failure twice
            jdbc_bad = sum(1 for r in verdict.collect() if r.is_ok != "YES") + sum(
                1 for r in reports if not r.ok
            )
            runs.append(round(time.monotonic() - t0, 3))
            run_phases.append({r.table: r.phases for r in reports if r.phases})
        n_bad += jdbc_bad
        all_runs["migrate_jdbc_db_to_db"] = runs
        timings["migrate_jdbc_db_to_db"] = min(runs)
        io_probe_by_query["migrate_jdbc_db_to_db"] = sorted(mig_io)[
            len(mig_io) // 2
        ]
        # per-table plan/copy/verify wall-time from the BEST run:
        # attributes the residual gap vs the reference (read-side vs
        # Derby's serialized embedded writes) instead of assuming it
        phase_split["migrate_jdbc_db_to_db"] = run_phases[runs.index(min(runs))]
    except Exception as exc:  # noqa: BLE001
        failed["migrate_jdbc_db_to_db"] = f"{type(exc).__name__}: {exc}"[:300]
    finally:
        # seeded Derby DBs are hundreds of MB at sf0.1 — never orphan
        # them on a failed run
        shutil.rmtree(derby_root, ignore_errors=True)

    # Layout A/B (r16 verdict item 3): the driver's sf0.1 fixtures are
    # SINGLE-row-group parquet files (the repo's own layoutProbe proves
    # it), so every scan in the headline TPC-H block runs on ONE task
    # of 32 — the same pathology the r16 stress fix removed from the
    # builder's corpora. Quantify the tax instead of absorbing it:
    # rewrite a bounded-row-group (20k) copy of the TPC-H tables, run
    # the 7-query headline block on BOTH layouts with runs interleaved
    # A,B,A,B,... (so a disk drift mid-block contaminates both sides
    # equally), and record both walls per query. Correctness/oracle
    # checks stay on the driver fixtures untouched; the headline
    # timings above also stay on the driver layout so the cross-round
    # series remains comparable — this block makes the tax a recorded
    # fact with a footnote, not a silent divisor.
    layout_ab = None
    try:
        layout_ab = _layout_ab_block(spark, queries, sf_dir, _median)
        spark.catalog.clearCache()
        teardown_caches()
    except Exception as exc:  # noqa: BLE001 — evidence block is additive
        failed["_layout_ab"] = f"{type(exc).__name__}: {exc}"[:300]

    # the LSH quality numbers at THIS scale, recorded per round next
    # to the timings — a banding change that speeds LSH up by losing
    # recall shows up here, not just as a faster row
    recall_row = None
    try:
        recall_row = {
            k: (float(v) if v is not None else None)
            for k, v in queries["dedup_lsh_recall_report"](spark, sf_dir)
            .collect()[0]
            .asDict()
            .items()
        }
    except Exception as exc:  # noqa: BLE001 — quality row is additive
        failed["_recall_report"] = f"{type(exc).__name__}: {exc}"[:300]

    # LSH recall at 10x the largest fixture (seeded synthetic corpus,
    # planted near-dups with exact generation-time Jaccard): validates
    # the banding parameters beyond fixture scale and pins measured
    # recall against the b-band/r-row theory curve (VERDICT r7 item 6;
    # this harness is what exposed the r7 affine-family recall gap)
    # tools/ on sys.path for BOTH stress blocks below (r10 advice: the
    # x30 import silently relied on this running inside the x10 try)
    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools")
    )
    recall_10x = None
    try:
        from lsh_stress import run_stress

        recall_10x = run_stress(spark, sf_dir, factor=10, seed=8)
    except Exception as exc:  # noqa: BLE001 — quality row is additive
        failed["_recall_10x"] = f"{type(exc).__name__}: {exc}"[:300]

    # x30 extension (r8 verdict carry-over): one seed at 3x the x10
    # corpus (150 k docs at sf0.1) — checks the recall == theory match
    # holds as bucket occupancy triples, at ~linear extra cost
    recall_30x = None
    try:
        from lsh_stress import run_stress as _run_stress_30

        recall_30x = _run_stress_30(spark, sf_dir, factor=30, seed=8)
    except Exception as exc:  # noqa: BLE001 — quality row is additive
        failed["_recall_30x"] = f"{type(exc).__name__}: {exc}"[:300]

    # x100 extension (r13 verdict item 3): the one scale point the
    # 100 TB story had not stressed — 500 k docs / 200 k vectors at
    # sf0.1. The √N-cells/fixed-probes and banding-theory predictions
    # say recall holds within a few points of x30 while wall grows
    # ~linearly; measured r14 (idle box): LSH 0.970 vs 0.9744 theory
    # at 149 s, ivfpq 0.775 / multiprobe-LSH 0.978 at ~11 min
    # (training a 200 k-vector index dominates). ENV-GATED
    # (SPARK_GRAFT_STRESS_100X=1) because the ANN side alone would
    # double the per-round bench wall; the builder's end-of-round
    # bench runs WITH the flag so the committed BENCH_LOCAL record
    # carries the blocks — the per-round regression gates stay the
    # unconditional x10/x30 blocks above.
    stress_100x = os.environ.get("SPARK_GRAFT_STRESS_100X") == "1"
    recall_100x = None
    if stress_100x:
        try:
            from lsh_stress import run_stress as _run_stress_100

            recall_100x = _run_stress_100(spark, sf_dir, factor=100, seed=8)
        except Exception as exc:  # noqa: BLE001 — quality row is additive
            failed["_recall_100x"] = f"{type(exc).__name__}: {exc}"[:300]

    # ANN recall at 10x the largest fixture (r10 verdict item 3: the
    # similarity mirror of the LSH stress — planted near neighbors +
    # exact generation-time truth, so the Lloyd-training recall gains
    # are regression-gated beyond fixture scale)
    ann_10x = None
    try:
        from ann_stress import run_stress_ann

        ann_10x = run_stress_ann(spark, sf_dir, factor=10, seed=8)
    except Exception as exc:  # noqa: BLE001 — quality row is additive
        failed["_ann_recall_10x"] = f"{type(exc).__name__}: {exc}"[:300]

    # x100 ANN extension (r13 verdict item 3): 200 k vectors — the
    # trained IVF-PQ funnel + multiprobe LSH at 100x the fixture
    # (same env gate as the LSH x100 block above)
    ann_100x = None
    if stress_100x:
        try:
            from ann_stress import run_stress_ann as _run_ann_100

            ann_100x = _run_ann_100(spark, sf_dir, factor=100, seed=8)
        except Exception as exc:  # noqa: BLE001 — quality row is additive
            failed["_ann_recall_100x"] = f"{type(exc).__name__}: {exc}"[:300]

    # x300 ANN extension (r15 verdict item 6): 600 k vectors — one
    # more octave past the x100 point that validated the derived
    # probe/shortlist budgets (0.852 at x10 -> 0.8783 at x100). If
    # the policy scales, recall holds >= ~0.85 here while the
    # per-query budgets grow sub-linearly in N (probes ~ 13% of
    # ~sqrt(N) cells). Own env gate (SPARK_GRAFT_STRESS_300X=1):
    # training a 600 k-vector index dominates and would multiply the
    # round's bench wall; run standalone via
    # `python tools/ann_stress.py 300 8` when adjudicating.
    ann_300x = None
    if os.environ.get("SPARK_GRAFT_STRESS_300X") == "1":
        try:
            from ann_stress import run_stress_ann as _run_ann_300

            ann_300x = _run_ann_300(spark, sf_dir, factor=300, seed=8)
        except Exception as exc:  # noqa: BLE001 — quality row is additive
            failed["_ann_recall_300x"] = f"{type(exc).__name__}: {exc}"[:300]

    # Wall-vs-SF scaling evidence (r11): one timed run of each
    # representative operator at the two SMALLER fixtures, recorded
    # next to its sf0.1 best — the judge-facing check that plans cost
    # what their shape claims as data grows 10x/100x. ratio_01 is
    # wall(sf0.1)/wall(sf0.01): ~1 reads fixed-cost-dominated at test
    # scale, <= ~10 reads linear; a superlinear ratio is the tripwire.
    # Picked to cover the distinct plan families: scan-agg, banded
    # LSH dedup, the trained ANN funnel (per-SF training cached inside
    # the run, as in production), heavy text agg, stateful
    # sessionization, and the composed pipeline.
    SCALE_SWEEP = [
        "q1_pricing_summary",
        "dedup_minhash_lsh",
        "similarity_ivfpq_topk",
        "text_heavy_hitters",
        "events_sessionization",
        "pipeline_global_shuffle",
    ]
    scale_sweep: dict = {}
    try:
        for name in SCALE_SWEEP:
            if name not in timings:
                continue
            row = {"sf0.1": timings[name]}
            for small in ("0.001", "0.01"):
                sd = sf_dir.rstrip("/").rsplit("/", 1)[0] + f"/sf{small}"
                # best-of-2, same discipline as the headline numbers:
                # the first run pays one-time per-SF costs the sf0.1
                # side has already amortized (ANN training caches,
                # codegen) — the comparable number is the warm scan
                walls = []
                for _ in range(2):
                    t0 = time.time()
                    queries[name](spark, sd).write.mode("overwrite").format(
                        "noop"
                    ).save()
                    walls.append(round(time.time() - t0, 3))
                row[f"sf{small}"] = min(walls)
            row["ratio_01"] = round(row["sf0.1"] / max(row["sf0.01"], 1e-9), 2)
            scale_sweep[name] = row
    except Exception as exc:  # noqa: BLE001 — evidence row is additive
        failed["_scale_sweep"] = f"{type(exc).__name__}: {exc}"[:300]

    cpu_probe_bracket = {"start": probe_start, "end": _cpu_probe()}
    io_probe_bracket = {"start": io_probe_start, "end": _io_probe()}
    env_verdict = _env_class(
        cpu_probe_bracket, io_probe_bracket, probe_by_query, io_probe_by_query
    )
    out = {
        "metric": "headline_queries_total_wall",
        # a round with ANY failed headline metric must not publish a
        # comparable-looking total: the missing query's time would make
        # the sum DROP, reading as a speedup. Per-query timings stay.
        # (underscore-keyed failures — _warmup, _recall_report — are
        # not timed metrics, so they alone don't null it.)
        "value": (
            round(sum(timings.values()), 3)
            if not {k for k in failed if not k.startswith("_")}
            else None
        ),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
        # core count the walls were measured at (r18): the driver
        # re-runs the bench at a lower $SPARK_GRAFT_CPUS to measure
        # per-query scaling, and without this stamp two records from
        # different core counts are indistinguishable after the fact
        # (the 8-core scaling run of r18 had to be annotated by hand).
        # File-record metadata only — the stdout contract line is
        # unchanged.
        "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        # each query number is the MEDIAN of its burst-KEPT runs (r17
        # discipline change: runs whose io-probe bracket exceeded 2x
        # the run's typical probe level are excluded, and the adaptive
        # extension re-runs to >=3 kept samples, capped at 6/7 — the
        # label below changes so bench_compare prints its
        # statistic-changed note at the r16→r17 boundary; r12-r16
        # records were plain medians of 3-5). The migrate blocks stay
        # best-of-N because their first run pays one-time setup.
        # Per-run wall times behind every number, so a regression in
        # the headline metric is distinguishable from single-run box
        # noise without re-running the whole suite.
        "runs": all_runs,
        "query_stat": "burst_filtered_median_adaptive_to_6",
        # per-entry overrides: COLD_STEADY rows exclude the cold run
        # from their headline median (r13 advice — the label travels
        # with the record so cross-round tooling reads the right stat)
        "stat_by_query": stat_by_query,
        # (the r14→r15 `value_old_stat_definition` transition aid is
        # dropped as scheduled — r13-era totals remain comparable via
        # stat_by_query + runs in the committed BENCH_LOCAL records)
        # box-speed calibration bracketing the run (see _cpu_probe):
        # compare this across rounds BEFORE reading per-query deltas
        "cpu_probe": cpu_probe_bracket,
        # disk-speed calibration, same bracket discipline (see
        # _io_probe — closes the r15 attribution gap)
        "io_probe": io_probe_bracket,
        # one sample per query, taken just before its runs — the
        # burst-attribution evidence bench_compare reads when flagging
        "probe_by_query": probe_by_query,
        "io_probe_by_query": io_probe_by_query,
        # per-run disk brackets + the rejections the statistic made
        # from them (r16 verdict item 1): every headline number is now
        # attributable to the exact samples it kept and dropped
        "io_bracket_by_run": io_bracket_by_run,
        "io_probe_baseline": io_probe_baseline(),
        # executed-plan SQL-metric sums per headline query (shuffle /
        # spill / broadcast bytes, exchange counts) — the box-immune
        # plan-volume signal bench_compare uses to separate plan
        # regressions from environment drift
        "plan_metrics_by_query": plan_metrics_by_query,
        # environment verdict + probe medians (VERDICT r18 item 6) —
        # additive; see _env_class
        **env_verdict,
    }
    if streaming_state_by_query:
        out["streaming_state_by_query"] = streaming_state_by_query
    if burst_rejections:
        out["burst_rejections"] = burst_rejections
    if phase_split:
        out["phase_split"] = phase_split
    if cold_steady:
        out["ann_cold_vs_steady"] = cold_steady
    if recall_row:
        out["lsh_recall"] = recall_row
    if recall_10x:
        out["lsh_recall_10x"] = recall_10x
    if recall_30x:
        out["lsh_recall_30x"] = recall_30x
    if recall_100x:
        out["lsh_recall_100x"] = recall_100x
    if ann_10x:
        out["ann_recall_10x"] = ann_10x
    if ann_100x:
        out["ann_recall_100x"] = ann_100x
    if ann_300x:
        out["ann_recall_300x"] = ann_300x
    if scale_sweep:
        out["scale_sweep"] = scale_sweep
    if layout_ab:
        out["layout_ab"] = layout_ab
        if layout_ab.get("median_ratio", 0) >= 2:
            # the tax is LARGE: flag the headline so cross-round
            # totals are read layout-aware (r16 verdict item 3)
            out["headline_layout_footnote"] = (
                "driver sf fixtures are single-row-group parquet; the "
                "TPC-H headline entries measured "
                f"{layout_ab['median_ratio']}x slower on that layout "
                f"than on a bounded-{LAYOUT_AB_ROW_GROUP}-row-group "
                "rewrite of the same data (see layout_ab)"
            )
    if n_bad:
        # failure count lives OUTSIDE the summed timings dict so it
        # can't corrupt the wall-clock headline metric
        out["failed_objects"] = n_bad
    if failed:
        out["failed"] = failed
        # the non-comparable partial sum, clearly labeled as such
        out["value_partial"] = round(sum(timings.values()), 3)
    print(json.dumps(out))
    _persist_local_record(out)
    # LAST stdout line, guaranteed < ~1900 chars: the driver records
    # only the final 2000 chars of stdout and its parser has read
    # "parsed": null two rounds running because the full record line
    # above (~15 KB) never fits that tail (r12 verdict item 4). This
    # compact twin carries the headline value + every per-query
    # median at 2 dp; runs/phase/quality diagnostics live in the
    # committed BENCH_LOCAL_r{N}.json the full line also feeds.
    print(f"BENCH_JSON: {compact_bench_line(out, timings, failed)}")
    spark.stop()


def compact_bench_line(out: dict, timings: dict, failed: dict) -> str:
    """The final-stdout-line builder, extracted so the size-budget test
    (tests/test_round13_ops.py) exercises THE shipped truncation logic
    instead of re-implementing it (r13 advice: the inline copy let the
    test keep passing against drifted behavior)."""
    compact = {
        "metric": out["metric"],
        "value": out["value"],
        "unit": out["unit"],
        "sf": out["sf"],
        "queries": {k: round(v, 2) for k, v in timings.items()},
        "query_stat": out["query_stat"],
        "record": f"BENCH_LOCAL_r{_current_round():02d}.json",
    }
    # box-speed brackets travel with the truncated driver tail too
    # (r16): a cross-round total delta in BENCH_r{N}.json is then
    # attributable (box vs plans) without the full committed record
    for probe in ("cpu_probe", "io_probe"):
        if out.get(probe):
            compact[probe] = out[probe]
    # environment verdict (VERDICT r18 item 6): the one word PERF
    # readers need before trusting any wall in this line; hot-query
    # names stay in the committed record (env_hot_queries) to protect
    # the line's size budget — only their count travels here
    if out.get("env_class"):
        compact["env_class"] = out["env_class"]
        compact["env_cpu_probe_median"] = out.get("env_cpu_probe_median")
        compact["env_io_probe_median"] = out.get("env_io_probe_median")
        compact["env_hot_n"] = len(out.get("env_hot_queries", []))
    # burst-suppression count travels with the tail (full rejection
    # metadata lives in the committed BENCH_LOCAL record)
    if out.get("burst_rejections"):
        compact["burst_rejected_n"] = len(out["burst_rejections"])
    if failed:
        compact["n_failed"] = len(failed)
    line = json.dumps(compact, separators=(",", ":"))
    if len(line) > 1900:
        # never let growth in the registry push the line back past
        # the tail budget: drop the cheapest rows first, keep the
        # most expensive (the ones cross-round comparisons read)
        keep = dict(
            sorted(timings.items(), key=lambda kv: -kv[1])[:40]
        )
        compact["queries"] = {k: round(v, 2) for k, v in keep.items()}
        compact["queries_truncated_to"] = 40
        line = json.dumps(compact, separators=(",", ":"))
    return line


def _current_round() -> int:
    """This build round: $SPARK_GRAFT_ROUND, else derived from the
    newest CORRECTNESS_r{N}.json. The driver's end-of-round sequence
    is correctness → bench → write BENCH_r{N}.json (from bench's own
    stdout), so an unconditional N+1 mis-stamps the end-of-round run
    (the r10 record landed as BENCH_LOCAL_r11 — VERDICT r10 item 3).
    Disambiguation: if BENCH_r{N}.json already exists, round N's
    bench has already been recorded and this is a mid-round-N+1 run;
    if it does not, we ARE round N's end-of-round bench."""
    env = os.environ.get("SPARK_GRAFT_ROUND")
    if env:
        return int(env)
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    ns = [
        int(m.group(1))
        for p in glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", p))
    ]
    if not ns:
        return 0
    n = max(ns)
    bench_rec = os.path.join(here, f"BENCH_r{n:02d}.json")
    return n + 1 if os.path.exists(bench_rec) else n


def _persist_local_record(out: dict) -> None:
    """Commit-able per-round copy of the bench record
    (BENCH_LOCAL_r{N}.json, same schema as the stdout line): the
    driver's BENCH_r{N}.json truncates its tail under long output, so
    the in-repo copy is what keeps tools/bench_compare.py able to
    diff any two rounds offline with zero missing queries. At the
    default sf0.1 only — ad-hoc smaller-SF runs must not overwrite
    the round's record."""
    try:
        if out.get("sf") != 0.1:
            return
        here = os.path.dirname(os.path.abspath(__file__))
        path = os.path.join(here, f"BENCH_LOCAL_r{_current_round():02d}.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"wrote {path}", file=sys.stderr)
    except Exception as exc:  # noqa: BLE001 — persistence is additive
        print(f"local bench record not written: {exc}", file=sys.stderr)


if __name__ == "__main__":
    try:
        main()
    except Exception as exc:  # noqa: BLE001 — the record must exist
        # last-resort guarantee: the driver parses ONE JSON line from
        # stdout; a startup/import crash must still yield a record
        # (round 4 had rc=1, parsed=null and therefore no perf record)
        print(
            json.dumps(
                {
                    "metric": "headline_queries_total_wall",
                    "value": None,
                    "unit": "sec",
                    "queries": {},
                    "error": f"{type(exc).__name__}: {exc}"[:500],
                }
            )
        )
        raise SystemExit(1)
