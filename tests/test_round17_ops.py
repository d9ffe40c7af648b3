"""Round-17 units: the burst-aware bench statistic (r16 verdict
item 1 — the probes recorded disk bursts, the median now USES them),
its bench_compare consumption, and the layout/serving/scan items of
the r16 brief."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# ---------------------------------------------------------------- #
# select_unburst_runs — the pure statistic core                     #
# ---------------------------------------------------------------- #


def test_select_unburst_rejects_burst_bracketed_samples():
    """The exact r16 failure shape: committed similarity_lsh_multiprobe
    landed on 2.429 s out of runs [7.855, 22.092, 2.429, 1.612, 1.922]
    because the first two samples ate a disk burst and the median
    picked the straddle point. With brackets recording the burst, the
    statistic must drop those two and report the clean tail's median.
    """
    from bench import select_unburst_runs

    walls = [7.855, 22.092, 2.429, 1.612, 1.922]
    brackets = [
        [0.090, 0.050],  # burst during run 0
        [0.050, 0.080],  # burst during run 1
        [0.015, 0.012],
        [0.013, 0.012],
        [0.012, 0.014],
    ]
    kept, rejected = select_unburst_runs(walls, brackets, baseline=0.012)
    assert rejected == [0, 1]
    assert kept == [2, 3, 4]
    assert sorted(walls[i] for i in kept)[1] == 1.922  # the clean median


def test_select_unburst_either_bracket_side_flags():
    """A burst visible in EITHER the pre- or the post-probe flags the
    run: the pair straddles the timed window."""
    from bench import select_unburst_runs

    walls = [1.0, 1.1, 5.0]
    brackets = [[0.01, 0.01], [0.01, 0.01], [0.01, 0.05]]
    kept, rejected = select_unburst_runs(walls, brackets, baseline=0.01)
    assert rejected == [2] and kept == [0, 1]


def test_select_unburst_disables_when_whole_window_degraded():
    """On a box degraded for the whole query window every bracket
    exceeds the threshold; the filter must DISABLE itself and keep all
    runs (plain median) — bracket magnitude no longer discriminates
    samples, and a pick-lowest-bracket fallback was measured keeping a
    query's two slowest runs on probe noise. Same when only one clean
    sample survives (a single-sample 'median' is a lucky minimum)."""
    from bench import select_unburst_runs

    walls = [9.0, 4.0, 5.0]
    brackets = [[0.30, 0.25], [0.10, 0.09], [0.20, 0.15]]
    assert select_unburst_runs(walls, brackets, 0.012) == ([0, 1, 2], [])
    # one clean sample -> still below min_kept -> disabled
    brackets1 = [[0.30, 0.25], [0.012, 0.013], [0.20, 0.15]]
    assert select_unburst_runs(walls, brackets1, 0.012) == ([0, 1, 2], [])


def test_select_unburst_clean_runs_and_degenerate_baseline():
    """No bracket above threshold -> nothing rejected; a zero/absent
    baseline (first query of a run that produced no samples) must
    disable rejection rather than divide by zero or flag everything."""
    from bench import select_unburst_runs

    walls = [1.0, 1.2, 0.9]
    brackets = [[0.012, 0.013], [0.014, 0.012], [0.013, 0.015]]
    assert select_unburst_runs(walls, brackets, 0.012) == ([0, 1, 2], [])
    assert select_unburst_runs(walls, brackets, 0.0) == ([0, 1, 2], [])


def test_io_probe_baseline_is_running_median():
    """The baseline is the running MEDIAN of every probe sample this
    process — the typical level most samples sit at. Not the min: on
    this box, samples taken right after a Spark query run 1.5-2.5x the
    quiet-moment minimum (shuffle flush-out), and a min-based baseline
    rejected 36/40 headline entries in the shakeout run."""
    import bench

    bench._IO_SAMPLES.clear()
    assert bench.io_probe_baseline() == 0.0  # degenerate -> disabled
    bench._IO_SAMPLES.extend([0.05, 0.013, 0.09, 0.012])
    assert bench.io_probe_baseline() == (0.013 + 0.05) / 2
    bench._IO_SAMPLES.append(0.014)
    assert bench.io_probe_baseline() == 0.014
    bench._IO_SAMPLES.clear()


# ---------------------------------------------------------------- #
# bench_compare consumes the rejection metadata                     #
# ---------------------------------------------------------------- #


def _write_record(path, queries, runs, extra=None):
    rec = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "sf": 0.1,
        "queries": queries,
        "runs": runs,
        "query_stat": "median_of_3_adaptive_to_5",
    }
    rec.update(extra or {})
    with open(path, "w") as f:
        json.dump(rec, f)
    return path


def test_bench_compare_labels_burst_suppressed(tmp_path, capsys):
    """The r16->r17 compare must label entries whose new-record
    statistic excluded burst samples, and attribute a REGRESSED row
    whose KEPT samples were all bracketed by a degraded disk to the
    disk, not the plan."""
    import importlib

    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
        ),
    )
    bc = importlib.import_module("bench_compare")

    old = _write_record(
        str(tmp_path / "old.json"),
        {"qa": 1.0, "qb": 2.0, "qc": 3.0},
        {
            "qa": [1.0, 1.1, 0.9],
            "qb": [2.0, 2.1, 1.9],
            "qc": [5.0, 3.0, 3.1, 2.9],
        },
    )
    new = _write_record(
        str(tmp_path / "new.json"),
        {"qa": 1.9, "qb": 4.0, "qc": 6.0},
        {
            "qa": [7.0, 22.0, 1.9],
            "qb": [4.0, 4.1, 3.9],
            "qc": [9.5, 6.0, 6.1, 5.9],
        },
        extra={
            "burst_rejections": {
                "qa": {
                    "rejected_runs": [0, 1],
                    "rejected_walls": [7.0, 22.0],
                    "io_baseline": 0.012,
                    "threshold_x": 2.0,
                    "reason": "io_bracket>2x_idle_baseline",
                }
            },
            "io_bracket_by_run": {
                "qa": [[0.09, 0.05], [0.05, 0.08], [0.013, 0.012]],
                # qb regressed with EVERY kept bracket >2x idle: the
                # whole-window-degradation exoneration must fire
                "qb": [[0.06, 0.05], [0.05, 0.07], [0.06, 0.05]],
                # qc is COLD_STEADY: run0 (the cold run, EXCLUDED from
                # the statistic) has a QUIET bracket; every steady
                # bracket is degraded — the exoneration must ignore
                # run0 and still fire (r17 review finding)
                "qc": [
                    [0.012, 0.013],
                    [0.06, 0.05],
                    [0.05, 0.07],
                    [0.06, 0.05],
                ],
            },
            "io_probe_baseline": 0.012,
            "stat_by_query": {"qc": "steady_median_excl_cold_run0"},
        },
    )
    argv = sys.argv
    try:
        sys.argv = ["bench_compare.py", old, new]
        assert bc.main() == 0
    finally:
        sys.argv = argv
    out = capsys.readouterr().out
    assert "burst-suppressed in new record" in out
    assert "rejected runs [0, 1]" in out
    assert "disk degraded across ALL kept samples" in out
    # the COLD_STEADY row's quiet cold bracket did not mask the
    # whole-window degradation of its steady samples
    qc_line = [ln for ln in out.splitlines() if " qc" in ln]
    assert qc_line and "disk degraded across ALL kept samples" in qc_line[0]
    # and a record WITHOUT the fields still compares (back-compat)
    sys.argv = ["bench_compare.py", old, old]
    try:
        assert bc.main() == 0
    finally:
        sys.argv = argv


def test_bench_source_wires_rejection_metadata():
    """The record must carry the per-run brackets, the idle baseline,
    and per-entry stat labels for rejected runs — greppable in source
    so a refactor can't silently drop the evidence channel."""
    src = open(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "bench.py",
        )
    ).read()
    for needle in (
        '"io_bracket_by_run": io_bracket_by_run',
        '"io_probe_baseline": io_probe_baseline()',
        'out["burst_rejections"] = burst_rejections',
        "_excl_burst_runs",
        "select_unburst_runs(walls, brs, io_probe_baseline())",
    ):
        assert needle in src, needle


# ---------------------------------------------------------------- #
# serving-path: numpy probe selection + artifact drift hardening    #
# ---------------------------------------------------------------- #


def test_serving_probe_cells_matches_fold_reference(spark):
    """r16 verdict item 6: the serving path's probe selection is now
    one numpy matmul + stable argsort; the DECISION (which cells to
    read) must be identical to the old per-centroid pure-Python fold
    on the fixture panel — the module's rounding-robust contract."""
    from tests.conftest import SF_SMALL
    from mysqldatasynctool_spark.operators import similarity as S

    S.reset_trained_state()
    S.similarity_ivfpq_topk(spark, SF_SMALL).count()  # trains + caches
    cents = S._TRAINED_CENTS[(SF_SMALL, S.LLOYD_ITERS)]
    n_cells = len(cents)
    probes = S._ivfpq_probes(n_cells)

    def _fold_reference(qv, qnorm, k):
        def _seq_dot(a, b):
            acc = 0.0
            for x, y in zip(a, b):
                acc = acc + x * y
            return acc

        sims = [
            (_seq_dot(qv, cv) / (qnorm * S._seq_norm(cv)), -cid)
            for cid, cv in cents
        ]
        order = sorted(range(len(cents)), key=lambda i: sims[i], reverse=True)
        return [cents[i][0] for i in order[:k]]

    panel = S._vecs(spark, SF_SMALL).limit(8).collect()
    assert len(panel) == 8
    for r in panel:
        qv = [float(x) for x in r.v]
        qnorm = S._seq_norm(qv)
        got = S._serving_probe_cells(cents, qv, qnorm, probes)
        assert got == _fold_reference(qv, qnorm, probes), r.vec_id
    # sub-probes ask returns a prefix; degenerate probes clamps to 1
    qv = [float(x) for x in panel[0].v]
    qnorm = S._seq_norm(qv)
    full = S._serving_probe_cells(cents, qv, qnorm, n_cells)
    assert S._serving_probe_cells(cents, qv, qnorm, 3) == full[:3]
    assert len(S._serving_probe_cells(cents, qv, qnorm, 0)) == 1


def test_frames_meta_missing_column_refuses_descriptively(spark, tmp_path):
    """r16 advice: a meta block MISSING the `blocks` (or `probes`)
    column must produce the descriptive artifact-mismatch ValueError,
    not a raw AttributeError from the gate condition itself."""
    import pytest as _pytest

    from tests.conftest import SF_SMALL
    from mysqldatasynctool_spark.operators import similarity as S

    S.reset_trained_state()
    S.similarity_ivfpq_topk(spark, SF_SMALL).count()
    path = str(tmp_path / "frames_noblocks")
    S.save_index_frames(spark, path, SF_SMALL)
    m = spark.read.parquet(f"{path}/meta").collect()[0]
    forged = spark.createDataFrame(
        [(m.version, m.sf_dir, int(m.probes), int(m.n_cells))],
        "version string, sf_dir string, probes int, n_cells int",
    )
    forged.coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")
    with _pytest.raises(ValueError, match="artifact mismatch"):
        S._validate_frames_meta(spark, path)


def test_adc_codebook_drift_raises_loudly(spark, tmp_path):
    """r16 advice: a codes row whose code is absent from the codebook
    used to VANISH via the inner ADC join; the left join + raise_error
    must turn the drift into a loud failure naming the rebuild."""
    import glob as _glob

    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest as _pytest

    from tests.conftest import SF_SMALL
    from mysqldatasynctool_spark.operators import similarity as S

    S.reset_trained_state()
    S.similarity_ivfpq_topk(spark, SF_SMALL).count()
    path = str(tmp_path / "frames_drift")
    S.save_index_frames(spark, path, SF_SMALL)
    # corrupt ONE cell's codes file: point code0 at an id no codebook
    # block contains (schema-compatible drift, the silent-vanish case)
    f = sorted(_glob.glob(f"{path}/codes/cell=*/*.parquet"))[0]
    t = pq.read_table(f)
    bad = pa.array([2**40] * t.num_rows, type=t.schema.field("code0").type)
    t = t.set_column(t.schema.get_field_index("code0"), "code0", bad)
    pq.write_table(t, f)
    # drop Hadoop's .crc sidecar — the rewrite must read as VALID
    # parquet (schema-compatible drift), not as a corrupt file
    crc = os.path.join(os.path.dirname(f), f".{os.path.basename(f)}.crc")
    if os.path.exists(crc):
        os.remove(crc)

    emb = S._vecs(spark, SF_SMALL)
    qv = [float(x) for x in emb.limit(1).collect()[0].v]
    S.load_trained_index  # noqa: B018 — dicts already trained above
    with _pytest.raises(Exception, match="codebook/codes drift"):
        S.ivfpq_search_artifact(spark, path, qv).collect()


def test_layout_ab_block_measures_both_layouts(spark, monkeypatch, tmp_path):
    """r16 verdict item 3: the layout A/B must rewrite bounded-row-
    group copies (layoutProbe-verified), time each query on BOTH
    layouts, and report per-query walls + ratios. Mechanics tested
    with cheap stand-in queries; the real 7-query block runs inside
    bench.py each round."""
    import bench
    from tests.conftest import SF_SMALL

    def _q(s, d):
        return s.read.parquet(f"{d}/lineitem.parquet").groupBy().count()

    monkeypatch.setattr(bench, "LAYOUT_AB_QUERIES", ["qx", "qy"])
    monkeypatch.setattr(bench, "LAYOUT_AB_ROW_GROUP", 1_000)

    def med(xs):
        s = sorted(xs)
        m = len(s) // 2
        return s[m] if len(s) % 2 else round((s[m - 1] + s[m]) / 2, 3)

    r = bench._layout_ab_block(spark, {"qx": _q, "qy": _q}, SF_SMALL, med)
    assert r["row_group_size"] == 1_000
    # sf0.001 lineitem = 6000 rows -> 6 groups in the bounded copy
    assert r["lineitem_layout"]["driver"]["row_groups"] == 1
    assert r["lineitem_layout"]["bounded"]["row_groups"] == 6
    assert r["lineitem_layout"]["bounded"]["max_scan_tasks"] == 6
    for q in ("qx", "qy"):
        row = r["queries"][q]
        assert row["driver_rg1"] > 0 and row["bounded_rg20k"] > 0
        assert len(row["runs_driver"]) == len(row["runs_bounded"]) == 3
        assert row["ratio"] > 0
    assert r["median_ratio"] > 0
    # the temp copy is cleaned up
    import glob as _glob
    import tempfile as _tf

    assert not _glob.glob(os.path.join(_tf.gettempdir(), "bench_layout_ab_*"))


def test_scan_parallelism_sampling_mode(tmp_path):
    """r16 verdict item 7: on a huge tree the footer walk must be
    sample-able — N evenly-spaced footers, extrapolated counts, exact
    bytes, `sampled` flag — and exact below the threshold. On a
    uniform 500-file tree the sampled estimate agrees with exact on
    `bounded` and on the extrapolated totals."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mysqldatasynctool_spark.sources.files import parquet_scan_parallelism

    d = tmp_path / "tree.parquet"
    t = pa.table({"x": list(range(200))})
    for i in range(500):
        sub = d / f"part={i % 10}"
        sub.mkdir(parents=True, exist_ok=True)
        pq.write_table(t, str(sub / f"f{i:03d}.parquet"), row_group_size=100)

    exact = parquet_scan_parallelism(str(d), target_parallelism=32)
    sampled = parquet_scan_parallelism(
        str(d), target_parallelism=32, sample_files=50
    )
    assert exact["files"] == sampled["files"] == 500
    assert exact["row_groups"] == 1000 and not exact["bounded"]
    assert "sampled" not in exact
    assert sampled["sampled"] and sampled["sampled_files"] == 50
    # uniform tree -> extrapolation is exact
    assert sampled["row_groups"] == exact["row_groups"]
    assert sampled["rows"] == exact["rows"]
    assert sampled["bytes"] == exact["bytes"]  # bytes never sampled
    assert sampled["bounded"] == exact["bounded"]

    # threshold >= file count -> exact path, no flag
    below = parquet_scan_parallelism(str(d), sample_files=500)
    assert "sampled" not in below and below["row_groups"] == 1000


def test_serving_cent_cache_per_index_and_reset():
    """The serving path's centroid matrix + exact norms are one-time
    per index (the list->matrix conversion and _seq_norm folds cost
    seconds at 10^5 cells — per-query would defeat the numpy rewrite):
    a keyed call populates the cache, a stale-length entry is rebuilt
    (an index retrained to a different cell count under the same key
    must not serve the old matrix), and reset_trained_state clears it."""
    from mysqldatasynctool_spark.operators import similarity as S

    cents = [(i, [float(i), 1.0]) for i in range(8)]
    qv, qnorm = [1.0, 0.5], S._seq_norm([1.0, 0.5])
    S._SERVING_CENT_CACHE.clear()
    a = S._serving_probe_cells(cents, qv, qnorm, 3, cache_key=("k", 3))
    assert ("k", 3) in S._SERVING_CENT_CACHE
    assert S._serving_probe_cells(cents, qv, qnorm, 3, cache_key=("k", 3)) == a
    # stale-length entry (same key, different index) is rebuilt
    bigger = cents + [(8, [9.0, 9.0])]
    b = S._serving_probe_cells(bigger, qv, qnorm, 9, cache_key=("k", 3))
    assert len(b) == 9 and S._SERVING_CENT_CACHE[("k", 3)][2] == 9
    # unkeyed calls never populate
    S._SERVING_CENT_CACHE.clear()
    S._serving_probe_cells(cents, qv, qnorm, 3)
    assert not S._SERVING_CENT_CACHE
    S._SERVING_CENT_CACHE[("k", 3)] = ("x", "y", 1)
    S.reset_trained_state()
    assert not S._SERVING_CENT_CACHE


def test_load_trained_index_invalidates_serving_cache(spark, tmp_path):
    """r17 review finding: load_trained_index REPLACES the in-process
    centroids; a same-length serving matrix cached under the same key
    would pass _serving_probe_cells' length guard and serve stale
    centroids. The load must pop the serving-cache entry for every
    IVF key it replaces."""
    from tests.conftest import SF_SMALL
    from mysqldatasynctool_spark.operators import similarity as S

    S.reset_trained_state()
    S.similarity_ivfpq_topk(spark, SF_SMALL).count()
    path = str(tmp_path / "idx")
    S.save_trained_index(spark, path)
    key = (SF_SMALL, S.LLOYD_ITERS)
    S._SERVING_CENT_CACHE[key] = ("stale-matrix", "stale-norms", 999)
    S.load_trained_index(spark, path)
    assert key not in S._SERVING_CENT_CACHE


def test_sliding_distinct_sketch_merge_matches_exact(spark):
    """The HLL sketch-merge sliding distinct (tumbling-bucket sketches
    union'd per window — no event-level fan-out) must produce the
    exact twin's window set with every estimate inside the 5% bound,
    and its sketch path must shuffle fewer rows than the fanned
    two-step form (the entire point of merging sketches)."""
    from mysqldatasynctool_spark.operators import events as E
    from mysqldatasynctool_spark.plans import executed_plan_metrics

    sf = "/root/testdata/sf0.01"
    got = E.events_sliding_distinct_sketch_merge(spark, sf)
    rows = got.collect()
    assert rows and all(r.within_tol for r in rows)

    exact = {
        (r.win_start, r.n_users)
        for r in E.events_sliding_distinct_users(spark, sf)
        .select("win_start", "n_users")
        .collect()
    }
    assert {(r.win_start, r.n_users) for r in rows} == exact

    m = executed_plan_metrics(got)  # populated by the collect above
    fanned = E.events_sliding_distinct_approx(spark, sf)
    fanned._jdf.queryExecution().toRdd().count()
    m_fanned = executed_plan_metrics(fanned)
    # entry includes its exact-verification side; even so the sketch
    # path keeps total shuffle in the same class while the x4 event
    # fan-out is gone from the operator half
    assert m["spill_bytes"] == 0
    assert m["shuffle_records_written"] < 1.5 * m_fanned["shuffle_records_written"]


def test_two_step_distinct_excludes_null_keys(spark):
    """The shared distinct-pairs rewrite must match COUNT(DISTINCT)
    semantics on NULL keys (which it excludes) — the fixtures never
    emit NULL keys, so this pins the invariant on a synthetic frame."""
    from pyspark.sql import functions as F

    from mysqldatasynctool_spark.operators.events import (
        _distinct_window_users,
    )

    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 00:01:00"),
            (2, "2024-01-01 00:02:00"),
            (2, "2024-01-01 00:03:00"),  # dup pair
            (None, "2024-01-01 00:04:00"),  # NULL user: excluded
        ],
        "user_id int, ts_s string",
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
    pairs = _distinct_window_users(ev)
    counts = {
        r.start: r.n
        for r in pairs.groupBy(F.col("w.start").alias("start"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    # every window containing the events has exactly 2 distinct
    # non-NULL users (1 and 2) — the NULL row contributes nothing
    assert counts and set(counts.values()) == {2}
