"""Round-13 additions: trained-ANN artifact persistence, MMR degenerate
-input degradation, bench compact-line size budget."""

from __future__ import annotations

import json

import pytest

from tests.conftest import SF_SMALL


def test_trained_index_artifact_roundtrip_bit_identical(spark, tmp_path):
    """save_trained_index -> reset_trained_state -> load_trained_index
    must reproduce the driver-side trained state BIT-identically (r12
    verdict item 7: on a real cluster a driver restart would silently
    retrain; the artifact is the FAISS index-file analogue). Training
    is deterministic, so the loaded state must equal the retrained
    state float-for-float — and a query run on the loaded state must
    equal the retrained run row-for-row."""
    import numpy as np

    from mysqldatasynctool_spark.operators import similarity as S

    S.reset_trained_state()
    # populate both dicts via the production entry (trains IVF cells
    # AND the PQ codebook under cache_key=sf_dir)
    retrained = [
        tuple(r)
        for r in S.similarity_ivfpq_topk(spark, SF_SMALL).collect()
    ]
    assert (SF_SMALL, S.LLOYD_ITERS) in S._TRAINED_CENTS
    assert any(k[0] == SF_SMALL for k in S._TRAINED_CB)
    snap_cents = {k: [(c, list(v)) for c, v in vs] for k, vs in S._TRAINED_CENTS.items()}
    snap_cb = {
        k: [(list(ids), mat.copy()) for ids, mat in blocks]
        for k, blocks in S._TRAINED_CB.items()
    }

    path = str(tmp_path / "trained_index")
    n_saved = S.save_trained_index(spark, path)
    assert n_saved > 0

    dropped = S.reset_trained_state()
    assert dropped >= 2
    assert not S._TRAINED_CENTS and not S._TRAINED_CB

    n_loaded = S.load_trained_index(spark, path)
    assert n_loaded == n_saved
    assert set(S._TRAINED_CENTS) == set(snap_cents)
    for k, vs in snap_cents.items():
        got = S._TRAINED_CENTS[k]
        assert [c for c, _ in got] == [c for c, _ in vs]
        for (_, a), (_, b) in zip(got, vs):
            assert list(a) == list(b)  # exact float equality
    assert set(S._TRAINED_CB) == set(snap_cb)
    for k, blocks in snap_cb.items():
        got = S._TRAINED_CB[k]
        assert len(got) == len(blocks)
        for (gids, gmat), (ids, mat) in zip(got, blocks):
            assert gids == ids
            assert np.array_equal(gmat, mat)

    # the query on LOADED state must reproduce the retrained run
    reloaded = [
        tuple(r)
        for r in S.similarity_ivfpq_topk(spark, SF_SMALL).collect()
    ]
    assert reloaded == retrained


def test_trained_index_artifact_fresh_process_bit_identical(spark, tmp_path):
    """The literal driver-restart scenario (r12 verdict item 7): a
    FRESH python process with its own SparkSession loads the artifact
    and must hold bit-identical trained state — floats compared via
    repr, which round-trips doubles exactly."""
    import subprocess
    import sys as _sys

    from mysqldatasynctool_spark.operators import similarity as S

    if (SF_SMALL, S.LLOYD_ITERS) not in S._TRAINED_CENTS or not any(
        k[0] == SF_SMALL for k in S._TRAINED_CB
    ):
        S.similarity_ivfpq_topk(spark, SF_SMALL).count()
    path = str(tmp_path / "restart_index")
    S.save_trained_index(spark, path)

    def snapshot(cents, cb):
        return {
            "cents": {
                repr(k): [(c, [repr(x) for x in v]) for c, v in vs]
                for k, vs in cents.items()
            },
            "cb": {
                repr(k): [
                    (list(ids), [[repr(x) for x in row] for row in mat])
                    for ids, mat in blocks
                ]
                for k, blocks in cb.items()
            },
        }

    mine = json.dumps(snapshot(S._TRAINED_CENTS, S._TRAINED_CB), sort_keys=True)
    (tmp_path / "parent.json").write_text(mine)

    child = f"""
import json, sys
sys.path.insert(0, {repr(str(__import__('os').path.dirname(__import__('os').path.dirname(__import__('os').path.abspath(__file__)))))})
from mysqldatasynctool_spark.session import get_spark
from mysqldatasynctool_spark.operators import similarity as S
spark = get_spark(app_name="artifact-restart", master="local[4]", shuffle_partitions=4)
assert not S._TRAINED_CENTS and not S._TRAINED_CB
S.load_trained_index(spark, {path!r})
def snapshot(cents, cb):
    return {{
        "cents": {{repr(k): [(c, [repr(x) for x in v]) for c, v in vs]
                   for k, vs in cents.items()}},
        "cb": {{repr(k): [(list(ids), [[repr(x) for x in row] for row in mat])
                 for ids, mat in blocks] for k, blocks in cb.items()}},
    }}
open({repr(str(tmp_path / "child.json"))}, "w").write(
    json.dumps(snapshot(S._TRAINED_CENTS, S._TRAINED_CB), sort_keys=True))
spark.stop()
"""
    subprocess.run(
        [_sys.executable, "-c", child], check=True, timeout=300, cwd="/tmp"
    )
    theirs = (tmp_path / "child.json").read_text()
    # fresh-process state must cover every key this process trained
    # for SF_SMALL and match it float-for-float; this process may
    # additionally hold other datasets' training (session fixture)
    mine_d, theirs_d = json.loads(mine), json.loads(theirs)
    for kind in ("cents", "cb"):
        for k, v in theirs_d[kind].items():
            assert mine_d[kind][k] == v
        assert any(SF_SMALL in k for k in theirs_d[kind])


def test_trained_index_artifact_version_gate(spark, tmp_path):
    """An artifact written under different knobs must be REFUSED, not
    silently loaded: a stale index trained under other LLOYD_ITERS /
    PQ geometry would break the oracle contract."""
    from mysqldatasynctool_spark.operators import similarity as S

    if not S._TRAINED_CENTS:
        S._assign_cells(
            spark, S._vecs(spark, SF_SMALL), probes=1, cache_key=SF_SMALL
        )
    path = str(tmp_path / "stale_index")
    S.save_trained_index(spark, path)
    # rewrite with a corrupted version string
    df = spark.read.parquet(path)
    from pyspark.sql import functions as F

    df.withColumn("version", F.lit("v0:other-knobs")).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "stale_index2"))
    with pytest.raises(ValueError, match="version mismatch"):
        S.load_trained_index(spark, str(tmp_path / "stale_index2"))


def test_mmr_degenerate_candidates_lose_not_raise(spark):
    """A zero-norm candidate makes rel/sim non-finite; the greedy pick
    key must let it LOSE every comparison (pre-r12 round() behavior)
    instead of raising from math.floor (r12 advice). Degenerates are
    picked only when nothing finite remains, ties by ascending id."""
    from pyspark.sql import types as T

    from mysqldatasynctool_spark.operators.similarity import MMR_K, _mmr_select

    schema = T.StructType(
        [
            T.StructField("qid", T.LongType()),
            T.StructField("vec_id", T.LongType()),
            T.StructField("rel", T.DoubleType()),
            T.StructField("v", T.ArrayType(T.DoubleType())),
            T.StructField("vnorm", T.DoubleType()),
        ]
    )
    nan = float("nan")
    rows = [
        (1, 10, 0.9, [1.0, 0.0], 1.0),
        (1, 11, 0.5, [0.0, 1.0], 1.0),
        # zero-norm degenerates: upstream cosine rel is NaN
        (1, 12, nan, [0.0, 0.0], 0.0),
        (1, 13, nan, [0.0, 0.0], 0.0),
    ]
    cand = spark.createDataFrame(rows, schema)
    out = _mmr_select(cand).collect()
    got = [(r.rank, r.vec_id) for r in out]
    k = min(MMR_K, 4)
    # finite candidates first (10 best rel, then 11), degenerates
    # last in ascending-id order — and no exception anywhere
    assert got[:2] == [(1, 10), (2, 11)]
    assert [v for _, v in got[2:k]] == [12, 13][: k - 2]


def test_ivfpq_reuses_persisted_index_frames(spark):
    """Steady-state calls must REUSE the persisted assignment and PQ
    code frames (r13: the r12 swap-per-call variant re-ran the numpy
    assignment scan and PQ encode on every call), and the cache stays
    bounded at one frame per (dataset, kind)."""
    from mysqldatasynctool_spark.operators import similarity as S

    S.reset_trained_state()
    S.similarity_ivfpq_topk(spark, SF_SMALL).count()
    keys = set(S._PERSISTED_WITH_CELLS)
    assert (SF_SMALL, S.ivfpq_probes_for(SF_SMALL)) in keys
    assert (SF_SMALL, "pq_codes") in keys
    first = dict(S._PERSISTED_WITH_CELLS)

    S.similarity_ivfpq_topk(spark, SF_SMALL).count()
    assert set(S._PERSISTED_WITH_CELLS) == keys, "cache must stay bounded"
    for k, frame in S._PERSISTED_WITH_CELLS.items():
        assert frame is first[k], f"{k}: frame must be reused, not rebuilt"
    # full reset releases everything (bench COLD_STEADY cold path)
    S.reset_trained_state()
    assert not S._PERSISTED_WITH_CELLS


def test_bench_compact_line_fits_driver_tail():
    """bench.py's final BENCH_JSON line must stay under the driver's
    2000-char stdout tail with the full current registry priced in —
    the whole point of the line is surviving tail truncation (r12
    verdict item 4)."""
    # simulate the worst case: every HEADLINE query present at 4-char
    # values (e.g. 12.57), plus the migrate rows bench adds — and call
    # bench.compact_bench_line itself (r13 advice: an inline
    # re-implementation kept passing against drifted shipped logic)
    import bench

    timings = {name: 99.99 for name in bench.HEADLINE}
    timings["migrate_full_db_with_verify"] = 99.99
    timings["migrate_jdbc_db_to_db"] = 99.99
    out = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "sf": 0.1,
        "query_stat": "median_of_3_adaptive_to_5",
    }
    failed = {f"_fail{i}": "x" for i in range(99)}
    line = bench.compact_bench_line(out, timings, failed)
    assert len(line) + len("BENCH_JSON: ") <= 1990
    # the line must parse and carry the headline value + a queries map
    parsed = json.loads(line)
    assert parsed["value"] == out["value"]
    assert parsed["n_failed"] == 99
    assert parsed["queries"]
