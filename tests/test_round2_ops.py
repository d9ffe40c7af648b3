"""Round-2 operators: row-level diff, duplicate-cluster resolution,
mixture weighting — semantic invariants beyond the oracle gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from mysqldatasynctool_spark.operators import compare, dedup, pipeline
from mysqldatasynctool_spark.sources.fixtures import load
from tests.conftest import SF_DIR, assert_matches_oracle


def test_row_diff_matches_oracle(spark, duck):
    df = compare.QUERIES["migration_row_diff"](spark, SF_DIR)
    assert df.count() > 0
    assert_matches_oracle(df, compare.ORACLES["migration_row_diff"], duck)


def test_row_diff_statuses_match_drift_arithmetic(spark):
    """Each diff status count must equal what the drift moduli imply."""
    keys = [
        r.o_orderkey
        for r in load(spark, SF_DIR, "orders").select("o_orderkey").collect()
    ]
    expect_removed = sum(1 for k in keys if k % compare.DRIFT_DELETE_MOD == 0)
    expect_added = sum(1 for k in keys if k % compare.DRIFT_INSERT_MOD == 3)
    # changed = bumped price, not already counted as removed
    expect_changed = sum(
        1
        for k in keys
        if k % compare.DRIFT_UPDATE_MOD == 0 and k % compare.DRIFT_DELETE_MOD != 0
    )
    got = {
        r.diff_status: r.n
        for r in compare.QUERIES["migration_row_diff"](spark, SF_DIR)
        .groupBy("diff_status")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got.get("removed", 0) == expect_removed
    assert got.get("added", 0) == expect_added
    assert got.get("changed", 0) == expect_changed


def test_clusters_consistent_with_pairs(spark):
    """Every verified near-dup pair must land in one cluster, the
    cluster label must be the min member id, and exactly the min
    member is kept."""
    pairs = [
        (r.ida, r.idb)
        for r in dedup.QUERIES["dedup_minhash_lsh"](spark, SF_DIR).collect()
    ]
    rows = dedup.QUERIES["dedup_clusters"](spark, SF_DIR).collect()
    cluster_of = {r.doc_id: r.cluster_id for r in rows}
    assert pairs and rows
    for a, b in pairs:
        assert cluster_of[a] == cluster_of[b], f"pair ({a},{b}) split across clusters"
    members: dict[int, list[int]] = {}
    for r in rows:
        members.setdefault(r.cluster_id, []).append(r.doc_id)
    for cid, ms in members.items():
        assert cid == min(ms)
    kept = {r.doc_id for r in rows if r.verdict == "keep"}
    assert kept == set(members), "exactly one keep per cluster, the canonical"
    sizes = {r.doc_id: r.cluster_size for r in rows}
    for cid, ms in members.items():
        assert sizes[cid] == len(ms)


def test_mix_weights_normalize(spark):
    rows = pipeline.QUERIES["pipeline_mix_weights"](spark, SF_DIR).collect()
    assert len(rows) > 1
    assert abs(sum(r.mix_weight for r in rows) - 1.0) < 1e-9
    assert abs(sum(r.token_share for r in rows) - 1.0) < 1e-9
    # temperature scaling flattens: the biggest source's weight is
    # pulled below its raw share, the smallest's above
    big = max(rows, key=lambda r: r.n_tokens)
    small = min(rows, key=lambda r: r.n_tokens)
    assert big.mix_weight < big.token_share
    assert small.mix_weight > small.token_share
    assert all(r.tokens_per_epoch <= pipeline.MIX_TOKEN_BUDGET for r in rows)
