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


def test_paragraph_dedup_planted_dups_detected(spark):
    """Planted near-duplicate docs share 20-token segments verbatim,
    so segment-level dedup must flag a nonzero duplicate ratio
    somewhere, dup counts must never exceed segment counts, and the
    corpus-wide first occurrence of every segment must be kept
    (sum of dups < sum of segments)."""
    rows = dedup.QUERIES["dedup_paragraph_exact"](spark, SF_DIR).collect()
    assert rows
    assert all(0 <= r.n_dup_segments <= r.n_segments for r in rows)
    assert any(r.n_dup_segments > 0 for r in rows), "no duplicate segments found"
    assert sum(r.n_dup_segments for r in rows) < sum(r.n_segments for r in rows)


def test_paragraph_dedup_constructed_corpus(spark):
    """Hand-built corpus with known segment structure: identical docs
    dup against the earliest doc_id; partial (<20-token) segments
    still count; unique docs have zero dups."""
    docs = spark.createDataFrame(
        [
            (0, "a b c"),          # 1 partial segment
            (1, "a b c"),          # identical -> its segment is a dup
            (2, "x y z"),          # unique
            (3, " ".join(str(i) for i in range(45))),  # 3 segments (20+20+5)
        ],
        "doc_id long, text string",
    )
    rows = {
        r.doc_id: r
        for r in dedup.paragraph_dedup_report(docs).collect()
    }
    assert rows[0].n_segments == 1 and rows[0].n_dup_segments == 0
    assert rows[1].n_segments == 1 and rows[1].n_dup_segments == 1
    assert rows[1].dup_ratio == 1.0
    assert rows[2].n_segments == 1 and rows[2].n_dup_segments == 0
    assert rows[3].n_segments == 3 and rows[3].n_dup_segments == 0


def test_train_val_split_deterministic_and_complete(spark):
    rows = pipeline.QUERIES["pipeline_train_val_split"](spark, SF_DIR).collect()
    by_split = {r.split: r.n_docs for r in rows}
    n_docs = load(spark, SF_DIR, "documents").count()
    assert sum(by_split.values()) == n_docs, "split must partition the corpus"
    assert set(by_split) == {"train", "val", "test"}
    # 90/5/5 within hash noise
    assert by_split["train"] > by_split["val"]
    assert by_split["train"] > by_split["test"]
    again = {
        r.split: r.n_docs
        for r in pipeline.QUERIES["pipeline_train_val_split"](spark, SF_DIR).collect()
    }
    assert again == by_split, "hash split must be reproducible"


def test_global_shuffle_is_permutation(spark):
    rows = pipeline.QUERIES["pipeline_global_shuffle"](spark, SF_DIR).collect()
    n_docs = load(spark, SF_DIR, "documents").count()
    assert len(rows) == n_docs
    assert len({r.doc_id for r in rows}) == n_docs, "must be a permutation"
    # positions are contiguous 1..size within each shard
    shards: dict[int, list[int]] = {}
    for r in rows:
        shards.setdefault(r.shard, []).append(r.pos)
    assert len(shards) > 1
    for poss in shards.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    # not the identity order: hash shuffling must actually reorder
    first_shard = sorted(shards)[0]
    docs_in_order = [
        r.doc_id for r in sorted(rows, key=lambda r: (r.shard, r.pos))
    ]
    assert docs_in_order != sorted(docs_in_order)


def test_frame_sample_geometry(spark):
    """Fan-out must follow the frame geometry exactly: every 4th
    64-byte frame of each payload, offsets aligned, digests unique per
    distinct content."""
    from mysqldatasynctool_spark.functions.multimodal import FRAME_BYTES, FRAME_STRIDE
    from mysqldatasynctool_spark.operators import multimodal

    rows = multimodal.QUERIES["multimodal_frame_sample"](spark, SF_DIR).collect()
    assert rows
    lens = {
        r.doc_id: r.n_chars
        for r in load(spark, SF_DIR, "documents").select("doc_id", "n_chars").collect()
    }
    by_doc: dict[int, list] = {}
    for r in rows:
        assert r.offset == r.frame_idx * FRAME_BYTES
        assert r.frame_idx % FRAME_STRIDE == 0
        assert r.n_bytes == FRAME_BYTES
        by_doc.setdefault(r.doc_id, []).append(r.frame_idx)
    for doc_id, idxs in by_doc.items():
        n_frames = lens[doc_id] // FRAME_BYTES
        assert sorted(idxs) == list(range(0, n_frames, FRAME_STRIDE))


def test_ivf_multiprobe_recall_not_worse(spark):
    """probes=2 scans a superset of cells per query, so its hit set
    vs the exact brute-force top-k must be at least as large."""
    from mysqldatasynctool_spark.operators import similarity

    exact = {
        (r.qid, r.neighbor_id)
        for r in similarity.QUERIES["similarity_topk_bruteforce"](spark, SF_DIR).collect()
    }
    p1 = {
        (r.qid, r.neighbor_id)
        for r in similarity.similarity_ivf_pandas(spark, SF_DIR, probes=1).collect()
    }
    p2 = {
        (r.qid, r.neighbor_id)
        for r in similarity.similarity_ivf_pandas(spark, SF_DIR, probes=2).collect()
    }
    assert len(p2 & exact) >= len(p1 & exact)
    assert len(p1 & exact) >= 1


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


def test_asof_salted_equals_single_exchange_form(spark):
    """The time-bucketed skew twin must reproduce the single-exchange
    asof output EXACTLY — every (purchase, click_ts) pair, including
    NULL click_ts rows at the tolerance edge."""
    from mysqldatasynctool_spark.operators import events

    base = events.QUERIES["events_asof_join"](spark, SF_DIR).collect()
    salted = events.QUERIES["events_asof_join_salted"](spark, SF_DIR).collect()
    assert len(base) > 0
    assert [tuple(r) for r in base] == [tuple(r) for r in salted]
    # both NULL and non-NULL outcomes must actually occur, or the
    # tolerance path was never exercised
    assert any(r.click_ts is None for r in base)
    assert any(r.click_ts is not None for r in base)


def test_session_window_builtin_sessions_disjoint(spark):
    """Native session_window sessions must be disjoint per user and
    each span >= the 30-min gap (end = last event + gap)."""
    from mysqldatasynctool_spark.operators import events as ev_ops

    rows = ev_ops.events_session_window_builtin(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    prev_end, prev_user = None, None
    for r in rows:
        assert (r["session_end"] - r["session_start"]).total_seconds() >= 1800
        if r["user_id"] == prev_user:
            # next session starts at/after the previous session's end
            assert r["session_start"] >= prev_end
        prev_user, prev_end = r["user_id"], r["session_end"]
