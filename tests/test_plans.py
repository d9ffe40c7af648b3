"""Physical-plan audits: the scale properties ARCHITECTURE.md claims,
asserted against .explain output so they cannot silently regress.

At sf0.01 everything is fast regardless; these tests pin the *plan
shape* that matters at 100 TB: pushdown reaching the scan, broadcast
joins for dims, partial aggregation, codegen in hot paths.
"""

from __future__ import annotations

import pytest

from mysqldatasynctool_spark.operators import dedup, relational, similarity, textops

SF = "/root/testdata/sf0.01"


def _plan(spark, df, mode: str = "formatted") -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def test_filter_pushdown_reaches_parquet_scan(spark):
    plan = _plan(spark, relational.project_filter(spark, SF))
    assert "PushedFilters: [" in plan
    assert "GreaterThanOrEqual(l_quantity,45.0)" in plan
    assert "EqualTo(l_returnflag,R)" in plan


def test_column_pruning(spark):
    plan = _plan(spark, relational.project_filter(spark, SF))
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    # 2-column projection + filter/computed columns; the 16-col table
    # must NOT be read wholesale
    assert "l_orderkey" in read_schema and "l_shipdate" not in read_schema
    assert read_schema.count(":") <= 8


def test_q5_all_dim_joins_broadcast(spark):
    plan = _plan(spark, relational.q5_local_supplier_volume(spark, SF), "simple")
    assert plan.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in plan


def test_q1_partial_aggregation(spark):
    plan = _plan(spark, relational.q1_pricing_summary(spark, SF), "simple")
    assert "partial_sum" in plan  # map-side combine before the shuffle


def test_topk_uses_take_ordered(spark):
    plan = _plan(spark, relational.sort_limit_topk(spark, SF), "simple")
    assert "TakeOrderedAndProject" in plan  # never a global sort


def test_no_python_udfs_in_text_pipeline(spark):
    for name in ("text_token_stats", "text_quality_score", "text_fingerprint"):
        plan = _plan(spark, textops.QUERIES[name](spark, SF), "simple")
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name


def test_simhash_no_pair_distinct_credit_assignment(spark):
    """Pair dedup is CREDIT ASSIGNMENT (first matching block), not a
    distinct(): no aggregate over pair keys may exist, so the only
    hash shuffles are the two per-side signature aggregations, and no
    HashAggregate keyed on the pair ids appears anywhere (measured
    3.66 s -> 2.39 s at sf0.1 when the 1.5M-pair distinct died)."""
    import re

    plan = _plan(spark, dedup.QUERIES["dedup_simhash"](spark, SF), "formatted")
    assert plan.count("Exchange hashpartitioning") <= 2
    agg_keys = re.findall(r"Keys \[\d+\]: \[([^\]]*)\]", plan)
    assert not any("ida" in k or "idb" in k for k in agg_keys), agg_keys


def test_embedding_lsh_join_is_bucketed_not_cross(spark):
    """The production embedding-dedup twin must join on the LSH bucket
    key — never a cartesian/nested-loop pairing."""
    plan = _plan(spark, dedup.QUERIES["dedup_embedding_lsh"](spark, SF), "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ivf_scores_in_cogrouped_pandas(spark):
    """IVF search must score per cell inside a cogrouped pandas op
    (one numpy matmul per cell) — not via interpreted per-pair dots,
    whose signature would be `aggregate(zip_with...)` in a Project
    above the join."""
    plan = _plan(spark, similarity.QUERIES["similarity_ivf_pandas"](spark, SF), "simple")
    assert "FlatMapCoGroupsInPandas" in plan
    assert "zip_with" not in plan


def test_funnel_join_is_keyed_not_nested_loop(spark):
    """The stream-stream-shaped funnel join must hash/merge on the
    user_id equi-key with the interval predicate as a residual — never
    a nested-loop/cartesian plan (which the pure range form would
    produce and which cannot scale or bound streaming state)."""
    from mysqldatasynctool_spark.operators import events

    plan = _plan(spark, events.QUERIES["events_funnel_join"](spark, SF), "simple")
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    join_lines = [l for l in plan.splitlines() if "Join" in l and "user_id" in l]
    assert join_lines, "expected an equi-join keyed on user_id"


def test_salted_join_key_includes_salt(spark):
    """The skew-salted join's physical key must be (key, _salt) so a
    hot key's rows spread over salt-many reducers."""
    plan = _plan(spark, relational.QUERIES["join_skew_salted"](spark, SF), "simple")
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert any(
        "Join" in l and "_salt" in l for l in plan.splitlines()
    ), "join key does not include the salt column"


def test_end_to_end_pipeline_has_no_joins_or_python(spark):
    """The composed dedup->quality->split pipeline is windows +
    aggregates only: no join (nothing pairs), no Python eval nodes,
    and document text must not appear in any exchange."""
    from mysqldatasynctool_spark.operators import pipeline

    plan = _plan(spark, pipeline.QUERIES["pipeline_end_to_end"](spark, SF), "simple")
    assert "Join" not in plan
    assert "PythonUDF" not in plan and "ArrowEval" not in plan


def test_minhash_band_join_shuffles_slim_rows(spark):
    plan = _plan(spark, dedup.QUERIES["dedup_minhash_lsh"](spark, SF), "formatted")
    # the band self-join must not carry shingle arrays through its
    # exchanges: no array column in any Exchange hashpartitioning on
    # the band key
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line and "band_idx" in line:
            assert "sh#" not in line, f"band shuffle carries arrays: {line[:200]}"


def test_asof_join_has_no_join_nodes(spark):
    """events_asof_join is implemented as union + ONE windowed pass
    (shuffle keyed on user_id), not as a join: any Join/Cartesian node
    in the plan means the cheap shape regressed to the
    interval-join+groupBy rewrite (unbounded pair blowup on hot
    users)."""
    from mysqldatasynctool_spark.operators import events

    plan = _plan(spark, events.QUERIES["events_asof_join"](spark, SF), "simple")
    assert "Join" not in plan and "Cartesian" not in plan
    assert "Window" in plan


def test_hypertable_rollup_expands_mapside_with_partial_agg(spark):
    """ROLLUP must expand grouping sets map-side (Expand node) and
    partial-aggregate BEFORE the single exchange — the property that
    makes hour/day/total cost one shuffle, not three scans."""
    from mysqldatasynctool_spark.operators import events

    plan = _plan(spark, events.QUERIES["events_hypertable_rollup"](spark, SF), "simple")
    assert "Expand" in plan
    assert "partial_" in plan, "no map-side partial aggregation under ROLLUP"


def test_sessionization_single_data_shuffle(spark):
    """Sessionization's lag window, cumsum window AND the session
    groupBy must all ride ONE hashpartitioning(user_id) exchange
    (hash-clustering by user_id satisfies the (user_id, session_id)
    grouping requirement); the only other exchange allowed is the
    final presentation sort's rangepartitioning."""
    from mysqldatasynctool_spark.operators import events

    plan = _plan(spark, events.QUERIES["events_sessionization"](spark, SF), "simple")
    assert plan.count("Exchange hashpartitioning") == 1


def test_asof_join_single_hash_exchange_no_join(spark):
    """events_asof_join's whole contract at 100 TB: ONE hash exchange
    on user_id, a per-key sort, NO join operator (the union+window
    rewrite) — the interval-join form it replaces would blow up on
    hot users. The trailing rangepartitioning exchange is the
    presentation orderBy, not part of the operator."""
    from mysqldatasynctool_spark.operators import events

    plan = _plan(spark, events.QUERIES["events_asof_join"](spark, SF), "simple")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "user_id" in plan.split("Exchange hashpartitioning", 1)[1].split("\n")[0]
    for joinop in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
                   "CartesianProduct", "BroadcastNestedLoopJoin"):
        assert joinop not in plan, joinop


def test_asof_join_salted_partitions_by_user_and_bucket(spark):
    """The skew twin must key every wide stage by (user_id, bucket) —
    never user_id alone — so a single hot user cannot serialize on
    one task."""
    import re

    from mysqldatasynctool_spark.operators import events

    plan = _plan(
        spark, events.QUERIES["events_asof_join_salted"](spark, SF), "simple"
    )
    hash_parts = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    assert hash_parts, "expected hash exchanges"
    for keys in hash_parts:
        assert "user_id" in keys and "bucket" in keys, keys


def test_interval_overlap_join_is_equi_bucketed(spark):
    """The large-large interval-overlap join must execute as an
    EQUI-join on the hour bucket (hash/sort-merge), never the
    nested-loop product the raw inequality predicate would plan;
    the credit-assignment bucket filter means no dedup shuffle."""
    from mysqldatasynctool_spark.operators import events

    plan = _plan(spark, events.events_interval_overlap_join(spark, SF), "simple")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "BroadcastHashJoin" in plan
    )
    # no distinct-dedup of pair hits anywhere in the plan
    assert "Deduplicate" not in plan


def test_ohlc_bars_partial_agg_single_exchange(spark):
    """OHLC must partial-aggregate map-side (min_by/max_by combine)
    before ONE hash exchange on the hour bucket — the property that
    makes it the scale rewrite of the per-bucket window formulation
    (which would sort every raw row). The only other exchange is the
    presentation sort's rangepartitioning."""
    from mysqldatasynctool_spark.operators import events

    plan = _plan(spark, events.QUERIES["events_ohlc_bars"](spark, SF), "simple")
    assert "partial_" in plan, "no map-side partial aggregation for OHLC"
    assert plan.count("Exchange hashpartitioning") == 1


def test_market_basket_pair_join_is_keyed(spark):
    """The pair-generation self-join must be an equi-join on
    l_orderkey (bounded per-order fanout), never a nested loop; the
    item-count dims ride in as broadcasts; top-k is
    TakeOrderedAndProject, not a global sort."""
    from mysqldatasynctool_spark.operators import advanced

    plan = _plan(spark, advanced.QUERIES["agg_market_basket"](spark, SF), "simple")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 2
    assert "TakeOrderedAndProject" in plan


def test_incremental_rollup_touched_set_broadcast(spark):
    """The refresh must prune with the touched-hour set as a BROADCAST
    semi/anti pair — never a shuffled join against the delta — so
    refresh cost tracks the delta size."""
    from mysqldatasynctool_spark.operators import events

    plan = _plan(
        spark, events.QUERIES["events_incremental_rollup"](spark, SF), "simple"
    )
    assert "LeftAnti, BuildRight" in plan or (
        "LeftAnti" in plan and "BroadcastHashJoin" in plan
    )
    assert "LeftSemi" in plan


def test_range_search_is_bucket_equi_join(spark):
    """r12: range search must plan as one EQUI-join on the LSH bucket
    key with the cosine threshold applied as a plain Filter — never a
    nested-loop radius scan, and no per-query window/sort (the
    operator's whole point is that output is threshold-bounded, not
    rank-bounded)."""
    plan = _plan(spark, similarity.similarity_range_search(spark, SF), "simple")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "BroadcastHashJoin" in plan
    )
    assert "Window" not in plan


def test_asof_nearest_single_exchange_two_frames_one_sort(spark):
    """r13's join_asof_nearest inherits join_asof's whole 100 TB
    contract: ONE hash exchange on user_id, NO join of the two event
    streams, and all four ignore-nulls window columns (back/fwd ts+id)
    ride ONE per-partition sort — Spark runs both frame directions off
    the same (ts, kind, eid) order. The only other exchange/sort pair
    is the presentation orderBy."""
    from mysqldatasynctool_spark.operators import advanced

    plan = _plan(spark, advanced.join_asof_nearest(spark, SF), "simple")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "user_id" in plan.split("Exchange hashpartitioning", 1)[1].split("\n")[0]
    for joinop in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
                   "CartesianProduct", "BroadcastNestedLoopJoin"):
        assert joinop not in plan, joinop
    # both frame directions present...
    assert plan.count("unboundedfollowing") >= 2 and plan.count("unboundedpreceding") >= 2
    # ...off exactly one local (non-presentation) sort: `false, 0` is
    # the per-partition sort flag; the global presentation sort is
    # `true, 0` above the rangepartitioning exchange
    local_sorts = [l for l in plan.splitlines() if "Sort [" in l and "false, 0" in l]
    assert len(local_sorts) == 1, local_sorts


def test_weighted_median_two_phase_no_full_domain_sort(spark):
    """agg_weighted_median's scale contract: phase 1 buckets raw rows
    with map-side combine; the phase-2 re-aggregation joins the raw
    scan against the crossing-bucket frame as a BROADCAST hash join on
    (l_returnflag, bkt); the only nested-loop is the 2-row quantile
    dim (allowlisted scalar-subquery class); and no task ever sorts a
    group's full value domain — the only rangepartitioning exchange is
    the presentation orderBy."""
    from mysqldatasynctool_spark.operators import advanced

    plan = _plan(spark, advanced.agg_weighted_median(spark, SF), "simple")
    assert "partial_sum" in plan  # map-side combine in both phases
    # phase-2 join broadcast, keyed on the bucket
    bhj_lines = [l for l in plan.splitlines() if "BroadcastHashJoin" in l]
    assert any("bkt" in l for l in bhj_lines), bhj_lines
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    # exactly the quantile-dim NLJ, nothing else
    assert plan.count("BroadcastNestedLoopJoin") == 1
    # a full-domain sort regression would plan a global sort of the
    # value column: only the presentation orderBy may range-partition
    assert plan.count("Exchange rangepartitioning") == 1


def test_phash_dedup_one_arrow_pass_one_shuffle(spark):
    """multimodal_phash_dedup's scale contract: ONE Arrow map pass
    emits (doc_id, phash) — 2 longs per payload — then ONE hash
    shuffle on the 16-bit key with map-side partial aggregation; the
    payload bytes never enter an exchange."""
    from mysqldatasynctool_spark.operators import multimodal

    plan = _plan(spark, multimodal.multimodal_phash_dedup(spark, SF), "simple")
    assert plan.count("MapInPandas") == 1
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_count" in plan
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "payload" not in line, f"payload bytes in a shuffle: {line[:200]}"


def test_knn_label_vote_is_bucketed_topk_then_agg(spark):
    """r12: the kNN vote must generate candidates via the bucket
    equi-join, rank with a per-qid window (top-K), and vote with
    partial-aggregated counts — no nested loop anywhere."""
    plan = _plan(spark, similarity.similarity_knn_label_vote(spark, SF), "simple")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" in plan
    assert "partial_count" in plan or "partial_" in plan


def test_q15_no_single_partition_window(spark):
    """r15 (r14 verdict item 1): Q15's argmax is a 1-row MAX broadcast
    joined on decimal equality — NOT a rank over an unpartitioned
    window, which would serialize the |suppliers| aggregate through
    one task. The plan must have a broadcast join and ZERO WindowExec
    on a SinglePartition exchange."""
    from mysqldatasynctool_spark.operators import tpch
    from tools.plan_audit import _has_global_window

    plan = _plan(spark, tpch.q15_top_supplier(spark, SF), "simple")
    assert not _has_global_window(plan), plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_perplexity_total_is_scalar_broadcast_not_window(spark):
    """r15: the corpus token total attaches to the vocab frame as a
    1-row broadcast (BNLJ, allowlisted scalar-subquery class) — never
    a global window over the unbounded vocab."""
    plan = _plan(spark, textops.text_unigram_perplexity(spark, SF), "simple")
    from tools.plan_audit import _has_global_window

    assert not _has_global_window(plan), plan
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row total


def test_rfm_ntile_decomposed_no_customer_frame_window(spark):
    """r15: RFM quintiles come from windows.scale_safe_row_number —
    three hash-partitioned windows on the dimension buckets plus
    histogram-offset windows; the built-in ntile (which forces
    SinglePartition over |customers|) must be gone."""
    from mysqldatasynctool_spark.operators import advanced

    plan = _plan(spark, advanced.agg_rfm_segmentation(spark, SF), "simple")
    assert "ntile" not in plan.lower()
    assert plan.count("Exchange hashpartitioning(_ssrn_bkt") >= 3
    # r18: the per-customer aggregate is checkpointed — each
    # scale_safe_row_number pass consumes its input twice (rank +
    # histogram), and the chained calls re-planned the orders
    # aggregation up to 8x (9 scans). The final plan must read the
    # materialized RDD and never re-scan orders.
    assert "Scan ExistingRDD" in plan
    assert "Scan parquet" not in plan


def test_pareto_topk_via_take_ordered(spark):
    """r15: the top-20 cut is TakeOrderedAndProject (per-partition
    top-k merge); the rank/cumsum window sees only the 20 survivors."""
    from mysqldatasynctool_spark.operators import windows as wops

    plan = _plan(spark, wops.window_pareto_cumshare(spark, SF), "simple")
    assert "TakeOrderedAndProject" in plan


def test_bm25_tf_first_no_distinct_exchange_no_rescan(spark):
    """r18: bm25's dl/df/Σdl derive from the checkpointed (doc,token)
    TF frame — the final plan must read the materialized RDD (no
    parquet re-scan, no re-tokenize) and the old full-corpus DISTINCT
    exchange of token occurrences must be gone (df is a COUNT over tf
    rows, which are distinct pairs by construction)."""
    import re

    plan = _plan(spark, textops.QUERIES["text_bm25_topk"](spark, SF), "formatted")
    assert "Scan ExistingRDD" in plan          # checkpointed tf
    assert "Scan parquet" not in plan          # no second tokenize scan
    # the (doc_id, token) grouping exists only in the checkpoint job
    # (the tf build); the final plan must not re-run it — the old
    # plan's df-side DISTINCT was exactly that grouping over every
    # token occurrence
    pair_groupings = [
        keys
        for keys in re.findall(r"HashAggregate\(keys=\[([^\]]*)\]", plan)
        if "doc_id" in keys and "token" in keys
    ]
    assert not pair_groupings, pair_groupings


def test_cluster_topics_single_assignment_no_text_broadcast(spark):
    """r18: cluster_topics materializes (a) the narrow assignment and
    (b) the vocab-sized (cell, token, cnt) frame once each — the final
    plan must read the checkpointed RDDs, never re-run the mapInPandas
    matmul, scan parquet at most once (the n_docs branch), and the
    corpus text must NEVER be a broadcast build side (the old plan
    shipped four [doc_id, text] broadcast copies — the corpus-sized
    broadcast that cannot exist at 100 TB)."""
    import re

    from mysqldatasynctool_spark.operators import similarity

    plan = _plan(
        spark, similarity.QUERIES["similarity_cluster_topics"](spark, SF), "formatted"
    )
    assert "Scan ExistingRDD" in plan          # the two checkpoints
    assert "MapInPandas" not in plan           # matmul ran once, upstream
    # formatted mode prints each node twice (tree line + details
    # header) — count the numbered details headers, one per scan node
    n_scans = len(re.findall(r"\(\d+\) Scan parquet", plan))
    assert n_scans <= 1, n_scans
    texty = [
        b
        for b in re.findall(r"\) BroadcastExchange\nInput \[\d+\]: \[([^\]]*)\]", plan)
        if "text#" in b
    ]
    assert not texty, texty


def test_cdc_apply_two_scans_only(spark):
    """r18: the fixture change-set derives from ONE orders scan
    (struct-array explode, row-multiset identical to the old 3-way
    filter union) — the plan must hold exactly two orders scans: base
    + the change derivation. Production shape is base + an external
    feed, so extra scans were pure fixture-derivation overhead."""
    import re

    from mysqldatasynctool_spark.operators import compare as comp

    plan = _plan(
        spark, comp.QUERIES["migration_cdc_apply"](spark, SF), "formatted"
    )
    n_scans = len(re.findall(r"\(\d+\) Scan parquet", plan))
    assert n_scans == 2, n_scans


def test_weighted_median_phase1_runs_once(spark):
    """r18: the phase-1 bucket frame `c` is checkpointed — its two
    consumers (crossing search, exact-prefix join) must read the
    materialized RDD, leaving exactly ONE lineitem scan in the final
    plan (phase 2). The old plan duplicated the whole scan + rebalance
    + bucket-aggregate + double-window subtree under each consumer
    (3 lineitem scans, 9 executed shuffles vs 6 after)."""
    import re

    from mysqldatasynctool_spark.operators import advanced

    plan = _plan(
        spark, advanced.QUERIES["agg_weighted_median"](spark, SF), "formatted"
    )
    assert "Scan ExistingRDD" in plan
    n_scans = len(re.findall(r"\(\d+\) Scan parquet", plan))
    assert n_scans == 1, n_scans


# ---------------------------------------------------------------- r19


def test_hybrid_rrf_tf_first_no_distinct_no_rescan(spark):
    """r19 (VERDICT r18 item 3): hybrid RRF's lexical side now follows
    bm25's TF-first shape — dl/df/Σdl derive from the checkpointed
    (doc, token) TF frame, Σdl rides a 1-row broadcast instead of a
    driver collect, and the old full-corpus DISTINCT exchange of token
    occurrences is gone. Final plan: the checkpointed RDD is read, no
    (doc_id, token) grouping remains (formatted mode prints aggregate
    keys as `Keys [n]: [...]` detail lines), and the only parquet
    scans left are the semantic side's two embeddings scans."""
    import re

    plan = _plan(
        spark, similarity.QUERIES["similarity_hybrid_rrf"](spark, SF), "formatted"
    )
    assert "Scan ExistingRDD" in plan
    pair_groupings = [
        keys
        for keys in re.findall(r"Keys \[\d+\]: \[([^\]]*)\]", plan)
        if "doc_id" in keys and "token" in keys
    ]
    assert not pair_groupings, pair_groupings
    n_scans = len(re.findall(r"\(\d+\) Scan parquet", plan))
    assert n_scans <= 2, n_scans


def test_heavy_hitters_candidates_without_driver_roundtrip(spark):
    """r19 (VERDICT r18 item 7): the Misra-Gries candidate set is the
    broadcast build side itself — no mid-query collect, no
    createDataFrame round-trip. The final plan therefore CONTAINS the
    MapInPandas sketch pass (inside the broadcast build) where the old
    shape ran it in a separate driver-blocking job."""
    plan = _plan(spark, textops.QUERIES["text_heavy_hitters"](spark, SF), "formatted")
    assert "MapInPandas" in plan
    assert "Scan ExistingRDD" in plan  # the checkpointed gram frame
    assert "BroadcastExchange" in plan


def test_page_checksums_one_scan_no_join(spark):
    """r19 (VERDICT r18 item 4): page checksums fuse the two per-side
    aggregates + full-outer join into ONE conditional aggregation over
    the side-tagged digest rows — exactly one orders scan, one
    aggregation shuffle, and no join node of any kind."""
    import re

    from mysqldatasynctool_spark.operators import compare as comp

    plan = _plan(
        spark, comp.QUERIES["migration_page_checksums"](spark, SF), "formatted"
    )
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    for node in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin"):
        assert node not in plan, node


def test_scd2_versions_from_one_customer_scan(spark):
    """r19 (VERDICT r18 item 4): the three SCD2 version branches read
    the checkpointed 3-column customer frame — zero parquet scans in
    the final plan (the checkpoint job holds the single scan)."""
    import re

    from mysqldatasynctool_spark.operators import compare as comp

    plan = _plan(
        spark, comp.QUERIES["migration_scd2_history"](spark, SF), "formatted"
    )
    assert "Scan ExistingRDD" in plan
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 0


def test_fuzzy_ed1_deletion_neighborhood_built_once(spark):
    """r19 (VERDICT r18 item 4): the deletion-neighborhood explode is
    checkpointed; both join sides read the materialized rows — zero
    parquet scans and zero Generate (explode) nodes in the final
    plan."""
    import re

    plan = _plan(spark, relational.QUERIES["join_fuzzy_ed1"](spark, SF), "formatted")
    assert "Scan ExistingRDD" in plan
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 0
    assert "Generate" not in plan


def test_dim_truncation_single_base_pass(spark):
    """r19 (VERDICT r18 item 4): both widths' vectors + norms ride ONE
    checkpointed base frame and the full-dim top-k is checkpointed for
    its two consumers — zero parquet scans in the final plan (6 before)."""
    import re

    plan = _plan(
        spark,
        similarity.QUERIES["similarity_dim_truncation_audit"](spark, SF),
        "formatted",
    )
    assert "Scan ExistingRDD" in plan
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 0


def test_knn_label_vote_single_corpus_pass(spark):
    """r19 (VERDICT r18 item 4): emb checkpointed (both join sides),
    votes checkpointed (pred + sizes), n_neighbors = Σ votes.n — the
    final plan reads RDDs only."""
    import re

    plan = _plan(
        spark, similarity.QUERIES["similarity_knn_label_vote"](spark, SF), "formatted"
    )
    assert "Scan ExistingRDD" in plan
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 0


def test_fk_discovery_counts_in_one_pass(spark):
    """r19 (VERDICT r18 item 4): each candidate's two counts come from
    ONE aggregate over a broadcast LEFT join (no semi-join + crossJoin
    double consumption) — 10 scans (5 child + 5 parent), the big
    lineitem distinct exactly once, and no nested-loop join."""
    import re

    from mysqldatasynctool_spark.operators import migration as mig

    plan = _plan(
        spark, mig.QUERIES["migration_fk_discovery"](spark, SF), "formatted"
    )
    n_scans = len(re.findall(r"\(\d+\) Scan parquet", plan))
    assert n_scans == 10, n_scans
    assert plan.count("lineitem.parquet") <= 2  # tree line + details header
    assert "BroadcastNestedLoopJoin" not in plan


def test_pca_microunit_rounding_matches_spark_round_cast(spark):
    """r19 (VERDICT r18 item 8): the mapInArrow covariance kernel's
    integer micro-unit rounding (fast floor(|s|+0.5) path + Decimal
    tie path) must equal Spark's round(p, 6) → CAST(DECIMAL(18,6))
    composition for adversarial doubles: exact 6-dp values, half-way
    points at 6 dp (HALF_UP, both signs), values a hair either side
    of a half-way point, negative zero, and random products."""
    import numpy as np
    from decimal import ROUND_HALF_UP, Decimal

    from pyspark.sql import functions as F

    vals = [
        0.0,
        -0.0,
        0.1234565,        # shortest repr IS a half-way point -> HALF_UP
        -0.1234565,
        0.12345650000000001,
        0.12345649999999999,
        2.5e-07,
        -2.5e-07,
        1.9999995,
        -1.9999995,
        0.123456,
        3.9999999999,
        -3.2111115,
    ]
    rng = np.random.default_rng(7)
    vals += [float(x) for x in (rng.random(200) * 8 - 4)]

    def microunits(p: float) -> int:
        s = abs(p) * 1e6
        if abs(s - np.floor(s) - 0.5) < 4e-9:
            return int(
                Decimal(repr(p)).scaleb(6).to_integral_value(rounding=ROUND_HALF_UP)
            )
        return int(np.sign(p) * np.floor(s + 0.5))

    df = spark.createDataFrame([(v,) for v in vals], "p double")
    got = df.select(
        "p", F.round(F.col("p"), 6).cast("decimal(18,6)").alias("r")
    ).collect()
    for row in got:
        expect = Decimal(row.r).scaleb(6)
        assert microunits(row.p) == int(expect), (row.p, row.r, microunits(row.p))
