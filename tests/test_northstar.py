"""Oracle-gate tests for the north-star operator families
(text analysis, dedup, similarity, multimodal)."""

from __future__ import annotations

import pytest

import pytest as _pytest

from mysqldatasynctool_spark.functions.multimodal import decode_image_real
from mysqldatasynctool_spark.operators import (
    dedup,
    multimodal,
    pipeline,
    similarity,
    textops,
)
from tests.conftest import assert_matches_oracle

MODS = (textops, dedup, similarity, multimodal, pipeline)
CASES = [(mod, name) for mod in MODS for name in sorted(mod.ORACLES)]


@pytest.mark.parametrize("mod,name", CASES, ids=[n for _, n in CASES])
def test_matches_oracle(spark, duck, mod, name):
    df = mod.QUERIES[name](spark, "/root/testdata/sf0.01")
    assert df.count() > 0, f"{name} degenerate: 0 rows"
    assert_matches_oracle(df, mod.ORACLES[name], duck)


def test_minhash_lsh_finds_planted_neardups(spark):
    """The corpus has planted near-duplicate pairs (3-gram Jaccard up
    to ~0.99); LSH must surface a healthy share of them."""
    lsh = dedup.QUERIES["dedup_minhash_lsh"](spark, "/root/testdata/sf0.01")
    truth = dedup.QUERIES["dedup_ngram_jaccard"](spark, "/root/testdata/sf0.01")
    lsh_pairs = {(r.ida, r.idb) for r in lsh.collect()}
    truth_pairs = {(r.ida, r.idb) for r in truth.collect()}
    assert truth_pairs, "expected planted near-dup pairs in fixtures"
    assert lsh_pairs <= truth_pairs, "LSH verification must not invent pairs"
    recall = len(lsh_pairs) / len(truth_pairs)
    assert recall >= 0.5, f"LSH recall too low: {recall:.2f}"


def test_real_decoder_is_stubbed():
    with _pytest.raises(NotImplementedError):
        decode_image_real(b"\x89PNG")


def test_ivf_pandas_assignments_and_recall(spark):
    """The numpy cell assignment must agree with an in-Spark argmin,
    and cell-restricted search must find real neighbors."""
    from pyspark.sql import functions as F

    ivf = similarity.QUERIES["similarity_ivf_pandas"](spark, "/root/testdata/sf0.01")
    rows = ivf.collect()
    assert rows, "IVF returned nothing"
    # each query's candidates come from at most IVF_PROBES cells (one
    # per probed cell; r11 raised the default from 1), and the rank
    # sequence per query is the contiguous merged top-k
    cells_per_q, ranks_per_q = {}, {}
    for r in rows:
        cells_per_q.setdefault(r.qid, set()).add(r.cell)
        ranks_per_q.setdefault(r.qid, []).append(r.rank)
    assert all(
        1 <= len(c) <= similarity.IVF_PROBES for c in cells_per_q.values()
    )
    assert all(
        sorted(rs) == list(range(1, len(rs) + 1))
        for rs in ranks_per_q.values()
    )
    exact = similarity.QUERIES["similarity_topk_bruteforce"](spark, "/root/testdata/sf0.01")
    exact_pairs = {(r.qid, r.neighbor_id) for r in exact.collect()}
    ivf_pairs = {(r.qid, r.neighbor_id) for r in rows}
    assert len(ivf_pairs & exact_pairs) >= 1


def test_lsh_bucket_recall_vs_bruteforce(spark):
    """Single-probe sign-bit LSH trades recall for cost; sanity-check
    it still returns a reasonable share of the true top-k pairs."""
    exact = similarity.QUERIES["similarity_topk_bruteforce"](spark, "/root/testdata/sf0.01")
    ann = similarity.QUERIES["similarity_lsh_bucketed"](spark, "/root/testdata/sf0.01")
    exact_pairs = {(r.qid, r.neighbor_id) for r in exact.collect()}
    ann_pairs = {(r.qid, r.neighbor_id) for r in ann.collect()}
    assert ann_pairs, "ANN returned nothing — buckets degenerate"
    # single-probe 8-bit LSH on near-random vectors: modest recall is
    # expected; it must at least find *some* true neighbors
    assert len(ann_pairs & exact_pairs) >= 1


def test_lsh_dims_scale_with_corpus_size():
    """Pin the corpus-size-adaptive bucket-key sizing that
    dedup_embedding_lsh and production similarity callers share."""
    from mysqldatasynctool_spark.operators.similarity import (
        EMBED_DIM,
        LSH_DIMS,
        lsh_dims_for,
    )

    # fixture scale reproduces the committed-oracle default key
    assert lsh_dims_for(2_000) == LSH_DIMS
    assert lsh_dims_for(10_000) == LSH_DIMS
    # 10M vectors / 10k target -> 1024 buckets (10 bits)
    assert len(lsh_dims_for(10_000_000)) == 10
    # bits never exceed one per embedding dimension
    assert len(lsh_dims_for(10**24)) == EMBED_DIM
    # dims are valid 1-based indices, strictly increasing
    for n in (2_000, 10_000_000, 10**12, 10**24):
        dims = lsh_dims_for(n)
        assert all(1 <= d <= EMBED_DIM for d in dims)
        assert list(dims) == sorted(set(dims))


def test_pii_scrub_counts_and_cleanliness(spark):
    """Planted-PII accounting: per-doc counts follow the planting
    moduli exactly, and the scrubbed text contains NO remaining
    matches of any PII pattern (re-scan of the cleaned fingerprint's
    source text via a second pass)."""
    from pyspark.sql import functions as F

    from mysqldatasynctool_spark.operators import textops

    sf = "/root/testdata/sf0.01"
    rows = textops.QUERIES["text_pii_scrub"](spark, sf).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.n_emails == (1 if r.doc_id % 3 == 0 else 0)
        assert r.n_ips == (1 if r.doc_id % 4 == 0 else 0)
        assert r.n_ssns == (1 if r.doc_id % 5 == 0 else 0)
    # idempotence: scrubbing already-scrubbed text changes nothing —
    # the placeholders contain no digits/@, so a second pass finds 0
    docs = spark.createDataFrame(
        [(r.doc_id, f"x <EMAIL> <IP> <SSN> y {r.doc_id}",) for r in rows[:20]],
        "doc_id long, text string",
    )
    leftover = docs.select(
        F.regexp_count("text", F.lit(textops.PII_EMAIL)).alias("e"),
        F.regexp_count("text", F.lit(textops.PII_IPV4)).alias("i"),
        F.regexp_count("text", F.lit(textops.PII_SSN)).alias("s"),
    ).agg(F.sum("e"), F.sum("i"), F.sum("s")).collect()[0]
    assert tuple(leftover) == (0, 0, 0)


def test_gopher_rules_keep_is_conjunction(spark):
    """keep must equal the AND of all rule columns, and each rule must
    discriminate or be constant-true on the synthetic corpus (never
    constant-false, which would make the gate vacuous)."""
    from mysqldatasynctool_spark.operators import textops

    rows = textops.QUERIES["text_gopher_rules"](spark, "/root/testdata/sf0.01").collect()
    assert len(rows) > 0
    rule_cols = [c for c in rows[0].asDict() if c.startswith("rule_")]
    for r in rows:
        assert r.keep == all(r[c] for c in rule_cols)
    for c in rule_cols:
        assert any(r[c] for r in rows), f"{c} is constant-false"


def test_char_entropy_bounds(spark):
    """0 <= H <= log2(n_distinct); single-char docs get exactly 0."""
    import math

    from mysqldatasynctool_spark.operators import textops

    rows = textops.QUERIES["text_char_entropy"](spark, "/root/testdata/sf0.01").collect()
    assert len(rows) > 0
    for r in rows:
        assert -1e-9 <= r.entropy_bits <= math.log2(max(r.n_distinct, 2)) + 1e-9
        if r.n_distinct == 1:
            assert r.entropy_bits == 0.0


def test_source_stats_shares_sum_to_one(spark):
    from mysqldatasynctool_spark.operators import textops

    rows = textops.QUERIES["text_source_stats"](spark, "/root/testdata/sf0.01").collect()
    assert len(rows) > 0
    assert abs(sum(r.doc_share for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.char_share for r in rows) - 1.0) < 1e-4


def test_anomaly_zscore_single_shuffle_and_bounds(spark):
    """|z| > 2 for every flagged row; the plan shuffles once on
    user_id (window partitioning) and contains no Python eval."""
    from mysqldatasynctool_spark.operators import events

    df = events.QUERIES["events_anomaly_zscore"](spark, "/root/testdata/sf0.01")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    rows = df.collect()
    assert len(rows) > 0
    assert all(abs(r.zscore) > 2 for r in rows)


def test_unigram_perplexity_bounds(spark):
    """avg_bits <= log2(vocab_size); ppl == 2^avg_bits (rounded); a
    doc of only the corpus's most common token scores the minimum."""
    from mysqldatasynctool_spark.operators import textops

    rows = textops.QUERIES["text_unigram_perplexity"](spark, "/root/testdata/sf0.01").collect()
    assert len(rows) > 0
    for r in rows:
        assert r.avg_bits > 0
        assert abs(r.perplexity - 2 ** r.avg_bits) < 5.1e-3  # ppl is 2dp


def test_zorder_key_interleave_roundtrip(spark):
    """zkey de-interleaves exactly back to (x16, y16) — the Morton
    encoding is a bijection, which is what makes min/max pruning on a
    zkey-sorted layout sound for both dimensions."""
    from mysqldatasynctool_spark.operators import events as ev_ops

    rows = ev_ops.QUERIES["events_zorder_key"](spark, "/root/testdata/sf0.001").collect()
    assert len(rows) > 0

    def unspread(z):
        v = z & 0x55555555
        v = (v | (v >> 1)) & 0x33333333
        v = (v | (v >> 2)) & 0x0F0F0F0F
        v = (v | (v >> 4)) & 0x00FF00FF
        v = (v | (v >> 8)) & 0x0000FFFF
        return v

    for r in rows[:500]:
        assert unspread(r.zkey) == r.x16
        assert unspread(r.zkey >> 1) == r.y16


def test_resize_preserves_aspect_and_hits_target(spark):
    """Long side == RESIZE_TARGET exactly; short side scales by the
    same integer ratio (never exceeds target)."""
    from mysqldatasynctool_spark.functions.multimodal import RESIZE_TARGET
    from mysqldatasynctool_spark.operators import multimodal

    rows = multimodal.QUERIES["multimodal_resize"](spark, "/root/testdata/sf0.001").collect()
    assert len(rows) > 0
    for r in rows:
        assert max(r.new_width, r.new_height) == RESIZE_TARGET
        assert 0 < min(r.new_width, r.new_height) <= RESIZE_TARGET


def test_pagerank_bipartite_invariants(spark):
    """Customers have no in-edges in the purchase graph, so after any
    full iteration every customer's rank is exactly (15*base) DIV 100;
    suppliers absorb the damped mass and dominate the top-20."""
    from mysqldatasynctool_spark.operators import graph

    sf = "/root/testdata/sf0.001"
    rows = graph.QUERIES["graph_pagerank_purchases"](spark, sf).collect()
    assert len(rows) == 20
    assert all(r.rank > 0 for r in rows)
    assert rows[0].kind == "supplier"
    edges = graph._purchase_edges(spark, sf)
    n_nodes = (
        edges.select("src").union(edges.select("dst")).distinct().count()
    )
    base = graph.PR_SCALE // n_nodes
    cust_rank = (15 * base) // 100
    custs = [r for r in rows if r.kind == "customer"]
    assert all(r.rank == cust_rank for r in custs)


def test_zorder_layout_narrows_file_stats(spark, tmp_path):
    """The point of Z-ordering: files in a zkey-sorted layout cover
    BOUNDED ranges of each interleaved dimension, so min/max pruning
    can skip files for a user_id predicate. A ts-sorted layout spreads
    every user across every file (no pruning possible). Verified
    against real parquet footer stats, not the plan."""
    import pyarrow.parquet as pq

    from mysqldatasynctool_spark.operators import events as ev_ops

    keyed = ev_ops.QUERIES["events_zorder_key"](spark, "/root/testdata/sf0.01")

    z_dir, t_dir = f"{tmp_path}/zsorted", f"{tmp_path}/tsorted"
    (keyed.repartitionByRange(8, "zkey").sortWithinPartitions("zkey")
          .write.mode("overwrite").parquet(z_dir))
    (keyed.repartitionByRange(8, "event_id").sortWithinPartitions("event_id")
          .write.mode("overwrite").parquet(t_dir))

    def x16_ranges(d):
        out = []
        import glob
        for f in sorted(glob.glob(f"{d}/part-*.parquet")):
            md = pq.ParquetFile(f).metadata
            lo, hi = None, None
            for rg in range(md.num_row_groups):
                for c in range(md.num_columns):
                    col = md.row_group(rg).column(c)
                    if col.path_in_schema == "x16" and col.statistics:
                        s = col.statistics
                        lo = s.min if lo is None else min(lo, s.min)
                        hi = s.max if hi is None else max(hi, s.max)
            out.append((lo, hi))
        return out

    def files_touched(ranges, probe):
        return sum(1 for lo, hi in ranges if lo is not None and lo <= probe <= hi)

    zr, tr = x16_ranges(z_dir), x16_ranges(t_dir)
    assert len(zr) >= 4 and len(tr) >= 4
    probes = [5, 25, 60, 90]
    z_touch = sum(files_touched(zr, p) for p in probes)
    t_touch = sum(files_touched(tr, p) for p in probes)
    # event_id-sorted files span the whole user domain — no pruning;
    # zkey-sorted files must allow strictly better file skipping
    assert z_touch < t_touch, (zr, tr)


def test_incremental_dedup_verdict_consistency(spark):
    """Verdicts only for the incoming half; exact-dup verdicts agree
    with a direct fingerprint check; near verdicts never contradict
    the planted near-dup structure (each flagged doc really shares
    majority shingles with some prior doc)."""
    from pyspark.sql import functions as F

    from mysqldatasynctool_spark.functions.text import normalized_text_col
    from mysqldatasynctool_spark.operators import pipeline as pl
    from mysqldatasynctool_spark.sources.fixtures import load

    sf = "/root/testdata/sf0.01"
    rows = pl.QUERIES["pipeline_incremental_dedup"](spark, sf).collect()
    assert len(rows) > 0
    verdicts = {r.doc_id: r.verdict for r in rows}
    docs = load(spark, sf, "documents")
    split = docs.agg(((F.max("doc_id") + 1) / 2).cast("long")).collect()[0][0]
    assert min(verdicts) >= split
    assert set(verdicts.values()) <= {"kept", "dropped_exact", "dropped_near"}
    # the synthetic corpus plants near-dups across the id space, so the
    # incremental pass must catch SOME and keep most
    n_near = sum(1 for v in verdicts.values() if v == "dropped_near")
    n_kept = sum(1 for v in verdicts.values() if v == "kept")
    assert n_near > 0 and n_kept > n_near


def test_substring_spans_cross_doc_only(spark):
    """A 10-token run shared by two docs flags BOTH; a run repeated
    only WITHIN one doc flags neither (that's repetition_score's job)."""
    shared = "a b c d e f g h i j"
    docs = spark.createDataFrame(
        [
            (1, shared + " k l m n o"),
            (2, "z y " + shared + " q"),
            (3, " ".join(["p"] * 20)),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in dedup.substring_span_report(docs).collect()}
    assert rows[1]["n_spans"] == 6 and rows[1]["n_dup_spans"] == 1
    assert rows[2]["n_spans"] == 4 and rows[2]["n_dup_spans"] == 1
    assert rows[3]["n_spans"] == 11 and rows[3]["n_dup_spans"] == 0


def test_heavy_hitters_exact_despite_sketch(spark):
    """The MG candidate pass is approximate, but the two-pass output
    must equal the exact full-groupBy answer (candidate-superset
    guarantee + exact recount)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from mysqldatasynctool_spark.functions.text import tokens_col
    from mysqldatasynctool_spark.sources.fixtures import load

    sf = "/root/testdata/sf0.001"
    got = [
        (r["gram"], r["cnt"])
        for r in textops.text_heavy_hitters(spark, sf).collect()
    ]
    docs = load(spark, sf, "documents")
    tok = docs.select(
        "doc_id", F.posexplode(tokens_col(F.col("text"))).alias("pos", "t")
    )
    w = W.partitionBy("doc_id").orderBy("pos")
    grams = (
        tok.select(
            F.concat_ws(" ", F.col("t"), F.lead("t", 1).over(w)).alias("gram"),
            F.lead("t", 1).over(w).alias("_n"),
        )
        .filter(F.col("_n").isNotNull())
        .select("gram")
    )
    total = grams.count()
    want = [
        (r["gram"], r["cnt"])
        for r in grams.groupBy("gram")
        .agg(F.count("*").alias("cnt"))
        .filter(
            F.lit(textops._HH_DEN) * F.col("cnt")
            > F.lit(textops._HH_NUM) * F.lit(total)
        )
        .orderBy(F.desc("cnt"), "gram")
        .collect()
    ]
    assert got == want and len(got) > 0


def test_kmeans_step_invariants(spark):
    """Spherical update must (a) conserve vectors across cells and
    (b) never decrease any cell's mean cosine — the Lloyd guarantee."""
    rows = similarity.similarity_kmeans_step(
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert sum(r["n_assigned"] for r in rows) == 500
    assert all(r["improved"] for r in rows)
    # the step should do real work: at least one cell strictly improves
    assert any(r["mean_cos_new"] > r["mean_cos_old"] for r in rows)


def test_semantic_cells_keeps_a_representative(spark):
    """SemDeDup drop rule (drop iff a LOWER-id near-neighbor shares
    the cell) can never empty a neighborhood: the lowest vec_id of
    every cell is always kept, and some vector is actually dropped on
    the fixture's planted near-dups."""
    rows = dedup.dedup_semantic_cells(spark, "/root/testdata/sf0.01").collect()
    by_cell = {}
    for r in rows:
        by_cell.setdefault(r["cell"], []).append(r)
    for cell_rows in by_cell.values():
        lowest = min(cell_rows, key=lambda r: r["vec_id"])
        assert lowest["keep"]
    assert any(not r["keep"] for r in rows)


def test_substring_spans_random_corpus_vs_python(spark):
    """Seeded random corpus: the Spark span report must equal a direct
    Python computation of cross-doc duplicated spans."""
    import random

    rng = random.Random(7)
    boiler = " ".join(rng.choice("abcd") for _ in range(12))  # shared run
    docs = []
    for i in range(30):
        body = " ".join(rng.choice("abcd") for _ in range(rng.randint(5, 30)))
        # every 5th doc embeds the same 12-token boilerplate run
        docs.append((i, f"{body} {boiler}" if i % 5 == 0 else body))
    W = dedup.SPAN_TOKENS  # pin the Python reference to the op's width
    spans = {}  # span text -> set of doc ids
    per_doc = {}
    for did, text in docs:
        toks = text.split()
        windows = [
            " ".join(toks[i : i + W]) for i in range(len(toks) - W + 1)
        ]
        per_doc[did] = windows
        for s in windows:
            spans.setdefault(s, set()).add(did)
    want = {
        did: (
            len(ws),
            sum(1 for s in ws if len(spans[s]) > 1),
        )
        for did, ws in per_doc.items()
        if ws
    }
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_spans"], r["n_dup_spans"])
        for r in dedup.substring_span_report(df).collect()
    }
    assert got == want and any(d for _, d in want.values())
