"""Graph operators over the derived customer→supplier purchase graph
(iterative-algorithm capability class — ABSENT in the reference, which
has no query engine at all; SURVEY.md §2B requires the NEW engine to
cover iterative analytics).

The graph: one directed edge per DISTINCT (customer, supplier) pair
observed in lineitem⋈orders — a bipartite "who buys from whom" graph
(~|customers|×avg-degree edges). Supplier node ids are offset so the
two id spaces cannot collide.

Determinism design — INTEGER-ONLY PageRank: float PageRank cannot be
oracle-hashed (per-node sums of doubles are order-dependent, and
rounding quotients hits decimal-half boundaries where engines disagree
— measured on this corpus, see text_unigram_perplexity's docstring).
Instead ranks live in fixed-point micro-units (SCALE = 1e12) and every
step is integer arithmetic: contribution = rank DIV outdegree, damping
= (15·base + 85·inflow) DIV 100. Integer division and 64-bit sums are
exact and order-independent in every engine, so THREE unrolled
iterations hash-match DuckDB bit-for-bit — an iterative algorithm with
a full-strength oracle instead of the rows-only fallback.

Scale notes (100 TB):
- each iteration is one shuffle (edge⋈rank on src, then groupBy dst);
  the rank frame is nodes-sized (tiny vs edges) — at production scale
  persist/checkpoint it between iterations so the lineage doesn't
  re-execute the whole prefix (3 unrolled iterations keep the plan
  linear here);
- outdegree is computed once and joined into the edge frame before
  iterating, so the per-iteration work touches only (src, dst, outdeg);
- the driver-side N (node count) is a 1-row aggregate, same class as
  the PK stats probe (migrate.py) — never a data-path collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.fixtures import load

#: fixed-point scale for integer PageRank micro-units
PR_SCALE = 1_000_000_000_000
#: supplier node-id offset (customer keys are ~1e5 at tested SFs)
SUPP_OFFSET = 1_000_000
#: damping factor 0.85 expressed as integer percent
DAMP_PCT = 85
ITERATIONS = 3


def _purchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.col("o_custkey").cast("long").alias("src"),
            (F.col("l_suppkey").cast("long") + SUPP_OFFSET).alias("dst"),
        )
        .distinct()
    )


def graph_pagerank_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-iteration integer PageRank over the purchase graph; top-20
    nodes by rank (node id breaks ties). See module docstring for the
    exact fixed-point recurrence both engines replicate."""
    # materialize the loop invariants ONCE (localCheckpoint truncates
    # lineage): without this, every iteration's action re-executes the
    # edge-derivation join — measured 3-4x the whole query's cost. At
    # cluster scale this is persist(StorageLevel.DISK) + checkpoint.
    edges = _purchase_edges(spark, sf_dir).localCheckpoint()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n_nodes = nodes.count()  # driver-side scalar, deterministic int
    base = PR_SCALE // n_nodes
    outdeg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    ranked_edges = edges.join(outdeg, "src").localCheckpoint()  # (src, dst, outdeg)

    rank = nodes.withColumn("rank", F.lit(base).cast("long"))
    for _ in range(ITERATIONS):
        inflow = (
            ranked_edges.join(rank, ranked_edges.src == rank.node)
            .select("dst", F.expr("rank DIV outdeg").alias("contrib"))
            .groupBy("dst")
            .agg(F.sum("contrib").alias("inflow"))
        )
        rank = nodes.join(inflow, nodes.node == inflow.dst, "left").select(
            "node",
            F.expr(
                f"(({100 - DAMP_PCT} * CAST({base} AS BIGINT)) + "
                f"({DAMP_PCT} * coalesce(inflow, 0L))) DIV 100"
            ).alias("rank"),
        )
    return (
        rank.select(
            "node",
            F.when(F.col("node") >= SUPP_OFFSET, "supplier")
            .otherwise("customer")
            .alias("kind"),
            "rank",
        )
        .orderBy(F.desc("rank"), "node")
        .limit(20)
    )


GRAPH_PAGERANK_ORACLE = f"""
WITH edges AS (
  SELECT DISTINCT CAST(o_custkey AS BIGINT) AS src,
                  CAST(l_suppkey AS BIGINT) + {SUPP_OFFSET} AS dst
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), nodes AS (
  SELECT src AS node FROM edges UNION SELECT dst FROM edges
), params AS (
  SELECT {PR_SCALE} // COUNT(*) AS base FROM nodes
), outdeg AS (
  SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src
), re AS (
  SELECT e.src, e.dst, o.outdeg FROM edges e JOIN outdeg o USING (src)
), r0 AS (
  SELECT node, (SELECT base FROM params) AS rank FROM nodes
), i1 AS (
  SELECT dst, SUM(rank // outdeg) AS inflow
  FROM re JOIN r0 ON re.src = r0.node GROUP BY dst
), r1 AS (
  SELECT n.node,
         (({100 - DAMP_PCT} * (SELECT base FROM params))
          + ({DAMP_PCT} * COALESCE(i1.inflow, 0))) // 100 AS rank
  FROM nodes n LEFT JOIN i1 ON n.node = i1.dst
), i2 AS (
  SELECT dst, SUM(rank // outdeg) AS inflow
  FROM re JOIN r1 ON re.src = r1.node GROUP BY dst
), r2 AS (
  SELECT n.node,
         (({100 - DAMP_PCT} * (SELECT base FROM params))
          + ({DAMP_PCT} * COALESCE(i2.inflow, 0))) // 100 AS rank
  FROM nodes n LEFT JOIN i2 ON n.node = i2.dst
), i3 AS (
  SELECT dst, SUM(rank // outdeg) AS inflow
  FROM re JOIN r2 ON re.src = r2.node GROUP BY dst
), r3 AS (
  SELECT n.node,
         (({100 - DAMP_PCT} * (SELECT base FROM params))
          + ({DAMP_PCT} * COALESCE(i3.inflow, 0))) // 100 AS rank
  FROM nodes n LEFT JOIN i3 ON n.node = i3.dst
)
SELECT node,
       CASE WHEN node >= {SUPP_OFFSET} THEN 'supplier' ELSE 'customer' END AS kind,
       CAST(rank AS BIGINT) AS rank
FROM r3
ORDER BY rank DESC, node
LIMIT 20
"""


def graph_degree_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the purchase graph per node kind — the
    skew audit run BEFORE an iterative job (a hot node concentrates an
    iteration's shuffle; mitigation is the same salting as
    join_skew_salted)."""
    edges = _purchase_edges(spark, sf_dir)
    deg = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("degree"))
    )
    return (
        deg.select(
            F.when(F.col("node") >= SUPP_OFFSET, "supplier")
            .otherwise("customer")
            .alias("kind"),
            "degree",
        )
        .groupBy("kind")
        .agg(
            F.count("*").alias("n_nodes"),
            F.min("degree").alias("min_degree"),
            F.max("degree").alias("max_degree"),
            F.sum("degree").alias("total_degree"),
        )
        .orderBy("kind")
    )


GRAPH_DEGREE_STATS_ORACLE = f"""
WITH edges AS (
  SELECT DISTINCT CAST(o_custkey AS BIGINT) AS src,
                  CAST(l_suppkey AS BIGINT) + {SUPP_OFFSET} AS dst
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), deg AS (
  SELECT node, COUNT(*) AS degree FROM (
    SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges
  ) t GROUP BY node
)
SELECT CASE WHEN node >= {SUPP_OFFSET} THEN 'supplier' ELSE 'customer' END AS kind,
       COUNT(*) AS n_nodes,
       CAST(MIN(degree) AS BIGINT) AS min_degree,
       CAST(MAX(degree) AS BIGINT) AS max_degree,
       CAST(SUM(degree) AS BIGINT) AS total_degree
FROM deg
GROUP BY kind
ORDER BY kind
"""


#: mutual-kNN sparsification degree bound for the co-supplier graph
TRI_K = 8


def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle count + integer clustering coefficient over the
    co-supplier graph (suppliers appearing in the same order), with
    the two standard scale disciplines composed:

    1. **Sparsify first — mutual top-k.** The raw co-occurrence
       projection of a uniform bipartite graph densifies toward the
       complete graph (measured on this fixture: K100 at sf0.01,
       0.91·K1000 at sf0.1), and triangle counting on a near-clique
       is Θ(n³) no matter how it's written. Production co-occurrence
       analytics therefore sparsify before counting: each node keeps
       its TRI_K strongest neighbors (co-occurrence count, ties to the
       smaller id — deterministic), and an edge survives only if BOTH
       endpoints keep it (mutual-kNN). Degree ≤ TRI_K by construction,
       so everything downstream is linear in nodes at ANY scale.
    2. **Orient by (degree, id).** Each surviving undirected edge is
       directed from the lexicographically-smaller (degree, id)
       endpoint, the classic trick that makes the wedge join touch
       each triangle exactly once and bounds per-node fanout by the
       max oriented out-degree.

    Plan: pair-generation self-join is keyed on l_orderkey (bounded
    per-order fanout ⇒ linear, never cartesian); top-k is one window
    over the count aggregate; mutuality is an equi-self-join on the
    reversed key; the wedge join + closing-edge semi join are
    equi-joins on a ≤ TRI_K-degree edge list. Output: one row —
    (n_nodes, n_edges, n_triangles, n_wedges, clustering_ppm), all
    integers (ppm = 1e6·3·tri DIV wedges), so the oracle hashes
    bit-for-bit.

    NOTE (eager): CONSTRUCTING this frame runs jobs — the oriented
    edge list is localCheckpointed and the triangle total is a
    ``.count()`` action folded in as a literal, so roughly half the
    work happens at call time, not at the first downstream action.
    Composing callers should treat this like the other scalar-literal
    builders (q11/q22 thresholds).
    """
    os_ = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    a, b = os_.alias("a"), os_.alias("b")
    # symmetric co-occurrence counts: both (u,v) and (v,u) kept so the
    # per-node top-k window sees every neighbor once
    co = (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_suppkey") != F.col("b.l_suppkey"))
        .groupBy(
            F.col("a.l_suppkey").alias("u"), F.col("b.l_suppkey").alias("v")
        )
        .agg(F.count("*").alias("cnt"))
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("u").orderBy(F.desc("cnt"), F.asc("v"))
    topk = (
        co.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TRI_K)
        .select("u", "v")
    )
    rev = topk.select(F.col("v").alias("u"), F.col("u").alias("v"))
    # mutual edges, then one canonical row per undirected edge (u<v)
    und = (
        topk.join(rev, ["u", "v"], "left_semi")
        .filter(F.col("u") < F.col("v"))
        .localCheckpoint(eager=True)
    )
    deg = (
        und.select(F.col("u").alias("node"))
        .union(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    oriented = (
        und.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(
                F.struct("du", "u") < F.struct("dv", "v"), F.col("u")
            )
            .otherwise(F.col("v"))
            .alias("s"),
            F.when(
                F.struct("du", "u") < F.struct("dv", "v"), F.col("v")
            )
            .otherwise(F.col("u"))
            .alias("t"),
        )
        .localCheckpoint(eager=True)
    )
    e2 = oriented.select(F.col("s").alias("s2"), F.col("t").alias("t2"))
    closing = oriented.select(F.col("s").alias("s3"), F.col("t").alias("t3"))
    triangles = (
        oriented.join(e2, oriented.t == F.col("s2"))
        .join(
            closing,
            (oriented.s == F.col("s3")) & (F.col("t2") == F.col("t3")),
            "left_semi",
        )
        .count()
    )
    stats = (
        deg.agg(
            F.count("*").alias("n_nodes"),
            F.sum(F.expr("d * (d - 1) DIV 2")).alias("n_wedges"),
            F.expr("sum(d) DIV 2").alias("n_edges"),
        )
        .withColumn("n_triangles", F.lit(triangles).cast("long"))
        .select(
            "n_nodes",
            "n_edges",
            "n_triangles",
            "n_wedges",
            F.expr(
                "CASE WHEN n_wedges = 0 THEN 0 "
                "ELSE (3 * n_triangles * 1000000) DIV n_wedges END"
            ).alias("clustering_ppm"),
        )
    )
    return stats


GRAPH_TRIANGLE_ORACLE = f"""
WITH os AS (
  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
), co AS (
  SELECT a.l_suppkey AS u, b.l_suppkey AS v, COUNT(*) AS cnt
  FROM os a JOIN os b ON a.l_orderkey = b.l_orderkey
                     AND a.l_suppkey <> b.l_suppkey
  GROUP BY 1, 2
), topk AS (
  SELECT u, v FROM (
    SELECT u, v,
           ROW_NUMBER() OVER (PARTITION BY u ORDER BY cnt DESC, v ASC) AS rn
    FROM co
  ) WHERE rn <= {TRI_K}
), und AS (
  SELECT t.u, t.v FROM topk t
  WHERE t.u < t.v
    AND EXISTS (SELECT 1 FROM topk r WHERE r.u = t.v AND r.v = t.u)
), deg AS (
  SELECT node, COUNT(*) AS d FROM (
    SELECT u AS node FROM und UNION ALL SELECT v FROM und
  ) GROUP BY node
), oriented AS (
  SELECT CASE WHEN (du.d, und.u) < (dv.d, und.v) THEN und.u ELSE und.v END AS s,
         CASE WHEN (du.d, und.u) < (dv.d, und.v) THEN und.v ELSE und.u END AS t
  FROM und JOIN deg du ON und.u = du.node JOIN deg dv ON und.v = dv.node
), tri AS (
  SELECT COUNT(*) AS n_triangles
  FROM oriented e1 JOIN oriented e2 ON e1.t = e2.s
  WHERE EXISTS (
    SELECT 1 FROM oriented e3 WHERE e3.s = e1.s AND e3.t = e2.t
  )
)
SELECT (SELECT COUNT(*) FROM deg) AS n_nodes,
       CAST((SELECT SUM(d) // 2 FROM deg) AS BIGINT) AS n_edges,
       (SELECT n_triangles FROM tri) AS n_triangles,
       CAST((SELECT SUM(d * (d - 1) // 2) FROM deg) AS BIGINT) AS n_wedges,
       CAST(CASE WHEN (SELECT SUM(d * (d - 1) // 2) FROM deg) = 0 THEN 0
            ELSE (3 * (SELECT n_triangles FROM tri) * 1000000)
                 // (SELECT SUM(d * (d - 1) // 2) FROM deg) END AS BIGINT)
         AS clustering_ppm
"""


QUERIES = {
    "graph_pagerank_purchases": graph_pagerank_purchases,
    "graph_degree_stats": graph_degree_stats,
    "graph_triangle_count": graph_triangle_count,
}

ORACLES = {
    "graph_pagerank_purchases": GRAPH_PAGERANK_ORACLE,
    "graph_degree_stats": GRAPH_DEGREE_STATS_ORACLE,
    "graph_triangle_count": GRAPH_TRIANGLE_ORACLE,
}
