"""Similarity search over embeddings (north star — SURVEY.md §2B).

Two paths, matching the task's brief:
- brute-force cosine top-k — exact, oracle-checkable, quadratic; the
  correctness baseline;
- sign-bit LSH-bucketed top-k — the scale path: vectors are bucketed
  by the sign pattern of d fixed dimensions (a valid axis-aligned
  random-hyperplane LSH family), candidates only join within a
  bucket. At 100 TB the bucket key becomes the shuffle/partition key,
  turning an O(N²) cross join into O(sum of bucket² ), and buckets can
  be sub-partitioned by prefix length to cap skew. Multi-probe (query
  neighboring buckets) trades recall for cost — here single-probe,
  which the oracle mirrors exactly.

Dot products run element-wise in doubles with sequential accumulation
(F.aggregate left-fold), which is bit-identical to DuckDB's
list_dot_product — that is what makes the scores hash-comparable.

A Pandas-UDF / mapInPandas IVF variant (numpy batch dot against
centroid-partitioned shards) is the next rung when vectors stop
fitting JVM rows; the plumbing pattern for it is in
operators/multimodal.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources.fixtures import load

TOP_K = 5
#: dimensions whose sign bit forms the LSH bucket key (1-based here;
#: element_at/list indexing is 1-based in both Spark and DuckDB).
#: 4 bits → 16 buckets: sized so buckets hold ~N/16 vectors — enough
#: candidates for useful single-probe recall at fixture scale; at
#: production N, add bits (buckets should hold 10^3-10^5 vectors).
LSH_DIMS = (1, 9, 17, 25)


def _vecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )


def _dot(x: Column, y: Column) -> Column:
    return F.aggregate(
        F.zip_with(x, y, lambda p, q: p * q), F.lit(0.0), lambda acc, z: acc + z
    )


def _cosine(va: Column, vb: Column) -> Column:
    return _dot(va, vb) / (F.sqrt(_dot(va, va)) * F.sqrt(_dot(vb, vb)))


def _with_norm(df: DataFrame, vcol: str = "v", out: str = "vnorm") -> DataFrame:
    """Precompute each vector's norm BEFORE any pairing join: the
    higher-order dot runs interpreted (outside codegen), so evaluating
    norms once per vector instead of once per pair is a 3x cut in the
    dominant cost. Sequential aggregation keeps the value bit-equal to
    DuckDB's list_dot_product."""
    return df.withColumn(out, F.sqrt(_dot(F.col(vcol), F.col(vcol))))


def similarity_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k: every 50th vector queries the full corpus.

    Physical shape: broadcast the (small) query set against the corpus
    scan, per-corpus-row score (ONE dot per pair — norms precomputed
    per side), then a per-query top-k window — at scale, TakeOrdered
    per query key, never a global sort.
    """
    emb = _with_norm(_vecs(spark, sf_dir))
    queries = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("v").alias("qv"),
        F.col("vnorm").alias("qnorm"),
    )
    scored = (
        emb.join(F.broadcast(queries), F.col("vec_id") != F.col("qid"))
        .withColumn(
            "cosine",
            F.round(_dot(F.col("qv"), F.col("v")) / (F.col("qnorm") * F.col("vnorm")), 6),
        )
    )
    w = W.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("qid", F.col("vec_id").alias("neighbor_id"), "cosine", "rank")
        .orderBy("qid", "rank")
    )


SIMILARITY_TOPK_ORACLE = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS vnorm
  FROM embeddings
),
q AS (SELECT vec_id AS qid, v AS qv, vnorm AS qnorm FROM e WHERE vec_id % 50 = 0),
scored AS (
  SELECT q.qid, e.vec_id AS neighbor_id,
         ROUND(list_dot_product(q.qv, e.v) / (q.qnorm * e.vnorm), 6) AS cosine
  FROM q JOIN e ON e.vec_id <> q.qid
),
ranked AS (
  SELECT qid, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT qid, neighbor_id, cosine, rank FROM ranked
WHERE rank <= {TOP_K}
ORDER BY qid, rank
"""


def _bucket_expr(v: Column) -> Column:
    bits = [
        F.when(F.element_at(v, d) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for d in LSH_DIMS
    ]
    return F.concat(*bits)


def similarity_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via sign-bit LSH buckets: per-query top-k restricted to the
    query's bucket (single probe). Recall < 1 by design; the oracle
    replicates the same bucketed semantics, so results match exactly."""
    emb = _with_norm(_vecs(spark, sf_dir)).withColumn("bucket", _bucket_expr(F.col("v")))
    queries = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("v").alias("qv"),
        F.col("vnorm").alias("qnorm"),
        "bucket",
    )
    scored = (
        emb.join(queries, "bucket")
        .filter(F.col("vec_id") != F.col("qid"))
        .withColumn(
            "cosine",
            F.round(_dot(F.col("qv"), F.col("v")) / (F.col("qnorm") * F.col("vnorm")), 6),
        )
    )
    w = W.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("qid", "bucket", F.col("vec_id").alias("neighbor_id"), "cosine", "rank")
        .orderBy("qid", "rank")
    )


def _lsh_oracle() -> str:
    bits = " || ".join(
        f"(CASE WHEN v[{d}] >= 0 THEN '1' ELSE '0' END)" for d in LSH_DIMS
    )
    return f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS vnorm
  FROM embeddings
),
b AS (SELECT vec_id, v, vnorm, {bits} AS bucket FROM e),
q AS (SELECT vec_id AS qid, v AS qv, vnorm AS qnorm, bucket FROM b WHERE vec_id % 50 = 0),
scored AS (
  SELECT q.qid, b.bucket, b.vec_id AS neighbor_id,
         ROUND(list_dot_product(q.qv, b.v) / (q.qnorm * b.vnorm), 6) AS cosine
  FROM q JOIN b ON b.bucket = q.bucket AND b.vec_id <> q.qid
),
ranked AS (
  SELECT qid, bucket, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT qid, bucket, neighbor_id, cosine, rank FROM ranked
WHERE rank <= {TOP_K}
ORDER BY qid, rank
"""


def similarity_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid + intra-label cohesion — the aggregation
    shape IVF coarse quantization needs (element-wise array mean via
    posexplode → one shuffle keyed by (label, dim))."""
    emb = _vecs(spark, sf_dir)
    by_dim = emb.select(
        "label", F.posexplode("v").alias("dim", "x")
    )
    return (
        by_dim.groupBy("label", "dim")
        .agg(F.count("*").alias("n"), F.round(F.avg("x"), 6).alias("mean_x"))
        .filter(F.col("dim") < 4)  # first 4 dims keep the result compact
        .orderBy("label", "dim")
    )


SIMILARITY_CENTROIDS_ORACLE = """
WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
by_dim AS (
  SELECT label, 0 AS dim, v[1] AS x FROM e
  UNION ALL SELECT label, 1, v[2] FROM e
  UNION ALL SELECT label, 2, v[3] FROM e
  UNION ALL SELECT label, 3, v[4] FROM e
)
SELECT label, dim, COUNT(*) AS n, ROUND(AVG(x), 6) AS mean_x
FROM by_dim
GROUP BY label, dim
ORDER BY label, dim
"""


def similarity_ivf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN via a vectorized Pandas UDF (the numpy scale
    path the brief calls for): coarse cells are seeded by every 100th
    vector; each partition assigns its vectors to the nearest cell
    with ONE numpy matmul per Arrow batch; queries then search only
    their own cell.

    100 TB shape: the broadcast centroid matrix is tiny; assignment is
    a linear scan at matmul speed; the shuffle key is the cell id, so
    search cost is corpus/k per query (multi-probe = also scan the
    runner-up cell, same plumbing). Rows-only driver check (numpy's
    reduction order differs from SQL engines'); the pytest gate
    verifies assignments against an in-Spark argmin and recall > 0 vs
    brute force.
    """
    import numpy as np

    emb = _vecs(spark, sf_dir)
    cents = emb.filter(F.col("vec_id") % 100 == 0).select("vec_id", "v").collect()
    cent_ids = [r.vec_id for r in cents]
    cent_mat = np.array([r.v for r in cents], dtype=np.float64)
    cent_norms = np.linalg.norm(cent_mat, axis=1)
    b_ids = spark.sparkContext.broadcast(cent_ids)
    b_mat = spark.sparkContext.broadcast(cent_mat)
    b_norms = spark.sparkContext.broadcast(cent_norms)

    def make_assign():
        def _assign(batches):
            import numpy as _np
            import pandas as _pd

            mat, norms, ids = b_mat.value, b_norms.value, b_ids.value
            for pdf in batches:
                vecs = _np.stack(pdf["v"].to_numpy())
                sims = (vecs @ mat.T) / (
                    _np.linalg.norm(vecs, axis=1)[:, None] * norms[None, :]
                )
                best = sims.argmax(axis=1)
                yield _pd.DataFrame(
                    {
                        "vec_id": pdf["vec_id"].values,
                        "v": pdf["v"].values,
                        "cell": [ids[i] for i in best],
                    }
                )

        return _assign

    assigned = emb.select("vec_id", "v").mapInPandas(
        make_assign(), schema="vec_id long, v array<double>, cell long"
    )
    queries = assigned.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv"), "cell"
    )
    scored = (
        assigned.join(queries, "cell")
        .filter(F.col("vec_id") != F.col("qid"))
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("qv"), F.col("v"))
                / (F.sqrt(_dot(F.col("qv"), F.col("qv"))) * F.sqrt(_dot(F.col("v"), F.col("v")))),
                6,
            ),
        )
    )
    w = W.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("qid", "cell", F.col("vec_id").alias("neighbor_id"), "cosine", "rank")
        .orderBy("qid", "rank")
    )


QUERIES = {
    "similarity_topk_bruteforce": similarity_topk_bruteforce,
    "similarity_lsh_bucketed": similarity_lsh_bucketed,
    "similarity_label_centroids": similarity_label_centroids,
    "similarity_ivf_pandas": similarity_ivf_pandas,
}

ORACLES = {
    "similarity_topk_bruteforce": SIMILARITY_TOPK_ORACLE,
    "similarity_lsh_bucketed": _lsh_oracle(),
    "similarity_label_centroids": SIMILARITY_CENTROIDS_ORACLE,
}
