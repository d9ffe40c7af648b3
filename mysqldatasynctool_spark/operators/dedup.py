"""Deduplication operators (north star — SURVEY.md §2B "Dedup").

Five dedup families over the fixture corpus, all oracle-checkable
because every hash involved is md5-derived (engine-portable):

- exact subset-key dedup (dropDuplicates semantics, kept deterministic
  via min-tiebreak groupBy);
- exact-content dedup via normalized-text fingerprint;
- MinHash + LSH banding near-dup candidates, verified with true
  shingle Jaccard;
- n-gram Jaccard all-pairs near-dup (the brute-force truth the LSH
  path approximates);
- SimHash (bitwise majority of token hashes) + Hamming-distance pairs.

Scale story (100 TB corpus):
- exact/fingerprint: one shuffle on the 16-byte digest, partial agg
  map-side; never shuffles document text.
- MinHash LSH: explode shingles (map-side), aggregate 8 mins per doc
  (one shuffle keyed by doc), explode 4 band keys, self-join on band
  key (shuffle keyed by 32-byte band) — candidate pairs only, then
  verify. This is the linear-ish path; the all-pairs Jaccard below is
  quadratic and exists as ground truth at test scale.
- SimHash: signature is one agg; pairing joins on the 16-bit rotation
  buckets in production (here, small-N all-pairs for the oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import (
    BAND_ROWS,
    MINHASH_SEEDS,
    band_cols,
    minhash_cols,
    normalized_text_col,
    shingles_col,
    tokens_col,
)
from ..sources.fixtures import load

JACCARD_THRESHOLD = 0.2
SIMHASH_BITS = 16


def dedup_exact_subset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on a column subset — dropDuplicates([cols])
    semantics made deterministic: keep the first event (min event_id)
    per (user_id, event_type) and report the duplicate count."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", "event_type")
        .agg(
            F.min("event_id").alias("kept_event_id"),
            F.count("*").alias("n_dupes"),
        )
        .orderBy("user_id", "event_type")
    )


DEDUP_EXACT_SUBSET_ORACLE = """
SELECT user_id, event_type,
       MIN(event_id) AS kept_event_id,
       COUNT(*) AS n_dupes
FROM events
GROUP BY user_id, event_type
ORDER BY user_id, event_type
"""


def dedup_exact_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-content dedup via normalized fingerprint: one row per
    distinct normalized text, keeping the smallest doc_id (the corpus
    has no exact dups, so n_copies is 1 everywhere — the near-dup
    operators below catch the planted ~0.99-Jaccard pairs)."""
    docs = load(spark, sf_dir, "documents")
    fp = F.md5(normalized_text_col(F.col("text")))
    return (
        docs.groupBy(fp.alias("fingerprint"))
        .agg(F.min("doc_id").alias("kept_doc_id"), F.count("*").alias("n_copies"))
        .orderBy("kept_doc_id")
    )


DEDUP_EXACT_TEXT_ORACLE = r"""
SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint,
       MIN(doc_id) AS kept_doc_id,
       COUNT(*) AS n_copies
FROM documents
GROUP BY 1
ORDER BY kept_doc_id
"""


def _shingle_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.explode(shingles_col(tokens_col(F.col("text")))).alias("sh")
    )


_DUCK_SHINGLES = r"""
  SELECT doc_id, unnest(list_distinct(
    [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] for i in range(1, len(toks) - 1)]
  )) AS sh
  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents)
"""


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup detection, fully engine-portable:

    word-3-gram shingles → 8 md5-seeded minhashes (lexicographic min
    of fixed-width hex == numeric min) → 4 bands of 2 → self-join on
    band key → candidate pairs → verified with true Jaccard ≥ 0.2.
    """
    sh = _shingle_table(spark, sf_dir)
    sig = sh.groupBy("doc_id").agg(
        *[F.min(c).alias(f"m{i}") for i, c in enumerate(minhash_cols(F.col("sh")))]
    )
    n_bands = MINHASH_SEEDS // BAND_ROWS
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band_idx"), band_cols()[b].alias("key"))
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band_idx", "bk.key")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("ida"), F.col("b.doc_id").alias("idb"))
        .distinct()
    )
    # verify candidates with true shingle Jaccard
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    sha = sh.select(F.col("doc_id").alias("ida"), "sh")
    shb = sh.select(F.col("doc_id").alias("idb"), "sh")
    inter = (
        cand.join(sha, "ida")
        .join(shb, ["idb", "sh"])
        .groupBy("ida", "idb")
        .agg(F.count("*").alias("n_inter"))
    )
    verified = (
        inter.join(sizes.select(F.col("doc_id").alias("ida"), F.col("sz").alias("sza")), "ida")
        .join(sizes.select(F.col("doc_id").alias("idb"), F.col("sz").alias("szb")), "idb")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter") / (F.col("sza") + F.col("szb") - F.col("n_inter")), 6
            ),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )
    return verified.select("ida", "idb", "jaccard").orderBy("ida", "idb")


def _minhash_oracle() -> str:
    mins = ", ".join(
        f"min(md5('{s}:' || sh)) AS m{s}" for s in range(MINHASH_SEEDS)
    )
    n_bands = MINHASH_SEEDS // BAND_ROWS
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_idx, "
        + " || '_' || ".join(f"m{b * BAND_ROWS + r}" for r in range(BAND_ROWS))
        + " AS key FROM sig"
        for b in range(n_bands)
    )
    return f"""
WITH sh AS ({_DUCK_SHINGLES}),
sig AS (SELECT doc_id, {mins} FROM sh GROUP BY doc_id),
bands AS ({band_rows}),
cand AS (
  SELECT DISTINCT a.doc_id AS ida, b.doc_id AS idb
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.key = b.key AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.ida, c.idb, COUNT(*) AS n_inter
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.ida
  JOIN sh sb ON sb.doc_id = c.idb AND sb.sh = sa.sh
  GROUP BY c.ida, c.idb
)
SELECT i.ida, i.idb,
       ROUND(n_inter * 1.0 / (za.sz + zb.sz - n_inter), 6) AS jaccard
FROM inter i
JOIN sizes za ON za.doc_id = i.ida
JOIN sizes zb ON zb.doc_id = i.idb
WHERE n_inter * 1.0 / (za.sz + zb.sz - n_inter) >= {JACCARD_THRESHOLD}
ORDER BY ida, idb
"""


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force all-pairs 3-gram Jaccard ≥ threshold — the exact
    ground truth for the LSH approximation (quadratic; test-scale
    only, the production path is dedup_minhash_lsh)."""
    sh = _shingle_table(spark, sf_dir)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    sha = sh.select(F.col("doc_id").alias("ida"), "sh")
    shb = sh.select(F.col("doc_id").alias("idb"), "sh")
    inter = (
        sha.join(shb, "sh")
        .filter(F.col("ida") < F.col("idb"))
        .groupBy("ida", "idb")
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(sizes.select(F.col("doc_id").alias("ida"), F.col("sz").alias("sza")), "ida")
        .join(sizes.select(F.col("doc_id").alias("idb"), F.col("sz").alias("szb")), "idb")
        .withColumn(
            "jaccard",
            F.round(F.col("n_inter") / (F.col("sza") + F.col("szb") - F.col("n_inter")), 6),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("ida", "idb", "jaccard")
        .orderBy("ida", "idb")
    )


_NGRAM_JACCARD_ORACLE = f"""
WITH sh AS ({_DUCK_SHINGLES}),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS ida, b.doc_id AS idb, COUNT(*) AS n_inter
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.ida, i.idb,
       ROUND(n_inter * 1.0 / (za.sz + zb.sz - n_inter), 6) AS jaccard
FROM inter i
JOIN sizes za ON za.doc_id = i.ida
JOIN sizes zb ON zb.doc_id = i.idb
WHERE n_inter * 1.0 / (za.sz + zb.sz - n_inter) >= {JACCARD_THRESHOLD}
ORDER BY ida, idb
"""


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup: 16-bit signature = bitwise majority over
    token hashes (first 4 md5 hex chars → uint16); pairs with Hamming
    distance ≤ 3 (same-signature docs collapse together).

    Production pairing joins on signature rotations; all-pairs here is
    the test-scale ground truth.
    """
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(F.array_distinct(tokens_col(F.col("text")))).alias("tok"),
    ).withColumn("h", F.conv(F.substring(F.md5("tok"), 1, 4), 16, 10).cast("int"))
    bit_sums = tok.groupBy("doc_id").agg(
        F.count("*").alias("n_toks"),
        *[
            F.sum(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1))).alias(f"s{b}")
            for b in range(SIMHASH_BITS)
        ],
    )
    sig = sum(
        (F.when(F.col(f"s{b}") * 2 > F.col("n_toks"), F.lit(1 << b)).otherwise(0))
        for b in range(SIMHASH_BITS)
    )
    sigs = bit_sums.select("doc_id", sig.alias("simhash"))
    a = sigs.select(F.col("doc_id").alias("ida"), F.col("simhash").alias("ha"))
    b = sigs.select(F.col("doc_id").alias("idb"), F.col("simhash").alias("hb"))
    return (
        a.crossJoin(b)
        .filter(F.col("ida") < F.col("idb"))
        .withColumn("hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
        .filter(F.col("hamming") <= 3)
        .select("ida", "idb", "ha", "hb", "hamming")
        .orderBy("ida", "idb")
    )


def _simhash_oracle() -> str:
    bit_sums = ", ".join(
        f"SUM((h >> {b}) & 1) AS s{b}" for b in range(SIMHASH_BITS)
    )
    sig = " + ".join(
        f"(CASE WHEN s{b} * 2 > n_toks THEN {1 << b} ELSE 0 END)"
        for b in range(SIMHASH_BITS)
    )
    return f"""
WITH tok AS (
  SELECT doc_id,
         CAST(concat('0x', substr(md5(tok), 1, 4)) AS INT) AS h
  FROM (
    SELECT doc_id, unnest(list_distinct(string_split_regex(trim(text), '\\s+'))) AS tok
    FROM documents
  )
),
bit_sums AS (
  SELECT doc_id, COUNT(*) AS n_toks, {bit_sums}
  FROM tok GROUP BY doc_id
),
sigs AS (SELECT doc_id, {sig} AS simhash FROM bit_sums)
SELECT a.doc_id AS ida, b.doc_id AS idb,
       a.simhash AS ha, b.simhash AS hb,
       bit_count(xor(CAST(a.simhash AS BIGINT), CAST(b.simhash AS BIGINT))) AS hamming
FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
WHERE bit_count(xor(CAST(a.simhash AS BIGINT), CAST(b.simhash AS BIGINT))) <= 3
ORDER BY ida, idb
"""


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup: pairs with cosine ≥ 0.4 (double-precision
    sequential dot product — identical in IEEE engines)."""
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    a = emb.select(F.col("vec_id").alias("ida"), F.col("v").alias("va"))
    b = emb.select(F.col("vec_id").alias("idb"), F.col("v").alias("vb"))

    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p * q),
            F.lit(0.0),
            lambda acc, z: acc + z,
        )

    return (
        a.crossJoin(b)
        .filter(F.col("ida") < F.col("idb"))
        .withColumn(
            "cosine",
            F.round(
                dot(F.col("va"), F.col("vb"))
                / (F.sqrt(dot(F.col("va"), F.col("va"))) * F.sqrt(dot(F.col("vb"), F.col("vb")))),
                6,
            ),
        )
        .filter(F.col("cosine") >= 0.4)
        .select("ida", "idb", "cosine")
        .orderBy("ida", "idb")
    )


DEDUP_EMBEDDING_COSINE_ORACLE = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
p AS (
  SELECT a.vec_id AS ida, b.vec_id AS idb,
         ROUND(list_dot_product(a.v, b.v)
               / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS cosine
  FROM e a JOIN e b ON a.vec_id < b.vec_id
)
SELECT ida, idb, cosine FROM p
WHERE cosine >= 0.4
ORDER BY ida, idb
"""


QUERIES = {
    "dedup_exact_subset": dedup_exact_subset,
    "dedup_exact_text": dedup_exact_text,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_simhash": dedup_simhash,
    "dedup_embedding_cosine": dedup_embedding_cosine,
}

ORACLES = {
    "dedup_exact_subset": DEDUP_EXACT_SUBSET_ORACLE,
    "dedup_exact_text": DEDUP_EXACT_TEXT_ORACLE,
    "dedup_minhash_lsh": _minhash_oracle(),
    "dedup_ngram_jaccard": _NGRAM_JACCARD_ORACLE,
    "dedup_simhash": _simhash_oracle(),
    "dedup_embedding_cosine": DEDUP_EMBEDDING_COSINE_ORACLE,
}
