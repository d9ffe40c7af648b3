"""Column-expression helpers for the text/dedup operator family.

Everything here is built from JVM-side built-ins (split / transform /
md5 / aggregate) — no Python UDFs in any hot path, so the whole
pipeline stays inside WholeStageCodegen and scales with executor
count. Hashes are md5-based, which makes every derived signature
engine-portable (DuckDB/MySQL compute identical values) — that is what
lets the MinHash/SimHash pipelines be checked by the SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: number of minhash permutations (seeds) and rows per LSH band
MINHASH_SEEDS = 8
BAND_ROWS = 2


def tokens_col(text: Column) -> Column:
    """Whitespace tokenization."""
    return F.split(F.trim(text), r"\s+")


def normalized_text_col(text: Column) -> Column:
    """Dedup normalization: lowercase + collapse whitespace + trim."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def ngram_rows(docs, n: int, out_col: str = "gram", keep_pos: bool = False):
    """ALL (doc_id, n-gram) occurrence rows via posexplode + window
    ``lead`` — THE codegen-safe n-gram core, shared by MinHash
    shingles (n=3, distinct), decontamination grams (n=4, distinct),
    the substring-span dedup (n=SPAN_TOKENS, multiplicities kept),
    and the heavy-hitter bigram stream (n=2, multiplicities kept).
    One definition so the lead/_last boundary semantics can never
    drift between call sites. ``keep_pos`` adds the token position to
    the output row for callers that need span offsets (none of the
    registry operators do since the r17 shuffle diet — the substring
    report's h-window never read it — but the span-offset use case is
    real, e.g. extracting the duplicated byte ranges for rewriting).

    Why not an array-expression (``transform`` over ``sequence``): a
    higher-order transform runs interpreted (outside codegen) and
    re-evaluates the token ``split`` per element access — measured
    ~O(tokens²) per document. posexplode evaluates the split once per
    doc and lead() is a streaming per-partition window; everything
    stays in WholeStageCodegen.
    """
    from pyspark.sql import Window as W

    tok = docs.select(
        "doc_id", F.posexplode(tokens_col(F.col("text"))).alias("pos", "t")
    )
    w = W.partitionBy("doc_id").orderBy("pos")
    leads = [F.lead("t", k).over(w) for k in range(1, n)]
    gram = F.concat_ws(" ", F.col("t"), *leads) if leads else F.col("t")
    last = leads[-1] if leads else F.col("t")
    cols = ["doc_id", "pos"] if keep_pos else ["doc_id"]
    return (
        tok.select(*cols, gram.alias(out_col), last.alias("_last"))
        .filter(F.col("_last").isNotNull())
        .drop("_last")
    )


def distinct_ngram_rows(docs, n: int, out_col: str = "gram"):
    """Distinct (doc_id, n-gram) rows — ``ngram_rows`` + distinct."""
    return ngram_rows(docs, n, out_col).distinct()


def shingles_col(toks: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles; empty array for short docs.

    WARNING (measured): higher-order ``transform`` runs interpreted and
    re-evaluates ``toks`` per element access — on a split() input this
    is ~O(tokens²) per row. Fine for small arrays / one-off use; hot
    paths should use the posexplode + window-lead formulation
    (operators/dedup._shingle_table).
    """
    joined = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + k + 1) for k in range(n)]),
    )
    return F.when(F.size(toks) >= n, F.array_distinct(joined)).otherwise(
        F.array().cast("array<string>")
    )


def minhash_cols(shingle: Column, seeds: int = MINHASH_SEEDS) -> list[Column]:
    """Per-seed hash of one (exploded) shingle. The minhash signature
    is min() of each over a document's shingles.

    md5 hex strings have fixed length, so their lexicographic MIN is
    the numeric min of the 128-bit values — no integer conversion
    needed, and identical in any engine with md5().
    """
    return [
        F.md5(F.concat(F.lit(f"{s}:"), shingle)).alias(f"m{s}") for s in range(seeds)
    ]


def band_cols(seeds: int = MINHASH_SEEDS, rows: int = BAND_ROWS) -> list[Column]:
    """LSH banding: concatenate each group of `rows` signature values
    into a band key. Two docs collide on a band iff that slice of
    their signatures matches exactly."""
    return [
        F.concat_ws("_", *[F.col(f"m{b * rows + r}") for r in range(rows)]).alias(
            f"band{b}"
        )
        for b in range(seeds // rows)
    ]
