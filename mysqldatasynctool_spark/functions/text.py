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
    """ALL (doc_id, n-gram) occurrence rows — THE n-gram core, shared
    by MinHash shingles (n=3, distinct), decontamination grams (n=4,
    distinct), the substring-span dedup (n=SPAN_TOKENS, multiplicities
    kept), and the heavy-hitter bigram stream (n=2, multiplicities
    kept). One definition so the boundary semantics can never drift
    between call sites. ``keep_pos`` adds the token position to the
    output row for callers that need span offsets.

    r18 SHUFFLE REMOVAL (guide §2.4): the r1–r17 formulation was
    posexplode + a window ``lead`` over (doc_id, pos) — which EXCHANGES
    AND SORTS every token row (corpus tokens × string bytes) just to
    pair each token with its neighbors, even though every token of a
    doc is already adjacent inside its row. This form builds the gram
    ARRAY per doc row with ``zip_with`` over shifted ``slice``s of the
    token array (zip_with pads the shorter side with NULL, and concat
    null-propagates, so incomplete tail grams drop exactly like the
    old ``lead IS NULL`` filter), then explodes — zero exchanges,
    zero sorts. Measured at sf0.1: the shingle subtree loses its
    Exchange+Sort (~2.5 M token rows) per build.

    Two standing traps, both still avoided:
    - ``transform(sequence(...), i -> element_at(toks, i+k))``
      re-evaluates the SPLIT per element access (measured ~O(tokens²)
      per doc, r7) — here the lambda never references the token
      expression, only zip_with's already-materialized operands;
    - the token array is materialized in its OWN projection below so
      the n ``slice`` references cannot inline n copies of
      split+regexp (CollapseProject keeps non-cheap multi-referenced
      expressions un-collapsed; verified in the committed plans).
    """
    toks, g = _gram_arrays(docs, n)
    if keep_pos:
        out = toks.select("doc_id", F.posexplode(g).alias("pos", out_col))
    else:
        out = toks.select("doc_id", F.explode(g).alias(out_col))
    return out.filter(F.col(out_col).isNotNull())


def _gram_arrays(docs, n: int):
    """(token-projection frame, gram-array column) — see ngram_rows."""
    toks = docs.select("doc_id", tokens_col(F.col("text")).alias("_toks"))
    t = F.col("_toks")
    g = t
    for k in range(1, n):
        shifted = F.slice(t, k + 1, F.greatest(F.size(t) - k, F.lit(0)))
        g = F.zip_with(g, shifted, lambda a, b: F.concat(a, F.lit(" "), b))
    return toks, g


def distinct_ngram_rows(docs, n: int, out_col: str = "gram"):
    """Distinct (doc_id, n-gram) rows.

    r18: per-doc ``array_distinct`` before the explode replaces the
    old global ``.distinct()`` — the (doc_id, gram) distinct is
    per-document by definition, so deduping inside the row removes the
    distinct's whole EXCHANGE of the pair stream (guide §2.4: a
    distinct on data that is already key-local). Gram arrays are
    bounded by document token counts, the same bound the split/tokens
    array already carries."""
    toks, g = _gram_arrays(docs, n)
    return toks.select(
        "doc_id", F.explode(F.array_distinct(g)).alias(out_col)
    ).filter(F.col(out_col).isNotNull())


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
