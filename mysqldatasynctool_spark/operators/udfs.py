"""Python UDF surface as oracle-checked queries (SURVEY.md §2B
"UDF/UDAF/UDTF" row).

The engine's design rule is "UDFs are the slow path": production
operators use built-ins or Arrow-batched pandas functions. These two
queries exist to prove the full API surface works end-to-end under
the driver contract anyway:

- a GROUPED_AGG pandas UDF (vectorized UDAF — Arrow transfer, one
  numpy-backed reduction per group) aggregating an integer column, so
  the result is exact and hash-comparable against SQL;
- a Python UDTF (table function) in a LATERAL join, fanning each doc
  out to overlapping token windows — deterministic arithmetic, so the
  DuckDB oracle reproduces it with list slicing.

Both callables are defined INSIDE the query functions: cloudpickle
then serializes them by value and executors never need this package
importable (the closure-factory rule every Python-worker entry point
here follows).
"""

# NOTE: no `from __future__ import annotations` here — PEP 563 turns
# the pandas UDF's `pd.Series -> int` hints into strings, which
# pandas_udf signature inference rejects (UNSUPPORTED_SIGNATURE).

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.fixtures import load

#: UDTF window geometry (tokens per window / step between starts)
UDTF_WIN, UDTF_STEP = 10, 5
#: doc subset for the UDTF fan-out (filter, never limit(): LIMIT picks
#: nondeterministic rows in a distributed plan)
UDTF_MAX_DOC = 20


def udf_grouped_agg_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized UDAF: per-language doc count + total characters via
    a GROUPED_AGG pandas UDF. Integer sums are exact in pandas int64,
    so the oracle hash-matches bit-for-bit (a double-summing UDAF
    would not — see the DECIMAL discipline in operators/__init__.py).
    """
    import pandas as pd

    @F.pandas_udf("long")
    def int_total(v: pd.Series) -> int:
        return int(v.sum())

    # Spark rejects mixing GROUPED_AGG pandas UDFs with JVM aggregate
    # functions in one agg (INVALID_PANDAS_UDF_PLACEMENT), so the
    # group count is a pandas UDF too
    @F.pandas_udf("long")
    def n_rows(v: pd.Series) -> int:
        return len(v)

    docs = load(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang")
        .agg(
            n_rows("doc_id").alias("n_docs"),
            int_total("n_chars").alias("total_chars"),
        )
        .orderBy("lang")
    )


UDF_GROUPED_AGG_ORACLE = """
SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY lang ORDER BY lang
"""


def udf_udtf_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF in a LATERAL join: each doc fans out to overlapping
    token windows (size 10, step 5) — the table-function API the
    in-package chunking op implements relationally (textops.py).
    """
    from pyspark.sql.functions import udtf

    # useArrow: the UDTF still evaluates per input row (that IS the
    # table-function contract) but rows transfer in Arrow record
    # batches instead of pickled one-at-a-time — the same 10-100x
    # serialization win as pandas UDFs (plan shows ArrowEvalPythonUDTF,
    # audited by tools/plan_audit.py)
    @udtf(returnType="win_id int, start_tok int, win_text string", useArrow=True)
    class SlidingWindows:
        def eval(self, text: str, size: int, step: int):
            toks = text.split()
            wid = 0
            for start in range(0, max(len(toks) - size + 1, 1), step):
                yield wid, start, " ".join(toks[start : start + size])
                wid += 1

    spark.udtf.register("engine_sliding_windows", SlidingWindows)
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < UDTF_MAX_DOC)
    docs.createOrReplaceTempView("udtf_docs")
    return spark.sql(
        f"""
        SELECT d.doc_id, w.win_id, w.start_tok, w.win_text
        FROM udtf_docs d,
             LATERAL engine_sliding_windows(d.text, {UDTF_WIN}, {UDTF_STEP}) w
        ORDER BY d.doc_id, w.win_id
        """
    )


UDF_UDTF_ORACLE = rf"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
  FROM documents WHERE doc_id < {UDTF_MAX_DOC}
),
wins AS (
  SELECT doc_id,
         CAST(u.s / {UDTF_STEP} AS INT) AS win_id,
         CAST(u.s AS INT) AS start_tok,
         array_to_string(list_slice(t, u.s + 1, u.s + {UDTF_WIN}), ' ') AS win_text
  FROM toks,
       LATERAL (
         SELECT unnest(range(0, greatest(len(t) - {UDTF_WIN} + 1, 1), {UDTF_STEP})) AS s
       ) u
)
SELECT doc_id, win_id, start_tok, win_text FROM wins
ORDER BY doc_id, win_id
"""


QUERIES = {
    "udf_grouped_agg_pandas": udf_grouped_agg_pandas,
    "udf_udtf_windows": udf_udtf_windows,
}

ORACLES = {
    "udf_grouped_agg_pandas": UDF_GROUPED_AGG_ORACLE,
    "udf_udtf_windows": UDF_UDTF_ORACLE,
}
