"""Python UDTF surface (SURVEY.md §2B UDF/UDAF/UDTF row): a
table-function that explodes a document into overlapping windows —
defined INSIDE the test/caller (pickled by value, same closure rule as
every Python-worker entry point in this engine)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_udtf_sliding_token_windows(spark):
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="win_id int, start_tok int, text string")
    class SlidingWindows:
        def eval(self, doc_id: int, text: str, size: int, step: int):
            toks = text.split()
            wid = 0
            for start in range(0, max(len(toks) - size + 1, 1), step):
                yield wid, start, " ".join(toks[start : start + size])
                wid += 1

    spark.udtf.register("sliding_windows", SlidingWindows)
    from mysqldatasynctool_spark.sources.fixtures import load

    docs = load(spark, "/root/testdata/sf0.001", "documents").limit(20)
    docs.createOrReplaceTempView("docs_udtf")
    out = spark.sql(
        """
        SELECT d.doc_id, w.win_id, w.start_tok, w.text
        FROM docs_udtf d, LATERAL sliding_windows(d.doc_id, d.text, 10, 5) w
        """
    ).collect()
    assert out, "UDTF produced no windows"
    # overlapping windows: step 5 over size 10 → consecutive windows
    # share 5 tokens; verify window arithmetic for one doc
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_rows in by_doc.values():
        starts = sorted(r.start_tok for r in doc_rows)
        assert starts[0] == 0
        assert all(b - a == 5 for a, b in zip(starts, starts[1:]))
        assert all(len(r.text.split()) <= 10 for r in doc_rows)
