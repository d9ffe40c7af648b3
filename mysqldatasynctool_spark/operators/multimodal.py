"""Multimodal-column operators (north star — SURVEY.md §2B).

The fixtures carry no real media, so binary payloads are synthesized
from ``documents.text`` (utf-8 encode) — every Spark-side mechanism
(binary columns, octet arithmetic, Arrow-batched mapInPandas decode)
is real; only the codec is the deterministic fake
(functions/multimodal.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.multimodal import (
    AUDIO_HOP,
    AUDIO_SCHEMA,
    AUDIO_WINDOW,
    DECODE_SCHEMA,
    RESIZE_SCHEMA,
    RESIZE_TARGET,
    make_audio_window_batches,
    make_resize_batches,
    FRAME_BYTES,
    FRAME_SCHEMA,
    FRAME_STRIDE,
    make_decode_batches,
    make_frame_sample_batches,
)
from ..sources.fixtures import load


def _with_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", "lang", F.encode("text", "utf-8").alias("payload")
    )


def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary column handling: byte length, head-bytes hex,
    content digest — pure built-ins over BinaryType (the typed
    replacement for the reference's raw-bytes BLOB branch,
    /root/reference/cmd/root.go:423-427)."""
    return (
        _with_payload(spark, sf_dir)
        .select(
            "doc_id",
            "lang",
            F.octet_length("payload").alias("n_bytes"),
            F.hex(F.substring("payload", 1, 8)).alias("head_hex"),
            F.md5("payload").alias("digest"),
        )
        .orderBy("doc_id")
    )


MULTIMODAL_BINARY_META_ORACLE = """
-- fixture text is pure ASCII (verified: octet_length == length), so
-- VARCHAR substring == byte substring and md5(text) == md5(utf8 bytes)
SELECT doc_id, lang,
       octet_length(CAST(text AS BLOB)) AS n_bytes,
       hex(CAST(substring(text, 1, 8) AS BLOB)) AS head_hex,
       md5(text) AS digest
FROM documents
ORDER BY doc_id
"""


def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decode step: Arrow-batched mapInPandas over the binary
    payload producing typed metadata (width/height/channels/format).
    Deterministic fake codec → the SQL oracle can replicate it, which
    verifies schema, batching, and row alignment end-to-end."""
    payloads = _with_payload(spark, sf_dir).select("doc_id", "payload")
    decoded = payloads.mapInPandas(make_decode_batches(), schema=DECODE_SCHEMA)
    return decoded.orderBy("doc_id")


MULTIMODAL_DECODE_ORACLE = """
WITH p AS (SELECT doc_id, octet_length(CAST(text AS BLOB)) AS n FROM documents)
SELECT doc_id,
       CAST(n AS INT) AS n_bytes,
       CAST(64 + (n % 512) AS INT) AS width,
       CAST(64 + ((n * 7) % 512) AS INT) AS height,
       CAST(1 + (n % 3) AS INT) AS channels,
       CASE WHEN n % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format
FROM p
ORDER BY doc_id
"""


def multimodal_size_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Size-histogram / skew-audit for a binary column: the check run
    before decode at scale (decide repartitioning by payload size so
    large blobs spread evenly)."""
    return (
        _with_payload(spark, sf_dir)
        .select(F.floor(F.octet_length("payload") / 100).alias("size_bucket_100b"))
        .groupBy("size_bucket_100b")
        .agg(F.count("*").alias("n_payloads"))
        .orderBy("size_bucket_100b")
    )


MULTIMODAL_SIZE_ORACLE = """
SELECT CAST(floor(octet_length(CAST(text AS BLOB)) / 100) AS BIGINT) AS size_bucket_100b,
       COUNT(*) AS n_payloads
FROM documents
GROUP BY 1
ORDER BY size_bucket_100b
"""


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling for video-shaped payloads: every payload fans
    out to one row per sampled fixed-size frame (every 4th of its
    64-byte frames) with offset + content digest — the row-expansion
    shape of real video pipelines (decode k-th frame only). The byte
    slicer is the deterministic codec stand-in; the SQL oracle
    replicates the slicing, verifying fan-out row alignment, offsets,
    and per-frame digests end-to-end through mapInPandas.

    100 TB shape: pure map-side fan-out — no shuffle at all; output
    rows carry a 32-char digest, not the frame bytes, so downstream
    joins stay slim. Real decoders drop in at the closure swap point
    (functions/multimodal.py)."""
    payloads = _with_payload(spark, sf_dir).select("doc_id", "payload")
    return payloads.mapInPandas(
        make_frame_sample_batches(), schema=FRAME_SCHEMA
    ).orderBy("doc_id", "frame_idx")


MULTIMODAL_FRAME_ORACLE = f"""
-- fixture text is pure ASCII, so VARCHAR slicing == byte slicing and
-- md5(substring(text,...)) == md5 of the frame bytes
SELECT doc_id,
       CAST(i AS INT) AS frame_idx,
       CAST(i * {FRAME_BYTES} AS INT) AS offset,
       CAST({FRAME_BYTES} AS INT) AS n_bytes,
       md5(substring(text, CAST(i * {FRAME_BYTES} + 1 AS BIGINT), {FRAME_BYTES})) AS digest
FROM documents,
     LATERAL (
       SELECT unnest(range(0, CAST(floor(octet_length(CAST(text AS BLOB)) / {FRAME_BYTES}) AS BIGINT), {FRAME_STRIDE})) AS i
     )
ORDER BY doc_id, frame_idx
"""


def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The resize step: Arrow-batched mapInPandas computing the
    aspect-preserving resize plan (long side → 224) and a digest
    standing in for the resized buffer. Completes the
    decode/feature/resize/frame-sample quartet; the real pixel kernel
    swaps into make_resize_batches (functions/multimodal.py) — the
    distributed plumbing is what this verifies.

    100 TB shape: pure map-side, no shuffle; output carries dims + a
    32-char digest, never pixel buffers."""
    payloads = _with_payload(spark, sf_dir).select("doc_id", "payload")
    return payloads.mapInPandas(make_resize_batches(), schema=RESIZE_SCHEMA).orderBy(
        "doc_id"
    )


MULTIMODAL_RESIZE_ORACLE = f"""
-- same deterministic fake geometry as the decode oracle; digest is
-- md5(payload || '|WxH') — ASCII fixture text makes BLOB==VARCHAR md5
WITH p AS (
  SELECT doc_id, text, octet_length(CAST(text AS BLOB)) AS n FROM documents
), dims AS (
  SELECT doc_id, text,
         CAST(64 + (n % 512) AS INT) AS width,
         CAST(64 + ((n * 7) % 512) AS INT) AS height,
         CAST(1 + (n % 3) AS INT) AS channels
  FROM p
)
SELECT doc_id, width, height,
       CAST(width * {RESIZE_TARGET} // greatest(width, height) AS INT) AS new_width,
       CAST(height * {RESIZE_TARGET} // greatest(width, height) AS INT) AS new_height,
       CAST(CAST(width * {RESIZE_TARGET} // greatest(width, height) AS BIGINT)
            * CAST(height * {RESIZE_TARGET} // greatest(width, height) AS BIGINT)
            * channels AS BIGINT) AS out_bytes,
       md5(text || '|' ||
           CAST(width * {RESIZE_TARGET} // greatest(width, height) AS INT) || 'x' ||
           CAST(height * {RESIZE_TARGET} // greatest(width, height) AS INT))
         AS resized_digest
FROM dims
ORDER BY doc_id
"""


QUERIES = {
    "multimodal_binary_meta": multimodal_binary_meta,
    "multimodal_decode_features": multimodal_decode_features,
    "multimodal_size_partitioned": multimodal_size_partitioned,
    "multimodal_frame_sample": multimodal_frame_sample,
    "multimodal_resize": multimodal_resize,
}

ORACLES = {
    "multimodal_binary_meta": MULTIMODAL_BINARY_META_ORACLE,
    "multimodal_decode_features": MULTIMODAL_DECODE_ORACLE,
    "multimodal_size_partitioned": MULTIMODAL_SIZE_ORACLE,
    "multimodal_frame_sample": MULTIMODAL_FRAME_ORACLE,
    "multimodal_resize": MULTIMODAL_RESIZE_ORACLE,
}


def multimodal_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio windowing for PCM-shaped payloads — the STFT-prep shape
    every audio pipeline runs before feature extraction: each payload
    fans out to one row per OVERLAPPING analysis window (256 samples,
    hop 128 — the 50% overlap is exactly what the video sampler's
    disjoint strided frames cannot express) carrying the start
    sample, an EXACT integer energy (sum of squared centered 8-bit
    samples, no float anywhere), and the window digest. Completes the
    multimodal quartet's audio corner; the real PCM decode swaps in
    at the same closure point as the image codec
    (functions/multimodal.py).

    100 TB shape: pure map-side fan-out (mapInPandas), zero shuffles;
    rows carry a digest + three ints, never sample buffers; windows
    per payload is ~n/hop, so output scales linearly with corpus
    bytes regardless of overlap.
    """
    payloads = _with_payload(spark, sf_dir).select("doc_id", "payload")
    return payloads.mapInPandas(
        make_audio_window_batches(), schema=AUDIO_SCHEMA
    ).orderBy("doc_id", "win_idx")


MULTIMODAL_AUDIO_ORACLE = f"""
-- fixture text is pure ASCII (BLOB==VARCHAR slicing, ascii() == the
-- byte value), so the energy and digest replicate exactly
WITH wins AS (
  SELECT doc_id, text, CAST(s AS INT) AS start,
         CAST(s / {AUDIO_HOP} AS INT) AS win_idx
  FROM documents,
       LATERAL (
         SELECT unnest(range(
           0,
           GREATEST(octet_length(CAST(text AS BLOB)) - {AUDIO_WINDOW} + 1, 0),
           {AUDIO_HOP})) AS s
       )
),
pos AS (SELECT unnest(range(0, {AUDIO_WINDOW})) AS j)
SELECT w.doc_id, w.win_idx, w.start,
       CAST({AUDIO_WINDOW} AS INT) AS n_samples,
       CAST(SUM(
         (ascii(substring(w.text, CAST(w.start + p.j + 1 AS BIGINT), 1)) - 128)
         * (ascii(substring(w.text, CAST(w.start + p.j + 1 AS BIGINT), 1)) - 128)
       ) AS BIGINT) AS energy,
       md5(substring(w.text, CAST(w.start + 1 AS BIGINT), {AUDIO_WINDOW})) AS digest
FROM wins w CROSS JOIN pos p
GROUP BY w.doc_id, w.win_idx, w.start, w.text
ORDER BY w.doc_id, w.win_idx
"""

QUERIES["multimodal_audio_windows"] = multimodal_audio_windows
ORACLES["multimodal_audio_windows"] = MULTIMODAL_AUDIO_ORACLE


def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-duplicate detection over the binary
    payloads — the image-dedup staple (aHash/pHash bucket-join) the
    multimodal family lacked: documents whose CONTENT hashes to the
    same coarse 16-bit average-hash land in one bucket; buckets with
    >= 2 members are the near-dup report (at production scale a
    verify stage re-checks members pairwise, exactly like
    dedup_minhash_lsh's banding -> verify split).

    The hash is the classic average-hash over the 1-D byte stream:
    split the payload into 16 position blocks, bit b = 1 iff block
    b's byte mean >= the whole payload's mean. All decisions are
    EXACT integer cross-multiplications (block_sum * n_total >=
    total_sum * block_len) — no float mean ever exists, so the oracle
    replays the identical bits from ascii() codes (fixture text is
    pure ASCII; payload bytes == character codes, the invariant
    multimodal_binary_meta's oracle already pins). A real pHash (DCT
    over decoded pixels) swaps in at the same mapInPandas closure
    point as the image codec (functions/multimodal.py).

    100 TB shape: one Arrow map pass emits (doc_id, phash) — 2 longs
    per payload, never the bytes — then ONE hash-shuffle groupBy on
    the 16-bit key; bucket sizes are bounded by hash collisions, and
    the coarse key is the blocking stage, not the verdict.
    """
    payloads = _with_payload(spark, sf_dir).select("doc_id", "payload")

    def ahash(batches):
        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            ids, hashes = [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                a = _np.frombuffer(bytes(payload), dtype=_np.uint8)
                n = a.shape[0]
                if n == 0:
                    continue
                idx = (_np.arange(n, dtype=_np.int64) * 16) // n
                sums = _np.zeros(16, dtype=_np.int64)
                _np.add.at(sums, idx, a.astype(_np.int64))
                lens = _np.bincount(idx, minlength=16).astype(_np.int64)
                total = int(sums.sum())
                bits = (sums * n) >= (total * lens)
                ph = 0
                for b in range(16):
                    if lens[b] and bits[b]:
                        ph |= 1 << b
                ids.append(int(doc_id))
                hashes.append(ph)
            yield _pd.DataFrame({"doc_id": ids, "phash": hashes})

    hashed = payloads.mapInPandas(ahash, schema="doc_id long, phash long")
    return (
        hashed.groupBy("phash")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .filter(F.col("n_docs") > 1)
        .orderBy("phash")
    )


MULTIMODAL_PHASH_ORACLE = """
-- fixture text is pure ASCII (payload bytes == ascii codes); the
-- average-hash bits are exact integer cross-multiplications, so the
-- oracle replays them bit-for-bit from character codes
WITH pos AS (
  SELECT doc_id,
         unnest(range(1, length(text) + 1)) AS i,
         text,
         length(text) AS n
  FROM documents
  WHERE length(text) > 0
), px AS (
  SELECT doc_id,
         ascii(substring(text, CAST(i AS INT), 1)) AS b,
         ((i - 1) * 16) // n AS blk,
         n
  FROM pos
), blocks AS (
  SELECT doc_id, blk, n,
         CAST(SUM(b) AS BIGINT) AS bs,
         CAST(COUNT(*) AS BIGINT) AS bl
  FROM px GROUP BY doc_id, blk, n
), tot AS (
  SELECT doc_id, CAST(SUM(bs) AS BIGINT) AS ts FROM blocks GROUP BY doc_id
), bits AS (
  SELECT b.doc_id,
         CAST(SUM(CASE WHEN b.bs * b.n >= t.ts * b.bl
                       THEN CAST(1 AS BIGINT) << CAST(b.blk AS INT)
                       ELSE 0 END) AS BIGINT) AS phash
  FROM blocks b JOIN tot t USING (doc_id)
  GROUP BY b.doc_id
)
SELECT phash, COUNT(*) AS n_docs,
       MIN(doc_id) AS min_doc_id, MAX(doc_id) AS max_doc_id
FROM bits GROUP BY phash HAVING COUNT(*) > 1
ORDER BY phash
"""

QUERIES["multimodal_phash_dedup"] = multimodal_phash_dedup
ORACLES["multimodal_phash_dedup"] = MULTIMODAL_PHASH_ORACLE
