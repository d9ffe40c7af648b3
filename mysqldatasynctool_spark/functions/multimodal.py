"""Multimodal (image/audio/video) column plumbing.

Design (north star): media travels as an opaque ``binary`` column with
typed metadata columns beside it; decode / feature-extraction /
resize / frame-sampling run as Arrow-batched Pandas functions over
``mapInPandas`` — per-batch Python cost is amortized over thousands of
rows, and partitioning/shuffle semantics are identical to any other
column. At 100 TB the binary payloads dominate storage: keep them in
their own parquet column-chunks (they compress independently), prune
them out of any query that only needs metadata (column pruning does
this for free), and repartition by size before decode so one task
doesn't get all the large blobs.

The container has no image/audio codecs, so the real decoder is
stubbed (``decode_image_real`` raises); ``fake_decode_meta`` is the
deterministic stand-in that keeps every piece of Spark-side plumbing
(schema, batching, UDF signature) real and testable — swap the one
function when codecs exist.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

#: output schema of the decode step — what a real image decoder would
#: emit alongside the source id.
DECODE_SCHEMA = (
    "doc_id long, n_bytes int, width int, height int, channels int, format string"
)


def decode_image_real(payload: bytes) -> dict:
    """Real decode — requires PIL/opencv, not present in this
    container. Swap point for production."""
    raise NotImplementedError(
        "image codecs are not available in this environment; "
        "use fake_decode_meta (deterministic stand-in) instead"
    )


def fake_decode_meta(payload: bytes) -> dict:
    """Deterministic fake decoder: derives plausible image metadata
    purely from the payload bytes, so tests (and the SQL oracle) can
    verify the distributed plumbing end-to-end."""
    n = len(payload)
    return {
        "n_bytes": n,
        "width": 64 + (n % 512),
        "height": 64 + ((n * 7) % 512),
        "channels": 1 + (n % 3),
        "format": "png" if n % 2 == 0 else "jpeg",
    }


def make_decode_batches(payload_col: str = "payload"):
    """Factory for the mapInPandas body: Arrow batch in → decoded-
    metadata batch out.

    Returned as a self-contained CLOSURE on purpose: cloudpickle
    serializes nested functions by value, so executor Python workers
    do not need this package on their import path (a module-level
    function would be pickled by reference and fail with
    ModuleNotFoundError when the engine is driven from outside the
    repo, e.g. by the driver harness). Every Python-worker entry point
    in this engine must follow this pattern.
    """

    def _fake_meta(payload: bytes) -> dict:
        # keep in sync with fake_decode_meta above (inlined so the
        # closure captures no module globals)
        n = len(payload)
        return {
            "n_bytes": n,
            "width": 64 + (n % 512),
            "height": 64 + ((n * 7) % 512),
            "channels": 1 + (n % 3),
            "format": "png" if n % 2 == 0 else "jpeg",
        }

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            metas = [_fake_meta(p) for p in pdf[payload_col]]
            out = _pd.DataFrame(metas)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out[["doc_id", "n_bytes", "width", "height", "channels", "format"]]

    return _batches


#: resize target (long side, pixels) — the standard vision-model prep
RESIZE_TARGET = 224

RESIZE_SCHEMA = (
    "doc_id long, width int, height int, new_width int, new_height int, "
    "out_bytes long, resized_digest string"
)


def make_resize_batches(payload_col: str = "payload", target: int = RESIZE_TARGET):
    """Factory for the resize mapInPandas body: aspect-preserving
    integer resize plan (long side → ``target``) plus a deterministic
    digest standing in for the resized pixel buffer. A real kernel
    (PIL/opencv) swaps in at this closure — dims math and row
    alignment stay identical. Closure-factory pattern — see
    make_decode_batches."""

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import pandas as _pd

        cols = [
            "doc_id",
            "width",
            "height",
            "new_width",
            "new_height",
            "out_bytes",
            "resized_digest",
        ]
        for pdf in batches:
            out: list[tuple] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                data = bytes(payload)
                n = len(data)
                w, h, c = 64 + (n % 512), 64 + ((n * 7) % 512), 1 + (n % 3)
                long_side = max(w, h)
                tw, th = w * target // long_side, h * target // long_side
                digest = hashlib.md5(data + f"|{tw}x{th}".encode()).hexdigest()
                out.append((int(doc_id), w, h, tw, th, tw * th * c, digest))
            yield _pd.DataFrame(out, columns=cols)

    return _batches


#: frame-sampling geometry: fixed-size "frames" of the binary payload,
#: keeping every FRAME_STRIDE-th frame (a real video sampler keeps
#: every k-th decoded frame; the byte-slice fake keeps the plumbing —
#: per-frame fan-out rows, offsets, digests — oracle-checkable)
FRAME_BYTES = 64
FRAME_STRIDE = 4

FRAME_SCHEMA = "doc_id long, frame_idx int, offset int, n_bytes int, digest string"


def make_frame_sample_batches(
    payload_col: str = "payload",
    frame_bytes: int = FRAME_BYTES,
    stride: int = FRAME_STRIDE,
):
    """Factory for the frame-sampling mapInPandas body: each payload
    row fans out to one row per sampled frame (idx 0, stride,
    2*stride, ... over the floor(n/frame_bytes) full frames), with the
    frame's byte offset and content digest. Closure-factory pattern —
    see make_decode_batches."""

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import pandas as _pd

        cols = ["doc_id", "frame_idx", "offset", "n_bytes", "digest"]
        for pdf in batches:
            out: list[tuple] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                data = bytes(payload)
                n_frames = len(data) // frame_bytes
                for i in range(0, n_frames, stride):
                    off = i * frame_bytes
                    frame = data[off : off + frame_bytes]
                    out.append(
                        (
                            int(doc_id),
                            i,
                            off,
                            len(frame),
                            hashlib.md5(frame).hexdigest(),
                        )
                    )
            yield _pd.DataFrame(out, columns=cols)

    return _batches


#: audio windowing: treat the payload as 8-bit PCM samples and emit
#: OVERLAPPING analysis windows — window 256 samples, hop 128 (50%
#: overlap), full windows only. The hop<window overlap is what
#: distinguishes the audio/STFT shape from the video sampler's
#: disjoint strided frames.
AUDIO_WINDOW = 256
AUDIO_HOP = 128

AUDIO_SCHEMA = (
    "doc_id long, win_idx int, start int, n_samples int, "
    "energy long, digest string"
)


def make_audio_window_batches(
    payload_col: str = "payload",
    window: int = AUDIO_WINDOW,
    hop: int = AUDIO_HOP,
):
    """Factory for the audio-windowing mapInPandas body: each payload
    fans out to one row per full overlapping window with its start
    sample, EXACT integer energy (sum of squared centered 8-bit
    samples — (b-128)^2 summed as python ints, so the value is
    engine-exact with no float anywhere), and the window's content
    digest. Closure-factory pattern — see make_decode_batches; the
    real PCM decoder swaps in the same way the image codec does."""

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import pandas as _pd

        cols = ["doc_id", "win_idx", "start", "n_samples", "energy", "digest"]
        for pdf in batches:
            out: list[tuple] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                data = bytes(payload)
                idx = 0
                for start in range(0, len(data) - window + 1, hop):
                    win = data[start : start + window]
                    energy = 0
                    for b in win:
                        c = b - 128
                        energy += c * c
                    out.append(
                        (
                            int(doc_id),
                            idx,
                            start,
                            window,
                            energy,
                            hashlib.md5(win).hexdigest(),
                        )
                    )
                    idx += 1
            yield _pd.DataFrame(out, columns=cols)

    return _batches
