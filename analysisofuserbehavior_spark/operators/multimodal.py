"""Multimodal (image/audio/video) column plumbing.

Not in the reference (pure log analytics); added for training-data
pipelines: media travels as an opaque `binary` column plus typed
metadata, and per-batch feature extraction runs as Arrow-batched
`mapInPandas` — the Spark-side contract (schema, partitioning, batch
shape) is real and tested, while the actual codec work is stubbed
because no image/audio libraries ship in this environment.

Wire format of the deterministic fake used by tests and the stub
decoder: 8-byte little-endian header `<II` = (width, height) followed
by an arbitrary payload.  A production build swaps `_decode_fake`
for PIL/ffmpeg inside the same mapInPandas iterator — the plan,
schema and Arrow batching are unchanged.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

MEDIA_SCHEMA = "doc_id long, media_type string, media binary"
METADATA_SCHEMA = (
    "doc_id long, media_type string, width int, height int, n_bytes long"
)

try:  # real decoders are optional; absent in this environment
    import PIL.Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


def _decode_fake(payload: bytes) -> tuple[int, int]:
    """Parse the deterministic fake header (see module docstring)."""
    if payload is None or len(payload) < 8:
        return (0, 0)
    return struct.unpack("<II", payload[:8])


def decode_real(payload: bytes):  # pragma: no cover - env has no codecs
    """Real decode path — requires PIL; stubbed per environment."""
    if not HAVE_PIL:
        raise NotImplementedError(
            "image decoding requires PIL/ffmpeg, not available in this build; "
            "the fake-header path (media_metadata) exercises the full "
            "Spark plumbing"
        )
    raise NotImplementedError("wire PIL.Image.open here")


def media_metadata(media: DataFrame) -> DataFrame:
    """Extract (width, height, n_bytes) per media row via mapInPandas.

    One Arrow batch in, one out — no per-row Python calls across the
    JVM boundary; at 100 TB this runs embarrassingly parallel over
    whatever partitioning the media table already has."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = pdf["media"].map(_decode_fake)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "width": dims.map(lambda d: d[0]).astype("int32"),
                    "height": dims.map(lambda d: d[1]).astype("int32"),
                    "n_bytes": pdf["media"].map(
                        lambda b: 0 if b is None else len(b)
                    ).astype("int64"),
                }
            )

    return media.mapInPandas(extract, METADATA_SCHEMA)


def resize_media(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plan: same binary-in/binary-out contract a PIL/ffmpeg
    implementation would have.  The fake path rewrites the header to
    the target dims and scales the payload length proportionally
    (deterministic, so tests can assert exact output); the real
    decoder drops into the same iterator."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def one(b: bytes | None) -> bytes | None:
                if b is None or len(b) < 8:
                    return None
                w0, h0 = struct.unpack("<II", b[:8])
                body = b[8:]
                if w0 and h0:
                    scale = (width * height) / float(w0 * h0)
                    body = body[: max(0, int(len(body) * min(scale, 1.0)))]
                return struct.pack("<II", width, height) + body

            out = pdf.copy()
            out["media"] = pdf["media"].map(one)
            yield out

    return media.mapInPandas(resize, MEDIA_SCHEMA)


def embed_media(media: DataFrame, dim: int = 16) -> DataFrame:
    """Feature-extraction stub: deterministic pseudo-embedding
    (seeded from a payload digest) with the exact schema a vision
    encoder would emit (`array<float>`), feeding straight into the
    similarity operators.  A production build replaces the hash loop
    with a batched model forward pass inside the same iterator —
    partitioning, Arrow batch shape, and output schema unchanged."""
    import hashlib

    def embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def one(b: bytes | None) -> list[float]:
                if b is None:
                    return [0.0] * dim
                d = hashlib.sha256(b).digest()
                # widen the 32-byte digest to `dim` floats in [-1, 1)
                vals = []
                for i in range(dim):
                    chunk = d[(2 * i) % 32] * 256 + d[(2 * i + 1) % 32]
                    vals.append(chunk / 32768.0 - 1.0)
                return vals

            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "embedding": pdf["media"].map(one)}
            )

    return media.mapInPandas(embed, "doc_id long, embedding array<float>")


def frame_offsets(media: DataFrame, every_n: int = 10, fps: int = 30) -> DataFrame:
    """Video frame-sampling plan: emit the byte-free frame index list
    a downstream decoder would extract (width encodes frame count in
    the fake format).  `timestamp_sec` is floored to the millisecond
    via integer math (idx*1000//fps / 1000) so the value is
    bit-identical across engines — float rounding is not."""

    import numpy as np

    def plan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            # header decode is a byte-slice per row; the frame fan-out
            # (the hot loop: ~n_frames/every_n rows per video) is pure
            # numpy repeat/arange — no per-row Python iteration
            n_frames = np.fromiter(
                (_decode_fake(b)[0] for b in pdf["media"]),
                dtype=np.int64,
                count=len(pdf),
            )
            counts = -(-n_frames // every_n)  # ceil; 0 for headerless rows
            doc_ids = np.repeat(pdf["doc_id"].to_numpy(), counts)
            ends = np.cumsum(counts)
            # global arange minus each row's start offset → per-row
            # 0, every_n, 2·every_n, ... sequences, all vectorized
            idx_within = np.arange(ends[-1]) - np.repeat(ends - counts, counts)
            frame_index = (idx_within * every_n).astype(np.int32)
            yield pd.DataFrame(
                {
                    "doc_id": doc_ids,
                    "frame_index": frame_index,
                    "timestamp_sec": (frame_index.astype(np.int64) * 1000 // fps)
                    / 1000.0,
                }
            )

    return media.where(media.media_type == "video").mapInPandas(
        plan, "doc_id long, frame_index int, timestamp_sec double"
    )


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Deterministic media table derived from the documents corpus —
    the ingest boundary for the multimodal oracle gate.

    Every doc becomes one media row in the fake wire format (module
    docstring): videos for doc_id % 5 == 0 (width encodes the frame
    count, 30 + doc_id % 240), images otherwise (width
    64 + doc_id % 1024); height 64 + (doc_id*7) % 768; payload =
    header + utf-8 text bytes.  All formulas are closed-form over
    (doc_id, text), so a SQL oracle can predict every metadata field
    the decode path recovers — an end-to-end check of the binary
    Arrow round trip, not of the generator."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(did)
                video = did % 5 == 0
                width = 30 + did % 240 if video else 64 + did % 1024
                height = 64 + (did * 7) % 768
                rows.append(
                    {
                        "doc_id": did,
                        "media_type": "video" if video else "image",
                        "media": struct.pack("<II", width, height)
                        + text.encode("utf-8"),
                    }
                )
            yield pd.DataFrame(rows, columns=["doc_id", "media_type", "media"])

    return docs.select("doc_id", "text").mapInPandas(gen, MEDIA_SCHEMA)
