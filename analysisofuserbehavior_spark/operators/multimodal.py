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


def frame_offsets(media: DataFrame, every_n: int = 10, fps: int = 30) -> DataFrame:
    """Video frame-sampling plan: emit the byte-free frame index list
    a downstream decoder would extract (width encodes frame count in
    the fake format)."""

    def plan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                n_frames, _ = _decode_fake(r["media"])
                for idx in range(0, n_frames, every_n):
                    rows.append(
                        {
                            "doc_id": r["doc_id"],
                            "frame_index": idx,
                            "timestamp_sec": round(idx / fps, 3),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_index", "timestamp_sec"]
            )

    return media.where(media.media_type == "video").mapInPandas(
        plan, "doc_id long, frame_index int, timestamp_sec double"
    )
