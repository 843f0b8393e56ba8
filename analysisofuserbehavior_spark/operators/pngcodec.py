"""PNG codec in pure stdlib (zlib) + numpy — no PIL.

Second COMPRESSED image format decoded for real (after
`jpegcodec.py`): PNG is DEFLATE-compressed with per-row predictive
filters, and the stdlib ships the DEFLATE half (zlib), so a complete
8-bit truecolor decoder is small and exact.  PNG is LOSSLESS, so the
oracle for the gate row is simply the synthesized color — no
quantization replay needed.

Scope: 8-bit RGB (color type 2) and RGBA (6, alpha dropped for the
feature row), non-interlaced.  The DECODER is general within that
profile: it walks chunks, concatenates IDAT, inflates, and reverses
ALL FIVE row filters (None/Sub/Up/Average/Paeth) — the encoder only
emits filter 0, but the filter loop is exercised by unit tests that
hand-build Sub/Up/Average/Paeth rows.  Out-of-profile payloads
(palette, 16-bit, interlaced, bad CRC lengths, truncated) return
None — the same quarantine contract as the other decoders.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(rgb: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as an 8-bit truecolor
    non-interlaced PNG (filter 0 rows, one zlib stream)."""
    h, w = rgb.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + rgb[i].tobytes() for i in range(h))
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(payload: bytes):
    """Decode an 8-bit truecolor(±alpha) non-interlaced PNG →
    (h, w, 3) uint8 RGB array (alpha dropped), or None for payloads
    outside the profile."""
    if len(payload) < 8 or payload[:8] != _SIG:
        return None
    pos = 8
    w = h = 0
    nch = 0
    idat = bytearray()
    try:
        while pos + 8 <= len(payload):
            ln, tag = struct.unpack_from(">I4s", payload, pos)
            body = payload[pos + 8 : pos + 8 + ln]
            if len(body) != ln:
                return None  # truncated chunk
            pos += 12 + ln  # skip CRC
            if tag == b"IHDR":
                w, h, depth, ctype, comp, filt, inter = struct.unpack(
                    ">IIBBBBB", body
                )
                if depth != 8 or ctype not in (2, 6) or comp or filt or inter:
                    return None  # outside profile
                nch = 3 if ctype == 2 else 4
            elif tag == b"IDAT":
                idat += body
            elif tag == b"IEND":
                break
        if not (w and h and nch and idat):
            return None
        raw = zlib.decompress(bytes(idat))
    except (struct.error, zlib.error):
        return None
    stride = w * nch
    if len(raw) != h * (1 + stride):
        return None
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for i in range(h):
        row = raw[i * (1 + stride) : (i + 1) * (1 + stride)]
        ftype, data = row[0], np.frombuffer(row[1:], np.uint8).astype(np.int32)
        if ftype == 0:  # None
            cur = data
        elif ftype == 2:  # Up
            cur = (data + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth: sequential
            cur = np.zeros(stride, dtype=np.int32)
            for j in range(stride):
                a = cur[j - nch] if j >= nch else 0
                b = prev[j]
                if ftype == 1:
                    cur[j] = (data[j] + a) & 0xFF
                elif ftype == 3:
                    cur[j] = (data[j] + ((a + b) >> 1)) & 0xFF
                else:
                    c = prev[j - nch] if j >= nch else 0
                    cur[j] = (data[j] + _paeth(a, b, c)) & 0xFF
        else:
            return None
        out[i] = cur.astype(np.uint8)
        prev = cur
    px = out.reshape(h, w, nch)
    return px[:, :, :3].copy()
