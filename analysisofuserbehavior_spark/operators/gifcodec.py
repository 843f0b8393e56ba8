"""Pure-Python GIF89a codec (LZW) — the engine's fifth REAL image
format and its first MULTI-FRAME one.

Like jpegcodec/pngcodec, this exists to make the multimodal
plumbing's decode step REAL without PIL/ffmpeg (absent from the
container): stdlib-only LZW entropy coding, numpy pixel math.  GIF
adds what the stills lack — a genuine animation container, so the
frame-sampling semantics `media_frame_offsets` models against fake
headers are exercised against a real wire format here.

Profile (raises/returns None outside it, like the other codecs):
- GIF89a/GIF87a, global color table only (no local tables),
- non-interlaced, full-logical-screen frames at (0,0),
- no transparency handling (GCE blocks are parsed and skipped).

GIF is LOSSLESS for palette-expressible frames, so the oracle can
predict decoded channel means as the synthesized colors themselves —
the same closed-form gate discipline as BMP/PPM/PNG.

Format facts used (public GIF89a spec):
- LZW per GIF: initial code width = min_code_size+1, CLEAR=2^mcs,
  EOI=CLEAR+1; dictionary grows to 4095; width bumps at 2^width;
  encoder emits CLEAR first and resets at dictionary overflow.
- Pixel data arrives in ≤255-byte sub-blocks, bits packed LSB-first.
"""

from __future__ import annotations

import struct

import numpy as np


# ---- LZW (GIF variant, LSB-first bit packing) ------------------------------


def _lzw_compress(indices: list[int], mcs: int) -> bytes:
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    next_code = eoi + 1
    width = mcs + 1
    table: dict[tuple[int, ...], int] = {(i,): i for i in range(1 << mcs)}
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    buf: tuple[int, ...] = ()
    for px in indices:
        cand = buf + (px,)
        if cand in table:
            buf = cand
            continue
        emit(table[buf])
        table[cand] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        elif next_code > 4095:
            emit(clear)
            table = {(i,): i for i in range(1 << mcs)}
            next_code = eoi + 1
            width = mcs + 1
        buf = (px,)
    if buf:
        emit(table[buf])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decompress(data: bytes, mcs: int, n_expected: int) -> list[int]:
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    width = mcs + 1
    table: list[tuple[int, ...]] = [(i,) for i in range(1 << mcs)] + [(), ()]
    out: list[int] = []
    acc = 0
    nbits = 0
    pos = 0
    prev: tuple[int, ...] | None = None
    while len(out) < n_expected:
        while nbits < width:
            if pos >= len(data):
                return out
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [(i,) for i in range(1 << mcs)] + [(), ()]
            width = mcs + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
        elif prev is not None and code == len(table):
            entry = prev + (prev[0],)  # the KwKwK case
        else:
            raise ValueError("corrupt LZW stream")
        out.extend(entry)
        if prev is not None:
            table.append(prev + (entry[0],))
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    return out


# ---- container --------------------------------------------------------------


def encode_gif(frames: list[np.ndarray]) -> bytes:
    """Encode full-screen RGB frames (equal shapes, uint8 HxWx3) as a
    GIF89a with one global palette built from the distinct colors
    across all frames (≤256 required — the synthetic profile)."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    flat = np.concatenate([f.reshape(-1, 3) for f in frames])
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError("synthetic GIF profile needs <=256 distinct colors")
    # palette size must be a power of two >= 2
    bits = max(1, int(np.ceil(np.log2(max(2, len(palette))))))
    size = 1 << bits
    pal = np.zeros((size, 3), dtype=np.uint8)
    pal[: len(palette)] = palette
    mcs = max(2, bits)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | ((bits - 1) << 4) | (bits - 1), 0, 0])
    out += pal.tobytes()
    per_frame = h * w
    for i, f in enumerate(frames):
        if f.shape[:2] != (h, w):
            raise ValueError("all frames must share the logical screen size")
        # Graphic Control Extension: 4-centisecond delay per frame —
        # exercises extension-block skipping in every real decoder
        out += bytes([0x21, 0xF9, 4, 0]) + struct.pack("<H", 4) + bytes([0, 0])
        out += bytes([0x2C]) + struct.pack("<HHHH", 0, 0, w, h) + bytes([0])
        idx = inverse[i * per_frame : (i + 1) * per_frame].astype(int).tolist()
        out += bytes([mcs])
        comp = _lzw_compress(idx, mcs)
        for off in range(0, len(comp), 255):
            blk = comp[off : off + 255]
            out += bytes([len(blk)]) + blk
        out += bytes([0])
    out += bytes([0x3B])
    return bytes(out)


def decode_gif(payload: bytes) -> list[np.ndarray] | None:
    """Decode a GIF within the documented profile into a list of
    HxWx3 uint8 frames; None for non-GIF payloads, ValueError for
    GIFs outside the profile (a real quarantine path would catch
    both)."""
    if payload[:6] not in (b"GIF89a", b"GIF87a"):
        return None
    w, h = struct.unpack_from("<HH", payload, 6)
    packed, _bg, _aspect = payload[10], payload[11], payload[12]
    pos = 13
    if not packed & 0x80:
        raise ValueError("profile requires a global color table")
    gct_size = 2 << (packed & 0x07)
    pal = np.frombuffer(payload, dtype=np.uint8, count=gct_size * 3, offset=pos)
    pal = pal.reshape(gct_size, 3)
    pos += gct_size * 3
    frames: list[np.ndarray] = []
    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks, skip
            pos += 2
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected block 0x{b:02x}")
        left, top, fw, fh = struct.unpack_from("<HHHH", payload, pos + 1)
        fpacked = payload[pos + 9]
        pos += 10
        if (left, top, fw, fh) != (0, 0, w, h):
            raise ValueError("profile requires full-screen frames")
        if fpacked & 0xC0:
            raise ValueError("profile excludes local tables/interlace")
        mcs = payload[pos]
        pos += 1
        comp = bytearray()
        while payload[pos] != 0:
            ln = payload[pos]
            comp += payload[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = _lzw_decompress(bytes(comp), mcs, w * h)
        if len(idx) != w * h:
            raise ValueError("short LZW stream")
        frames.append(pal[np.asarray(idx, dtype=np.int64)].reshape(h, w, 3))
    return frames
