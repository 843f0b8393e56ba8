"""IMA ADPCM (DVI4) WAV codec — the engine's first COMPRESSED audio
format, stdlib-only (struct + bytes math; numpy only for feature
math downstream).

Role, like jpegcodec/pngcodec/gifcodec: make the multimodal decode
step REAL without ffmpeg/soundfile.  IMA ADPCM is the classic 4:1
speech/audio codec (4 bits/sample vs PCM-16), carried in a WAV
container with format tag 0x0011, per-block headers and a `fact`
chunk holding the true sample count.

Gate discipline: ADPCM is lossy in general, but a CONSTANT signal
with block predictor seeded to its value and step index 0 decodes
BIT-EXACTLY (nibble 0 at step 7 adds step>>3 == 0) — so synthesized
constant tones give closed-form features (rms == |amplitude|), the
same trick the JPEG gate plays with DC-only quantization.  General
signals get a bounded-error property test instead.

Tables and update rules are the public IMA/DVI specification.
"""

from __future__ import annotations

import struct

STEP_TABLE = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
INDEX_TABLE = [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8]

_I16_MIN, _I16_MAX = -32768, 32767


def _clamp16(v: int) -> int:
    return _I16_MIN if v < _I16_MIN else (_I16_MAX if v > _I16_MAX else v)


def _encode_nibble(sample: int, pred: int, idx: int) -> tuple[int, int, int]:
    step = STEP_TABLE[idx]
    diff = sample - pred
    code = 0x8 if diff < 0 else 0
    diff = abs(diff)
    if diff >= step:
        code |= 4
        diff -= step
    if diff >= step >> 1:
        code |= 2
        diff -= step >> 1
    if diff >= step >> 2:
        code |= 1
    pred, idx = _decode_nibble(code, pred, idx)
    return code, pred, idx


def _decode_nibble(code: int, pred: int, idx: int) -> tuple[int, int]:
    step = STEP_TABLE[idx]
    diffq = step >> 3
    if code & 4:
        diffq += step
    if code & 2:
        diffq += step >> 1
    if code & 1:
        diffq += step >> 2
    pred = _clamp16(pred - diffq if code & 8 else pred + diffq)
    idx = min(88, max(0, idx + INDEX_TABLE[code]))
    return pred, idx


def _encode_block(samples: list[int], spb: int) -> bytes:
    """One mono block: 4-byte header (predictor = first sample, step
    index 0) + (spb-1)/2 nibble bytes, low nibble first; short final
    blocks pad by repeating the last sample (the `fact` count trims
    them on decode)."""
    first = samples[0]
    pred, idx = first, 0
    out = bytearray(struct.pack("<hBB", first, idx, 0))
    rest = list(samples[1:]) + [samples[-1]] * (spb - len(samples))
    for lo_i in range(0, len(rest), 2):
        lo, pred, idx = _encode_nibble(rest[lo_i], pred, idx)
        hi, pred, idx = _encode_nibble(rest[lo_i + 1], pred, idx)
        out.append(lo | (hi << 4))
    return bytes(out)


def encode_adpcm_wav(
    samples: list[int], sample_rate: int, samples_per_block: int = 505
) -> bytes:
    """Mono PCM-16 samples → IMA ADPCM WAV (format 0x0011, fact
    chunk with the true count).  samples_per_block must be odd (one
    header sample + nibble pairs)."""
    if not samples:
        raise ValueError("need at least one sample")
    if samples_per_block % 2 != 1:
        raise ValueError("samples_per_block must be odd")
    spb = samples_per_block
    block_align = 4 + (spb - 1) // 2
    data = bytearray()
    for off in range(0, len(samples), spb):
        data += _encode_block(samples[off : off + spb], spb)
    byte_rate = sample_rate * block_align // spb
    fmt = struct.pack(
        "<HHIIHHHH", 0x0011, 1, sample_rate, byte_rate, block_align, 4, 2, spb
    )
    out = bytearray(b"RIFF")
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<II", 4, len(samples))
        + b"data" + struct.pack("<I", len(data)) + bytes(data)
    )
    out += struct.pack("<I", len(body)) + body
    return bytes(out)


def decode_adpcm_wav(payload: bytes):
    """IMA ADPCM WAV → (sample_rate, [pcm16 samples]); None if not a
    RIFF/WAVE or not format 0x0011; ValueError outside the mono
    profile."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos = 12
    fmt = None
    n_samples = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        ln = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + ln]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"fact":
            n_samples = struct.unpack_from("<I", body, 0)[0]
        elif cid == b"data":
            data = body
        pos += 8 + ln + (ln & 1)
    if fmt is None or data is None:
        return None
    tag, ch, rate, _br, block_align, bits = struct.unpack_from("<HHIIHH", fmt, 0)
    if tag != 0x0011:
        return None
    if ch != 1 or bits != 4 or len(fmt) < 20:
        raise ValueError("profile: mono 4-bit IMA ADPCM only")
    spb = struct.unpack_from("<H", fmt, 18)[0]
    samples: list[int] = []
    for off in range(0, len(data), block_align):
        block = data[off : off + block_align]
        if len(block) < 4:
            break
        pred, idx, _rsv = struct.unpack_from("<hBB", block, 0)
        idx = min(88, max(0, idx))
        samples.append(pred)
        for byte in block[4:]:
            for code in (byte & 0x0F, byte >> 4):
                pred, idx = _decode_nibble(code, pred, idx)
                samples.append(pred)
    if n_samples is not None:
        samples = samples[:n_samples]
    return rate, samples
