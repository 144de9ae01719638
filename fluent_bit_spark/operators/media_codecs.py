"""Real media codecs implementable with the stdlib only: PNG (zlib)
and WAV/PCM (wave/struct). These upgrade the multimodal decode gate
from "stubbed" to "real" for the two formats a container without
PIL/ffmpeg can still handle honestly; JPEG/video remain gated in
`multimodal.decode_media`.

PNG support: 8-bit depth, color types 0 (gray), 2 (RGB), 6 (RGBA),
non-interlaced — the subset every screenshot/diagram pipeline emits.
Filters 0-4 (None/Sub/Up/Average/Paeth) are fully implemented, so any
compliant encoder's output of that subset decodes bit-exactly.

WAV support: RIFF/WAVE with 8- or 16-bit integer PCM, any channel
count / sample rate.

Everything is numpy-vectorized per payload (row-wise scan for the
filter recurrence only, which is inherently sequential per scanline
pair); payloads are decoded inside Arrow batches on executors — never
on the driver.

Reference parity note: Fluent Bit itself never decodes media; this
module serves the beyond-reference multimodal brief (decode /
feature-extract / resize / frame-sample over binary columns).
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}  # color type -> samples per pixel


# ---------------------------------------------------------------------------
# PNG

def encode_png(arr: np.ndarray) -> bytes:
    """Minimal PNG writer (filter 0 on every scanline, one IDAT).
    `arr` is HxW (gray), HxWx3 (RGB) or HxWx4 (RGBA) uint8."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    color_type = {1: 0, 3: 2, 4: 6}[c]
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    # int16 arithmetic: operands are 0-255 so the predictor fits easily
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def decode_png(payload: bytes) -> np.ndarray:
    """Decode a PNG (8-bit, color type 0/2/6, non-interlaced) to an
    HxWxC uint8 array. Raises ValueError on malformed input and
    NotImplementedError on out-of-subset files (16-bit, palette,
    interlaced) so callers can keep an honest gate."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos, idat, meta = 8, [], None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated PNG chunk")
        if tag == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise NotImplementedError(f"PNG bit depth {depth} unsupported")
            if color not in _CHANNELS:
                raise NotImplementedError(f"PNG color type {color} unsupported")
            if interlace:
                raise NotImplementedError("interlaced PNG unsupported")
            if comp or filt:
                raise ValueError("invalid PNG compression/filter method")
            meta = (w, h, _CHANNELS[color])
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if meta is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, c = meta
    raw = zlib.decompress(b"".join(idat))
    stride = w * c
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG decompressed size mismatch")
    lines = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype, line = lines[y, 0], lines[y, 1:].copy()
        if ftype == 0:
            cur = line
        elif ftype == 1:  # Sub: sequential along the scanline
            cur = line
            for x in range(c, stride):
                cur[x] = (int(cur[x]) + int(cur[x - c])) & 0xFF
        elif ftype == 2:  # Up
            cur = (line + prior).astype(np.uint8)
        elif ftype == 3:  # Average
            cur = line
            for x in range(stride):
                left = int(cur[x - c]) if x >= c else 0
                cur[x] = (cur[x] + (left + int(prior[x])) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line
            for x in range(stride):
                left = cur[x - c] if x >= c else np.uint8(0)
                ul = prior[x - c] if x >= c else np.uint8(0)
                cur[x] = (
                    int(cur[x])
                    + int(_paeth(np.array(left), prior[x], np.array(ul)))
                ) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = cur
        prior = cur
    return out.reshape(h, w, c)


# ---------------------------------------------------------------------------
# WAV

def encode_wav(
    samples: np.ndarray, sample_rate: int = 16000, channels: int = 1
) -> bytes:
    """PCM16 WAV writer. `samples` is int16, interleaved if multichannel."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int, int]:
    """Decode a RIFF/WAVE PCM payload -> (int16 samples interleaved,
    sample_rate, channels). 8-bit PCM is widened to int16 (offset
    binary -> signed, <<8) so downstream stats are width-independent."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        channels = w.getnchannels()
        rate = w.getframerate()
        width = w.getsampwidth()
        frames = w.readframes(w.getnframes())
    if width == 2:
        samples = np.frombuffer(frames, dtype="<i2")
    elif width == 1:
        samples = (
            np.frombuffer(frames, dtype=np.uint8).astype(np.int16) - 128
        ) << 8
    else:
        raise NotImplementedError(f"WAV sample width {width} unsupported")
    return samples, rate, channels
