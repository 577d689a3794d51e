"""Minimal pure-stdlib PNG codec (zlib + struct + numpy).

This container ships no image library (no PIL/opencv), but PNG's format is
just zlib-compressed filtered scanlines — enough of it is implementable on
the stdlib that the multimodal decode path (`operators.multimodal.
decode_image`) can run REAL bytes end-to-end instead of gating everything
behind ``fake=True``.

Supported: 8-bit depth, color types 0 (gray), 2 (RGB), 4 (gray+alpha) and
6 (RGBA), non-interlaced, all five standard scanline filters.  Palette
(type 3), 16-bit and interlaced images raise ``ValueError`` — callers fall
back to their documented NotImplementedError gate.  A matching `encode_png`
exists so tests can synthesize genuine PNG bytes (any filter type) without
an external library.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → ``uint8`` array of shape (height, width, channels)."""
    if not data.startswith(PNG_SIGNATURE):
        raise ValueError("not a PNG: bad signature")
    pos, ihdr, idat = len(PNG_SIGNATURE), None, []
    while pos + 8 <= len(data):
        (length,), ctype = struct.unpack(">I", data[pos:pos + 4]), data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        pos += 12 + length  # length + type + body + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("not a PNG: missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or color not in _CHANNELS or interlace != 0 or comp != 0:
        raise ValueError(
            f"unsupported PNG variant (depth={depth}, color={color}, "
            f"interlace={interlace})"
        )
    ch = _CHANNELS[color]
    stride = w * ch
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("corrupt PNG: wrong decompressed size")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        row = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int32)
        if ft == 0:
            rec = row
        elif ft == 1:  # Sub — cumulative per channel column
            rec = np.cumsum(row.reshape(w, ch), axis=0).reshape(stride) % 256
        elif ft == 2:  # Up
            rec = (row + prev) % 256
        elif ft == 3:  # Average — sequential in x, vectorized per pixel
            rec = np.zeros(stride, dtype=np.int32)
            pr = prev.astype(np.int32)
            for x in range(w):
                s = slice(x * ch, (x + 1) * ch)
                left = rec[slice((x - 1) * ch, x * ch)] if x else np.zeros(ch, np.int32)
                rec[s] = (row[s] + (left + pr[s]) // 2) % 256
        elif ft == 4:  # Paeth — sequential in x, per-byte predictor
            rec = np.zeros(stride, dtype=np.int32)
            pr = prev.astype(np.int32)
            for x in range(w):
                for k in range(ch):
                    i = x * ch + k
                    a = rec[i - ch] if x else 0
                    b = pr[i]
                    c = pr[i - ch] if x else 0
                    rec[i] = (row[i] + _paeth(int(a), int(b), int(c))) % 256
        else:
            raise ValueError(f"corrupt PNG: unknown filter {ft}")
        out[y] = rec.astype(np.uint8)
        prev = out[y]
    return out.reshape(h, w, ch)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """``uint8`` (h, w) or (h, w, channels) array → PNG bytes, every
    scanline under ``filter_type`` (0/1/2 — enough to exercise decode)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    flat = a.reshape(h, w * ch).astype(np.int32)
    lines = []
    for y in range(h):
        row = flat[y]
        if filter_type == 0:
            enc = row
        elif filter_type == 1:
            left = np.concatenate([np.zeros(ch, np.int32), row[:-ch]])
            enc = (row - left) % 256
        elif filter_type == 2:
            up = flat[y - 1] if y else np.zeros(w * ch, np.int32)
            enc = (row - up) % 256
        else:
            raise ValueError("encoder supports filter types 0/1/2")
        lines.append(bytes([filter_type]) + enc.astype(np.uint8).tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + _chunk(b"IEND", b"")
    )
