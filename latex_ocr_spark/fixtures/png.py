"""Minimal pure-numpy+zlib PNG codec (8-bit grayscale / RGB, no interlace).

The container ships no PIL/scipy; the reference reads PNGs with
``scipy.misc.imread`` (/root/reference/model/utils/data_generator.py:162-166)
and writes them via ImageMagick (model/utils/image.py:164-207). Fixture images
here are tiny synthetic renders, so a from-scratch codec for the two PNG color
types we emit is the simplest deterministic replacement.

Public API:
    encode_png(arr)  -> bytes     arr: uint8 (H,W) gray or (H,W,3) RGB
    decode_png(data) -> np.ndarray uint8 (H,W) or (H,W,3)
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        color_type, channels = 0, 1
        h, w = arr.shape
    elif arr.ndim == 3 and arr.shape[2] == 3:
        color_type, channels = 2, 3
        h, w = arr.shape[:2]
    else:
        raise ValueError(f"unsupported array shape {arr.shape}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = arr.reshape(h, w * channels)
    # filter byte 0 (None) per scanline
    scanlines = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), raw], axis=1
    ).tobytes()
    idat = zlib.compress(scanlines, 6)
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a.astype(np.int32) + b.astype(np.int32) - c.astype(np.int32)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def decode_png(data: bytes) -> np.ndarray:
    if data[:8] != _SIG:
        raise ValueError("not a PNG")
    pos = 8
    ihdr = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, bit_depth, color_type, _comp, _filt, interlace = ihdr
    if bit_depth != 8 or interlace != 0:
        raise ValueError("only 8-bit non-interlaced PNG supported")
    channels = {0: 1, 2: 3}.get(color_type)
    if channels is None:
        raise ValueError(f"unsupported color type {color_type}")
    raw = zlib.decompress(bytes(idat))
    stride = w * channels
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    filters = rows[:, 0]
    bpp = channels
    if not filters.any():
        # all filter-0 scanlines (what encode_png emits): one vectorized slice
        arr = rows[:, 1:].reshape(h, w, channels)
        return arr[:, :, 0] if channels == 1 else arr.copy()
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        f = filters[y]
        cur = rows[y, 1:].astype(np.uint8).copy()
        prev = out[y - 1] if y > 0 else np.zeros(stride, dtype=np.uint8)
        if f == 0:
            out[y] = cur
        elif f == 1:  # Sub
            acc = cur.astype(np.int32)
            for x in range(bpp, stride):
                acc[x] = (acc[x] + acc[x - bpp]) & 0xFF
            out[y] = acc.astype(np.uint8)
        elif f == 2:  # Up
            out[y] = (cur.astype(np.int32) + prev) & 0xFF
        elif f == 3:  # Average
            acc = cur.astype(np.int32)
            for x in range(stride):
                left = acc[x - bpp] if x >= bpp else 0
                acc[x] = (acc[x] + ((left + int(prev[x])) >> 1)) & 0xFF
            out[y] = acc.astype(np.uint8)
        elif f == 4:  # Paeth
            acc = cur.astype(np.int32)
            for x in range(stride):
                a = acc[x - bpp] if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                acc[x] = (acc[x] + int(_paeth(np.uint8(a), np.uint8(b), np.uint8(c)))) & 0xFF
            out[y] = acc.astype(np.uint8)
        else:
            raise ValueError(f"bad filter {f}")
    arr = out.reshape(h, w, channels)
    return arr[:, :, 0] if channels == 1 else arr
