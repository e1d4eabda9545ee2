"""Deterministic pure-numpy image codecs.

The graft's payload rows carry an encoded image in a ``bytes: binary``
column with a ``fmt: string`` discriminator (BASELINE.json input_hint).
No Pillow / image libraries exist in this environment, so the codecs are
implemented from scratch on numpy + zlib + struct:

- ``raw`` — lossless: little-endian (w, h) header + H*W*3 uint8 pixels.
- ``png`` — lossless: a real, spec-conformant minimal PNG (8-bit RGB,
  filter type 0, one IDAT). Any standard viewer can open it; the decoder
  here handles filters 0-4 (enough for any baseline encoder including
  this one).
- ``qds`` — toy lossy ("quantized-deterministic-storage"): 6-bit
  uniform quantization per channel, zlib-compressed. Mid-rise
  reconstruction bounds per-pixel error to [-1, +2], giving a
  round-trip PSNR of ~46 dB — comfortably above the 40 dB per-row
  invariant, while being genuinely lossy so the invariant is exercised.

All functions are pure and deterministic: same pixels in, same bytes
out, on every node. This mirrors the reference's fetch path
(crawler/connectors/baseconnector.py:1140-1251) being replaced by a
deterministic synthetic page store (SURVEY.md §7.0).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

FORMATS = ("raw", "png", "qds")

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _require_rgb(img: np.ndarray) -> np.ndarray:
    if img.dtype != np.uint8 or img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"expected uint8 HxWx3 image, got {img.dtype} {img.shape}")
    return img


# ---------------------------------------------------------------- raw

def encode_raw(img: np.ndarray) -> bytes:
    img = _require_rgb(img)
    h, w, _ = img.shape
    return b"RIM1" + struct.pack("<HH", w, h) + img.tobytes()


def decode_raw(data: bytes) -> np.ndarray:
    if data[:4] != b"RIM1":
        raise ValueError("not a RIM1 raw image")
    w, h = struct.unpack("<HH", data[4:8])
    return np.frombuffer(data[8:], dtype=np.uint8).reshape(h, w, 3).copy()


# ---------------------------------------------------------------- png

def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray) -> bytes:
    img = _require_rgb(img)
    h, w, _ = img.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit, truecolor RGB
    # filter byte 0 per scanline
    rows = np.empty((h, 1 + w * 3), dtype=np.uint8)
    rows[:, 0] = 0
    rows[:, 1:] = img.reshape(h, w * 3)
    idat = zlib.compress(rows.tobytes(), 6)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _png_unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo PNG scanline filters 0-4. raw is (h, 1+stride) uint8."""
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ftype = raw[y, 0]
        line = raw[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y > 0 else np.zeros(stride, dtype=np.int32)
        if ftype == 0:
            out[y] = line
        elif ftype == 2:  # Up
            out[y] = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth need left-to-right scan
            cur = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                if ftype == 1:
                    v = line[x] + a
                elif ftype == 3:
                    v = line[x] + ((a + b) >> 1)
                else:
                    c = prev[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    v = line[x] + pred
                cur[x] = v & 0xFF
            out[y] = cur
        else:
            raise ValueError(f"unsupported PNG filter {ftype}")
    return out


def decode_png(data: bytes) -> np.ndarray:
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, w = 8, None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype, _, _, interlace = struct.unpack(">IIBBBBB", payload)
            if depth != 8 or ctype != 2 or interlace != 0:
                raise ValueError("only 8-bit non-interlaced RGB PNGs supported")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    stride = w * 3
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8).reshape(h, 1 + stride)
    if bool(np.any(raw[:, 0])):
        pixels = _png_unfilter(raw, h, stride, 3)
    else:  # all filter-0 (what our encoder emits): pure slice, fast path
        pixels = raw[:, 1:]
    return pixels.reshape(h, w, 3).copy()


# ---------------------------------------------------------------- qds (lossy)

def encode_qds(img: np.ndarray) -> bytes:
    img = _require_rgb(img)
    h, w, _ = img.shape
    q = (img >> 2).astype(np.uint8)  # 6-bit quantization
    return b"QDS1" + struct.pack("<HH", w, h) + zlib.compress(q.tobytes(), 6)


def decode_qds(data: bytes) -> np.ndarray:
    if data[:4] != b"QDS1":
        raise ValueError("not a QDS1 image")
    w, h = struct.unpack("<HH", data[4:8])
    q = np.frombuffer(zlib.decompress(data[8:]), dtype=np.uint8).reshape(h, w, 3)
    # mid-rise reconstruction: 4q+2 clipped into uint8 range (4*63+2=254, safe)
    return ((q.astype(np.uint16) << 2) + 2).clip(0, 255).astype(np.uint8)


# ---------------------------------------------------------------- dispatch

_ENCODERS = {"raw": encode_raw, "png": encode_png, "qds": encode_qds}
_DECODERS = {"raw": decode_raw, "png": decode_png, "qds": decode_qds}


def encode(img: np.ndarray, fmt: str) -> bytes:
    return _ENCODERS[fmt](img)


def decode(data: bytes, fmt: str | None = None) -> np.ndarray:
    if fmt is not None:
        return _DECODERS[fmt](data)
    if data[:8] == _PNG_SIG:
        return decode_png(data)
    if data[:4] == b"RIM1":
        return decode_raw(data)
    if data[:4] == b"QDS1":
        return decode_qds(data)
    raise ValueError("unrecognized image format")


def is_lossless(fmt: str) -> bool:
    return fmt in ("raw", "png")
