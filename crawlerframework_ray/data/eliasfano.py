"""Elias–Fano monotone-sequence encoding (Elias 1974; Vigna,
"Quasi-succinct indices", WSDM 2013) for posting lists.

Spec (shared verbatim with the SQL oracle — all sizes are exact
functions of (m, max_value)): given sorted DISTINCT values
v_0 < … < v_{m-1} with universe u = v_{m-1} + 1,

- low-bit width  l = floor(log2(u // m))   (integer division; u >= m
  always holds for distinct values, so u // m >= 1 and l >= 0),
- low stream:  m·l bits, the low l bits of each value, MSB-first,
- high stream: unary — bit (v_i >> l) + i is set for each i, plus one
  trailing zero terminator,
- total bits = m·l + m + (v_{m-1} >> l) + 1,
- bytes = ceil(bits / 8)  (np.packbits padding).

The encoder builds the REAL bitstream; callers assert the measured
byte length equals the closed-form size (fail-loudly, not a bare
assert) and that decode round-trips.
"""

from __future__ import annotations

import numpy as np


def ef_bit_size(m: int, vmax: int) -> tuple[int, int]:
    """(low_bit_width, total_bits) from the spec formula."""
    u = vmax + 1
    if m <= 0:
        raise ValueError("empty sequence")
    l = (u // m).bit_length() - 1
    return l, m * l + m + (vmax >> l) + 1


def ef_encode(vals: np.ndarray) -> tuple[bytes, int]:
    """Encode a sorted distinct int64 array; returns (packed bytes,
    low_bit_width)."""
    vals = np.asarray(vals, dtype=np.int64)
    if len(vals) == 0:
        raise ValueError("empty sequence")
    if (np.diff(vals) <= 0).any() or int(vals[0]) < 0:
        raise ValueError("values must be sorted, distinct, non-negative")
    m = len(vals)
    vmax = int(vals[-1])
    l, total_bits = ef_bit_size(m, vmax)
    bits = np.zeros(total_bits, dtype=np.uint8)
    if l > 0:
        shifts = l - 1 - np.arange(l, dtype=np.int64)
        low = ((vals[:, None] >> shifts[None, :]) & 1).astype(np.uint8)
        bits[: m * l] = low.reshape(-1)
    high = (vals >> l) + np.arange(m, dtype=np.int64)
    bits[m * l + high] = 1
    packed = np.packbits(bits).tobytes()
    if len(packed) != (total_bits + 7) // 8:
        raise ValueError(
            f"EF size mismatch: packed {len(packed)} B vs formula "
            f"{(total_bits + 7) // 8} B"
        )
    return packed, l


def ef_decode(packed: bytes, m: int, l: int) -> np.ndarray:
    """Decode back to the int64 value array."""
    bits = np.unpackbits(np.frombuffer(packed, dtype=np.uint8))
    if l > 0:
        low_bits = bits[: m * l].reshape(m, l).astype(np.int64)
        weights = 1 << (l - 1 - np.arange(l, dtype=np.int64))
        low = (low_bits * weights[None, :]).sum(axis=1)
    else:
        low = np.zeros(m, dtype=np.int64)
    ones = np.flatnonzero(bits[m * l:])[:m].astype(np.int64)
    high = ones - np.arange(m, dtype=np.int64)
    return (high << l) | low
