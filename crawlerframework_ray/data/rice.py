"""Golomb–Rice gap coding for posting lists (Golomb 1966; Rice 1971
— the power-of-two Golomb case production indexes use for d-gaps).

Spec (shared verbatim with the SQL oracle): for sorted distinct
values v_0 < … < v_{m-1}, the gap stream is g_0 = v_0,
g_i = v_i − v_{i-1}; at parameter k each gap costs
(g >> k) + 1 + k bits (unary quotient + terminator + k remainder
bits, MSB-first), so total_bits(k) = Σ(g_i >> k) + m·(k+1). The
optimal k is the argmin over k ∈ [0, K_MAX], smallest k on ties.

The encoder emits the real bitstream; callers assert the measured
length equals the closed form and that decode round-trips.
"""

from __future__ import annotations

import numpy as np

K_MAX = 20


def rice_gaps(vals: np.ndarray) -> np.ndarray:
    vals = np.asarray(vals, dtype=np.int64)
    if len(vals) == 0:
        raise ValueError("empty sequence")
    if (np.diff(vals) <= 0).any() or int(vals[0]) < 0:
        raise ValueError("values must be sorted, distinct, non-negative")
    return np.diff(vals, prepend=0)


def rice_total_bits(gaps: np.ndarray, k: int) -> int:
    return int((gaps >> k).sum()) + len(gaps) * (k + 1)


def rice_best_k(gaps: np.ndarray, k_max: int = K_MAX) -> int:
    best_k, best_bits = 0, None
    for k in range(k_max + 1):
        b = rice_total_bits(gaps, k)
        if best_bits is None or b < best_bits:
            best_k, best_bits = k, b
    return best_k


def rice_encode(vals: np.ndarray, k: int) -> bytes:
    gaps = rice_gaps(vals)
    total = rice_total_bits(gaps, k)
    bits = np.zeros(total, dtype=np.uint8)
    pos = 0
    for g in gaps.tolist():
        q = g >> k
        bits[pos:pos + q] = 1
        pos += q + 1  # q ones + one zero terminator
        for j in range(k):
            bits[pos + j] = (g >> (k - 1 - j)) & 1
        pos += k
    if pos != total:
        raise ValueError(f"rice size mismatch: {pos} vs {total} bits")
    return np.packbits(bits).tobytes()


def rice_decode(packed: bytes, m: int, k: int) -> np.ndarray:
    bits = np.unpackbits(np.frombuffer(packed, dtype=np.uint8))
    vals = np.empty(m, dtype=np.int64)
    pos = 0
    acc = 0
    for i in range(m):
        q = 0
        while bits[pos]:
            q += 1
            pos += 1
        pos += 1
        r = 0
        for j in range(k):
            r = (r << 1) | int(bits[pos + j])
        pos += k
        acc += (q << k) | r
        vals[i] = acc
    return vals
