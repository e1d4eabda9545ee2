"""Content-defined chunking (CDC) — the storage-dedup primitive.

The LBFS cut rule (Muthitacharoen, Chen & Mazières, SOSP 2001; the
FastCDC/Rabin lineage): slide a W-byte polynomial rolling hash over
the payload and cut wherever the low bits are all ones, bounded by a
min/max chunk length — so an insertion in the middle of a document
shifts only the chunks it touches, and identical passages landing at
DIFFERENT byte offsets in different documents still produce identical
chunks (what fixed-size blocking can never do). This is how a 100-TB
crawl store dedups re-crawled pages that changed by one paragraph:
chunk → hash → count, all order-free.

Spec (shared verbatim by the serial golden mirror in
tools/make_goldens.py — two independent implementations):

- window W=16, hash h(s) = Σ_{j<W} b[s+j] · B^(W-1-j) mod 2^64 with
  B = 0x100000001b3 (the FNV64 prime),
- a cut candidate sits AFTER byte s+W whenever h(s) & 31 == 31
  (expected chunk ≈ min + 32),
- walk: next cut = first candidate in [last+24, last+96], else
  forced at last+96 (or the end); docs shorter than W are one chunk.

The reference's change detection (crawler/utils/utils.py:480-498
get_hash) fingerprints the WHOLE page — one changed byte re-stores
everything; CDC is the sub-document form of the same idea."""

from __future__ import annotations

import hashlib

import numpy as np

W = 16
CMIN = 24
CMAX = 96
_MASK = np.uint64(31)
_B = np.uint64(1099511628211)


def _powers() -> np.ndarray:
    p = np.ones(W, np.uint64)
    with np.errstate(over="ignore"):
        for k in range(1, W):
            p[k] = p[k - 1] * _B
    return p[::-1].copy()  # _P[j] multiplies b[s + j]


_P = _powers()


def chunk_lengths(data: bytes) -> list[int]:
    """Deterministic CDC chunk lengths for one payload (sums to
    len(data)). Hashes are computed for the whole doc in W vectorized
    multiply-adds (uint64 wraparound); the min/max walk then visits
    only candidate positions — O(n/expected_chunk) Python steps."""
    n = len(data)
    if n == 0:
        return []
    if n < W:
        return [n]
    b = np.frombuffer(data, np.uint8).astype(np.uint64)
    h = np.zeros(n - W + 1, np.uint64)
    for j in range(W):
        h += b[j:n - W + 1 + j] * _P[j]
    cand = np.flatnonzero((h & _MASK) == _MASK) + W
    out: list[int] = []
    last, ci, m = 0, 0, len(cand)
    while last < n:
        limit = min(last + CMAX, n)
        lo = last + CMIN
        while ci < m and cand[ci] < lo:
            ci += 1
        if ci < m and cand[ci] <= limit:
            cut = int(cand[ci])
            ci += 1
        else:
            cut = limit
        out.append(cut - last)
        last = cut
    return out


def chunk_rows(text: str) -> list[tuple[bytes, int]]:
    """(chunk md5 digest, chunk length) pairs for one document —
    content-addressed identity, so equality across docs/sources is
    exact (16-byte digests; no birthday risk at catalog scales)."""
    data = text.encode("utf-8")
    out = []
    pos = 0
    for ln in chunk_lengths(data):
        out.append((hashlib.md5(data[pos:pos + ln]).digest(), ln))
        pos += ln
    return out
