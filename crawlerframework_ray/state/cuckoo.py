"""Deterministic cuckoo filter — the URL-seen membership sketch.

Replaces the reference's exact BerkeleyDB task-identifier set
(crawler/utils/priorityqueue.py:23-43 ``enqueued()`` membership,
crawler/utils/taskmanager.py:363-383 md5 identity) with the
approximate-membership structure the north_rule prescribes for a
10^10-URL seen set: ~2 bytes/URL instead of ~16+.

Design constraints (SURVEY.md §7.4 "bit-identical resume"):

- **Canonical state**: the table layout is a pure function of the
  *set* of inserted items when insertions happen in sorted order —
  the engine's shard actors and the single-process oracle both insert
  each epoch's fresh ids sorted by fingerprint bytes, so two runs (or
  a resumed run) reach byte-identical tables and digests.
- **Deterministic eviction**: the kick path is derived from the
  fingerprint and attempt counter, never from ``random``.
- **No false negatives** ever; false-positive rate ~ bucket_size *
  2^-16 * load — and because engine and oracle share the exact same
  parameters and insertion discipline, even the false positives are
  identical, keeping crawl traces comparable.

Items are 16-byte digests (md5 task ids); all hashing below just
slices the digest — md5 already mixed the bits.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_HEADER = struct.Struct("<4sQIIQ")  # magic, n_buckets, bucket_size, max_kicks, count

_ALT_LUT: np.ndarray | None = None


def _alt_lut() -> np.ndarray:
    """uint64[65536]: md5(fp as <H)[:8] little-endian for every 16-bit
    fingerprint — the vectorized form of ``_alt``'s per-item md5.
    Filter-independent (the bucket mask is applied by the caller)."""
    global _ALT_LUT
    if _ALT_LUT is None:
        lut = np.empty(1 << 16, dtype=np.uint64)
        for f in range(1 << 16):
            lut[f] = int.from_bytes(
                hashlib.md5(struct.pack("<H", f)).digest()[:8], "little"
            )
        _ALT_LUT = lut
    return _ALT_LUT


class CuckooFilter:
    MAGIC = b"CKF1"

    def __init__(self, capacity: int, bucket_size: int = 4, max_kicks: int = 250):
        n = 1
        while n * bucket_size < capacity / 0.84:  # target ≤84% load
            n <<= 1
        self.n_buckets = n
        self.bucket_size = bucket_size
        self.max_kicks = max_kicks
        self.table = np.zeros((n, bucket_size), dtype=np.uint16)
        self.count = 0
        self.n_kicked_out = 0  # items lost to table-full (monitoring)

    # -- addressing -------------------------------------------------
    def _fp(self, item: bytes) -> int:
        # Fingerprint from bytes 6-7: ShardedSeen routes on the low bits
        # of bytes 0-7 (int(item[:8]) % n_shards) and bucket indexing
        # uses bytes 8-15, so within a shard the fingerprint would lose
        # log2(n_shards) bits of entropy if it shared the routing bytes
        # (≈n_shards× the 2^-16 FP rate). Bytes 6-7 are the high-order
        # bytes of the routing integer: for power-of-two shard counts up
        # to 2^48 the mod constrains only bytes 0-5, leaving these two
        # bytes at full entropy within every shard.
        fp = item[6] | (item[7] << 8)
        return fp or 1  # 0 means empty slot

    def _i1(self, item: bytes) -> int:
        return int.from_bytes(item[8:16], "little") & (self.n_buckets - 1)

    def _alt(self, i: int, fp: int) -> int:
        # partial-key cuckoo hashing: i2 = i1 xor H(fp)
        h = int.from_bytes(hashlib.md5(struct.pack("<H", fp)).digest()[:8], "little")
        return (i ^ h) & (self.n_buckets - 1)

    # -- operations -------------------------------------------------
    def contains(self, item: bytes) -> bool:
        fp = self._fp(item)
        i1 = self._i1(item)
        if (self.table[i1] == fp).any():
            return True
        return bool((self.table[self._alt(i1, fp)] == fp).any())

    def contains_many(self, arr: np.ndarray) -> np.ndarray:
        """Vectorized membership for an (n, 16)-uint8 id array —
        bit-identical to ``contains`` per row (same fp / i1 / alt
        derivation; the md5-of-fingerprint alt hash comes from a shared
        65536-entry table since fp is 16-bit)."""
        if arr.size == 0:
            return np.zeros(0, dtype=bool)
        fp = (arr[:, 6].astype(np.uint16) | (arr[:, 7].astype(np.uint16) << np.uint16(8)))
        fp = np.where(fp == 0, np.uint16(1), fp)
        mask = np.uint64(self.n_buckets - 1)
        i1 = (arr[:, 8:16].copy().view("<u8").reshape(-1) & mask).astype(np.int64)
        alt = ((i1.astype(np.uint64) ^ _alt_lut()[fp]) & mask).astype(np.int64)
        fpc = fp[:, None]
        return ((self.table[i1] == fpc).any(axis=1)
                | (self.table[alt] == fpc).any(axis=1))

    def add(self, item: bytes) -> bool:
        """Insert; returns False only if the table was full (item
        dropped, counted in n_kicked_out). Does not check membership
        first. Inserts are refused outright beyond 95% load: an
        eviction chain that fails loses a *previously inserted*
        fingerprint (a false negative), which a URL-seen set must never
        trade for one more entry."""
        if self.count >= int(0.95 * self.n_buckets * self.bucket_size):
            self.n_kicked_out += 1
            return False
        fp = self._fp(item)
        i = self._i1(item)
        for idx in (i, self._alt(i, fp)):
            row = self.table[idx]
            empty = np.flatnonzero(row == 0)
            if empty.size:
                row[empty[0]] = fp
                self.count += 1
                return True
        # deterministic eviction: slot chosen from (fp, attempt); the
        # displacement path is recorded so a failed chain ROLLS BACK —
        # a failure must never evict a previously inserted fingerprint
        # (that would be a false negative in the seen set).
        path: list[tuple[int, int]] = []
        cur = fp
        for attempt in range(self.max_kicks):
            slot = (cur + attempt) % self.bucket_size
            path.append((i, slot))
            cur, self.table[i, slot] = int(self.table[i, slot]), cur
            i = self._alt(i, cur)
            row = self.table[i]
            empty = np.flatnonzero(row == 0)
            if empty.size:
                row[empty[0]] = cur
                self.count += 1
                return True
        for bi, slot in reversed(path):  # undo the whole chain
            cur, self.table[bi, slot] = int(self.table[bi, slot]), cur
        self.n_kicked_out += 1
        return False

    def add_sorted(self, items: list[bytes]) -> int:
        """Canonical bulk insert: items sorted ascending first. This is
        the ONLY insert path engine shards and the oracle use, making
        filter state a pure function of the inserted set."""
        n = 0
        for it in sorted(items):
            n += self.add(it)
        return n

    # -- state ------------------------------------------------------
    def serialize(self) -> bytes:
        head = _HEADER.pack(self.MAGIC, self.n_buckets, self.bucket_size, self.max_kicks, self.count)
        return head + struct.pack("<Q", self.n_kicked_out) + self.table.tobytes()

    @classmethod
    def deserialize(cls, blob: bytes) -> "CuckooFilter":
        magic, n_buckets, bucket_size, max_kicks, count = _HEADER.unpack_from(blob, 0)
        if magic != cls.MAGIC:
            raise ValueError("bad cuckoo blob")
        (kicked,) = struct.unpack_from("<Q", blob, _HEADER.size)
        obj = cls.__new__(cls)
        obj.n_buckets, obj.bucket_size, obj.max_kicks = n_buckets, bucket_size, max_kicks
        obj.count, obj.n_kicked_out = count, kicked
        off = _HEADER.size + 8
        obj.table = (
            np.frombuffer(blob, dtype=np.uint16, offset=off)
            .reshape(n_buckets, bucket_size)
            .copy()
        )
        return obj

    def digest(self) -> str:
        """sha256 of the canonical serialization — the per-shard lineage
        digest recorded in checkpoint manifests."""
        return hashlib.sha256(self.serialize()).hexdigest()
