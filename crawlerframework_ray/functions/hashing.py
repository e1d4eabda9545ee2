"""Hash functions: task identity, content hash, rolling fingerprint.

- ``task_id`` mirrors the reference's enqueue-dedup key
  (crawler/utils/taskmanager.py:363-383: md5 over workspace + uri +
  priority [+ filter words]) — here md5 over ``url|priority``.
- ``content_hash`` mirrors get_hash (crawler/utils/utils.py:480-498:
  md5 of sorted page fields) — here md5 over the fields that define
  page content identity.
- ``fingerprint64`` is a rolling (Rabin-Karp-style) 64-bit document
  fingerprint for cheap near-identity checks on text.
"""

from __future__ import annotations

import hashlib

import numpy as np

MASK64 = 0xFFFFFFFFFFFFFFFF


def task_id(url: str, priority: int) -> bytes:
    """16-byte md5 dedup key over (url, priority)."""
    return hashlib.md5(f"{url}|{priority}".encode("utf-8", "surrogatepass")).digest()


def task_ids_batch(urls, priorities) -> list[bytes]:
    return [task_id(u, int(p)) for u, p in zip(urls, priorities)]


def content_hash(*fields) -> bytes:
    """md5 over the sorted string forms of the content-defining fields
    (title/data/posted_date in the reference; caption/image_id here)."""
    parts = sorted(str(f) for f in fields if f is not None)
    return hashlib.md5("\x1f".join(parts).encode("utf-8", "surrogatepass")).digest()


def shard_of(url: str, n_shards: int) -> int:
    """Stable shard routing: first 8 bytes of md5(url) mod n_shards.
    Independent of priority so all variants of a url co-locate."""
    d = hashlib.md5(url.encode("utf-8", "surrogatepass")).digest()
    return int.from_bytes(d[:8], "little") % n_shards


_FP_BASE = 1_099_511_628_211  # FNV-ish multiplier
_FP_OFFSET = 14_695_981_039_346_656_037


def fingerprint64(text: str) -> int:
    """Rolling 64-bit FNV-1a fingerprint of a document (signed int64
    so it stores in an Arrow int64 column)."""
    h = _FP_OFFSET
    for b in text.encode("utf-8", "surrogatepass"):
        h = ((h ^ b) * _FP_BASE) & MASK64
    return int(np.uint64(h).astype(np.int64))


def md5_hex_batch(texts) -> list[str]:
    return [hashlib.md5(t.encode("utf-8", "surrogatepass")).hexdigest() for t in texts]
