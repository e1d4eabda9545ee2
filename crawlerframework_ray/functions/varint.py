"""Vectorized LEB128 varint + zigzag codec over ragged int frames.

The byte-level primitive behind the compressed link-store
(stages/linkstore.py) and the compressed-postings index variant
(sources/solrsink.py): WebGraph-style adjacency compression (Boldi &
Vigna, "The WebGraph Framework I", WWW 2004 — public paper) stores a
node's sorted successor list as a reference-relative first gap
(signed, zigzag-coded) followed by strictly-positive deltas, each
LEB128 varint coded. The reference repo persists its frontier through
bsddb (crawler/utils/priorityqueue.py:23-36) with no compression at
all; at the 10^10-URL axis of BASELINE.json the adjacency/postings
bytes dominate object-store traffic, so the codec is a scale feature,
not a storage nicety.

Everything here is numpy-vectorized over a WHOLE BATCH of frames at
once — no per-row Python in the hot path:

- encode: per-value byte counts from bit lengths, one exclusive-scan
  for positions, then ≤ ``_MAX_BYTES`` masked passes (one per varint
  byte slot) fill a single preallocated uint8 buffer.
- decode: continuation bits locate value boundaries in one pass;
  each byte's 7-bit payload is shifted by its position within its
  value (exclusive scan per value) and summed with ``np.add.at``.

Both directions are exact for values in [0, 2^63); the encoder raises
on negatives (zigzag first — ``zigzag_encode``).
"""

from __future__ import annotations

import numpy as np

_MAX_BYTES = 10  # 63 significant bits / 7 bits-per-byte


def zigzag_encode(x: np.ndarray) -> np.ndarray:
    """Signed → unsigned zigzag: 0,-1,1,-2,2 → 0,1,2,3,4."""
    x = x.astype(np.int64)
    return ((x << 1) ^ (x >> 63)).astype(np.uint64)


def zigzag_decode(u: np.ndarray) -> np.ndarray:
    u = u.astype(np.uint64)
    return ((u >> np.uint64(1)).astype(np.int64)) ^ -(u & np.uint64(1)).astype(
        np.int64
    )


def varint_sizes(values: np.ndarray) -> np.ndarray:
    """Per-value encoded byte count: ceil(bit_length/7), min 1."""
    v = np.asarray(values, dtype=np.uint64)
    sizes = np.ones(len(v), dtype=np.int64)
    thresh = np.uint64(1 << 7)
    for n in range(2, _MAX_BYTES + 1):
        sizes[v >= thresh] = n
        if n < _MAX_BYTES:
            thresh = np.uint64(1) << np.uint64(7 * n)
    return sizes


def encode_varints(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """LEB128-encode a flat uint64 array.

    Returns ``(buf, ends)``: one uint8 buffer holding every varint
    back-to-back, and the exclusive end offset of each value (so
    frame i of a ragged batch spanning values [a, b) occupies bytes
    [ends[a-1] if a else 0, ends[b-1])."""
    v = np.asarray(values)
    if len(v) and np.asarray(values, dtype=np.int64).min() < 0:
        raise ValueError("varint encoder takes non-negative values; zigzag first")
    v = v.astype(np.uint64)
    sizes = varint_sizes(v)
    ends = np.cumsum(sizes)
    total = int(ends[-1]) if len(v) else 0
    buf = np.zeros(total, dtype=np.uint8)
    starts = ends - sizes
    for j in range(int(sizes.max()) if len(v) else 0):
        mask = sizes > j
        payload = (v[mask] >> np.uint64(7 * j)) & np.uint64(0x7F)
        cont = (sizes[mask] - 1 > j).astype(np.uint8) << 7
        buf[starts[mask] + j] = payload.astype(np.uint8) | cont
    return buf, ends


def decode_varints(buf: np.ndarray) -> np.ndarray:
    """Decode a back-to-back LEB128 buffer to a uint64 array.

    Raises on a truncated trailing varint (continuation bit set on
    the final byte) — a torn blob fails loudly, never silently."""
    b = np.asarray(buf, dtype=np.uint8)
    if len(b) == 0:
        return np.zeros(0, dtype=np.uint64)
    is_last = (b & 0x80) == 0
    if not is_last[-1]:
        raise ValueError("truncated varint stream")
    # value id per byte: 0-based index of the value this byte belongs to
    value_id = np.zeros(len(b), dtype=np.int64)
    value_id[1:] = np.cumsum(is_last[:-1])
    n_values = int(value_id[-1]) + 1
    # byte position within its value: global index minus the value's start
    starts = np.zeros(n_values, dtype=np.int64)
    starts[1:] = np.flatnonzero(is_last)[:-1] + 1
    pos = np.arange(len(b), dtype=np.int64) - starts[value_id]
    if int(pos.max()) >= _MAX_BYTES:
        raise ValueError("varint longer than 10 bytes")
    out = np.zeros(n_values, dtype=np.uint64)
    np.add.at(
        out, value_id, (b & np.uint8(0x7F)).astype(np.uint64) << (7 * pos).astype(np.uint64)
    )
    return out


def encode_gap_frames(
    anchors: np.ndarray, values: np.ndarray, row_splits: np.ndarray
) -> tuple[list[bytes], np.ndarray]:
    """Encode ragged sorted frames as (zigzag(first−anchor), gaps−1).

    ``values`` holds every frame back-to-back, strictly increasing
    within each frame; ``row_splits`` (len n_frames+1) delimits them;
    ``anchors[i]`` is frame i's reference value (the src node id in
    the adjacency use). Returns per-frame ``bytes`` blobs plus the
    per-frame encoded byte counts. Fully vectorized except the final
    per-frame buffer slicing (O(n_frames) slice-copies, no arithmetic)."""
    values = np.asarray(values, dtype=np.int64)
    row_splits = np.asarray(row_splits, dtype=np.int64)
    n = len(row_splits) - 1
    if len(values) == 0:
        return [b""] * n, np.zeros(n, dtype=np.int64)
    lens = np.diff(row_splits)
    firsts = row_splits[:-1].clip(max=len(values) - 1)
    is_first = np.zeros(len(values), dtype=bool)
    is_first[row_splits[:-1][lens > 0]] = True
    prev = np.empty_like(values)
    prev[1:] = values[:-1]
    prev[0] = 0
    gaps = values - prev - 1  # strictly increasing ⇒ ≥ 0 within a frame
    first_rel = values - np.repeat(np.asarray(anchors, dtype=np.int64), lens)
    coded = np.where(is_first, zigzag_encode(first_rel), gaps.astype(np.uint64))
    if (~is_first & (gaps < 0)).any():
        raise ValueError("frame values must be strictly increasing")
    buf, ends = encode_varints(coded)
    val_starts = np.concatenate(([0], ends[:-1]))
    frame_byte_ends = np.where(lens > 0, ends[(row_splits[1:] - 1).clip(min=0)], 0)
    frame_byte_starts = np.where(lens > 0, val_starts[firsts], 0)
    raw = buf.tobytes()
    blobs = [
        raw[frame_byte_starts[i]: frame_byte_ends[i]] if lens[i] else b""
        for i in range(n)
    ]
    return blobs, (frame_byte_ends - frame_byte_starts).astype(np.int64)


def decode_gap_frames(
    anchors: np.ndarray, blobs: list[bytes]
) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of :func:`encode_gap_frames` over a batch of blobs.

    Returns ``(values, row_splits)`` — the concatenated decoded
    frames and their boundaries. One decode pass over the batch's
    concatenated bytes; frame reassembly is vectorized off the
    continuation-bit value counts per blob."""
    anchors = np.asarray(anchors, dtype=np.int64)
    blob_lens = np.array([len(b) for b in blobs], dtype=np.int64)
    if blob_lens.sum() == 0:
        return np.zeros(0, dtype=np.int64), np.zeros(len(blobs) + 1, dtype=np.int64)
    cat = np.frombuffer(b"".join(blobs), dtype=np.uint8)
    # values per blob = count of continuation-terminator bytes per blob
    is_last = ((cat & 0x80) == 0).astype(np.int64)
    byte_ends = np.cumsum(blob_lens)
    cum_last = np.cumsum(is_last)
    vals_per_blob = np.diff(np.concatenate(([0], cum_last[byte_ends - 1])))
    vals_per_blob[blob_lens == 0] = 0
    # a blob must end exactly on a value boundary
    tail = cat[byte_ends[blob_lens > 0] - 1]
    if ((tail & 0x80) != 0).any():
        raise ValueError("blob ends mid-varint (torn frame)")
    coded = decode_varints(cat)
    row_splits = np.concatenate(([0], np.cumsum(vals_per_blob)))
    is_first = np.zeros(len(coded), dtype=bool)
    is_first[row_splits[:-1][vals_per_blob > 0]] = True
    out = np.where(
        is_first,
        zigzag_decode(coded) + np.repeat(anchors, vals_per_blob),
        coded.astype(np.int64) + 1,
    )
    # within-frame prefix sum: global cumsum minus the cumsum carried
    # in from everything before the frame's first value
    csum = np.cumsum(out)
    nz = vals_per_blob > 0
    starts = row_splits[:-1][nz]
    base_per_frame = np.where(starts > 0, csum[(starts - 1).clip(min=0)], 0)
    frame_base = np.repeat(base_per_frame, vals_per_blob[nz])
    values = csum - frame_base
    return values.astype(np.int64), row_splits
