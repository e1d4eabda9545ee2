"""Compressed adjacency store — WebGraph-style gap+varint outlink
blobs as a committed sink artifact, decoded back by a pruned reader.

The reference keeps its frontier adjacency implicitly: every parsed
page's outlinks are re-enqueued as flat rows through the bsddb-backed
priority queue (crawler/utils/priorityqueue.py:23-36,
crawler/connectors/baseconnector.py outlink loop) — nothing is ever
stored sorted or compressed. At the 10^10-URL axis in BASELINE.json
the adjacency bytes are the dominant object-store traffic, so this
implements the public WebGraph recipe (Boldi & Vigna, WWW 2004):
per-source sorted successor lists coded as a signed src-relative
first gap (zigzag) + strictly-positive deltas − 1, LEB128 varints,
one binary blob per source row.

Scale shape:

- The outlink derivation is ROW-LOCAL (a doc's successors are a pure
  function of its id), so encoding is an embarrassingly-parallel
  ``map_batches`` — no shuffle to co-locate a source's edges.
- Blobs land as bucket-partitioned parquet (``bucket = src %
  n_buckets``) with a manifest written LAST — the same
  crashed-build-never-looks-committed idiom as the Solr sink and the
  frontier checkpoint.
- The reader decodes ONLY the blob bytes (never the helper columns):
  per-src stats are recomputed from decoded successor ids, and the
  stored outdeg is cross-checked against the decoded count so a torn
  or bit-flipped blob fails loudly instead of skewing stats.

Codec: functions/varint.py (vectorized over whole batches).
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pyarrow as pa
import ray.data

from ..functions.varint import decode_gap_frames, encode_gap_frames

MANIFEST = "manifest.json"
BLOBS_DIR = "adjacency"

# (mult, add) per synthetic outlink: dst = (doc_id*mult + add) % n_docs
LINK_FORMULAS = ((7, 1), (13, 5), (29, 11), (43, 17), (61, 23), (5, 2))


def doc_outlinks(ids: np.ndarray, n_docs: int) -> tuple[np.ndarray, np.ndarray]:
    """Sorted distinct successors per doc, self-loops dropped.

    Returns ``(values, row_splits)`` ragged frames, one frame per id,
    fully vectorized (sort along axis=1 + neighbor-dup masking)."""
    ids = ids.astype(np.int64)
    dsts = np.stack(
        [(ids * m + a) % n_docs for m, a in LINK_FORMULAS], axis=1
    )
    dsts.sort(axis=1)
    keep = np.ones_like(dsts, dtype=bool)
    keep[:, 1:] = dsts[:, 1:] != dsts[:, :-1]
    keep &= dsts != ids[:, None]
    values = dsts[keep]
    row_splits = np.zeros(len(ids) + 1, dtype=np.int64)
    np.cumsum(keep.sum(axis=1), out=row_splits[1:])
    return values, row_splits


def encode_adjacency_batch(t: pa.Table, n_docs: int, n_buckets: int) -> pa.Table:
    ids = t.column("doc_id").to_numpy().astype(np.int64)
    values, row_splits = doc_outlinks(ids, n_docs)
    blobs, nbytes = encode_gap_frames(ids, values, row_splits)
    return pa.table(
        {
            "src": pa.array(ids, pa.int64()),
            "blob": pa.array(blobs, pa.binary()),
            "outdeg": pa.array(np.diff(row_splits), pa.int64()),
            "nbytes": pa.array(nbytes, pa.int64()),
            "bucket": pa.array(ids % n_buckets, pa.int64()),
        }
    )


def commit_linkstore(
    ds: ray.data.Dataset, out_dir: str, *, n_docs: int, n_buckets: int = 16
) -> None:
    """Encode and commit the adjacency store (manifest LAST)."""
    enc = ds.map_batches(
        lambda t: encode_adjacency_batch(t, n_docs, n_buckets),
        batch_format="pyarrow",
        batch_size=8192,
    )
    enc.write_parquet(
        os.path.join(out_dir, BLOBS_DIR), partition_cols=["bucket"]
    )
    with open(os.path.join(out_dir, MANIFEST), "w") as f:
        json.dump({"n_docs": n_docs, "n_buckets": n_buckets}, f)


def read_linkstore(out_dir: str) -> ray.data.Dataset:
    mpath = os.path.join(out_dir, MANIFEST)
    if not os.path.exists(mpath):
        raise FileNotFoundError(f"linkstore not committed: {mpath} missing")
    files = sorted(
        glob.glob(os.path.join(out_dir, BLOBS_DIR, "**", "*.parquet"), recursive=True)
    )
    return ray.data.read_parquet(files, columns=["src", "blob", "outdeg"])


def _decode_stats_batch(t: pa.Table) -> pa.Table:
    src = t.column("src").to_numpy().astype(np.int64)
    stored_deg = t.column("outdeg").to_numpy().astype(np.int64)
    blobs = t.column("blob").to_pylist()
    values, row_splits = decode_gap_frames(src, blobs)
    deg = np.diff(row_splits)
    if (deg != stored_deg).any():
        bad = src[deg != stored_deg][:5].tolist()
        raise ValueError(f"decoded outdeg mismatch for src {bad} — corrupt blob")
    # segment min/max/sum off the sorted frames: first element is the
    # min, last the max; sums via cumsum differences
    csum = np.concatenate(([0], np.cumsum(values)))
    sums = csum[row_splits[1:]] - csum[row_splits[:-1]]
    # zero-outlink sources carry no adjacency row (the SQL oracle's
    # GROUP BY src can only see sources with ≥ 1 edge)
    nz = deg > 0
    mins = values[row_splits[:-1][nz]]
    maxs = values[row_splits[1:][nz] - 1]
    nbytes = np.array([len(b) for b in blobs], dtype=np.int64)
    return pa.table(
        {
            "src": pa.array(src[nz], pa.int64()),
            "outdeg": pa.array(deg[nz], pa.int64()),
            "min_dst": pa.array(mins, pa.int64()),
            "max_dst": pa.array(maxs, pa.int64()),
            "sum_dst": pa.array(sums[nz], pa.int64()),
            "nbytes": pa.array(nbytes[nz], pa.int64()),
        }
    )


def linkstore_stats(out_dir: str) -> ray.data.Dataset:
    """Per-src successor stats recomputed FROM THE DECODED BLOBS —
    the codec round trip is load-bearing for every output value."""
    return read_linkstore(out_dir).map_batches(
        _decode_stats_batch, batch_format="pyarrow", batch_size=8192
    )
