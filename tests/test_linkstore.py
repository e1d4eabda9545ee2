"""Compressed adjacency store (stages/linkstore.py) + varint codec
(functions/varint.py): byte-level round trips, torn/corrupt blobs
fail loudly, and the committed-store stats equal a direct derivation."""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pytest

from crawlerframework_ray.functions.varint import (
    decode_gap_frames,
    decode_varints,
    encode_gap_frames,
    encode_varints,
    varint_sizes,
    zigzag_decode,
    zigzag_encode,
)
from crawlerframework_ray.stages.linkstore import (
    commit_linkstore,
    doc_outlinks,
    encode_adjacency_batch,
    linkstore_stats,
    read_linkstore,
)


def test_varint_roundtrip_boundaries():
    v = np.array(
        [0, 1, 127, 128, 16383, 16384, 2**21 - 1, 2**21, 2**28, 2**35, 2**62],
        dtype=np.uint64,
    )
    buf, ends = encode_varints(v)
    assert (decode_varints(buf) == v).all()
    # byte sizes match the spec: ceil(bit_length/7), min 1
    assert varint_sizes(v).tolist() == [1, 1, 1, 2, 2, 3, 3, 4, 5, 6, 9]
    assert int(ends[-1]) == len(buf)


def test_varint_roundtrip_random():
    rng = np.random.default_rng(11)
    v = rng.integers(0, 2**50, 5000).astype(np.uint64)
    buf, _ = encode_varints(v)
    assert (decode_varints(buf) == v).all()


def test_varint_rejects_negative_and_truncated():
    with pytest.raises(ValueError):
        encode_varints(np.array([-1], dtype=np.int64))
    buf, _ = encode_varints(np.array([300], dtype=np.uint64))
    with pytest.raises(ValueError):
        decode_varints(buf[:-1])  # continuation bit left dangling


def test_zigzag_roundtrip():
    x = np.array([0, -1, 1, -2, 2, -(2**40), 2**40], dtype=np.int64)
    assert (zigzag_encode(x) == np.array([0, 1, 2, 3, 4, 2**41 - 1, 2**41])).all()
    assert (zigzag_decode(zigzag_encode(x)) == x).all()


def test_gap_frames_roundtrip_ragged():
    rng = np.random.default_rng(5)
    anchors, frames = [], []
    for i in range(400):
        anchors.append(int(rng.integers(0, 10_000)))
        frames.append(np.unique(rng.integers(0, 10_000, int(rng.integers(0, 9)))))
    splits = np.concatenate(([0], np.cumsum([len(f) for f in frames])))
    values = np.concatenate([f for f in frames if len(f)]) if any(
        len(f) for f in frames
    ) else np.zeros(0, np.int64)
    anchors = np.array(anchors, dtype=np.int64)
    blobs, nbytes = encode_gap_frames(anchors, values, splits)
    assert [len(b) for b in blobs] == nbytes.tolist()
    dv, dsp = decode_gap_frames(anchors, blobs)
    assert (dsp == splits).all()
    assert (dv == values).all()


def test_gap_frames_torn_blob_raises():
    with pytest.raises(ValueError):
        decode_gap_frames(np.array([0]), [b"\x80"])


def test_doc_outlinks_matches_bruteforce():
    from crawlerframework_ray.stages.linkstore import LINK_FORMULAS

    n = 97
    ids = np.arange(n, dtype=np.int64)
    values, splits = doc_outlinks(ids, n)
    for i in range(n):
        expect = sorted({(i * m + a) % n for m, a in LINK_FORMULAS} - {i})
        got = values[splits[i]: splits[i + 1]].tolist()
        assert got == expect, i


def test_linkstore_commit_read_stats(ray_session, tmp_path):
    import ray.data

    n = 300
    ds = ray.data.from_arrow(pa.table({"doc_id": pa.array(range(n), pa.int64())}))
    out = str(tmp_path / "links")
    commit_linkstore(ds, out, n_docs=n, n_buckets=4)
    assert os.path.exists(os.path.join(out, "manifest.json"))
    stats = linkstore_stats(out).to_pandas().sort_values("src").reset_index(drop=True)
    values, splits = doc_outlinks(np.arange(n, dtype=np.int64), n)
    deg = np.diff(splits)
    nz = deg > 0
    assert (stats["src"].to_numpy() == np.arange(n)[nz]).all()
    assert (stats["outdeg"].to_numpy() == deg[nz]).all()
    csum = np.concatenate(([0], np.cumsum(values)))
    assert (
        stats["sum_dst"].to_numpy() == (csum[splits[1:]] - csum[splits[:-1]])[nz]
    ).all()
    # compression is real: every blob is smaller than 8 bytes/neighbor
    assert (stats["nbytes"].to_numpy() < 8 * stats["outdeg"].to_numpy()).all()


def test_linkstore_corrupt_blob_fails_loudly(ray_session, tmp_path):
    import glob

    import pyarrow.parquet as pq
    import ray.data

    n = 64
    ds = ray.data.from_arrow(pa.table({"doc_id": pa.array(range(n), pa.int64())}))
    out = str(tmp_path / "links")
    commit_linkstore(ds, out, n_docs=n, n_buckets=2)
    f = sorted(glob.glob(os.path.join(out, "adjacency", "**", "*.parquet"),
                         recursive=True))[0]
    t = pq.read_table(f)
    blobs = t.column("blob").to_pylist()
    # chop the last byte off a non-empty blob: either a torn-varint
    # decode error or an outdeg mismatch — never a silent wrong answer
    k = next(i for i, b in enumerate(blobs) if len(b) > 1)
    blobs[k] = blobs[k][:-1]
    cols = {c: t.column(c) for c in t.column_names}
    cols["blob"] = pa.array(blobs, pa.binary())
    pq.write_table(pa.table(cols), f)
    with pytest.raises(Exception, match="(torn|truncated|mismatch|corrupt)"):
        linkstore_stats(out).to_pandas()


def test_linkstore_uncommitted_read_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        read_linkstore(str(tmp_path / "nope"))


def test_encode_batch_row_local_no_shuffle():
    """Encoding is a pure per-batch function — a split batch encodes
    to exactly the same blobs as the whole (row-locality witness)."""
    t = pa.table({"doc_id": pa.array(range(100), pa.int64())})
    whole = encode_adjacency_batch(t, 100, 4)
    parts = pa.concat_tables(
        [encode_adjacency_batch(t.slice(0, 37), 100, 4),
         encode_adjacency_batch(t.slice(37), 100, 4)]
    )
    assert whole.equals(parts)
