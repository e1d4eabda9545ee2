"""Deduplication operators for training-data pipelines.

The reference's dedup is exact (md5 task identity D1, content-hash
change detection D4 — crawler/utils/utils.py:480-498). At 100 TB a
corpus also needs *near*-dup families; each is expressed Ray-Data-first:

- exact:      hash column in map_batches → groupby(hash) keep-first
- MinHash+LSH: shingle→minhash per batch → explode (band, band_hash,
               id) rows → groupby(band, band_hash) buckets → candidate
               pairs → verify true Jaccard     [one shuffle on bands]
- SimHash:    64-bit signature per doc → 4×16-bit band buckets →
               candidate pairs → verify Hamming distance
- embedding:  random-hyperplane LSH buckets → verify cosine

All randomness is a pure function of a seed (fixed hyperplanes /
permutation parameters), so outputs are deterministic across runs and
cluster sizes. Pair verification broadcasts the needed column once via
``ray.put`` (docs at sf scale; at 100 TB, repartition both pair ends by
doc_id and verify per-partition instead — noted per function).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.textstats import jaccard, word_shingles

_MERSENNE = (1 << 61) - 1


def _perm_params(n_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.Generator(np.random.PCG64(seed))
    a = rng.integers(1, _MERSENNE, size=n_perm, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, size=n_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    sh = word_shingles(text, k)
    if not sh:
        return np.array([0], dtype=np.uint64)
    return np.array(
        [int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little") for s in sorted(sh)],
        dtype=np.uint64,
    )


def _mod61(x: np.ndarray) -> np.ndarray:
    """Fold a uint64 array into [0, 2^61-1) using the Mersenne structure
    (2^61 ≡ 1 mod M)."""
    M = np.uint64(_MERSENNE)
    x = (x & M) + (x >> np.uint64(61))
    return np.where(x >= M, x - M, x)


def _mulmod61(a: np.ndarray, h: np.ndarray) -> np.ndarray:
    """Exact (a*h) mod 2^61-1, vectorized in uint64 — 32-bit split
    multiply with Mersenne folding, no silent 2^64 wrap (the wrap loses
    the universal-hash property the MinHash collision estimate relies
    on). Inputs must already be < 2^61."""
    MASK32 = np.uint64(0xFFFFFFFF)
    MASK29 = np.uint64((1 << 29) - 1)
    a1, a0 = a >> np.uint64(32), a & MASK32
    h1, h0 = h >> np.uint64(32), h & MASK32
    # a*h = a1h1·2^64 + (a1h0+a0h1)·2^32 + a0h0 ;  2^64 ≡ 8 (mod M)
    hi = a1 * h1 * np.uint64(8)                      # < 2^61
    mid = a1 * h0 + a0 * h1                          # < 2^62
    mid_red = (mid >> np.uint64(29)) + ((mid & MASK29) << np.uint64(32))  # mid·2^32 mod-ish
    lo = _mod61(a0 * h0)
    return _mod61(_mod61(hi + lo) + _mod61(mid_red))


def minhash_signature(text: str, n_perm: int, a: np.ndarray, b: np.ndarray, k: int = 3) -> np.ndarray:
    h = _mod61(_shingle_hashes(text, k))
    # (P, S) universal hashing mod Mersenne prime, min over shingles
    vals = _mod61(_mulmod61(a[:, None], h[None, :]) + b[:, None])
    return vals.min(axis=1).astype(np.uint64)


class MinHashStage:
    """map_batches: text → (id, band, band_hash) rows, ``n_bands`` per
    input row. Permutation params built once per actor."""

    def __init__(self, id_column: str, text_column: str, n_perm: int = 64,
                 n_bands: int = 16, shingle_k: int = 3, seed: int = 7):
        assert n_perm % n_bands == 0
        self.id_column, self.text_column = id_column, text_column
        self.n_perm, self.n_bands, self.k = n_perm, n_bands, shingle_k
        self.rows_per_band = n_perm // n_bands
        self.a, self.b = _perm_params(n_perm, seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_column).to_pylist()
        texts = batch.column(self.text_column).to_pylist()
        out_id, out_band, out_hash = [], [], []
        for i, t in zip(ids, texts):
            sig = minhash_signature(t, self.n_perm, self.a, self.b, self.k)
            for band in range(self.n_bands):
                chunk = sig[band * self.rows_per_band : (band + 1) * self.rows_per_band]
                bh = hashlib.md5(chunk.tobytes()).digest()[:8].hex()
                out_id.append(i)
                out_band.append(band)
                out_hash.append(bh)
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "band": pa.array(out_band, pa.int32()),
                "band_hash": pa.array(out_hash, pa.string()),
            }
        )


def band_pairs(g: pd.DataFrame, max_bucket: int = 64) -> pd.DataFrame:
    """Candidate pairs for one whole BAND (vectorized): prefilter rows
    whose band_hash collides at all (the overwhelming majority are
    singletons), then expand pairs per colliding bucket with
    ``np.triu_indices``. One Python call per band, not per bucket."""
    dup = g.loc[g.duplicated("band_hash", keep=False), ["band_hash", "doc_id"]].drop_duplicates()
    out_a, out_b = [], []
    for _, sub in dup.groupby("band_hash", sort=False):
        ids = np.sort(sub["doc_id"].unique())[:max_bucket]
        if len(ids) < 2:
            continue
        ia, ib = np.triu_indices(len(ids), 1)
        out_a.append(ids[ia])
        out_b.append(ids[ib])
    if not out_a:
        return pd.DataFrame(
            {"id_a": pd.Series([], dtype="int64"), "id_b": pd.Series([], dtype="int64")}
        )
    return pd.DataFrame(
        {"id_a": np.concatenate(out_a).astype(np.int64), "id_b": np.concatenate(out_b).astype(np.int64)}
    )


def bucket_pairs(group: pd.DataFrame, max_bucket: int = 64) -> pd.DataFrame:
    """LSH bucket → unique candidate pairs (a<b). Oversized buckets are
    truncated to the smallest ids (deterministic) — log-worthy skew at
    scale, but candidates lost to truncation reappear in other bands."""
    ids = sorted(group["doc_id"].unique())[:max_bucket]
    pairs = [(a, b) for i, a in enumerate(ids) for b in ids[i + 1 :]]
    if not pairs:
        return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                             "id_b": pd.Series([], dtype="int64")})
    return pd.DataFrame(pairs, columns=["id_a", "id_b"])


def simhash64(text: str, seed: int = 11) -> int:
    """64-bit SimHash over word tokens (term-frequency weighted)."""
    from ..functions.textstats import WORD_RE

    acc = np.zeros(64, dtype=np.int64)
    for tok in WORD_RE.findall(text.lower()):
        h = int.from_bytes(hashlib.md5(f"{seed}|{tok}".encode()).digest()[:8], "little")
        bits = np.unpackbits(np.frombuffer(np.uint64(h).tobytes(), dtype=np.uint8))
        acc += bits.astype(np.int64) * 2 - 1
    val = 0
    for bit in (acc >= 0).astype(np.uint8):
        val = (val << 1) | int(bit)
    return int(np.uint64(val).astype(np.int64))


class SimHashStage:
    def __init__(self, id_column: str, text_column: str, seed: int = 11):
        self.id_column, self.text_column, self.seed = id_column, text_column, seed

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_column).to_pylist()
        texts = batch.column(self.text_column).to_pylist()
        sigs = [simhash64(t, self.seed) for t in texts]
        out_id, out_band, out_hash = [], [], []
        for i, s in zip(ids, sigs):
            u = int(np.int64(s).astype(np.uint64))
            for band in range(4):  # 4 × 16-bit bands: Hamming≤3 ⇒ one band exact
                out_id.append(i)
                out_band.append(band)
                out_hash.append(f"{(u >> (16 * band)) & 0xFFFF:04x}")
        t = pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "band": pa.array(out_band, pa.int32()),
                "band_hash": pa.array(out_hash, pa.string()),
            }
        )
        return t


def verify_pairs_jaccard(
    pairs: pd.DataFrame, texts_by_id: dict, threshold: float, shingle_k: int = 3
) -> pd.DataFrame:
    """Exact n-gram Jaccard verification of candidate pairs. Returns
    (id_a, id_b, jaccard_permille:int64) — integer output so a future
    oracle can match bit-for-bit."""
    rows = []
    for a, b in zip(pairs["id_a"], pairs["id_b"]):
        j = jaccard(word_shingles(texts_by_id[a], shingle_k), word_shingles(texts_by_id[b], shingle_k))
        if j >= threshold:
            rows.append((int(a), int(b), int(round(j * 1000))))
    return pd.DataFrame(rows, columns=["id_a", "id_b", "jaccard_permille"]).astype(
        {"id_a": "int64", "id_b": "int64", "jaccard_permille": "int64"}
    )


def hamming64_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = (a.astype(np.uint64) ^ b.astype(np.uint64))
    return np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)


def hyperplane_sketch(vecs: np.ndarray, n_planes: int, seed: int) -> np.ndarray:
    """Random-hyperplane LSH code (uint64-packed sign pattern) for
    embedding near-dup bucketing; planes are a pure function of seed."""
    rng = np.random.Generator(np.random.PCG64(seed))
    planes = rng.standard_normal((vecs.shape[1], n_planes))
    signs = (vecs @ planes) >= 0
    out = np.zeros(len(vecs), dtype=np.uint64)
    for j in range(n_planes):
        out = (out << np.uint64(1)) | signs[:, j].astype(np.uint64)
    return out


def label_propagation_clusters(pairs: pd.DataFrame, max_rounds: int = 16):
    """Near-dup clusters from candidate pairs: distributed connected
    components by iterative min-label propagation.

    Each round: every node proposes its current label to its neighbors
    (an edge hash-join), every node takes the min of its own and
    proposed labels (bucketed grouped min), stop when no label changed.
    Rounds needed = graph diameter (near-dup families are shallow).
    Returns a Dataset (doc_id:int64, cluster_id:int64) covering every
    node that appears in a pair. The per-round state is one row per
    node in the candidate set — tiny relative to the corpus, which is
    what makes clustering after LSH tractable at 100 TB.
    """
    import ray.data

    from .agg import bucketed_group_agg
    from .joins import hash_join

    if len(pairs) == 0:
        return ray.data.from_pandas(
            pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                          "cluster_id": pd.Series([], dtype="int64")})
        )
    edges = pd.concat(
        [
            pairs.rename(columns={"id_a": "src", "id_b": "dst"})[["src", "dst"]],
            pairs.rename(columns={"id_b": "src", "id_a": "dst"})[["src", "dst"]],
        ]
    ).drop_duplicates().astype("int64")
    nodes = pd.unique(edges["src"])
    labels_pd = pd.DataFrame({"doc_id": nodes, "cluster_id": nodes}).astype("int64")

    edges_ds = ray.data.from_pandas(edges)
    for _ in range(max_rounds):
        labels_ds = ray.data.from_pandas(labels_pd.rename(columns={"doc_id": "src", "cluster_id": "label"}))
        proposals = hash_join(edges_ds, labels_ds, "src", ["dst"], ["label"]).map_batches(
            lambda df: df[["dst", "label"]].rename(columns={"dst": "doc_id", "label": "cluster_id"}),
            batch_format="pandas",
        )
        combined = proposals.union(
            ray.data.from_pandas(labels_pd)
        )
        new_labels = bucketed_group_agg(
            combined, ["doc_id"],
            lambda g: g.groupby("doc_id", as_index=False)["cluster_id"].min(),
        ).to_pandas().astype("int64").sort_values("doc_id").reset_index(drop=True)
        if new_labels.equals(labels_pd.sort_values("doc_id").reset_index(drop=True)):
            break
        labels_pd = new_labels
    return ray.data.from_pandas(labels_pd)
