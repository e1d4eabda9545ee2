"""Similarity search over an embedding column (list<float>).

- Brute-force cosine top-k: the baseline. The query matrix is
  broadcast ONCE (``ray.put``); each ``map_batches`` task does one
  numpy matmul against its batch and emits only its *per-batch top-k*
  rows (partial top-k = pre-aggregation), so the final
  ``groupby(query_id)`` top-k shuffle moves k×n_batches rows, not the
  corpus.
- IVF: the scale path. A deterministic numpy k-means (fixed seed,
  fixed iterations, sample-trained) builds the centroid table; batches
  are assigned to cells; a query probes only ``nprobe`` cells.
  Recall-vs-bruteforce is gated in tests/test_similarity.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def batch_vectors(batch: pa.Table, column: str) -> np.ndarray:
    """(n, dim) float64 matrix from a list<float> / fixed_size_list /
    tensor-extension column — the three layouts an embedding column can
    arrive in (parquet list, Ray tensor type, pandas object)."""
    col = batch.column(column)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_list(col.type) or pa.types.is_fixed_size_list(col.type) or pa.types.is_large_list(col.type):
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        return flat.reshape(len(batch), -1)
    arr = col.to_numpy(zero_copy_only=False)
    if arr.dtype == object:
        return np.stack(list(arr)).astype(np.float64)
    return np.asarray(arr, dtype=np.float64).reshape(len(batch), -1)


class BruteForceTopK:
    """map_batches callable emitting per-batch partial top-k rows
    (query_id, neighbor_id, cos). Finalize with
    groupby(query_id).map_groups(global top-k)."""

    def __init__(self, queries_ref, id_column: str, vec_column: str, k: int,
                 exclude_self: bool = True):
        q = ray.get(queries_ref) if not isinstance(queries_ref, tuple) else queries_ref
        self.query_ids, qmat = q
        self.qmat = _normalize(np.asarray(qmat, dtype=np.float64)).T  # (dim, nq)
        self.id_column, self.vec_column = id_column, vec_column
        self.k, self.exclude_self = k, exclude_self

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(self.id_column).to_pylist(), dtype=np.int64)
        vecs = _normalize(batch_vectors(batch, self.vec_column))
        cos = vecs @ self.qmat  # (batch, nq)
        out_q, out_n, out_c = [], [], []
        for qi, qid in enumerate(self.query_ids):
            col = cos[:, qi]
            order = np.lexsort((ids, -col))  # cos desc, id asc — deterministic
            taken = 0
            for r in order:
                if taken >= self.k:
                    break
                if self.exclude_self and ids[r] == qid:
                    continue
                out_q.append(int(qid))
                out_n.append(int(ids[r]))
                out_c.append(float(col[r]))
                taken += 1
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "cos": pa.array(out_c, pa.float64()),
            }
        )


def finalize_topk(k: int):
    """Per-query global top-k over the partial rows (deterministic
    ordering: cos desc, neighbor_id asc)."""

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cos", "neighbor_id"], ascending=[False, True], kind="mergesort").head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "neighbor_id", "rank"]]

    return fn


def ann_bruteforce(ds, query_ids: list[int], query_vecs: np.ndarray, *,
                   id_column: str = "vec_id", vec_column: str = "embedding",
                   k: int = 5, batch_size: int = 4096):
    ref = ray.put((query_ids, query_vecs))
    partial = ds.map_batches(
        BruteForceTopK,
        fn_constructor_kwargs={
            "queries_ref": ref,
            "id_column": id_column,
            "vec_column": vec_column,
            "k": k,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=2, num_cpus=0.5,
    )
    return partial.groupby("query_id").map_groups(finalize_topk(k), batch_format="pandas")


# ---------------------------------------------------------------- IVF

def kmeans_fit(sample: np.ndarray, n_cells: int, seed: int = 5, iters: int = 8) -> np.ndarray:
    """Deterministic Lloyd's k-means on a driver-side sample (the
    index-build step; at 100 TB this trains on ds.random_sample)."""
    rng = np.random.Generator(np.random.PCG64(seed))
    sample = _normalize(np.asarray(sample, dtype=np.float64))
    idx = rng.choice(len(sample), size=min(n_cells, len(sample)), replace=False)
    cents = sample[np.sort(idx)].copy()
    for _ in range(iters):
        assign = np.argmax(sample @ cents.T, axis=1)
        for c in range(len(cents)):
            members = sample[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cents[c] = v / n
    return cents


class IVFAssign:
    """map_batches: add the IVF cell id per row (centroids broadcast)."""

    def __init__(self, centroids_ref):
        self.cents = ray.get(centroids_ref) if not isinstance(centroids_ref, np.ndarray) else centroids_ref

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = _normalize(batch_vectors(batch, "embedding"))
        cell = np.argmax(vecs @ self.cents.T, axis=1).astype(np.int32)
        return batch.append_column("ivf_cell", pa.array(cell, pa.int32()))


def plant_query_twins(query_ids: list[int], query_vecs: np.ndarray, *,
                      k: int = 5, id_base: int = 1 << 40) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic near-identical twins of each query vector — the
    shared leaf between the ``ann_topk_ivf`` catalog query and its
    serial brute-force golden (tools/make_goldens.py), mirroring
    ``plant_near_dup_vectors``. Twin i of query q is
    normalize(q + eps_i * u_i) with eps_i ∈ [0.01, 0.05] and u_i drawn
    from PCG64 seeded by (qid, i): cos(q, twin) ≥ 0.998, far above any
    natural corpus similarity, so the true top-k of every query is
    exactly its twin set — which makes the IVF result EXACT (the twins
    share the query's cell by margin) and therefore oracle-checkable."""
    qm = _normalize(np.asarray(query_vecs, dtype=np.float64))
    ids, vecs = [], []
    for qi, qid in enumerate(query_ids):
        for i in range(k):
            rng = np.random.Generator(np.random.PCG64(int(qid) * 1000 + i))
            u = rng.standard_normal(qm.shape[1])
            u /= np.linalg.norm(u)
            v = qm[qi] + 0.01 * (i + 1) * u
            ids.append(id_base + int(qid) * 64 + i)
            vecs.append(v / np.linalg.norm(v))
    return np.asarray(ids, dtype=np.int64), np.asarray(vecs, dtype=np.float64)


def ann_ivf(ds, query_ids: list[int], query_vecs: np.ndarray, *, n_cells: int = 16,
            nprobe: int = 4, k: int = 5, seed: int = 5, train_sample: int = 4096):
    """IVF top-k: restrict each query's scan to its nprobe nearest
    cells, then brute-force inside. One assignment pass + a filtered
    brute-force — the corpus-side win is scanning nprobe/n_cells of it.

    The centroid sample is a SEEDED RANDOM sample of the corpus (not a
    prefix — on a corpus sorted/partitioned by host or epoch an ordered
    prefix trains centroids on one slice of the space)."""
    n = ds.count()
    frac = min(1.0, (train_sample * 1.25) / max(n, 1))
    sample_rows = ds.random_sample(frac, seed=seed).limit(train_sample).to_pandas()
    if len(sample_rows) == 0:
        sample_rows = ds.limit(train_sample).to_pandas()
    sample = np.stack(sample_rows["embedding"].to_numpy())
    cents = kmeans_fit(sample, n_cells, seed)
    cents_ref = ray.put(cents)

    assigned = ds.map_batches(
        IVFAssign, fn_constructor_kwargs={"centroids_ref": cents_ref},
        batch_format="pyarrow", batch_size=4096, concurrency=2, num_cpus=0.5,
    )
    qn = _normalize(np.asarray(query_vecs, dtype=np.float64))
    probe_cells = np.argsort(-(qn @ cents.T), axis=1)[:, :nprobe]
    wanted = sorted({int(c) for row in probe_cells for c in row})
    filtered = assigned.map_batches(
        lambda t: t.filter(pa.compute.is_in(t.column("ivf_cell"), value_set=pa.array(wanted, pa.int32()))),
        batch_format="pyarrow",
    )
    return ann_bruteforce(filtered, query_ids, query_vecs, k=k)


# ------------------------------------------------------- quantized ANN

QUANT_SCALE = 127  # int8 symmetric quantization (|x| < 1 for these embeddings)


def quantize_int8(m: np.ndarray, scale: int = QUANT_SCALE) -> np.ndarray:
    """floor(float64(x)*scale + 0.5) — the identical IEEE expression the
    DuckDB oracle uses (CAST(x AS DOUBLE)*127), so quantized values
    match bit-for-bit on both sides."""
    return np.floor(m.astype(np.float64) * scale + 0.5).astype(np.int8)


class QuantizedTopK:
    """Brute-force top-k over int8-quantized vectors by integer dot
    product. The 100-TB story: the corpus column moves through the
    object store at 1/4 the float32 bytes (1/8 of float64), and the
    kernel is an int32-accumulated matmul; exactness is total (integer
    dots have no accumulation-order ambiguity), so the same query is
    hash-checkable against SQL — unlike float cosine, which only
    rank-matches. Emits per-batch partial top-k rows."""

    def __init__(self, queries_ref, id_column: str, vec_column: str, k: int,
                 dims: int | None = None):
        q = ray.get(queries_ref) if not isinstance(queries_ref, tuple) else queries_ref
        self.query_ids, qmat = q
        qmat = np.asarray(qmat, dtype=np.float64)
        if dims is not None:
            qmat = qmat[:, :dims]  # matryoshka prefix truncation
        self.qmat = quantize_int8(qmat).astype(np.int32).T
        self.id_column, self.vec_column = id_column, vec_column
        self.k = k
        self.dims = dims

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(self.id_column).to_pylist(), dtype=np.int64)
        vecs = batch_vectors(batch, self.vec_column)
        if self.dims is not None:
            vecs = vecs[:, : self.dims]
        vq = quantize_int8(vecs).astype(np.int32)
        dots = (vq @ self.qmat).astype(np.int64)  # (batch, nq) exact ints
        out_q, out_n, out_d = [], [], []
        for qi, qid in enumerate(self.query_ids):
            col = dots[:, qi]
            order = np.lexsort((ids, -col))  # dot desc, id asc
            taken = 0
            for r in order:
                if taken >= self.k:
                    break
                if ids[r] == qid:
                    continue
                out_q.append(int(qid))
                out_n.append(int(ids[r]))
                out_d.append(int(col[r]))
                taken += 1
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "dot": pa.array(out_d, pa.int64()),
            }
        )


def ann_quantized(ds, query_ids: list[int], query_vecs: np.ndarray, *,
                  id_column: str = "vec_id", vec_column: str = "embedding",
                  k: int = 5, batch_size: int = 4096, dims: int | None = None):
    ref = ray.put((query_ids, query_vecs))
    partial = ds.map_batches(
        QuantizedTopK,
        fn_constructor_kwargs={
            "queries_ref": ref, "id_column": id_column,
            "vec_column": vec_column, "k": k, "dims": dims,
        },
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=2, num_cpus=0.5,
    )

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["dot", "neighbor_id"], ascending=[False, True],
                          kind="mergesort").head(k).reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "neighbor_id", "dot", "rank"]]

    return partial.groupby("query_id").map_groups(finalize, batch_format="pandas")


# ------------------------------------------- exact integer k-means

KMEANS_SCALE = 10**4


def kmeans_assign_int(x: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """argmin_j sum((x - cents_j)^2), ties to the smallest j — all
    int64, computed via the expanded form (-2 x·c + |c|^2; the |x|^2
    term is constant per row). Exact: integer equality of distances
    gives identical tie behavior on every partition and in the serial
    golden."""
    d = -2 * (x @ cents.T) + (cents * cents).sum(axis=1)[None, :]
    return np.argmin(d, axis=1).astype(np.int64)


def kmeans_cluster_int(ds, *, n_clusters: int = 8, iters: int = 4,
                       id_column: str = "vec_id", vec_column: str = "embedding",
                       scale: int = KMEANS_SCALE):
    """Distributed Lloyd's k-means in exact integer arithmetic.

    Vectors are quantized once (floor(x*scale + 0.5), int64) and the
    quantized dataset is materialized — it is the invariant side of
    the iteration. Centroids are updated by *floored elementwise
    mean* (sum // count): integer division makes the whole algorithm
    deterministic and partition-order-independent, so the distributed
    run is bit-identical to a serial mirror (the golden). Per
    iteration: centroid matrix broadcast (ray.put once), per-batch
    assignment + partial (cluster, count, sum-vector) rows — the
    shuffle moves k rows per batch, never vectors. Init: the
    quantized vectors of the n_clusters smallest ids (deterministic).
    """
    import ray as _ray

    def q(t: pa.Table) -> pa.Table:
        ids = np.asarray(t.column(id_column).to_pylist(), dtype=np.int64)
        xq = np.floor(batch_vectors(t, vec_column) * scale + 0.5).astype(np.int64)
        return pa.table(
            {"vec_id": pa.array(ids, pa.int64()),
             "xq": pa.array(list(xq), pa.list_(pa.int64()))}
        )

    qds = ds.map_batches(q, batch_format="pyarrow", batch_size=4096).materialize()

    # deterministic init: vectors of the n_clusters smallest vec_ids
    seed_df = qds.sort("vec_id").limit(n_clusters).to_pandas()
    cents = np.stack(seed_df["xq"].to_numpy()).astype(np.int64)

    from .agg import bucketed_group_agg

    for _ in range(iters):
        cref = _ray.put(cents)

        def partial(t: pa.Table) -> pa.Table:
            c = _ray.get(cref)
            x = np.stack(t.column("xq").to_numpy(zero_copy_only=False)).astype(np.int64)
            a = kmeans_assign_int(x, c)
            rows_c, rows_n, rows_s = [], [], []
            for j in np.unique(a):
                m = x[a == j]
                rows_c.append(int(j))
                rows_n.append(len(m))
                rows_s.append(m.sum(axis=0).tolist())  # exact int sums
            return pa.table(
                {"cluster": pa.array(rows_c, pa.int64()),
                 "n": pa.array(rows_n, pa.int64()),
                 "s": pa.array(rows_s, pa.list_(pa.int64()))}
            )

        def merge(g: pd.DataFrame) -> pd.DataFrame:
            out = []
            for j, gg in g.groupby("cluster", sort=False):
                s = np.stack(gg["s"].to_numpy()).astype(np.int64).sum(axis=0)
                out.append((int(j), int(gg["n"].sum()), s.tolist()))
            return pd.DataFrame(out, columns=["cluster", "n", "s"])

        stats = bucketed_group_agg(
            qds.map_batches(partial, batch_format="pyarrow"), ["cluster"], merge
        ).to_pandas()
        new = cents.copy()
        for _, r in stats.iterrows():
            if r["n"] > 0:
                new[int(r["cluster"])] = (
                    np.asarray(r["s"], dtype=np.int64) // int(r["n"])
                )
        cents = new

    cref = _ray.put(cents)

    def assign_final(t: pa.Table) -> pa.Table:
        c = _ray.get(cref)
        x = np.stack(t.column("xq").to_numpy(zero_copy_only=False)).astype(np.int64)
        return pa.table(
            {"vec_id": t.column("vec_id"),
             "cluster": pa.array(kmeans_assign_int(x, c), pa.int64())}
        )

    return qds.map_batches(assign_final, batch_format="pyarrow")


# ------------------------------------------- SemDeDup (semantic dedup)

SEMDEDUP_SIM_SCALE = 127
SEMDEDUP_TAU_NUM = 9025  # tau^2 = 0.9025 (tau = 0.95) ...
SEMDEDUP_TAU_DEN = 10**4  # ... as an exact integer ratio


def semdedup_int(ds, *, n_clusters: int = 8, iters: int = 4,
                 id_column: str = "vec_id", vec_column: str = "embedding",
                 tau_num: int = SEMDEDUP_TAU_NUM, tau_den: int = SEMDEDUP_TAU_DEN,
                 sim_scale: int = SEMDEDUP_SIM_SCALE):
    """SemDeDup (Abbas et al. 2023): semantic dedup inside k-means
    clusters — (vec_id, cluster, keep) where keep=0 iff an
    earlier-id vector in the SAME cluster has cosine ≥ tau.

    Exactness: clustering is :func:`kmeans_cluster_int` (bit-identical
    across partitionings); the cosine test is the cross-multiplied
    integer form ``dot>0 and dot^2*tau_den >= tau_num*|a|^2*|b|^2``
    over ``floor(x*sim_scale+0.5)`` vectors, so the whole output
    value-hash-matches a serial golden. int64 headroom: requires
    ``(dim*sim_scale^2)^2 * tau_den < 2^63`` (asserted) — dim ≤ ~850
    at scale 127.

    Scale shape: assignments attach to the quantized vectors by a
    bucketed hash join on vec_id (both sides partitioned — no
    broadcast of an O(n) table); the per-cluster greedy keep is ONE
    vectorized int matmul per cluster group. The within-cluster work
    is O(m^2) by construction (that is SemDeDup); at corpus scale
    n_clusters is sized so m = n/k fits a task, exactly like the
    paper's 50k-cluster configuration."""
    from .joins import hash_join

    clusters = kmeans_cluster_int(
        ds, n_clusters=n_clusters, iters=iters,
        id_column=id_column, vec_column=vec_column,
    )

    def q8(t: pa.Table) -> pa.Table:
        # int64 rows serialized to fixed-width binary: binary shuffles
        # cleanly through the join + groupby (a list column does not
        # survive the pandas sort-shuffle), same trick as the embedding
        # near-dup attach (stages/dedup.py)
        ids = np.asarray(t.column(id_column).to_pylist(), dtype=np.int64)
        xq = np.floor(batch_vectors(t, vec_column) * sim_scale + 0.5).astype(np.int64)
        return pa.table(
            {"vec_id": pa.array(ids, pa.int64()),
             "qv": pa.array([r.tobytes() for r in xq], pa.binary())}
        )

    qds = ds.map_batches(q8, batch_format="pyarrow", batch_size=4096)
    joined = hash_join(qds, clusters, key="vec_id",
                       left_cols=["qv"], right_cols=["cluster"], how="inner")

    def keep_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("vec_id", kind="mergesort").reset_index(drop=True)
        x = np.stack([np.frombuffer(b, dtype=np.int64) for b in g["qv"].to_numpy()])
        norms = (x * x).sum(axis=1)
        assert int(norms.max(initial=0)) ** 2 * tau_den < 2**63, "int64 overflow: shrink sim_scale"
        d = x @ x.T
        dup = (d > 0) & (d * d * tau_den >= tau_num * np.outer(norms, norms))
        earlier = np.tril(dup, k=-1)  # rows sorted by vec_id: i<j only
        keep = ~earlier.any(axis=1)
        return pd.DataFrame(
            {"vec_id": g["vec_id"].astype("int64"),
             "cluster": g["cluster"].astype("int64"),
             "keep": keep.astype(np.int64)}
        )

    return joined.groupby("cluster").map_groups(keep_group, batch_format="pandas")


def power_iteration_int(G: "np.ndarray", iters: int = 16, scale: int = 1000) -> "np.ndarray":
    """Top eigenvector of a small integer Gram matrix by fixed-point
    power iteration: v is kept as integer milli-units (L∞ norm scaled
    to ``scale`` each step via exact integer floor division), so the
    result is bit-identical wherever it runs — the driver-side closer
    for the one-pass distributed Gram accumulation (G is dims², tiny;
    the DATA never moves twice). Sign convention: the largest-|v|
    component is made positive (first index on ties)."""
    d = G.shape[0]
    v = np.ones(d, dtype=np.int64) * scale
    for _ in range(iters):
        w = G @ v  # int64 exact (|G| bounded by n*127^2, |v| by scale)
        m = np.abs(w).max()
        if m == 0:
            return np.zeros(d, dtype=np.int64)
        v = (w * scale) // m  # exact floor division, L∞ normalized
    i = int(np.abs(v).argmax())
    if v[i] < 0:
        v = -v
    return v.astype(np.int64)


# ------------------------------------------------ product quantization

PQ_SCALE = 1024  # fixed-point quantization of raw (unnormalized) coords


def pq_quantize(m: np.ndarray, scale: int = PQ_SCALE) -> np.ndarray:
    """Exact fixed-point image of the raw vectors: floor(x·scale+0.5)
    int64 — shared leaf between the distributed pipeline and the
    serial-mirror golden (every PQ distance below is integer-exact)."""
    return np.floor(np.asarray(m, dtype=np.float64) * scale + 0.5).astype(np.int64)


def pq_train_books(sample: np.ndarray, m_sub: int, n_codes: int,
                   seed: int = 5, iters: int = 8, scale: int = PQ_SCALE) -> list:
    """Per-subspace Lloyd's codebooks (Jégou, Douze & Schmid, "Product
    Quantization for Nearest Neighbor Search", TPAMI 2011): the D-dim
    space splits into m_sub contiguous subspaces, each trained to
    n_codes centroids on the fixed-point sample and ROUNDED BACK to
    int64 — so encoding and ADC distances downstream are pure integer
    arithmetic (only training touches floats, deterministically:
    seeded PCG64 init, argmin ties to the lowest code)."""
    q = pq_quantize(sample, scale)
    d = q.shape[1]
    sub = d // m_sub
    books = []
    for s in range(m_sub):
        xs = q[:, s * sub:(s + 1) * sub].astype(np.float64)
        rng = np.random.Generator(np.random.PCG64(seed * 100 + s))
        idx = rng.choice(len(xs), size=min(n_codes, len(xs)), replace=False)
        cents = xs[np.sort(idx)].copy()
        for _ in range(iters):
            d2 = ((xs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(len(cents)):
                members = xs[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books.append(np.floor(cents + 0.5).astype(np.int64))
    return books


def pq_encode(qm: np.ndarray, books: list) -> np.ndarray:
    """(n, m_sub) int8 codes: per-subspace argmin of the exact integer
    L2 to the int codebook (ties to the lowest code)."""
    m_sub = len(books)
    sub = qm.shape[1] // m_sub
    codes = np.empty((qm.shape[0], m_sub), np.int64)
    for s in range(m_sub):
        xs = qm[:, s * sub:(s + 1) * sub]
        diff = xs[:, None, :] - books[s][None, :, :]
        codes[:, s] = np.argmin((diff * diff).sum(axis=2), axis=1)
    return codes


class PQScanTopK:
    """map_batches: encode the batch and score it against every query
    via the ADC lookup tables (asymmetric distance computation — the
    query stays full-precision fixed-point, the corpus is its codes);
    emits per-batch partial top-k rows. Codebooks + tables broadcast
    once per actor."""

    def __init__(self, books_ref, queries_ref, id_column: str, k: int,
                 scale: int = PQ_SCALE):
        self.books = ray.get(books_ref) if not isinstance(books_ref, list) else books_ref
        qids, qvecs = ray.get(queries_ref) if not isinstance(queries_ref, tuple) else queries_ref
        self.qids = np.asarray(qids, dtype=np.int64)
        self.id_column = id_column
        self.k = k
        qq = pq_quantize(qvecs, scale)
        m_sub = len(self.books)
        sub = qq.shape[1] // m_sub
        # ADC tables: (n_queries, m_sub, n_codes) exact int64
        self.tables = np.stack(
            [
                ((qq[:, s * sub:(s + 1) * sub][:, None, :] - self.books[s][None, :, :]) ** 2).sum(axis=2)
                for s in range(m_sub)
            ],
            axis=1,
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_column).cast(pa.int64()).to_numpy()
        qm = pq_quantize(batch_vectors(batch, "embedding"))
        codes = pq_encode(qm, self.books)
        # dist[q, row] = sum_s tables[q, s, codes[row, s]]
        m_sub = codes.shape[1]
        dist = np.zeros((len(self.qids), len(ids)), np.int64)
        for s in range(m_sub):
            dist += self.tables[:, s, :][:, codes[:, s]]
        out_q, out_n, out_d = [], [], []
        kk = min(self.k, len(ids))
        for qi in range(len(self.qids)):
            row = dist[qi]
            # tie-AWARE partial top-k: the cut must honor the full
            # (dist, id) order — argpartition alone picks an arbitrary
            # subset among boundary ties (planted exact duplicates all
            # tie, so that arbitrariness is reachable, not theoretical)
            order = np.lexsort((ids, row))[:kk]
            out_q.extend([self.qids[qi]] * len(order))
            out_n.extend(ids[order])
            out_d.extend(row[order])
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "pq_dist": pa.array(out_d, pa.int64()),
            }
        )


def ann_pq(ds, query_ids: list[int], query_vecs: np.ndarray, *, m_sub: int = 4,
           n_codes: int = 16, k: int = 5, seed: int = 5, train_sample: int = 2048):
    """PQ/ADC top-k (the 10^10-vector scale path: the corpus lives as
    m_sub bytes per vector — 16× smaller than float32 at these params —
    and scoring is m_sub table lookups per row instead of a D-dim dot).
    Codebooks train on a SEEDED RANDOM sample (never a prefix); scan is
    per-batch ADC partials + ONE bounded query-keyed groupby for the
    global top-k. Distances are integer-exact end-to-end, so partials
    merge deterministically and a serial mirror reproduces the result
    bit for bit."""
    from ..stages.agg import bucketed_group_agg

    # PARTITION-INVARIANT training sample: a Knuth-hash row gate on
    # vec_id (every ~2nd row) collected in vec_id order and capped —
    # unlike random_sample, the drawn set cannot depend on block
    # structure, so the codebooks (and therefore every PQ code and
    # ADC distance) are identical across cluster sizes, retries and
    # the serial-mirror golden
    def tsample(t: pa.Table) -> pa.Table:
        ids = t.column("vec_id").cast(pa.int64()).to_numpy()
        keep = ((ids * 2654435761) % (1 << 32)) % 2 == 0
        return pa.table(
            {"vec_id": pa.array(ids[keep], pa.int64()),
             "embedding": t.column("embedding").filter(pa.array(keep))}
        )

    sample_rows = (
        ds.map_batches(tsample, batch_format="pyarrow")
        .to_pandas()
        .sort_values("vec_id", kind="mergesort")
        .head(train_sample)
    )
    books = pq_train_books(np.stack(sample_rows["embedding"].to_numpy()), m_sub, n_codes, seed)
    books_ref = ray.put(books)
    queries_ref = ray.put((list(query_ids), np.asarray(query_vecs, dtype=np.float64)))

    partials = ds.map_batches(
        PQScanTopK,
        fn_constructor_kwargs={
            "books_ref": books_ref, "queries_ref": queries_ref,
            "id_column": "vec_id", "k": k,
        },
        batch_format="pyarrow", batch_size=4096, concurrency=2, num_cpus=0.5,
    )

    def fin(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["query_id", "pq_dist", "neighbor_id"], kind="mergesort")
        g = g.groupby("query_id", sort=True).head(k).reset_index(drop=True)
        g["rank"] = g.groupby("query_id").cumcount() + 1
        return g[["query_id", "neighbor_id", "rank", "pq_dist"]].astype("int64")

    return bucketed_group_agg(partials, ["query_id"], fin)


def ann_ivfpq(ds, query_ids: list[int], query_vecs: np.ndarray, *, n_cells: int = 16,
              nprobe: int = 4, m_sub: int = 4, n_codes: int = 16, k: int = 5,
              seed: int = 5, train_sample: int = 2048):
    """IVF-PQ — the composition every production vector index ships
    (FAISS IVFx,PQy): the coarse quantizer prunes the corpus to
    nprobe/n_cells, the product quantizer scores what survives with
    integer ADC lookups. Both training passes draw the SAME
    partition-invariant hash sample; the fine scan is :func:`ann_pq`'s
    machinery over the filtered Dataset, so distances stay exact
    int64 and the serial mirror reproduces the composition bit for
    bit."""
    # coarse quantizer trains on the hash sample (cosine cells, like ann_ivf)
    def tsample(t: pa.Table) -> pa.Table:
        ids = t.column("vec_id").cast(pa.int64()).to_numpy()
        keep = ((ids * 2654435761) % (1 << 32)) % 2 == 0
        return pa.table(
            {"vec_id": pa.array(ids[keep], pa.int64()),
             "embedding": t.column("embedding").filter(pa.array(keep))}
        )

    sample_rows = (
        ds.map_batches(tsample, batch_format="pyarrow")
        .to_pandas()
        .sort_values("vec_id", kind="mergesort")
        .head(train_sample)
    )
    sample = np.stack(sample_rows["embedding"].to_numpy())
    cents = kmeans_fit(sample, n_cells, seed)
    cents_ref = ray.put(cents)
    assigned = ds.map_batches(
        IVFAssign, fn_constructor_kwargs={"centroids_ref": cents_ref},
        batch_format="pyarrow", batch_size=4096, concurrency=2, num_cpus=0.5,
    )
    qn = _normalize(np.asarray(query_vecs, dtype=np.float64))
    probe_cells = np.argsort(-(qn @ cents.T), axis=1)[:, :nprobe]
    wanted = sorted({int(c) for row in probe_cells for c in row})
    filtered = assigned.map_batches(
        lambda t: t.filter(
            pa.compute.is_in(t.column("ivf_cell"), value_set=pa.array(wanted, pa.int32()))
        ).select(["vec_id", "embedding"]),
        batch_format="pyarrow",
    )
    return ann_pq(filtered, query_ids, query_vecs, m_sub=m_sub, n_codes=n_codes,
                  k=k, seed=seed, train_sample=train_sample)
