"""Distinct-count sketch (HyperLogLog) as a Ray Data aggregation.

The reference counted distincts exactly and in-process
(``list(set(q))`` patterns, e.g. crawler/connectors/htmlconnector.py:153)
— fine for one page's links, impossible for a 10^10-id frontier column.
This is the sketch form of A5: each ``map_batches`` task reduces its
batch to a 4 KB REGISTER array (the partial), and the registers merge
by elementwise max — associative, commutative, idempotent, so the
aggregation is order-insensitive and retry-safe, and only one tiny row
per block crosses the wire instead of the column.

Published algorithm (Flajolet, Fusy, Gandouet, Meunier 2007), 64-bit
hash variant with the standard small-range linear-counting correction.
Deterministic end to end: fixed-key siphash (``pd.util.hash_array``,
the same primitive the dedup stages rely on for cross-process
determinism) + a splitmix64 finisher; the estimate is a pure function
of the merged registers, so a serially-computed golden reproduces it
bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .dedup import _splitmix64

P = 12                 # 2^12 = 4096 registers → ~1.6% standard error
M = 1 << P
_ALPHA = 0.7213 / (1.0 + 1.079 / M)
_W_BITS = 64 - P       # width of the rank window (52 — exact in float64)


def hash64(values: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit hash of an id/str column (uint64)."""
    return _splitmix64(pd.util.hash_array(values).astype(np.uint64))


def batch_registers(values: np.ndarray) -> np.ndarray:
    """One batch's HLL partial: (M,) uint8 register array."""
    h = hash64(values)
    idx = (h >> np.uint64(_W_BITS)).astype(np.int64)
    w = h & np.uint64((1 << _W_BITS) - 1)
    # rank = leading zeros of the 52-bit window + 1; w < 2^52 is exact
    # in float64, so floor(log2(w)) is exact
    rho = np.full(len(w), _W_BITS + 1, dtype=np.uint8)
    nz = w > 0
    rho[nz] = (_W_BITS - np.floor(np.log2(w[nz].astype(np.float64)))).astype(np.uint8)
    regs = np.zeros(M, dtype=np.uint8)
    np.maximum.at(regs, idx, rho)
    return regs


def merge_registers(parts: list[np.ndarray]) -> np.ndarray:
    out = np.zeros(M, dtype=np.uint8)
    for p in parts:
        np.maximum(out, p, out=out)
    return out


def estimate(regs: np.ndarray) -> int:
    """Floor-integer HLL estimate (pure function of the registers —
    identical IEEE expression on both the Ray side and the golden)."""
    s = np.sum(np.power(2.0, -regs.astype(np.float64)))
    e = _ALPHA * M * M / s
    if e <= 2.5 * M:
        zeros = int(np.sum(regs == 0))
        if zeros:
            e = M * np.log(M / zeros)
    return int(np.floor(e))


def hll_distinct(ds, columns: list[str]):
    """Distributed distinct-count sketch over ``columns`` of ``ds``:
    per-batch partials (one row of fixed-width registers per column per
    block) → groupby(col) max-merge → estimate. Returns a Dataset of
    (col, n_registers, hll_estimate)."""
    import pyarrow as pa

    def partial(t: pa.Table) -> pa.Table:
        cols, blobs = [], []
        for c in columns:
            arr = t.column(c).to_numpy(zero_copy_only=False)
            cols.append(c)
            blobs.append(batch_registers(arr).tobytes())
        return pa.table(
            {"col": pa.array(cols, pa.string()),
             "regs": pa.array(blobs, pa.binary())}
        )

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        regs = merge_registers([np.frombuffer(b, dtype=np.uint8) for b in g["regs"]])
        return pd.DataFrame(
            {"col": [g["col"].iloc[0]], "n_registers": np.int64(M),
             "hll_estimate": np.int64(estimate(regs))}
        )

    # distributed pre-fold: the per-col terminal group receives
    # O(n_blocks/fan^2) register rows, not one per block (r3's
    # driver/1-task fold shape)
    folded = prefold_grids(
        ds.map_batches(partial, batch_format="pyarrow"),
        "regs", "col", np.uint8, "max",
    )
    return folded.groupby("col").map_groups(finalize, batch_format="pandas")


# ------------------------------------------- distributed grid folds

_GRID_OPS = {"sum": np.add, "max": np.maximum, "or": np.bitwise_or}


def prefold_grids(ds, grid_col: str, key_col: str | None, dtype, op: str,
                  fan: int = 256, levels: int = 2):
    """Associative pre-fold of fixed-size grid partials (CMS counters,
    HLL registers, bloom bit arrays, gram matrices): each level is one
    ``map_batches`` pass merging up to ``fan`` grid rows (per key, if
    ``key_col``) into one, cutting the row count ``fan``× per level —
    so the terminal reduce receives O(n_partials / fan^levels) rows
    instead of every per-block partial. The merge op must be
    associative+commutative (sum / max / or — they are), making the
    fold order-insensitive and retry-safe."""
    merge = _GRID_OPS[op]

    def fold(t: pa.Table) -> pa.Table:
        keys = (
            t.column(key_col).to_pylist() if key_col
            else [0] * t.num_rows
        )
        acc: dict = {}
        for k, b in zip(keys, t.column(grid_col).to_pylist()):
            a = np.frombuffer(b, dtype=dtype)
            cur = acc.get(k)
            acc[k] = a.copy() if cur is None else merge(cur, a)
        d = {}
        if key_col:
            d[key_col] = pa.array(list(acc.keys()))
        d[grid_col] = pa.array([v.tobytes() for v in acc.values()], pa.binary())
        return pa.table(d)

    out = ds
    for _ in range(levels):
        out = out.map_batches(fold, batch_format="pyarrow", batch_size=fan)
    return out


def fold_grid_partials(ds, grid_col: str, dtype, op: str,
                       fan: int = 256, levels: int = 2) -> np.ndarray:
    """Fold ALL of ``ds``'s grid partials into ONE merged grid through
    the distributed pre-fold + a single-key terminal reduce — the
    driver receives exactly one row (asserted), never the per-block
    partial list (the r3 scale-killer shape: ``take_all`` of one grid
    per input batch)."""
    merge = _GRID_OPS[op]
    folded = prefold_grids(ds, grid_col, None, dtype, op, fan=fan, levels=levels)

    def final(g) -> "pd.DataFrame":
        acc = None
        for b in g[grid_col]:
            a = np.frombuffer(b, dtype=dtype)
            acc = a.copy() if acc is None else merge(acc, a)
        return pd.DataFrame({grid_col: [acc.tobytes()]})

    rows = (
        folded.map_batches(
            lambda t: t.append_column("__k", pa.array(np.zeros(t.num_rows, np.int64))),
            batch_format="pyarrow",
        )
        .groupby("__k")
        .map_groups(final, batch_format="pandas")
        .take_all()
    )
    if len(rows) != 1:
        raise ValueError(f"grid fold produced {len(rows)} rows, expected 1")
    return np.frombuffer(rows[0][grid_col], dtype=dtype)


def hll_intersection_estimate(set_regs_ds) -> pd.DataFrame:
    """Set-expression estimation over HLL sketches — the composition a
    single distinct-count cannot answer: |A∩B| ≈ est(A) + est(B) −
    est(A∪B) (inclusion-exclusion), where the UNION sketch costs no
    third pass because HLL registers obey the union law — registers of
    A∪B are the elementwise max of A's and B's registers (max of maxes
    over a partition of the union's elements). ``set_regs_ds`` is a
    Dataset of (set ∈ {'a','b'}, regs) per-batch register partials;
    they fold through the distributed grid pre-fold (driver receives
    O(1) rows per set, never per-block partials). Returns one row:
    (n_registers, est_a, est_b, est_union, est_intersection) —
    intersection floor-int, reported raw (inclusion-exclusion on
    sketches can go ≤ 0 for tiny true overlaps; thresholding is the
    caller's policy)."""
    folded = prefold_grids(set_regs_ds, "regs", "set", np.uint8, "max")

    def final(g: pd.DataFrame) -> pd.DataFrame:
        regs = merge_registers([np.frombuffer(b, dtype=np.uint8) for b in g["regs"]])
        return pd.DataFrame({"set": [g["set"].iloc[0]], "regs": [regs.tobytes()]})

    df = folded.groupby("set").map_groups(final, batch_format="pandas").to_pandas()
    by = {s: np.frombuffer(b, dtype=np.uint8) for s, b in zip(df["set"], df["regs"])}
    ra = by.get("a", np.zeros(M, np.uint8))
    rb = by.get("b", np.zeros(M, np.uint8))
    ea, eb = estimate(ra), estimate(rb)
    eu = estimate(np.maximum(ra, rb))
    return pd.DataFrame(
        [
            {
                "n_registers": np.int64(M),
                "est_a": np.int64(ea),
                "est_b": np.int64(eb),
                "est_union": np.int64(eu),
                "est_intersection": np.int64(ea + eb - eu),
            }
        ]
    )


# ----------------------------------------- Misra-Gries heavy hitters

MG_SLOTS = 256


def _mg_summary(counter: "dict[str, int]", slots: int) -> tuple[dict, int]:
    """Reduce a full counter to a Misra-Gries summary of ``slots``
    entries. Returns (summary, n_decrements): classic MG — when the
    summary overflows, decrement every counter by the smallest evictee
    weight. n_decrements > 0 means estimates carry error ≤ N/slots."""
    if len(counter) <= slots:
        return dict(counter), 0
    items = sorted(counter.items(), key=lambda kv: (-kv[1], kv[0]))
    cut = items[slots][1]  # weight of the first evictee
    out = {k: v - cut for k, v in items[:slots] if v > cut}
    return out, cut


def heavy_hitter_terms(ds, *, k: int = 32, slots: int = MG_SLOTS):
    """EXACT corpus top-k terms at sketch cost — the two-phase
    candidate/verify shape (Misra-Gries summaries are mergeable, so
    phase 1 moves ≤ ``slots`` rows per batch instead of the term
    universe):

    1. per-batch MG summaries → ONE bounded bucketed shuffle summing
       weights per term (each batch ships ≤ slots+1 partial rows), then
       a distributed partial-top-(slots+1) — the driver sees only the
       dec total, the term count and ≤ blocks × (slots+1) candidate
       rows, never the merged term universe;
    2. the candidate set is broadcast and EXACTLY recounted in one
       map_batches pass (counts only candidate terms) + one bounded
       bucketed sum, then top-k by (cnt DESC, term ASC).

    Exactness certificate: MG guarantees any term with true count
    > N·(decrements/N) survives; when NO decrement ever happened
    (term universe ≤ slots — asserted into the output as
    ``exact_certified``) the candidate set provably contains every
    term, so the recounted top-k equals the full-count top-k and the
    SQL oracle can demand value equality. With decrements the result
    is still exact whenever the true k-th count exceeds the total
    decrement bound; the certificate column reports which regime the
    run was in."""
    from collections import Counter

    import pyarrow as pa
    import ray

    def partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for txt in t.column("text").to_pylist():
            if txt:  # '' has ZERO tokens (string_split parity)
                c.update(txt.split(" "))
        summ, dec = _mg_summary(c, slots)
        return pa.table(
            {"term": pa.array(list(summ.keys()) + ["\x00dec"], pa.string()),
             "w": pa.array(list(summ.values()) + [dec], pa.int64())}
        )

    import pyarrow.compute as pc

    from .agg import bucketed_group_agg

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=8192)
    summed = bucketed_group_agg(
        parts, ["term"], lambda g: g.groupby("term", as_index=False)["w"].sum()
    ).materialize()
    dec_rows = summed.map_batches(
        lambda t: t.filter(pc.equal(t.column("term"), "\x00dec")),
        batch_format="pyarrow",
    ).to_pandas()
    decrements = int(dec_rows["w"].sum()) if len(dec_rows) else 0
    n_terms = summed.count() - len(dec_rows)

    def topk_part(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        df = df[df["term"] != "\x00dec"]
        return df.sort_values(["w", "term"], ascending=[False, True],
                              kind="mergesort").head(slots + 1)

    top_cand = (
        summed.map_batches(topk_part, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["w", "term"], ascending=[False, True], kind="mergesort")
        .head(slots + 1)
    )
    # merged MG: re-prune to `slots` (merge of MG summaries is MG);
    # every term with merged weight > cut ranks in the global top-slots,
    # so the partial top-(slots+1) provably contains the survivors
    if n_terms > slots:
        cut = int(top_cand["w"].iloc[slots])
        decrements += cut
        surv = top_cand.head(slots)
        cand = sorted(surv.loc[surv["w"] > cut, "term"].tolist())
    else:
        cand = sorted(top_cand["term"].tolist())
    ref = ray.put(set(cand))

    def recount(t: pa.Table) -> pa.Table:
        from collections import Counter as _C

        keep = ray.get(ref)
        c: _C = _C()
        for txt in t.column("text").to_pylist():
            if txt:
                c.update(tok for tok in txt.split(" ") if tok in keep)
        return pa.table(
            {"term": pa.array(list(c.keys()), pa.string()),
             "cnt": pa.array(list(c.values()), pa.int64())}
        )

    exact = (
        bucketed_group_agg(
            ds.map_batches(recount, batch_format="pyarrow", batch_size=8192),
            ["term"],
            lambda g: g.groupby("term", as_index=False)["cnt"].sum(),
        )
        .to_pandas()
        .sort_values(["cnt", "term"], ascending=[False, True], kind="mergesort")
        .head(k)
        .reset_index(drop=True)
    )
    exact["rank"] = np.arange(1, len(exact) + 1, dtype=np.int64)
    exact["exact_certified"] = np.int64(1 if decrements == 0 else 0)
    return exact[["rank", "term", "cnt", "exact_certified"]]


# ---------------------------------------------------------------------
# Blocked Bloom filter (membership sketch): per-batch bit-array
# partials OR-merged — associative/commutative/idempotent, so build is
# order-insensitive and retry-safe like the HLL registers above. No
# false negatives by construction; false positives bounded by the
# standard (1 - e^{-kn/m})^k. The reference gated URL admission on an
# exact per-instance seen set (T1); the bloom form is the probe-side
# complement for "have we EVER crawled content like this" checks where
# exactness isn't needed but memory is 10 bits/key.

BLOOM_M = 1 << 16      # bits
BLOOM_K = 4


def _bloom_positions(texts: list[str]) -> np.ndarray:
    """(n, K) bit positions from the md5 of each text — 16-bit slices
    of the digest, deterministic across processes."""
    import hashlib

    out = np.empty((len(texts), BLOOM_K), dtype=np.int64)
    for i, t in enumerate(texts):
        d = hashlib.md5(t.encode("utf-8", "surrogatepass")).digest()
        for j in range(BLOOM_K):
            out[i, j] = int.from_bytes(d[2 * j : 2 * j + 2], "little")
    return out


def bloom_partial(texts: list[str]) -> np.ndarray:
    """One batch → packed bit array (BLOOM_M/8 bytes)."""
    bits = np.zeros(BLOOM_M, dtype=bool)
    if texts:
        bits[_bloom_positions(texts).ravel()] = True
    return np.packbits(bits)


def bloom_merge(parts: list[np.ndarray]) -> np.ndarray:
    return np.bitwise_or.reduce(np.stack(parts), axis=0)


def bloom_probe(packed: np.ndarray, texts: list[str]) -> np.ndarray:
    """(n,) bool: True iff ALL k positions are set (possible member)."""
    bits = np.unpackbits(packed).astype(bool)
    if not texts:
        return np.zeros(0, dtype=bool)
    return bits[_bloom_positions(texts)].all(axis=1)


# ---------------------------------------------------------------------
# q-digest quantile sketch (Shrivastava, Buragohain, Agrawal & Suri,
# SenSys 2004): fixed-universe [0, 2^QD_BITS) binary trie with node
# counts, compressed so every stored triple (node, sibling, parent)
# carries >= n/sigma mass — size O(sigma * log U) regardless of n,
# counters mergeable by addition + recompress, and any quantile query
# answers within rank error log2(U) * n / sigma. Deterministic by
# construction: compression walks levels bottom-up and nodes in
# ascending id order; the quantile walk orders nodes by (interval
# right edge, interval left edge). Node v covers an interval via
# binary-heap numbering: root 1 covers the whole universe, children
# 2v / 2v+1 halve it; leaf for value x is U + x.
# ---------------------------------------------------------------------

QD_BITS = 12
QD_UNIVERSE = 1 << QD_BITS


def _qd_interval(v: int) -> tuple[int, int]:
    """[lo, hi] covered by node v (inclusive)."""
    level = v.bit_length() - 1
    span = QD_UNIVERSE >> level
    lo = (v - (1 << level)) * span
    return lo, lo + span - 1


def qdigest_compress(d: dict, n: int, sigma: int) -> dict:
    thr = max(1, n // sigma)
    for level in range(QD_BITS, 0, -1):
        lo_id, hi_id = 1 << level, 1 << (level + 1)
        for u in range(lo_id // 2, hi_id // 2):
            cl, cr = d.get(2 * u, 0), d.get(2 * u + 1, 0)
            if cl == 0 and cr == 0:
                continue
            if cl + cr + d.get(u, 0) < thr:
                d[u] = d.get(u, 0) + cl + cr
                d.pop(2 * u, None)
                d.pop(2 * u + 1, None)
    return d


def qdigest_build(values: np.ndarray, counts: np.ndarray, sigma: int = 64) -> tuple[dict, int]:
    """Digest from a (value, count) histogram; returns (digest, n)."""
    d = {int(QD_UNIVERSE + v): int(c) for v, c in zip(values, counts)}
    n = int(np.sum(counts))
    return qdigest_compress(d, n, sigma), n


def qdigest_merge(a: tuple[dict, int], b: tuple[dict, int], sigma: int = 64) -> tuple[dict, int]:
    d = dict(a[0])
    for k, v in b[0].items():
        d[k] = d.get(k, 0) + v
    n = a[1] + b[1]
    return qdigest_compress(d, n, sigma), n


def qdigest_quantile(dn: tuple[dict, int], q_num: int, q_den: int) -> int:
    """Value whose estimated rank first reaches ceil(q·n): walk stored
    nodes ordered by (hi, lo) accumulating counts — the canonical
    postorder. Rank error <= QD_BITS * n // sigma by the digest
    property."""
    d, n = dn
    target = (q_num * n + q_den - 1) // q_den
    nodes = sorted(d.items(), key=lambda kv: _qd_interval(kv[0])[::-1])
    cum = 0
    for v, c in nodes:
        cum += c
        if cum >= target:
            return _qd_interval(v)[1]
    return QD_UNIVERSE - 1


def qdigest_size(dn: tuple[dict, int]) -> int:
    return len(dn[0])
