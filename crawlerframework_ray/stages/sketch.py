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

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("col")
        .map_groups(finalize, batch_format="pandas")
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

    1. per-batch MG summaries → driver merge (≤ slots entries live at
       any point — constant driver state, like the HLL registers);
    2. the candidate set is broadcast and EXACTLY recounted in one
       map_batches pass (counts only candidate terms), then top-k by
       (cnt DESC, term ASC).

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

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=8192).to_pandas()
    decrements = int(parts.loc[parts["term"] == "\x00dec", "w"].sum())
    merged = parts[parts["term"] != "\x00dec"].groupby("term")["w"].sum()
    # merged MG: re-prune to `slots` (merge of MG summaries is MG)
    if len(merged) > slots:
        cut = int(merged.sort_values(ascending=False).iloc[slots])
        decrements += cut
        merged = merged[merged > cut] - cut
    cand = sorted(merged.index.tolist())
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
        ds.map_batches(recount, batch_format="pyarrow", batch_size=8192)
        .to_pandas()
        .groupby("term", as_index=False)["cnt"].sum()
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
