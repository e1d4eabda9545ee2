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
