"""Distributed prefix-sum (scan) and greedy sequence packing.

Training-data prep packs documents into fixed-token-budget bins
(sequence packing): in its contiguous/greedy form, a document's bin is
``floor(exclusive_prefix_sum(n_tokens) / budget)`` over a canonical
document order — a global SCAN, the one aggregation shape that is
inherently order-dependent. The distributed form here is the textbook
two-phase scan, expressed in Ray Data:

1. rows are hash-free RANGE-partitioned by the canonical key
   (``range_id = key // range_width`` — deterministic, independent of
   block boundaries, so pass 1 and pass 2 agree on the partitioning);
2. pass 1: per-range token totals (one tiny row per range);
3. the driver computes exclusive prefix offsets over the sorted range
   totals (O(n_ranges), bounded — ranges are sized so this table is
   thousands of rows at 100 TB, not millions);
4. pass 2: ``groupby(range_id).map_groups`` computes the within-range
   cumulative sum and adds the range's offset.

One bounded shuffle; every heavy step is per-range parallel.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def packed_bins(ds, key: str, weight: str, budget: int, range_width: int = 4096,
                carry: list[str] | None = None):
    """Assign each row a ``bin_id`` = exclusive-prefix-sum(weight) //
    budget over rows ordered by ``key`` (int). Returns a Dataset of
    (key, weight, *carry, bin_id); ``carry`` columns ride along
    untouched (e.g. a string id whose order-preserving int surrogate
    is the scan key)."""

    def add_range(t: pa.Table) -> pa.Table:
        k = t.column(key)
        if pa.types.is_integer(k.type):
            # exact int division (trunc — monotone in key, which is all the
            # range partition needs); the float path loses precision past
            # 2^53 and pyarrow refuses the cast for full-range int64 keys
            rid = pa.compute.cast(pa.compute.divide(k, range_width), pa.int64())
        else:
            rid = pa.compute.cast(
                pa.compute.floor(
                    pa.compute.divide(pa.compute.cast(k, pa.float64()), float(range_width))
                ),
                pa.int64(),
            )
        return t.append_column("__range", rid)

    ranged = ds.map_batches(add_range, batch_format="pyarrow")

    # pass 1: per-range totals — small enough to bring to the driver
    # (one partial row per range per block)
    def partial_totals(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"__range": t.column("__range").to_numpy(), "total": t.column(weight).to_numpy()}
        ).groupby("__range", as_index=False)["total"].sum()
        return pa.table(
            {"__range": pa.array(df["__range"], pa.int64()),
             "total": pa.array(df["total"].astype("int64"), pa.int64())}
        )

    totals = ranged.map_batches(partial_totals, batch_format="pyarrow").to_pandas()
    per_range = totals.groupby("__range")["total"].sum().sort_index()
    offsets = per_range.cumsum().shift(fill_value=0).to_dict()  # exclusive

    def within_range(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(key)
        excl = g[weight].cumsum().shift(fill_value=0) + offsets[int(g["__range"].iloc[0])]
        out = g[[key, weight] + list(carry or [])].copy()
        out["bin_id"] = (excl // budget).astype("int64")
        return out

    return ranged.groupby("__range").map_groups(within_range, batch_format="pandas")


def pps_systematic(ds, key: str, weight: str, step: int, range_width: int = 4096):
    """Madow's SYSTEMATIC PPS SAMPLING (probability proportional to
    size): lay the rows out on the cumulative-weight line in canonical
    ``key`` order and select every row whose interval
    ``[excl_prefix, excl_prefix + weight)`` contains a multiple of
    ``step`` — each row is drawn with probability ∝ its weight, the
    sample size is ``total_weight // step`` exactly, and the draw is
    RNG-free (retry/partition invariant). Same two-phase distributed
    scan as ``packed_bins``; returns the SELECTED rows as
    (key, weight, n_hits) where ``n_hits`` ≥ 2 flags rows heavier than
    ``step`` (they would be sampled with multiplicity — the standard
    PPS certainty-unit signal)."""

    def add_range(t: pa.Table) -> pa.Table:
        rid = pa.compute.cast(
            pa.compute.divide(t.column(key), range_width), pa.int64()
        )
        return t.append_column("__range", rid)

    ranged = ds.map_batches(add_range, batch_format="pyarrow")

    def partial_totals(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"__range": t.column("__range").to_numpy(), "total": t.column(weight).to_numpy()}
        ).groupby("__range", as_index=False)["total"].sum()
        return pa.table(
            {"__range": pa.array(df["__range"], pa.int64()),
             "total": pa.array(df["total"].astype("int64"), pa.int64())}
        )

    totals = ranged.map_batches(partial_totals, batch_format="pyarrow").to_pandas()
    per_range = totals.groupby("__range")["total"].sum().sort_index()
    offsets = per_range.cumsum().shift(fill_value=0).to_dict()  # exclusive

    def within_range(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(key)
        excl = (g[weight].cumsum().shift(fill_value=0)
                + offsets[int(g["__range"].iloc[0])]).astype("int64")
        hits = ((excl + g[weight]) // step - excl // step).astype("int64")
        out = g[[key, weight]].copy()
        out["n_hits"] = hits
        return out[out["n_hits"] > 0]

    return ranged.groupby("__range").map_groups(within_range, batch_format="pandas")
