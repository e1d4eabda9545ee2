"""High-cardinality grouped aggregation.

``Dataset.groupby(key).aggregate(...)`` / ``map_groups`` pay per-GROUP
Python overhead — fine for tens of groups, pathological for 10^5+ keys
(measured: 146 s for a 600k-row Sum over 147k keys on this Ray
version). The scalable form keeps the shuffle (co-location) but drops
the per-key dispatch: hash the key columns into ``n_buckets`` bucket
ids, ``groupby(bucket)`` — a bounded-cardinality shuffle — and run ONE
vectorized ``pandas.groupby`` per bucket.

Combine with a per-batch partial aggregate upstream so the shuffle
moves partial rows, not raw rows. Size ``n_buckets`` so the largest
bucket (~distinct_keys/n_buckets) fits a worker heap; skew in KEY
frequency is already absorbed by the partial aggregate (one row per
key per batch).
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd
import pyarrow as pa

N_AGG_BUCKETS = 64


def bucketed_group_agg(
    ds,
    keys: list[str],
    agg_fn: Callable[[pd.DataFrame], pd.DataFrame],
    n_buckets: int = N_AGG_BUCKETS,
):
    """``agg_fn`` receives all rows of one bucket (every key fully
    co-located) and must return the aggregated frame for those keys —
    typically ``g.groupby(keys, as_index=False).agg(...)``."""

    def add_bucket(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        df["__bucket"] = (
            pd.util.hash_pandas_object(df[keys], index=False).to_numpy() % n_buckets
        ).astype(np.int64)
        return df

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        return agg_fn(g.drop(columns="__bucket"))

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(reduce, batch_format="pandas")
    )
