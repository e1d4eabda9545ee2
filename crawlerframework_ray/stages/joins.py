"""Join strategies (SURVEY.md §2.4 — the reference had only row-loop
point lookups against Postgres; these are their distributed forms).

- ``broadcast_join``: small side shipped ONCE via ``ray.put`` (a dict),
  looked up vectorized inside ``map_batches`` — no shuffle (J1/J3).
- ``hash_join``: both sides large. The portable partitioned hash join:
  pad both sides to one schema with a side tag, union, ``groupby(key)``
  (ONE shuffle co-locates matching keys), and merge within each group.
- ``asof_join``: sort-merge within key groups via ``pd.merge_asof``
  (J5's "compare against the latest prior state" pattern).

Skew note: a hot key lands in one group; salt it (key → key#s on the
build side replicated s ways) when a key's row count exceeds a block.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray


def broadcast_join(ds, small_df: pd.DataFrame, key: str, add_columns: list[str],
                   batch_format: str = "pyarrow"):
    """Left join ``ds`` against a small pandas table on ``key``,
    appending ``add_columns``. Ships the small side once."""
    lookup = {k: tuple(v) for k, v in zip(small_df[key], small_df[add_columns].itertuples(index=False))}
    ref = ray.put(lookup)

    def fn(batch: pa.Table) -> pa.Table:
        lk = ray.get(ref)
        keys = batch.column(key).to_pylist()
        rows = [lk.get(x) for x in keys]
        for j, col in enumerate(add_columns):
            batch = batch.append_column(col, pa.array([r[j] if r else None for r in rows]))
        return batch

    return ds.map_batches(fn, batch_format=batch_format)


def _pad(df: pd.DataFrame, all_cols: list[str], side: str) -> pd.DataFrame:
    out = df.copy()
    for c in all_cols:
        if c not in out.columns:
            out[c] = None
    out["__side"] = side
    return out[all_cols + ["__side"]]


def hash_join(left, right, key: str, left_cols: list[str], right_cols: list[str],
              how: str = "inner"):
    """Partitioned hash join of two Datasets on ``key``. ``left_cols``/
    ``right_cols`` are the output columns taken from each side (key
    included implicitly). Returns a Dataset with key + both column sets.
    One groupby shuffle; each group merges in pandas."""
    lcols = [key] + [c for c in left_cols if c != key]
    rcols = [key] + [c for c in right_cols if c != key]
    all_cols = lcols + [c for c in rcols if c not in lcols]

    lt = left.map_batches(
        lambda t: _pad(t.select(lcols).to_pandas(), all_cols, "l"), batch_format="pyarrow"
    )
    rt = right.map_batches(
        lambda t: _pad(t.select(rcols).to_pandas(), all_cols, "r"), batch_format="pyarrow"
    )
    unioned = lt.union(rt)

    lval = [c for c in lcols if c != key]
    rval = [c for c in rcols if c != key]

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["__side"] == "l"][[key] + lval]
        rg = g[g["__side"] == "r"][[key] + rval]
        return lg.merge(rg, on=key, how=how)

    return unioned.groupby(key).map_groups(merge, batch_format="pandas")


def asof_join(left, right, key: str, left_ts: str, right_ts: str,
              left_cols: list[str], right_value: str, out_name: str):
    """For each left row, attach max(right_ts) ≤ left_ts within the same
    key (the classic as-of). Implemented as one groupby(key) shuffle +
    ``pd.merge_asof`` per group. ``right_value`` must equal ``right_ts``
    or be deterministic per (key, right_ts)."""
    lcols = [key, left_ts] + [c for c in left_cols if c not in (key, left_ts)]
    all_cols = lcols + ["__rts"]

    lt = left.map_batches(lambda t: _pad(t.select(lcols).to_pandas(), all_cols, "l"),
                          batch_format="pyarrow")
    rt = right.map_batches(
        lambda t: _pad(
            t.select([key, right_ts]).to_pandas().rename(columns={right_ts: "__rts"}),
            all_cols, "r",
        ),
        batch_format="pyarrow",
    )
    unioned = lt.union(rt)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["__side"] == "l"][lcols].sort_values(left_ts, kind="mergesort")
        rg = g[g["__side"] == "r"][[key, "__rts"]].dropna(subset=["__rts"]).sort_values("__rts", kind="mergesort")
        lg[left_ts] = pd.to_datetime(lg[left_ts]).astype("datetime64[us]")
        rg["__rts"] = pd.to_datetime(rg["__rts"]).astype("datetime64[us]")
        merged = pd.merge_asof(lg, rg.rename(columns={"__rts": out_name}),
                               left_on=left_ts, right_on=out_name, by=key)
        return merged

    return unioned.groupby(key).map_groups(merge, batch_format="pandas")
