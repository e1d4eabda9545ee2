"""Join strategies (SURVEY.md §2.4 — the reference had only row-loop
point lookups against Postgres; these are their distributed forms).

- ``broadcast_join``: small side shipped ONCE via ``ray.put`` (a dict),
  looked up vectorized inside ``map_batches`` — no shuffle (J1/J3).
- ``hash_join``: both sides large. The portable partitioned hash join:
  pad both sides to one schema with a side tag and a ``bucket =
  hash(key) % B`` column, union, ``groupby(bucket)`` (ONE shuffle
  co-locating matching keys), and ONE vectorized ``pandas.merge`` per
  bucket — never a Python call per key.
- ``asof_join``: per-bucket ``pd.merge_asof`` with ``by=key`` (J5's
  "compare against the latest prior state" pattern), vectorized across
  all keys in the bucket.

Bucket count B bounds per-task memory: size B so the largest bucket
(~rows/B, plus skew) fits a worker heap. A hot key still lands in one
bucket; salt it (key → key#s replicated s ways on the build side) when
a single key's row count exceeds a block.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

N_JOIN_BUCKETS = 32


def broadcast_join(ds, small_df: pd.DataFrame, key: str, add_columns: list[str],
                   batch_format: str = "pyarrow"):
    """Left join ``ds`` against a small pandas table on ``key``,
    appending ``add_columns``. Ships the small side once."""
    ref = ray.put(small_df[[key] + add_columns].reset_index(drop=True))

    def fn(batch: pa.Table) -> pa.Table:
        lk = ray.get(ref)
        # vectorized left merge of the key column against the broadcast
        # frame (no per-row dict.get loop)
        kdf = pd.DataFrame({key: batch.column(key).to_pandas()})
        joined = kdf.merge(lk, on=key, how="left")
        for col in add_columns:
            batch = batch.append_column(col, pa.Array.from_pandas(joined[col]))
        return batch

    return ds.map_batches(fn, batch_format=batch_format)


def _bucket_of(keys: pd.Series, n_buckets: int) -> np.ndarray:
    return (pd.util.hash_array(keys.to_numpy()) % n_buckets).astype(np.int64)


def _pad(df: pd.DataFrame, all_cols: list[str], side: str, key: str, n_buckets: int) -> pd.DataFrame:
    out = df.copy()
    for c in all_cols:
        if c not in out.columns:
            out[c] = None
    out["__side"] = side
    out["__bucket"] = _bucket_of(out[key], n_buckets)
    return out[all_cols + ["__side", "__bucket"]]


def _salt_of(df: pd.DataFrame, n_salts: int) -> np.ndarray:
    """Deterministic content-derived salt for probe-side rows: hash of
    the whole row tuple mod ``n_salts`` — independent of block
    boundaries, so a retried/re-partitioned run salts identically.
    (Literal duplicate rows share a salt; acceptable — the skew being
    split is one KEY's many distinct rows.)"""
    return (pd.util.hash_pandas_object(df, index=False).to_numpy() % n_salts).astype(np.int64)


def hash_join(left, right, key: str, left_cols: list[str], right_cols: list[str],
              how: str = "inner", n_buckets: int = N_JOIN_BUCKETS,
              n_salts: int = 1):
    """Partitioned hash join of two Datasets on ``key``. ``left_cols``/
    ``right_cols`` are the output columns taken from each side (key
    included implicitly).

    ``n_salts`` > 1 enables HOT-KEY SALTING (survey §7.3): the probe
    (left) side's rows spread over ``n_salts`` sub-buckets per key by a
    content-derived salt, and the build (right) side is replicated to
    every salt — so a key holding half the probe rows occupies
    ``n_salts`` tasks instead of one, with per-task peak rows bounded
    by ~hot/(n_salts). Build-side replication keeps every probe row's
    full match set in its own bucket, which preserves inner/left
    semantics exactly (asserted; a right/outer join would duplicate
    unmatched build rows)."""
    if n_salts > 1:
        assert how in ("inner", "left"), "salting preserves only inner/left joins"
    lcols = [key] + [c for c in left_cols if c != key]
    rcols = [key] + [c for c in right_cols if c != key]
    all_cols = lcols + [c for c in rcols if c not in lcols]

    def pad_l(t: pa.Table) -> pd.DataFrame:
        df = _pad(t.select(lcols).to_pandas(), all_cols, "l", key, n_buckets)
        if n_salts > 1:
            df["__bucket"] = df["__bucket"] * n_salts + _salt_of(df[lcols], n_salts)
        return df

    def pad_r(t: pa.Table) -> pd.DataFrame:
        df = _pad(t.select(rcols).to_pandas(), all_cols, "r", key, n_buckets)
        if n_salts > 1:
            df = df.loc[df.index.repeat(n_salts)].reset_index(drop=True)
            salts = np.tile(np.arange(n_salts, dtype=np.int64), len(df) // n_salts)
            df["__bucket"] = df["__bucket"] * n_salts + salts
        return df

    lt = left.map_batches(pad_l, batch_format="pyarrow")
    rt = right.map_batches(pad_r, batch_format="pyarrow")
    unioned = lt.union(rt)

    lval = [c for c in lcols if c != key]
    rval = [c for c in rcols if c != key]

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["__side"] == "l"][[key] + lval]
        rg = g[g["__side"] == "r"][[key] + rval]
        return lg.merge(rg, on=key, how=how)

    return unioned.groupby("__bucket").map_groups(merge_bucket, batch_format="pandas")


def asof_join(left, right, key: str, left_ts: str, right_ts: str,
              left_cols: list[str], right_value: str, out_name: str,
              n_buckets: int = N_JOIN_BUCKETS):
    """For each left row, attach max(right_ts) ≤ left_ts within the same
    key (the classic as-of). One groupby(bucket) shuffle + one
    ``pd.merge_asof(by=key)`` per bucket — vectorized across every key
    in the bucket. ``right_value`` must equal ``right_ts`` or be
    deterministic per (key, right_ts)."""
    lcols = [key, left_ts] + [c for c in left_cols if c not in (key, left_ts)]
    all_cols = lcols + ["__rts"]

    lt = left.map_batches(
        lambda t: _pad(t.select(lcols).to_pandas(), all_cols, "l", key, n_buckets),
        batch_format="pyarrow",
    )
    rt = right.map_batches(
        lambda t: _pad(
            t.select([key, right_ts]).to_pandas().rename(columns={right_ts: "__rts"}),
            all_cols, "r", key, n_buckets,
        ),
        batch_format="pyarrow",
    )
    unioned = lt.union(rt)

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["__side"] == "l"][lcols]
        rg = g[g["__side"] == "r"][[key, "__rts"]].dropna(subset=["__rts"])
        lg = lg.assign(**{left_ts: pd.to_datetime(lg[left_ts]).astype("datetime64[us]")})
        rg = rg.assign(__rts=pd.to_datetime(rg["__rts"]).astype("datetime64[us]"))
        lg = lg.sort_values(left_ts, kind="mergesort")
        rg = rg.sort_values("__rts", kind="mergesort")
        return pd.merge_asof(
            lg, rg.rename(columns={"__rts": out_name}),
            left_on=left_ts, right_on=out_name, by=key,
        )

    return unioned.groupby("__bucket").map_groups(merge_bucket, batch_format="pandas")


def range_join(left, right, key: str, left_ts: str, right_ts: str,
               left_cols: list[str], right_cols: list[str],
               lower, upper, n_buckets: int = N_JOIN_BUCKETS):
    """Interval join: every (left, right) pair sharing ``key`` with
    ``left_ts + lower <= right_ts <= left_ts + upper`` (an operator the
    reference expressed as per-entity time-window scans, e.g. the
    review-window re-checks around a post's timestamp). One
    groupby(bucket) shuffle; inside each bucket the expansion is
    vectorized: right rows sorted by (key, ts), each left row's window
    located with two ``searchsorted`` calls on the (key, ts) composite,
    pairs materialized with ``np.repeat``/concatenated ranges — no
    per-key Python loop, no cross join. Skew bound: a hot key expands
    only within its bucket; cap with a pre-aggregated window count if a
    single key's fan-out exceeds worker memory. Keys must be integral
    (hash string keys upstream) — the window search packs (key, ts)
    into a 16-byte memcmp-ordered composite."""
    import numpy as np

    lval = [c for c in left_cols if c not in (key, left_ts)]
    rval = [c for c in right_cols if c not in (key, right_ts)]
    lcols = [key, left_ts] + lval
    all_cols = lcols + ["__rts"] + rval

    lt = left.map_batches(
        lambda t: _pad(t.select(lcols).to_pandas(), all_cols, "l", key, n_buckets),
        batch_format="pyarrow",
    )
    rt = right.map_batches(
        lambda t: _pad(
            t.select([key, right_ts] + rval).to_pandas().rename(columns={right_ts: "__rts"}),
            all_cols, "r", key, n_buckets,
        ),
        batch_format="pyarrow",
    )
    unioned = lt.union(rt)
    lo_off = pd.Timedelta(lower)
    hi_off = pd.Timedelta(upper)

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["__side"] == "l"][lcols]
        rg = g[g["__side"] == "r"][[key, "__rts"] + rval].dropna(subset=["__rts"])
        lg = lg.assign(**{left_ts: pd.to_datetime(lg[left_ts]).astype("datetime64[us]")})
        rg = rg.assign(__rts=pd.to_datetime(rg["__rts"]).astype("datetime64[us]"))
        if lg.empty or rg.empty:
            # schema-stable empty output (NaN padding upstream makes
            # right value columns float — callers re-cast keys)
            out = lg.head(0).copy()
            out[right_ts] = pd.Series([], dtype="datetime64[us]")
            for c in rval:
                out[c] = pd.Series([], dtype=rg[c].dtype if len(rg.columns) else "float64")
            return out
        # composite order (key, ts): windows resolve inside key segments
        rg = rg.sort_values([key, "__rts"], kind="mergesort").reset_index(drop=True)
        rkeys = rg[key].to_numpy()
        rts = rg["__rts"].to_numpy()
        lkeys = lg[key].to_numpy()
        lts = lg[left_ts].to_numpy()
        # searchsorted on the composite: positions of (k, t±off) bounds
        lo = _composite_searchsorted(rkeys, rts, lkeys, lts + np.timedelta64(lo_off), "left")
        hi = _composite_searchsorted(rkeys, rts, lkeys, lts + np.timedelta64(hi_off), "right")
        counts = hi - lo
        li = np.repeat(np.arange(len(lg)), counts)
        ri = np.concatenate([np.arange(a, b) for a, b in zip(lo, hi)]) if counts.sum() else np.array([], dtype=np.int64)
        out = lg.iloc[li].reset_index(drop=True)
        out[right_ts] = rts[ri] if len(ri) else pd.Series([], dtype="datetime64[us]")
        for c in rval:
            out[c] = rg[c].to_numpy()[ri] if len(ri) else pd.Series([], dtype=rg[c].dtype)
        return out

    return unioned.groupby("__bucket").map_groups(merge_bucket, batch_format="pandas")


def _composite_searchsorted(rkeys, rts, lkeys, lbounds, side: str):
    """Positions of (key, bound) in the (rkeys, rts) composite order —
    ONE vectorized ``np.searchsorted`` over a 16-byte big-endian
    (key, ts) encoding whose memcmp order equals the lexicographic
    order (both halves biased to non-negative first)."""
    import numpy as np

    rts_i = rts.astype("datetime64[us]").view("i8")
    lb_i = lbounds.astype("datetime64[us]").view("i8")
    kmin = min(rkeys.min(), lkeys.min()) if len(rkeys) and len(lkeys) else 0
    tmin = min(rts_i.min(), lb_i.min()) if len(rts_i) and len(lb_i) else 0

    def pack(keys, ts):
        n = len(keys)
        buf = np.empty((n, 16), np.uint8)
        buf[:, :8] = (keys - kmin).astype(">i8").view(np.uint8).reshape(n, 8)
        buf[:, 8:] = (ts - tmin).astype(">i8").view(np.uint8).reshape(n, 8)
        return buf.reshape(-1).view("V16")

    return np.searchsorted(pack(np.asarray(rkeys, np.int64), rts_i),
                           pack(np.asarray(lkeys, np.int64), lb_i), side=side)


def anti_join(left, right, key: str, left_cols: list[str],
              n_buckets: int = N_JOIN_BUCKETS):
    """Partitioned anti-join: rows of ``left`` whose ``key`` has NO
    match in ``right`` (the NOT EXISTS / EXCEPT-by-key form the
    reference expressed as per-row Postgres point lookups). Same
    one-shuffle pad/union/groupby(bucket) shape as :func:`hash_join`;
    the build side ships only its distinct keys per batch (a per-batch
    combiner — the shuffle never moves build payload columns)."""
    lcols = [key] + [c for c in left_cols if c != key]
    all_cols = lcols

    lt = left.map_batches(
        lambda t: _pad(t.select(lcols).to_pandas(), all_cols, "l", key, n_buckets),
        batch_format="pyarrow",
    )
    rt = right.map_batches(
        lambda t: _pad(
            t.select([key]).to_pandas().drop_duplicates(), all_cols, "r", key, n_buckets
        ),
        batch_format="pyarrow",
    )
    unioned = lt.union(rt)

    def filter_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["__side"] == "l"][lcols]
        seen = g.loc[g["__side"] == "r", key].unique()
        return lg[~lg[key].isin(seen)]

    return unioned.groupby("__bucket").map_groups(filter_bucket, batch_format="pandas")
