"""Incremental re-crawl / content-change detection (T5 + D4 + J4).

The reference's session_info 'review' genre kept a per-entity content
hash; on re-crawl, ``checkSessionInfoReview`` skipped unchanged posts
and ``updateSessionInfoReview`` recorded changes
(crawler/utils/sessioninfomanager.py:56-86), with version modes on the
posts table (baseconnector.py:777-809): update-in-place, versioned
keep-all + is_latest, or append.

Ray-native restatement over a finished crawl's results partitions:

- ``recrawl_changes``: re-fetch the previously-crawled url set (the
  synthetic web takes an ``epoch_salt`` so content genuinely changes
  between 'visits'), hash-join new content hashes against the stored
  ones, and classify every url as unchanged / updated. One partitioned
  hash join — no driver-side diffing.
- ``mark_latest``: resolve the versioned mode across epochs — for every
  url keep all rows but flag the newest epoch's row ``is_latest``
  (grouped, bucketed, vectorized).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data

from ..data.synth import SynthWebConfig, fetch_stitched
from ..functions.hashing import content_hash
from ..stages.agg import bucketed_group_agg
from ..stages.joins import hash_join


def refetch_hashes(urls_ds: ray.data.Dataset, web: SynthWebConfig, salt: int,
                   batch_size: int = 512) -> ray.data.Dataset:
    """Re-fetch a url set against the salted web → (url, new_hash)."""
    salted = SynthWebConfig(**{**web.as_dict(), "seed": web.seed ^ salt})

    def fn(t: pa.Table) -> pa.Table:
        out_h = []
        for u in t.column("url").to_pylist():
            rec, _ = fetch_stitched(u, salted)
            out_h.append(content_hash(rec["image_id"], rec["caption"]).hex())
        return pa.table({"url": t.column("url"), "new_hash": pa.array(out_h, pa.string())})

    return urls_ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


def recrawl_changes(results_dir: str, web: SynthWebConfig, salt: int = 0) -> ray.data.Dataset:
    """Previous results → (url, changed:bool) via a partitioned hash
    join of stored vs re-fetched content hashes. ``salt=0`` re-fetches
    the identical web (everything unchanged — the skip path);
    a nonzero salt models content drift between crawls."""
    prev = ray.data.read_parquet(results_dir, columns=["url", "content_hash"])

    def hex_hash(t: pa.Table) -> pa.Table:
        hs = [h.hex() if h is not None else "" for h in t.column("content_hash").to_pylist()]
        return pa.table({"url": t.column("url"), "old_hash": pa.array(hs, pa.string())})

    prev_h = prev.map_batches(hex_hash, batch_format="pyarrow")
    # distinct url set (a url can be fetched at two priorities)
    prev_h = bucketed_group_agg(
        prev_h, ["url"], lambda g: g.drop_duplicates(subset=["url"], keep="first")
    )
    new_h = refetch_hashes(prev_h.map_batches(lambda t: t.select(["url"]), batch_format="pyarrow"), web, salt)
    joined = hash_join(prev_h, new_h, "url", ["old_hash"], ["new_hash"])

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        df["changed"] = df["old_hash"] != df["new_hash"]
        return df[["url", "changed"]]

    return joined.map_batches(classify, batch_format="pandas")


def mark_latest(results_dir: str) -> ray.data.Dataset:
    """Versioned mode (J4): every (url, priority) keeps all epoch rows;
    the newest epoch's row gets is_latest=True (ties impossible — a
    task id is fetched at most once per epoch)."""
    res = ray.data.read_parquet(results_dir, columns=["url", "priority", "epoch", "content_hash"])

    def latest(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["url", "priority", "epoch"], kind="mergesort")
        last = g.groupby(["url", "priority"], sort=False)["epoch"].transform("max")
        g["is_latest"] = g["epoch"] == last
        return g

    return bucketed_group_agg(res, ["url", "priority"], latest)
