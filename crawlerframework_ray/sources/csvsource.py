"""Filesystem/CSV source with parent/child path linking (operators
S9 + J6, SURVEY.md §2.1/§2.4).

The reference read directories of CSVs row-by-row into page dicts and
resolved each row's ``parent_id`` into a root→leaf ``path`` via an
in-memory ``parent_hashes`` map (crawler/connectors/
filesystemconnector.py:44-89,62-73). Here:

- ingestion is ``ray.data.read_csv`` over the directory;
- parent resolution is a hash self-join (stages/joins.hash_join) on
  ``parent_id = id`` — distributed, not a driver-side dict;
- ``path`` is built as ``parent_id.id`` (the synthetic hierarchy is
  two-level; deeper trees iterate the join, one round per level).
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import ray.data

from ..stages.joins import hash_join


def export_events_csv(sf_dir: str, out_dir: str, n_files: int = 4) -> str:
    """Deterministically derive a CSV directory from the events table:
    id, parent_id (decade root; roots have none), label. Used by tests
    and the catalog query so the DuckDB oracle can recompute the same
    rows straight from the events parquet."""
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    t = pq.read_table(f"{sf_dir}/events.parquet", columns=["event_id", "event_type"])
    df = t.to_pandas().sort_values("event_id")
    df["id"] = df.pop("event_id")
    df["parent_id"] = (df["id"] // 10) * 10
    df.loc[df["id"] % 10 == 0, "parent_id"] = -1  # roots
    df["label"] = df.pop("event_type")
    df = df[["id", "parent_id", "label"]]
    rows_per = (len(df) + n_files - 1) // n_files
    for i in range(n_files):
        part = df.iloc[i * rows_per : (i + 1) * rows_per]
        part.to_csv(os.path.join(out_dir, f"part-{i:02d}.csv"), index=False)
    return out_dir


def read_csv_with_paths(csv_dir: str) -> ray.data.Dataset:
    """CSV directory → rows with resolved parent labels and path."""
    ds = ray.data.read_csv(csv_dir)
    parents = ds.map_batches(
        lambda t: t.select(["id", "label"]).rename_columns(["parent_id", "parent_label"]),
        batch_format="pyarrow",
    )
    joined = hash_join(
        ds, parents, "parent_id", ["id", "label"], ["parent_label"], how="left"
    )

    def add_path(df: pd.DataFrame) -> pd.DataFrame:
        root = df["parent_id"] < 0
        df["path"] = df["parent_id"].astype("int64").astype(str) + "." + df["id"].astype("int64").astype(str)
        df.loc[root, "path"] = df.loc[root, "id"].astype("int64").astype(str)
        df.loc[root, "parent_label"] = None
        return df[["id", "parent_id", "label", "parent_label", "path"]]

    return joined.map_batches(add_path, batch_format="pandas")
