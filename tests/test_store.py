"""Table-layer gates: atomic writes and small-file compaction
(sources/store.py) — the resumable-output maintenance surface."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

from crawlerframework_ray.sources.store import compact_table, read_table, write_table

SF = "/root/testdata/sf0.001"


def _frame(path: str) -> pd.DataFrame:
    df = pq.read_table(path).to_pandas()
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def test_compaction_preserves_rows_and_shrinks_files(ray_session, tmp_path):
    import ray.data

    src = str(tmp_path / "fragmented")
    dst = str(tmp_path / "compacted")
    # a deliberately fragmented store: 32 small files for 500 rows
    write_table(
        ray.data.read_parquet(f"{SF}/documents.parquet").repartition(32), src
    )
    files_before = sum(1 for f in os.listdir(src) if f.endswith(".parquet"))
    assert files_before >= 16  # genuinely fragmented

    stats = compact_table(src, dst, target_rows_per_file=256)

    assert stats["files_before"] == files_before
    assert stats["files_after"] == 2  # ceil(500/256)
    assert stats["n_rows"] == 500
    # content-preserving: identical row multiset, layout-independent
    pd.testing.assert_frame_equal(_frame(src), _frame(dst))


def test_compaction_empty_dir_roundtrip(ray_session, tmp_path):
    import ray.data

    src = str(tmp_path / "empty-src")
    write_table(
        ray.data.read_parquet(f"{SF}/documents.parquet").filter(
            lambda r: False
        ),
        src,
    )
    dst = str(tmp_path / "empty-dst")
    stats = compact_table(src, dst, target_rows_per_file=256)
    assert stats["n_rows"] == 0
    assert read_table(dst).count() == 0
