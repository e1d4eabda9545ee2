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


def test_lance_roundtrip_when_available(ray_session, tmp_path):
    """The input_hint names Lance tables; the env lacks the library so
    the branch is normally dead (store.py HAVE_LANCE). This gate lights
    up the moment the env gains `lance`: a .lance write/read round trip
    through the same read_table/write_table seam, column pruning
    included. Skips (not passes) when lance is absent."""
    pytest.importorskip("lance")
    import pyarrow as pa
    import ray.data

    from crawlerframework_ray.sources.store import HAVE_LANCE, read_table, write_table

    assert HAVE_LANCE
    tbl = pa.table({
        "image_id": pa.array([f"id{i}" for i in range(100)], pa.string()),
        "w": pa.array(list(range(100)), pa.int32()),
        "caption": pa.array([f"cap {i}" for i in range(100)], pa.string()),
    })
    path = str(tmp_path / "t.lance")
    write_table(ray.data.from_arrow(tbl), path)
    got = read_table(path, columns=["image_id", "w"]).to_pandas().sort_values("image_id")
    assert list(got.columns) == ["image_id", "w"]
    assert len(got) == 100
