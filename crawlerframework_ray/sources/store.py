"""Table layer: dataset read/write behind one seam (SURVEY.md §7.0).

``input_hint`` names Lance tables; ``lance`` is not installed in this
environment, so the default codec is Parquet via
``ray.data.read_parquet`` / ``write_parquet``, with a Lance codepath
auto-enabled when ``lance``/``pylance`` is importable. Writes are
atomic (temp dir + rename) and partition-per-key so a failed run can
skip finished partitions — the "resumable output" contract.
"""

from __future__ import annotations

import os
import shutil
import uuid

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

try:  # pragma: no cover - not installed in this sandbox
    import lance  # noqa: F401

    HAVE_LANCE = True
except ImportError:
    HAVE_LANCE = False


def read_table(path: str, *, columns: list[str] | None = None, **kwargs) -> ray.data.Dataset:
    """Read a dataset directory/file. Always pass ``columns`` when the
    consumer needs a subset — pruning happens at the read."""
    if HAVE_LANCE and path.endswith(".lance"):
        return ray.data.read_lance(path, columns=columns, **kwargs)
    return ray.data.read_parquet(path, columns=columns, **kwargs)


def write_table(ds: ray.data.Dataset, path: str, **kwargs) -> None:
    """Atomic dataset write: write to a sibling temp dir, then rename
    into place. A partial write never appears at ``path``."""
    tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
    try:
        if HAVE_LANCE and path.endswith(".lance"):  # pragma: no cover
            ds.write_lance(tmp, **kwargs)
        else:
            ds.write_parquet(tmp, **kwargs)
        if not os.path.exists(tmp):
            # write_parquet emits nothing for an empty dataset; persist an
            # explicit zero-row file so the directory stays readable
            os.makedirs(tmp)
            schema = ds.schema(fetch_if_missing=False)
            arrow_schema = getattr(schema, "base_schema", None) if schema else None
            if arrow_schema is None:
                arrow_schema = pa.schema([])
            pq.write_table(arrow_schema.empty_table(), os.path.join(tmp, "empty.parquet"))
        if os.path.exists(path):
            shutil.rmtree(path)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            shutil.rmtree(tmp, ignore_errors=True)


def compact_table(src: str, dst: str, target_rows_per_file: int = 1 << 20) -> dict:
    """Small-file compaction: stream-read a parquet directory (e.g. the
    crawl store's per-fetch-task content-addressed parts, which at
    production scale accumulate thousands of small files per epoch) and
    rewrite it with ~``target_rows_per_file`` rows per output file.
    Content-preserving by construction — the row MULTISET is identical,
    only the file layout changes (row order across files is not part of
    the store's contract; every consumer reads the directory as a set).

    Distributed end to end: the read streams blocks, ``repartition``
    uses Ray's shuffle-free block splitting/coalescing (no all-to-all —
    blocks are split or concatenated, never hashed), and the write is
    atomic via ``write_table``. Returns {files_before, files_after,
    n_rows} so maintenance jobs can log the reclaim.

    Reference analogue: the relational sink's periodic OPTIMIZE/vacuum
    duty the reference delegated to its database (crawlerdb.py bulk
    tables); Lance datasets get the same via ``compact_files`` when the
    lance codepath is active.
    """

    def _n_files(p: str) -> int:
        return sum(1 for f in os.listdir(p) if f.endswith(".parquet"))

    ds = read_table(src)
    n_rows = ds.count()
    n_out = max(1, (n_rows + target_rows_per_file - 1) // target_rows_per_file)
    write_table(read_table(src).repartition(n_out), dst)
    return {
        "files_before": _n_files(src),
        "files_after": _n_files(dst),
        "n_rows": n_rows,
    }


def write_arrow(table: pa.Table, path: str) -> None:
    """Atomic single-file parquet write for small driver-side tables
    (frontier snapshots, manifests' sidecar tables)."""
    tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
    pq.write_table(table, tmp)
    os.replace(tmp, path)


def read_arrow(path: str, columns: list[str] | None = None) -> pa.Table:
    return pq.read_table(path, columns=columns)
