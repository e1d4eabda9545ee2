"""Document importers (operator S10): files-on-disk → text rows.

The reference's textimporter walked a directory, sniffed the format
and pulled plain text out of each file (crawler/utils/
textimporter.py:4-43). The Ray-native shape: ``read_binary_files``
over the directory (one block per file group, bytes stay in workers)
→ a decode ``map_batches`` stage that turns (path, bytes) into
(doc_id, text, n_chars) rows. PDF/DOC parsing libs aren't in this
container; the TXT path is real, other suffixes raise the documented
``NotImplementedError`` contract.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

TEXT_SUFFIXES = (".txt",)


def export_documents_txt(sf_dir: str, out_dir: str) -> str:
    """Materialize the documents table as one .txt file per doc (the
    import fixture — deterministic from the table)."""
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    os.makedirs(out_dir, exist_ok=True)
    for doc_id, text in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
        with open(os.path.join(out_dir, f"doc_{doc_id:06d}.txt"), "w") as f:
            f.write(text)
    return out_dir


def decode_files_batch(batch: dict) -> pa.Table:
    """map_batches (numpy dict in, arrow out): decode binary file rows
    into text rows. doc_id parses from the file name."""
    ids, texts = [], []
    for path, data in zip(batch["path"], batch["bytes"]):
        name = os.path.basename(str(path))
        if not name.endswith(TEXT_SUFFIXES):
            raise NotImplementedError(
                f"importer for {name!r}: only {TEXT_SUFFIXES} decode in this "
                "environment (no pdf/doc libraries); the reader contract is "
                "(path, bytes) -> (doc_id, text, n_chars)"
            )
        ids.append(int(name.split("_")[1].split(".")[0]))
        texts.append(bytes(data).decode("utf-8"))
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def read_text_documents(doc_dir: str):
    """Dataset of imported documents: binary read (pruned to the file
    bytes, parallel over file groups) → decode stage."""
    import ray.data

    ds = ray.data.read_binary_files(doc_dir, include_paths=True)
    return ds.map_batches(decode_files_batch, batch_size=64)
