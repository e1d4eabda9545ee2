"""Cheap regex entity extractors (the T6 extractor family's text side).

The reference ran per-row regex extractors over fetched text — email
(crawler/extractors/extractor.py:103-108), patent ids (:110-115),
calendar/temporal mentions (serendiocalendar.py) — inside its
row-callback pipeline. Here each extractor is a COMPILED-ONCE pattern
applied vectorized inside ``map_batches``; counts come out as int64
columns so a DuckDB ``regexp_extract_all`` oracle can reproduce them
bit-for-bit (both RE2 and Python ``re`` agree on these ASCII patterns).
"""

from __future__ import annotations

import re

import pyarrow as pa

# ASCII-only patterns chosen to have identical semantics in Python re
# and DuckDB's RE2 (no backtracking constructs, no unicode classes)
PATTERNS = {
    "emails": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+",
    "numbers": r"[0-9]+",
    "capitalized": r"[A-Z][a-z]+",
    "urls": r"https?://[A-Za-z0-9./_-]+",
}


class RegexExtractStage:
    """map_batches callable: adds ``n_<name>`` count columns and a
    ``first_<name>`` sample column per extractor. Patterns compile once
    per worker (``__init__``), never per batch."""

    def __init__(self, text_column: str = "text", patterns: dict | None = None):
        self.text_column = text_column
        self.compiled = {k: re.compile(v) for k, v in (patterns or PATTERNS).items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_column).to_pylist()
        for name, rx in self.compiled.items():
            hits = [rx.findall(t) for t in texts]
            batch = batch.append_column(
                f"n_{name}", pa.array([len(h) for h in hits], pa.int64())
            )
            batch = batch.append_column(
                f"first_{name}", pa.array([h[0] if h else "" for h in hits], pa.string())
            )
        return batch
