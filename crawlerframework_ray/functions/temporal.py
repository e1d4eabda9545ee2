"""Temporal / calendar mention extraction (operator family T6-text).

The reference's largest single extractor is its calendar parser
(crawler/extractors/serendiocalendar.py:1-1219, driven from
extractor.py:175-196 ``extract_temporal``): free-text date mentions
normalized to concrete dates. This module implements the bounded,
deterministic subset of that grammar that a SQL oracle can reproduce
bit-for-bit:

- ISO dates:        ``2021-07-04``
- month-name dates: ``July 4, 2021``
- relative days:    ``14 days ago``  (resolved against a FIXED anchor
                    date — the reference resolved against now(); a
                    frozen anchor is what makes the operator pure and
                    the oracle exact)

Each form normalizes to an ISO ``YYYY-MM-DD`` string; per-document
output is the per-form match count plus the MINIMUM normalized date
(order-independent, so the oracle needs no document-order reasoning).

Patterns are compiled once per worker (callable class for
``map_batches``); matching is ASCII-only so Python ``re`` and DuckDB's
RE2 agree.
"""

from __future__ import annotations

import datetime as _dt
import re

import pyarrow as pa

ANCHOR = _dt.date(2026, 1, 1)

MONTHS = [
    "January", "February", "March", "April", "May", "June",
    "July", "August", "September", "October", "November", "December",
]
_MONTH_NUM = {m: i + 1 for i, m in enumerate(MONTHS)}

ISO_RX = r"([0-9]{4})-(0[1-9]|1[0-2])-(0[1-9]|[12][0-9]|3[01])"
MONTHNAME_RX = r"(" + "|".join(MONTHS) + r") ([0-9]{1,2}), ([0-9]{4})"
RELATIVE_RX = r"([0-9]{1,3}) days ago"


class TemporalExtractStage:
    """map_batches callable: ``text`` → ``n_iso``/``n_monthname``/
    ``n_relative`` counts + ``min_date`` (ISO string, '' when the
    document mentions no date)."""

    def __init__(self, text_column: str = "text"):
        self.text_column = text_column
        self.iso = re.compile(ISO_RX)
        self.monthname = re.compile(MONTHNAME_RX)
        self.relative = re.compile(RELATIVE_RX)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_column).to_pylist()
        n_iso, n_mon, n_rel, min_date = [], [], [], []
        for t in texts:
            dates: list[str] = []
            iso = self.iso.findall(t)
            dates.extend(f"{y}-{m}-{d}" for y, m, d in iso)
            mon = self.monthname.findall(t)
            dates.extend(
                f"{int(y):04d}-{_MONTH_NUM[name]:02d}-{int(d):02d}" for name, d, y in mon
            )
            rel = self.relative.findall(t)
            dates.extend(
                (ANCHOR - _dt.timedelta(days=int(n))).isoformat() for n in rel
            )
            n_iso.append(len(iso))
            n_mon.append(len(mon))
            n_rel.append(len(rel))
            min_date.append(min(dates) if dates else "")
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_iso": pa.array(n_iso, pa.int64()),
                "n_monthname": pa.array(n_mon, pa.int64()),
                "n_relative": pa.array(n_rel, pa.int64()),
                "min_date": pa.array(min_date, pa.string()),
            }
        )
