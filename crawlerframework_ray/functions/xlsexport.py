"""K4 — spreadsheet exporter (reference utils/export_xls.py:32-224).

The reference pulled Solr hits and wrote them through ``xlwt`` as a
workbook: a column→header MAPPING, MULTIFIELD columns joined by a
configured separator, a KEYWORD filter, and rows chunked into sheets
of ``num_rows_sheet``. ``xlwt`` isn't in this environment, so the
workbook codec is Excel 2003 SpreadsheetML — pure XML that Excel and
LibreOffice open natively — produced with stdlib ElementTree: the
operator (mapping, multifield join, keyword gate, sheet chunking) is
REAL and round-trip-parseable; only the binary .xls container is
swapped for its XML sibling. Deterministic end to end, so the export →
re-parse round trip is SQL-oracle-gated (xls_export_posts).

Scale shape: the sheet assignment is a rank partition (row_number //
num_rows_sheet over the caller's sort key) — computed distributed via
the catalog's two-phase prefix-sum scan when the input doesn't fit one
task; this module only renders ALREADY-CHUNKED row groups, one
worksheet per map_batches task, no shuffle of its own.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import pandas as pd

XMLNS = "urn:schemas-microsoft-com:office:spreadsheet"


def apply_mapping(df: pd.DataFrame, mapping: dict[str, str],
                  multifield: dict[str, list[str]] | None = None,
                  field_sep: str = ",") -> pd.DataFrame:
    """Column projection/renaming + multifield joins (export_xls.py's
    rev_mapping + multifield_columns semantics): ``mapping`` is
    source-column → header; ``multifield`` header → list of source
    columns joined with ``field_sep``."""
    out = pd.DataFrame(index=df.index)
    for src, hdr in mapping.items():
        out[hdr] = df[src].astype(str)
    for hdr, srcs in (multifield or {}).items():
        out[hdr] = df[srcs[0]].astype(str)
        for s in srcs[1:]:
            out[hdr] = out[hdr] + field_sep + df[s].astype(str)
    return out


def keyword_filter(df: pd.DataFrame, text_col: str, keywords: list[str]) -> pd.DataFrame:
    """Keep rows whose ``text_col`` contains ANY keyword as a
    whitespace-delimited token (the reference padded keywords with
    spaces — ``' kw '`` — before substring search; token membership is
    the same predicate without the edge-of-string misses)."""
    if not keywords:
        return df
    kw = set(keywords)
    mask = df[text_col].map(lambda s: bool(kw & set(str(s).split(" "))))
    return df[mask]


def workbook_xml(sheets: list[tuple[str, pd.DataFrame]]) -> bytes:
    """SpreadsheetML workbook: one ``<Worksheet>`` per (name, frame),
    header row first, all cells typed String (the reference wrote
    display values; numeric typing is the consumer's re-cast)."""
    # explicit ss: prefix — the canonical SpreadsheetML form; a DEFAULT
    # namespace would leave the ss:Name/ss:Type attributes unprefixed
    # (attributes never inherit the default namespace)
    ET.register_namespace("ss", XMLNS)
    wb = ET.Element(f"{{{XMLNS}}}Workbook")
    for name, df in sheets:
        ws = ET.SubElement(wb, f"{{{XMLNS}}}Worksheet", {f"{{{XMLNS}}}Name": name})
        tbl = ET.SubElement(ws, f"{{{XMLNS}}}Table")
        def add_row(values):
            r = ET.SubElement(tbl, f"{{{XMLNS}}}Row")
            for v in values:
                c = ET.SubElement(r, f"{{{XMLNS}}}Cell")
                d = ET.SubElement(c, f"{{{XMLNS}}}Data", {f"{{{XMLNS}}}Type": "String"})
                d.text = str(v)
        add_row(df.columns.tolist())
        for row in df.itertuples(index=False):
            add_row(list(row))
    return ET.tostring(wb, encoding="utf-8", xml_declaration=True)


def parse_workbook(blob: bytes) -> list[tuple[str, pd.DataFrame]]:
    """Round-trip parse of :func:`workbook_xml` output."""
    root = ET.fromstring(blob)
    out = []
    for ws in root.findall(f"{{{XMLNS}}}Worksheet"):
        name = ws.get(f"{{{XMLNS}}}Name")
        rows = []
        for r in ws.find(f"{{{XMLNS}}}Table").findall(f"{{{XMLNS}}}Row"):
            rows.append([
                (c.find(f"{{{XMLNS}}}Data").text or "")
                for c in r.findall(f"{{{XMLNS}}}Cell")
            ])
        df = pd.DataFrame(rows[1:], columns=rows[0]) if rows else pd.DataFrame()
        out.append((name, df))
    return out
