"""JSONL source with dead-letter quarantine routing (S5/S9 family +
O4 guards, SURVEY.md §2.1/§2.6).

The reference's API connectors pull JSON feeds and drop/log rows that
fail parsing inside each connector's fetch loop (baseconnector.py
try/except around per-item parse; failures increment error counters
and the item is skipped). Here the same semantics are a first-class
dead-letter pattern: ingestion is ``ray.data.read_text`` over a JSONL
directory, parsing happens per batch with a tolerant decoder, and rows
that fail to parse are ROUTED to a quarantine label instead of being
silently dropped or crashing the pipeline — the output accounts for
every input line, so ingest totals reconcile exactly.

Scale shape: read_text streams line blocks; the parse is one
map_batches pass (stateless); nothing shuffles until the bounded
(status, event_type) rollup.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import ray.data

QUARANTINE_TYPE = "__unparseable__"


def export_events_jsonl(sf_dir: str, out_dir: str, n_files: int = 4) -> str:
    """Deterministically derive a JSONL directory from the events
    table: one JSON object per line with a NESTED props payload, and a
    planted corruption — every line with ``event_id % 13 == 7`` is
    truncated mid-object (the classic torn-write/partial-flush shape) —
    so the quarantine path provably fires and the DuckDB oracle can
    recompute both sides relationally from the parquet."""
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    t = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "value", "props"]
    )
    df = t.to_pandas().sort_values("event_id")
    lines = []
    for eid, etype, val, props in zip(
        df["event_id"], df["event_type"], df["value"], df["props"]
    ):
        line = json.dumps(
            {"event_id": int(eid), "event_type": etype, "value": float(val),
             "props": json.loads(props)},
            separators=(",", ":"),
        )
        if int(eid) % 13 == 7:
            line = line[: max(len(line) - 5, 1)]  # torn write
        lines.append(line)
    rows_per = (len(lines) + n_files - 1) // n_files
    for i in range(n_files):
        part = lines[i * rows_per : (i + 1) * rows_per]
        with open(os.path.join(out_dir, f"part-{i:02d}.jsonl"), "w") as f:
            f.write("\n".join(part) + ("\n" if part else ""))
    return out_dir


def read_jsonl_with_quarantine(jsonl_dir: str) -> ray.data.Dataset:
    """JSONL directory → typed rows; unparseable lines become
    ``status='quarantined'`` rows (payload fields zeroed) instead of
    exceptions. Output: status, event_type, value_milli:int64, k:int64
    — value integerized per row so downstream sums are order-free."""
    import math

    ds = ray.data.read_text(jsonl_dir)

    def parse(t: pa.Table) -> pa.Table:
        status, etypes, vms, ks = [], [], [], []
        for line in t.column("text").to_pylist():
            try:
                obj = json.loads(line)
                vm = int(math.floor(float(obj["value"]) * 1000 + 0.5))
                k = int(obj["props"]["k"])
                etypes.append(str(obj["event_type"]))
                status.append("ok")
            except (ValueError, KeyError, TypeError):
                etypes.append(QUARANTINE_TYPE)
                status.append("quarantined")
                vm, k = 0, 0
            vms.append(vm)
            ks.append(k)
        return pa.table(
            {"status": pa.array(status, pa.string()),
             "event_type": pa.array(etypes, pa.string()),
             "value_milli": pa.array(vms, pa.int64()),
             "k": pa.array(ks, pa.int64())}
        )

    return ds.map_batches(parse, batch_format="pyarrow", batch_size=8192)
