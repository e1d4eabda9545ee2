"""Streaming ingestion as a micro-batch chain (operator S6 + §2.9).

The reference's only true streaming source blpop'd ≤50 messages from
redis per task, processed them, then RE-ENQUEUED ITSELF with a mutated
URL to defeat dedup — continuous ingestion as an endless chain of
micro-batch tasks (crawler/connectors/datasiftstreamingconnector.py:
42-75,146-399; requeue baseconnector.py:158-181).

Ray Data has no event-time stream; the faithful restatement is a driver
loop: each iteration builds a bounded Dataset from the source cursor,
runs the same keyword-filter + aggregate pipeline over it, folds the
partial aggregates into carried state, and "re-enqueues" by advancing
the cursor — at-least-once, watermark-carrying, exactly the reference's
semantics. The invariant gated in tests: the chained result equals the
one-shot batch result over the same rows (micro-batching is a pure
execution choice, not a semantics change).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pandas as pd
import pyarrow as pa
import ray.data


@dataclass
class StreamState:
    """Carried across micro-batches (session_info 'search' genre:
    max-timestamp watermark, sessioninfomanager.py:117-153)."""

    cursor: int = 0
    watermark_us: int = 0
    counts: dict = field(default_factory=dict)
    value_milli: dict = field(default_factory=dict)
    n_batches: int = 0


def micro_batch_chain(
    sf_dir: str,
    batch_rows: int = 50,
    keyword: str | None = None,
    max_batches: int | None = None,
) -> StreamState:
    """Consume the events table as a ts-ordered stream in micro-batches
    of ``batch_rows`` (the reference's num_results=50), maintaining
    per-type counts/sums and the high watermark."""
    import pyarrow.parquet as pq

    # the "queue": events ordered by (ts, event_id) — deterministic
    src = pq.read_table(f"{sf_dir}/events.parquet", columns=["event_id", "ts", "event_type", "value", "props"])
    order = pd.DataFrame({"ts": src.column("ts").to_pandas(), "event_id": src.column("event_id").to_pandas()})
    order = order.sort_values(["ts", "event_id"], kind="mergesort").index.to_numpy()
    src = src.take(pa.array(order, pa.int64()))

    state = StreamState()
    while state.cursor < src.num_rows:
        if max_batches is not None and state.n_batches >= max_batches:
            break
        chunk = src.slice(state.cursor, batch_rows)
        ds = ray.data.from_arrow(chunk)
        if keyword is not None:
            kw = keyword

            def flt(t: pa.Table) -> pa.Table:
                mask = [kw in p for p in t.column("props").to_pylist()]
                return t.filter(pa.array(mask, pa.bool_()))

            ds = ds.map_batches(flt, batch_format="pyarrow")

        def partial(t: pa.Table) -> pd.DataFrame:
            df = t.to_pandas()
            import numpy as np

            df = df.assign(
                n=np.int64(1),
                vm=np.floor(df["value"].to_numpy() * 1000 + 0.5).astype("int64"),
            )
            agg = df.groupby("event_type", as_index=False)[["n", "vm"]].sum()
            agg["wm"] = df["ts"].astype("int64").max()
            return agg

        for row in ds.map_batches(partial, batch_format="pyarrow").to_pandas().itertuples():
            state.counts[row.event_type] = state.counts.get(row.event_type, 0) + int(row.n)
            state.value_milli[row.event_type] = state.value_milli.get(row.event_type, 0) + int(row.vm)
            state.watermark_us = max(state.watermark_us, int(row.wm))
        # self-requeue: advance the cursor — the next "task" in the chain
        state.cursor += chunk.num_rows
        state.n_batches += 1
    return state


def stream_result_frame(state: StreamState) -> pd.DataFrame:
    out = pd.DataFrame(
        {
            "event_type": sorted(state.counts),
            "n_events": [state.counts[k] for k in sorted(state.counts)],
            "sum_value_milli": [state.value_milli[k] for k in sorted(state.counts)],
        }
    )
    out["watermark_us"] = state.watermark_us
    return out.astype({"n_events": "int64", "sum_value_milli": "int64", "watermark_us": "int64"})
