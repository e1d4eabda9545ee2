"""Frontier-expansion stage (operator M6, SURVEY.md §2.2).

The reference's ``_addLinksToCrawler`` (crawler/connectors/
htmlconnector.py:182-217): every outlink is normalized, optionally
gated by a ``url_filter`` regex, self-links removed
(baseconnector.py:1133, D2), the depth cap applied
(level > max_recursion ⇒ emit nothing, crawler.cfg:197-198), and each
surviving link becomes a cloned task one level deeper.

Here it is a batch transform: fetched rows (with an ``outlinks`` list
column) → expansion candidate rows. Child score and task_id are pure
functions of the child url, so expansion output is deterministic
regardless of which worker/batch produced it. In-batch dedup (D3,
rssconnector.py:47,68-69) pre-shrinks the global
``groupby(task_id)`` dedup shuffle that follows.
"""

from __future__ import annotations

import hashlib
import re

import pyarrow as pa

from ..data.synth import host_of
from ..functions.hashing import task_id
from ..functions.urlnorm import resolve

CANDIDATE_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("depth", pa.int32()),
        ("priority", pa.int32()),
        ("score", pa.float32()),
        ("task_id", pa.binary(16)),
        ("epoch", pa.int32()),
        ("parent_url", pa.string()),
        ("times_reenqueued", pa.int32()),
    ]
)


def child_score(url: str, seed: int) -> float:
    """Deterministic crawl score in [0,1) — pure function of the url so
    concurrent discoverers agree (same derivation as seed scores)."""
    d = hashlib.sha256(f"{seed ^ 0x5EED}|{url}".encode()).digest()
    return int.from_bytes(d[1:4], "little") / 0x1000000


def expander_task_fn(max_depth: int, seed: int, url_filter: str | None = None,
                     robots_seed: int | None = None):
    """Task-based expansion stage with a per-worker-process cached
    ``Expander`` (compiled url_filter regex and robots cache reused
    across epochs without actor-pool spin-up)."""
    key = (max_depth, seed, url_filter, robots_seed)

    def fn(batch):
        e = _PROCESS_EXPANDERS.get(key)
        if e is None:
            e = _PROCESS_EXPANDERS[key] = Expander(max_depth, seed, url_filter, robots_seed)
        return e(batch)

    return fn


_PROCESS_EXPANDERS: dict = {}


class Expander:
    """map_batches callable: fetched batch → expansion candidates."""

    def __init__(self, max_depth: int, seed: int, url_filter: str | None = None,
                 robots_seed: int | None = None):
        self.max_depth = max_depth
        self.seed = seed
        self.url_filter = re.compile(url_filter) if url_filter else None
        # robots admission gate (O5): per-worker robots cache — a
        # disallowed child never enters the frontier
        if robots_seed is not None:
            from ..functions.robots import RobotsCache

            self.robots = RobotsCache(robots_seed)
        else:
            self.robots = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        # In-batch dedup (D3) keeps the CANONICAL duplicate — min
        # (depth, parent_url) — the same reduction the global
        # groupby(task_id) dedup applies, so batch composition can never
        # change the globally-chosen winner.
        best: dict[bytes, tuple] = {}
        depths = batch.column("depth").to_pylist()
        priorities = batch.column("priority").to_pylist()
        epochs = batch.column("epoch").to_pylist()
        urls = batch.column("url").to_pylist()
        outlinks = batch.column("outlinks").to_pylist()
        retries = (
            batch.column("retry").to_pylist()
            if "retry" in batch.schema.names
            else [0] * batch.num_rows
        )
        retry_rows: list[tuple] = []

        for url, depth, priority, epoch, links, retry in zip(
            urls, depths, priorities, epochs, outlinks, retries
        ):
            if retry:
                # transiently-failed fetch (cfg.failures): requeue the
                # SAME task unchanged into the next epoch — it rides
                # the route stage's retry flag past the seen gate (the
                # url is already sealed; re-admission is the point)
                retry_rows.append((url, depth, priority, epoch + 1))
                continue
            child_depth = depth + 1
            if child_depth > self.max_depth:  # level cap ⇒ emit nothing
                continue
            for link in links:
                child = resolve(url, link)
                if child == url:  # self-link removal (D2)
                    continue
                if self.url_filter is not None and not self.url_filter.search(child):
                    continue
                if self.robots is not None and self.robots.disallowed(child, host_of(child)):
                    continue
                tid = task_id(child, priority)
                row = (child_depth, url, child, priority, epoch + 1)
                prev = best.get(tid)
                if prev is None or row[:2] < prev[:2]:
                    best[tid] = row
        out: dict[str, list] = {n: [] for n in CANDIDATE_SCHEMA.names}
        for tid, (child_depth, parent, child, priority, epoch1) in best.items():
            out["url"].append(child)
            out["host"].append(host_of(child))
            out["depth"].append(child_depth)
            out["priority"].append(priority)
            out["score"].append(child_score(child, self.seed))
            out["task_id"].append(tid)
            out["epoch"].append(epoch1)
            out["parent_url"].append(parent)
            out["times_reenqueued"].append(0)
        for url, depth, priority, epoch1 in retry_rows:
            out["url"].append(url)
            out["host"].append(host_of(url))
            out["depth"].append(depth)
            out["priority"].append(priority)
            out["score"].append(child_score(url, self.seed))
            out["task_id"].append(task_id(url, priority))
            out["epoch"].append(epoch1)
            out["parent_url"].append("")
            out["times_reenqueued"].append(1)
        return pa.table(out, schema=CANDIDATE_SCHEMA)
