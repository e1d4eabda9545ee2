"""Single-process reference oracle.

A small, faithful serial model of the reference's TaskMaster semantics
(SURVEY.md §7.0): heap ordering (crawler/utils/priorityqueue.py:46-49)
restated as the engine's wave semantics — per-host politeness cap, then
global (priority, depth, -score, host, url) top-k — md5 enqueue-dedup
(crawler/utils/taskmanager.py:363-383), the level cap
(crawler.cfg:197-198) and the same deterministic synthetic web.

It deliberately shares ONLY the leaf-level pure functions with the
engine (page_record, normalize/resolve, task_id, CuckooFilter) — the
crawl loop itself is an independent serial implementation, so agreement
between the two is evidence the distributed pipeline preserves the
semantics, not a tautology. Sharing CuckooFilter (same params, same
sorted-insert discipline) makes even false positives identical, which
is what lets crawl traces be compared exactly (SURVEY.md §7.4).
"""

from __future__ import annotations

import numpy as np

from ..config import CrawlConfig
from ..data.synth import fetch_status_of, fetch_stitched, host_of
from ..functions.hashing import content_hash, task_id
from ..functions.urlnorm import normalize, resolve
from ..stages.expand import child_score
from ..state.cuckoo import CuckooFilter
from ..state.seen import ShardedSeen


def _sort_key(row: dict):
    return (row["priority"], row["depth"], -row["score"], row["host"], row["url"])


def oracle_crawl(cfg: CrawlConfig, seeds: list[dict]) -> dict:
    """seeds: dicts with url, depth, priority, score. Returns trace,
    final seen membership, shard digests, and fetched results rows."""
    import re

    url_filter = re.compile(cfg.url_filter) if cfg.url_filter else None
    robots = None
    if cfg.robots:
        from ..functions.robots import RobotsCache

        robots = RobotsCache(cfg.web.seed)
    filters = [CuckooFilter(cfg.shard_capacity) for _ in range(cfg.n_shards)]
    added: set[bytes] = set()

    def shard(tid: bytes) -> int:
        return ShardedSeen.shard_of_id(tid, cfg.n_shards)

    def contains(tid: bytes) -> bool:
        return filters[shard(tid)].contains(tid)

    def seal(ids: list[bytes]) -> None:
        per: dict[int, list[bytes]] = {}
        for tid in ids:
            per.setdefault(shard(tid), []).append(tid)
        for s, v in per.items():
            filters[s].add_sorted(v)
        added.update(ids)

    # ---- seed admission (mirror of CrawlEngine._admit at epoch 0)
    best: dict[bytes, dict] = {}
    for s in seeds:
        url = normalize(s["url"])
        if robots is not None and robots.disallowed(url, host_of(url)):
            continue
        tid = task_id(url, int(s["priority"]))
        row = {
            "url": url,
            "host": host_of(url),
            "depth": int(s["depth"]),
            "priority": int(s["priority"]),
            "score": float(np.float32(s["score"])),
            "task_id": tid,
            "parent_url": "",
        }
        prev = best.get(tid)
        if prev is None or (row["depth"], row["parent_url"]) < (prev["depth"], prev["parent_url"]):
            best[tid] = row
    fresh = [r for r in best.values() if not contains(r["task_id"])]
    seal([r["task_id"] for r in fresh])
    frontier = list(fresh)

    trace: list[tuple] = []
    results: list[dict] = []
    counters = {"fetched_urls": 0, "raw_outlinks": 0, "fresh_urls": len(fresh),
                "failed_transient": 0, "failed_permanent": 0}
    backoff: dict[str, int] = {}  # AIMD mirror (cfg.adaptive_politeness)

    for epoch in range(cfg.max_epochs):
        if not frontier:
            break
        # per-host politeness cap (top-k within host by sort key)
        per_host: dict[str, list[dict]] = {}
        for r in frontier:
            per_host.setdefault(r["host"], []).append(r)
        pool: list[dict] = []
        for host, rows in per_host.items():
            rows.sort(key=lambda r: (r["priority"], r["depth"], -r["score"], r["url"]))
            host_cap = (
                robots.host_budget(host, cfg.host_budget) if robots is not None else cfg.host_budget
            )
            if cfg.adaptive_politeness and backoff.get(host):
                host_cap = max(1, host_cap >> backoff[host])
            pool.extend(rows[:host_cap])
        # global top-k
        pool.sort(key=_sort_key)
        wave = pool[: cfg.wave_size]
        if not wave:
            break
        wave_ids = {r["task_id"] for r in wave}
        residual = [r for r in frontier if r["task_id"] not in wave_ids]

        best = {}
        retries: list[dict] = []
        for r in wave:
            trace.append((epoch, r["url"], r["depth"], r["priority"]))
            counters["fetched_urls"] += 1
            if cfg.failures:
                # mirror of the engine's failure split (stages/fetch.py):
                # permanent failures drop, transient failures requeue
                # past the seen gate with the expander's retry fields
                status = fetch_status_of(r["url"], epoch, cfg.web.seed)
                if status == "gone":
                    counters["failed_permanent"] += 1
                    continue
                if status == "retry":
                    counters["failed_transient"] += 1
                    retries.append(
                        {
                            "url": r["url"],
                            "host": r["host"],
                            "depth": r["depth"],
                            "priority": r["priority"],
                            "score": float(np.float32(child_score(r["url"], cfg.web.seed))),
                            "task_id": r["task_id"],
                            "parent_url": "",
                        }
                    )
                    continue
            page, _parts = fetch_stitched(r["url"], cfg.web)
            counters["raw_outlinks"] += len(page["outlinks"])
            results.append(
                {
                    "url": r["url"],
                    "depth": r["depth"],
                    "priority": r["priority"],
                    "epoch": epoch,
                    "image_id": page["image_id"],
                    "caption": page["caption"],
                    "phash": page["phash"],
                    "fmt": page["fmt"],
                    "bytes": page["bytes"],
                    "content_hash": content_hash(page["image_id"], page["caption"]),
                }
            )
            # expansion (M6 semantics — mirror of stages/expand.py)
            child_depth = r["depth"] + 1
            if child_depth > cfg.max_depth:
                continue
            for link in page["outlinks"]:
                child = resolve(r["url"], link)
                if child == r["url"]:
                    continue
                if url_filter is not None and not url_filter.search(child):
                    continue
                if robots is not None and robots.disallowed(child, host_of(child)):
                    continue
                tid = task_id(child, r["priority"])
                cand = {
                    "url": child,
                    "host": host_of(child),
                    "depth": child_depth,
                    "priority": r["priority"],
                    "score": float(np.float32(child_score(child, cfg.web.seed))),
                    "task_id": tid,
                    "parent_url": r["url"],
                }
                prev = best.get(tid)
                if prev is None or (cand["depth"], cand["parent_url"]) < (
                    prev["depth"],
                    prev["parent_url"],
                ):
                    best[tid] = cand
        if cfg.adaptive_politeness:
            # AIMD mirror of FrontierBucket.finalize: additive recovery
            # for backed-off hosts with no transient failure this wave,
            # multiplicative (halving-exponent) backoff for failing ones
            retry_hosts = {r["host"] for r in retries}
            for h in [h for h in backoff if h not in retry_hosts]:
                backoff[h] -= 1
                if backoff[h] <= 0:
                    del backoff[h]
            for h in retry_hosts:
                backoff[h] = min(backoff.get(h, 0) + 1, 6)
        fresh = [c for c in best.values() if not contains(c["task_id"])]
        seal([c["task_id"] for c in fresh])
        counters["fresh_urls"] += len(fresh)
        frontier = residual + fresh + retries

    return {
        "trace": trace,
        "seen_added": added,
        "shard_digests": [f.digest() for f in filters],
        "results": results,
        "counters": counters,
        "final_frontier": len(frontier),
    }
