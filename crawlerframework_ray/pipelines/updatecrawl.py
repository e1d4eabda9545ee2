"""In-crawl update mode (T5 in-epoch form): re-crawl with skip/update
classification against the cross-run content-hash store.

The reference's update crawls re-fetched everything, consulted
session_info per entity DURING the crawl, skipped unchanged posts,
wrote changed/new ones and recorded their hashes
(``checkSessionInfoReview`` / ``updateSessionInfoReview``,
crawler/utils/sessioninfomanager.py:56-86). Round 1 approximated this
post-hoc (pipelines/update.py); this module does it inside the epoch:

1. ``HashStore.load_from_results`` — distributed scan of the previous
   run's results partitions builds the sharded tid→hash store (never
   on the driver).
2. ``CrawlEngine.run(..., hash_store=store)`` over the (possibly
   drifted) web — a normal crawl whose fetch tasks classify each row
   against the store: unchanged rows are dropped from the results
   write, updated/new rows carry ``update_status`` and stage their
   hashes; the store seals per epoch. The schedule itself is untouched
   (the fresh seen set is run-scoped dedup — the reference's
   priority-queue vs session_info split).

``oracle_update_crawl`` is the independent serial model: the serial
crawl loop plus a plain dict store, classified row-by-row — statuses,
counts and per-shard store digests must match the engine exactly.
"""

from __future__ import annotations

from ..config import CrawlConfig
from ..functions.hashing import task_id
from ..state.hashstore import NEW, UNCHANGED, UPDATED, HashStore, hash_dict_digest
from ..state.seen import ShardedSeen
from .crawl import CrawlEngine, CrawlSummary
from .oracle import oracle_crawl


def update_crawl(cfg: CrawlConfig, prev_results_dir: str,
                 seeds) -> tuple[CrawlSummary, HashStore]:
    """Run ``cfg`` as an update crawl against the hash store built from
    ``prev_results_dir``. Returns (summary, sealed store); the run's
    results partitions contain ONLY changed/new rows, each with
    ``update_status`` (1 updated / 2 new)."""
    store = HashStore(cfg.n_shards)
    store.load_from_results(prev_results_dir)
    summary = CrawlEngine(cfg).run(seeds=seeds, hash_store=store)
    return summary, store


def resume_update_crawl(cfg: CrawlConfig, prev_results_dir: str) -> tuple[CrawlSummary, HashStore]:
    """Resume a killed update crawl: rebuild the store as
    previous-run hashes OVERLAID with the hashes committed by this
    run's finished epochs (their results parts carry (url, priority,
    content_hash) — the store state at the last checkpoint is a pure
    function of them), then resume the engine. Post-resume epochs
    classify against exactly the state an uninterrupted run had.

    Only epochs with a COMMITTED manifest are overlaid: a crash between
    the results-dir rename and the manifest write leaves an orphan
    ``results/epoch=N`` whose epoch the resumed engine will re-execute
    — overlaying its hashes first would make the re-run classify its
    changed/new rows as UNCHANGED and silently drop them."""
    import os

    from ..state import checkpoint as _ckpt

    store = HashStore(cfg.n_shards)
    store.load_from_results(prev_results_dir)
    last = _ckpt.latest_epoch(cfg.workdir)
    results_root = os.path.join(cfg.workdir, "results")
    if os.path.isdir(results_root) and last is not None:
        for name in sorted(os.listdir(results_root)):
            part_dir = os.path.join(results_root, name)
            if name.startswith("epoch=") and os.path.isdir(part_dir):
                if int(name.split("=")[1]) <= last:
                    store.load_from_results(part_dir)
    summary = CrawlEngine(cfg).run(resume=True, hash_store=store)
    return summary, store


def oracle_update_crawl(cfg: CrawlConfig, seeds: list[dict],
                        prev_hashes: dict[bytes, bytes]) -> dict:
    """Serial model of :func:`update_crawl` (independent loop; shares
    only the leaf functions). Returns statuses per tid, counts, the
    final store dict and its per-shard digests."""
    res = oracle_crawl(cfg, seeds)
    hashes = dict(prev_hashes)
    statuses: dict[bytes, int] = {}
    written: list[dict] = []
    counts = {"skipped_urls": 0, "updated_urls": 0, "new_urls": 0}
    for row in res["results"]:
        tid = task_id(row["url"], int(row["priority"]))
        h = row["content_hash"]
        old = prev_hashes.get(tid)
        if old is None:
            st = NEW
            counts["new_urls"] += 1
        elif old != h:
            st = UPDATED
            counts["updated_urls"] += 1
        else:
            st = UNCHANGED
            counts["skipped_urls"] += 1
        statuses[tid] = st
        if st != UNCHANGED:
            hashes[tid] = h
            written.append({**row, "update_status": st})
    per_shard: dict[int, dict[bytes, bytes]] = {i: {} for i in range(cfg.n_shards)}
    for tid, h in hashes.items():
        per_shard[ShardedSeen.shard_of_id(tid, cfg.n_shards)][tid] = h
    return {
        **res,
        "statuses": statuses,
        "written": written,
        "counts": counts,
        "store": hashes,
        "store_digests": [hash_dict_digest(per_shard[i]) for i in range(cfg.n_shards)],
    }


def results_hashes(results: list[dict]) -> dict[bytes, bytes]:
    """tid→hash dict from a serial oracle crawl's result rows (the
    serial analogue of ``HashStore.load_from_results``)."""
    return {
        task_id(r["url"], int(r["priority"])): r["content_hash"] for r in results
    }


def demo_cfg(workdir: str, drift: bool = False) -> CrawlConfig:
    """Canonical small config for the update-mode catalog query and its
    serial golden — ONE definition so the two sides cannot drift."""
    from ..data.synth import SynthWebConfig

    web_kw = dict(seed=42, n_hosts=16, path_space=512, max_outlinks=5)
    if drift:
        web_kw.update(drift_salt=7, drift_permille=250)
    return CrawlConfig(
        web=SynthWebConfig(**web_kw),
        workdir=workdir,
        max_depth=2,
        wave_size=256,
        host_budget=32,
        n_shards=8,
        shard_capacity=1 << 16,
        max_epochs=3,
        fetch_concurrency=2,
        fetch_batch_size=128,
    )


def demo_n_seeds(n_docs: int) -> int:
    return min(96, max(24, n_docs // 16))
