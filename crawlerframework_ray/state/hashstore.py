"""Sharded per-URL content-hash store: the cross-run 'session_info'.

The reference kept a per-entity content hash in session_info and, on an
update crawl, skipped unchanged entities at crawl time
(``checkSessionInfoReview`` / ``updateSessionInfoReview``,
crawler/utils/sessioninfomanager.py:56-86): a new path inserts, a
changed hash updates, an identical hash is skipped — all DURING the
crawl, not as a post-pass.

Ray-native restatement: hashes are hash-partitioned across shard actors
by the same ``task_id`` routing as the seen set (one logical keyspace,
two lifetimes — the seen set is RUN-scoped dedup, this store is
CROSS-run content state, exactly the reference's priority-queue vs
session_info split). The fetch stage classifies each fetched batch with
one batched RPC per shard; statuses are computed against the COMMITTED
map only (order-free across concurrent tasks — a task retry re-stages
identical values), and staged entries fold in at epoch ``seal``.

Scale: a shard holds 32 B/url (tid + hash); 10^10 urls / 256 shards ≈
1.2 GB/shard — per-node RAM, loadable by a distributed scan of the
results table (one pass, batched RPCs), never through the driver.
"""

from __future__ import annotations

import hashlib

import ray

from .seen import ShardedSeen

UNCHANGED, UPDATED, NEW = 0, 1, 2


@ray.remote(num_cpus=0)
class HashShard:
    def __init__(self, shard_id: int):
        self.shard_id = shard_id
        self.hashes: dict[bytes, bytes] = {}
        self.staged: dict[bytes, bytes] = {}

    def load(self, ids: list[bytes], hashes: list[bytes]) -> int:
        """Bulk-load committed state (distributed results-table scan).
        Idempotent: identical (tid, hash) pairs may arrive twice."""
        self.hashes.update(zip(ids, hashes))
        return len(self.hashes)

    def check_stage_batch(self, ids: list[bytes], hashes: list[bytes]) -> list[int]:
        """Classify each id vs the COMMITTED map (0 unchanged /
        1 updated / 2 new) and stage the 1/2 entries for the next seal.
        Reading committed-only keeps concurrent-task arrival order
        irrelevant; one wave fetches a tid at most once, so staged
        overwrites are identical values."""
        out = []
        for tid, h in zip(ids, hashes):
            old = self.hashes.get(tid)
            if old is None:
                self.staged[tid] = h
                out.append(NEW)
            elif old != h:
                self.staged[tid] = h
                out.append(UPDATED)
            else:
                out.append(UNCHANGED)
        return out

    def seal(self) -> int:
        self.hashes.update(self.staged)
        n = len(self.staged)
        self.staged.clear()
        return n

    def digest(self) -> str:
        """Canonical digest of the committed map (pure function of its
        item set) — comparable against the serial oracle's dict."""
        d = hashlib.sha256()
        for tid in sorted(self.hashes):
            d.update(tid)
            d.update(self.hashes[tid])
        return d.hexdigest()

    def size(self) -> int:
        return len(self.hashes)

    def dump(self) -> list[tuple[bytes, bytes]]:
        return sorted(self.hashes.items())


def hash_dict_digest(hashes: dict[bytes, bytes]) -> str:
    """The serial-oracle side of ``HashShard.digest``: digest of a
    plain dict sharded the same way. Returns per-shard digests."""
    d = hashlib.sha256()
    for tid in sorted(hashes):
        d.update(tid)
        d.update(hashes[tid])
    return d.hexdigest()


class HashStore:
    """Driver-side handle to the shard pool."""

    def __init__(self, n_shards: int):
        self.n_shards = n_shards
        self.shards = [HashShard.remote(i) for i in range(n_shards)]

    def handles(self) -> list:
        return list(self.shards)

    def seal(self) -> int:
        return sum(ray.get([s.seal.remote() for s in self.shards]))

    def digests(self) -> list[str]:
        return ray.get([s.digest.remote() for s in self.shards])

    def total_size(self) -> int:
        return sum(ray.get([s.size.remote() for s in self.shards]))

    def load_from_results(self, results_dir: str) -> int:
        """Distributed load: scan the finished crawl's results
        partitions (url, priority, content_hash), recompute task ids,
        and push each batch's entries to its shards — the store never
        materializes on the driver."""
        import pyarrow as pa
        import ray.data

        from ..functions.hashing import task_id

        shards, n_shards = self.shards, self.n_shards

        def load_batch(t: pa.Table) -> pa.Table:
            urls = t.column("url").to_pylist()
            prios = t.column("priority").to_pylist()
            hs = t.column("content_hash").to_pylist()
            groups: dict[int, tuple[list, list]] = {}
            for u, p, h in zip(urls, prios, hs):
                tid = task_id(u, int(p))
                g = groups.setdefault(ShardedSeen.shard_of_id(tid, n_shards), ([], []))
                g[0].append(tid)
                g[1].append(h)
            ray.get([shards[s].load.remote(ids, hh) for s, (ids, hh) in groups.items()])
            return pa.table({"n": pa.array([len(urls)], pa.int64())})

        loaded = ray.data.read_parquet(
            results_dir, columns=["url", "priority", "content_hash"]
        ).map_batches(load_batch, batch_format="pyarrow", batch_size=8192)
        import pyarrow.compute as pc  # noqa: F401

        total = 0
        for b in loaded.iter_batches(batch_format="pyarrow"):
            total += sum(b.column("n").to_pylist())
        return total


class HashClassifier:
    """The fetch-side hook: callable shipped into fetch tasks (holds
    only shard handles). Classifies a batch of (task_id, content_hash)
    with one RPC per shard and returns statuses in input order."""

    def __init__(self, shard_handles: list, n_shards: int):
        self.shards = shard_handles
        self.n_shards = n_shards

    def __call__(self, ids: list[bytes], hashes: list[bytes]) -> list[int]:
        groups: dict[int, list[int]] = {}
        for pos, tid in enumerate(ids):
            groups.setdefault(ShardedSeen.shard_of_id(tid, self.n_shards), []).append(pos)
        futs = {
            s: self.shards[s].check_stage_batch.remote(
                [ids[p] for p in pos], [hashes[p] for p in pos]
            )
            for s, pos in groups.items()
        }
        out = [NEW] * len(ids)
        for s, pos in groups.items():
            for p, st in zip(pos, ray.get(futs[s])):
                out[p] = st
        return out
