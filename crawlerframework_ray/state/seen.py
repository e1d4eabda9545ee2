"""Sharded URL-seen set: an actor pool of cuckoo-filter shards.

The distributed replacement for the reference's central TaskMaster
dedup gate (crawler/utils/priorityqueue.py:39-43 test-and-set before
enqueue, over a single BerkeleyDB). Here the seen set is hash-
partitioned across K shard actors (shard = md5(url)[:8] % K, so K can
exceed node count and shards rebalance trivially); membership tests are
batched RPCs grouped by shard — one message per shard per batch, not
per url.

Epoch discipline (what makes parallel runs deterministic — SURVEY.md
§7.4): within an epoch, candidate ids are globally deduped by a
``groupby(task_id)`` shuffle, then **tested read-only** against shards
(order-independent), and the fresh ids are **inserted only at epoch
commit, sorted**, so filter state is a pure function of the committed
id set. The oracle follows the identical discipline.

At 10^10 urls / 256 shards each shard holds ~40M fingerprints ≈ 95 MB —
RAM-resident per node. The exact ``added`` id set kept alongside is a
small-scale testing aid (final-membership dumps); at full scale it
would be dropped or spilled to the checkpoint only.
"""

from __future__ import annotations

import ray

from .cuckoo import CuckooFilter


@ray.remote(num_cpus=0)
class SeenShard:
    """One shard of the URL-seen set. num_cpus=0: shards are
    memory-bound lookaside state, not compute — they must not starve
    the fetch/parse stages of CPU slots."""

    def __init__(self, shard_id: int, capacity: int):
        self.shard_id = shard_id
        self.reset(capacity)

    def reset(self, capacity: int) -> int:
        """Rebind the shard to a new engine run (the pool is
        session-cached — spawning K actor processes per run would bill
        cold-start to every measured run). A reset shard is
        indistinguishable from a fresh one: the filter is a pure
        function of the inserted id set, and every other field is
        cleared."""
        self.filter = CuckooFilter(capacity)
        self.added: set[bytes] = set()
        self.staged: set[bytes] = set()
        self.epoch = -1
        # sealed (epoch, sorted ids) entries not yet taken by a
        # checkpoint — the delta-checkpoint payload (state/checkpoint.py)
        self.delta_log: list[tuple[int, list[bytes]]] = []
        return self.shard_id

    def contains_batch(self, ids: list[bytes]) -> list[bool]:
        f = self.filter
        return [f.contains(i) for i in ids]

    def contains_packed(self, buf: bytes) -> bytes:
        """Packed form of ``contains_batch``: ``buf`` is n×16 id bytes,
        returns n result bytes (0/1). One blob serializes ~20× cheaper
        than a list of bytes objects, and membership runs through the
        filter's vectorized kernel (bit-identical to the scalar path)."""
        import numpy as np

        arr = np.frombuffer(buf, dtype=np.uint8).reshape(-1, 16)
        return self.filter.contains_many(arr).tobytes()

    def stage(self, ids: list[bytes]) -> int:
        """Accumulate fresh ids from (possibly concurrent) expansion
        tasks. A *set*, so arrival order is irrelevant."""
        self.staged.update(ids)
        return len(self.staged)

    def stage_packed(self, buf: bytes) -> int:
        """Packed form of ``stage``; stores the same 16-byte ``bytes``
        objects, so seal order / digests are unchanged."""
        self.staged.update(
            buf[i : i + 16] for i in range(0, len(buf), 16)
        )
        return len(self.staged)

    def staged_size(self) -> int:
        return len(self.staged)

    def seal(self, epoch: int) -> int:
        """Epoch commit: insert the staged set in sorted order (canonical
        filter state), fold into `added`, clear staging. Idempotent:
        re-sealing an already-sealed epoch (resume replay) is a no-op."""
        if epoch <= self.epoch:
            self.staged.clear()
            return 0
        ids = sorted(self.staged)
        n = self.filter.add_sorted(ids)
        self.added.update(self.staged)
        self.staged.clear()
        self.epoch = epoch
        self.delta_log.append((epoch, ids))
        return n

    def take_deltas(self) -> list[tuple[int, list[bytes]]]:
        """Return and clear the sealed deltas accumulated since the
        last checkpoint."""
        log, self.delta_log = self.delta_log, []
        return log

    def digest(self) -> str:
        return self.filter.digest()

    def size(self) -> int:
        return self.filter.count

    def dump_added(self) -> list[bytes]:
        return sorted(self.added)

    def serialize(self) -> tuple[bytes, list[bytes], int]:
        return self.filter.serialize(), sorted(self.added), self.epoch

    def restore(self, blob: bytes, added: list[bytes], epoch: int) -> None:
        self.filter = CuckooFilter.deserialize(blob)
        self.added = set(added)
        self.epoch = epoch
        self.delta_log = []


_PROCESS_SHARD_POOLS: dict[int, list] = {}


class ShardedSeen:
    """Driver-side handle to the shard pool. Actor processes are
    session-cached per shard count (engine runs are sequential per
    driver process); each run rebinds them via ``reset``."""

    def __init__(self, n_shards: int, capacity_per_shard: int):
        self.n_shards = n_shards
        self.shards = self._handles(n_shards)
        ray.get([s.reset.remote(capacity_per_shard) for s in self.shards])

    @staticmethod
    def _handles(n_shards: int) -> list:
        handles = _PROCESS_SHARD_POOLS.get(n_shards)
        if handles is None:
            # SPREAD: shards are memory-bound (≈95 MB each at 10^10
            # urls / 256 shards) — they must land across node RAM, not
            # pack onto the driver's node as num_cpus=0 actors would
            # (gated by tests/test_cluster_sim.py)
            handles = [
                SeenShard.options(scheduling_strategy="SPREAD").remote(i, 1024)
                for i in range(n_shards)
            ]
            _PROCESS_SHARD_POOLS[n_shards] = handles
        return handles

    @classmethod
    def warm(cls, n_shards: int) -> None:
        """Pre-spawn the shard processes (cold-start isolation for
        benchmarks)."""
        ray.get([s.reset.remote(1024) for s in cls._handles(n_shards)])

    @staticmethod
    def shard_of_id(task_id: bytes, n_shards: int) -> int:
        return int.from_bytes(task_id[:8], "little") % n_shards

    def _group(self, ids: list[bytes]) -> dict[int, list[int]]:
        groups: dict[int, list[int]] = {}
        for pos, tid in enumerate(ids):
            groups.setdefault(self.shard_of_id(tid, self.n_shards), []).append(pos)
        return groups

    def contains_batch(self, ids: list[bytes]) -> list[bool]:
        """Batched membership test: one RPC per shard, issued in
        parallel, results re-scattered to input order."""
        groups = self._group(ids)
        futs = {
            s: self.shards[s].contains_batch.remote([ids[p] for p in pos])
            for s, pos in groups.items()
        }
        out = [False] * len(ids)
        for s, pos in groups.items():
            for p, hit in zip(pos, ray.get(futs[s])):
                out[p] = hit
        return out

    def stage(self, ids: list[bytes]) -> None:
        groups = self._group(ids)
        ray.get(
            [self.shards[s].stage.remote([ids[p] for p in pos]) for s, pos in groups.items()]
        )

    def seal(self, epoch: int) -> int:
        return sum(ray.get([s.seal.remote(epoch) for s in self.shards]))

    def staged_total(self) -> int:
        """Total staged (gate-passed) ids — the epoch's fresh count,
        read between the gate's last batch and ``seal``."""
        return sum(ray.get([s.staged_size.remote() for s in self.shards]))

    def digests(self) -> list[str]:
        return ray.get([s.digest.remote() for s in self.shards])

    def total_size(self) -> int:
        return sum(ray.get([s.size.remote() for s in self.shards]))

    def dump_added(self) -> set[bytes]:
        out: set[bytes] = set()
        for part in ray.get([s.dump_added.remote() for s in self.shards]):
            out.update(part)
        return out

    def handles(self) -> list:
        return list(self.shards)

    def serialize_all(self) -> list[tuple[bytes, list[bytes], int]]:
        return ray.get([s.serialize.remote() for s in self.shards])

    def take_deltas(self) -> list[list[tuple[int, list[bytes]]]]:
        return ray.get([s.take_deltas.remote() for s in self.shards])

    def restore_all(self, blobs: list[tuple[bytes, list[bytes], int]]) -> None:
        ray.get(
            [
                s.restore.remote(blob, added, epoch)
                for s, (blob, added, epoch) in zip(self.shards, blobs)
            ]
        )


class SeenGate:
    """``map_batches`` callable running INSIDE Ray Data tasks: the
    dedup semi-join (J7/D1). Tests each candidate batch against the
    shard pool (read-only), drops already-seen rows, and stages the
    fresh ids on their shards so the driver's epoch-commit ``seal``
    inserts them canonically. One RPC per shard per batch.

    The candidate stream MUST already be globally unique per task_id
    (the groupby(task_id) dedup shuffle runs upstream), which makes the
    read-only test race-free and the staged sets disjoint across
    batches."""

    def __init__(self, shard_handles: list, n_shards: int):
        self.shards = shard_handles
        self.n_shards = n_shards

    def __call__(self, batch):
        import numpy as np
        import pyarrow as pa

        from ..pipelines.crawl import _fixed16_np

        ids = batch.column("task_id").to_pylist()
        if not ids:
            return batch
        # vectorized shard routing: low 8 bytes → uint64 → mod
        arr = _fixed16_np(batch.column("task_id"))
        shards_np = (arr[:, :8].copy().view("<u8").reshape(-1) % np.uint64(self.n_shards)).astype(np.int64)
        groups: dict[int, list[int]] = {}
        for pos, sh in enumerate(shards_np):
            groups.setdefault(int(sh), []).append(pos)
        futs = {
            s: self.shards[s].contains_batch.remote([ids[p] for p in pos])
            for s, pos in groups.items()
        }
        seen_mask = [False] * len(ids)
        for s, pos in groups.items():
            for p, hit in zip(pos, ray.get(futs[s])):
                seen_mask[p] = hit
        fresh_idx = [i for i, hit in enumerate(seen_mask) if not hit]
        fresh = batch.take(pa.array(fresh_idx, type=pa.int64()))
        if fresh_idx:
            fresh_ids = [ids[i] for i in fresh_idx]
            fgroups: dict[int, list[bytes]] = {}
            for tid in fresh_ids:
                fgroups.setdefault(ShardedSeen.shard_of_id(tid, self.n_shards), []).append(tid)
            ray.get([self.shards[s].stage.remote(v) for s, v in fgroups.items()])
        return fresh
