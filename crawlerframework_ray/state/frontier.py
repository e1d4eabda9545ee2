"""Per-bucket frontier actors — the push-based shuffle that replaces
the epoch's sort-based ``groupby(host-bucket).map_groups`` barrier.

Ray 2.49's groupby is a sort shuffle: every epoch paid a ~2-3 s
all-to-all barrier (idle cores at 16+ cpus) between the fused
fetch→expand stage and the admission reduction, plus a full disk
re-read + re-route of the residual frontier (BASELINE.md round-2
scaling decomposition). Here the exchange is PUSH-based and the
frontier is RESIDENT:

- a pool of ``FrontierBucket`` actors, one per host-hash bucket (same
  url ⇒ same host ⇒ same bucket, so per-bucket reduction preserves
  GLOBAL dedup — the round-2 invariant, unchanged);
- the epoch pipeline routes expansion slices to their bucket actors
  *while fetch is still running* (shuffle overlaps compute; no sort
  barrier, no second execution);
- each actor RETAINS its bucket's frontier across epochs, so the
  residual never round-trips through disk: at ``finalize`` the actor
  drops the epoch's wave ids, dedups + seen-gates the new candidates,
  writes its frontier-checkpoint part, and applies the politeness cap
  + partial top-k — the identical reduction round 2 ran inside
  ``map_groups`` (same sorts, same tiebreaks, bit-identical trace).

Retry safety: pushes are idempotent (a deterministic slice id derived
from the slice's content — a retried fused fetch→expand→route task
re-sends byte-identical slices, folded in once); the admission
reduction itself is pure, seen staging is a set union, and the
frontier part name is content-addressed.

At 10^10-URL scale the pool is the standard push-shuffle tradeoff:
bucket count scales with the cluster (hundreds of actors spread across
nodes), each holding its bucket's frontier partition in RAM and
spilling cold rows to its checkpoint part — exactly the layout the
per-epoch parquet checkpoint already persists.

Reference parity: this is the TaskMaster enqueue path
(crawler/utils/priorityqueue.py:39-49 test-and-set + heap push) as a
sharded, streaming exchange instead of a central BerkeleyDB heap.
"""

from __future__ import annotations

import hashlib
import os
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..stages.expand import CANDIDATE_SCHEMA

SORT_COLS = ["priority", "depth", "score", "host", "url"]
_PD_ASC = [True, True, False, True, True]


def bucket_of_hosts(hosts: pa.Array, n_buckets: int) -> np.ndarray:
    """Vectorized host→bucket: crc32 computed once per UNIQUE host in
    the batch (dictionary-encode), scattered back through the indices —
    the round-2 per-row crc32 loop is gone."""
    enc = pc.dictionary_encode(
        hosts.combine_chunks() if isinstance(hosts, pa.ChunkedArray) else hosts
    )
    uniq = enc.dictionary.to_pylist()
    lut = np.array([zlib.crc32(h.encode()) % n_buckets for h in uniq], dtype=np.int64)
    return lut[enc.indices.to_numpy(zero_copy_only=False)]


def _slice_id(tbl: pa.Table, flag: int) -> bytes:
    """Deterministic content id of a routed slice: hashes the columns
    that carry canonical-dedup identity (task_id, depth, parent_url) so
    a retried task's re-sent slice dedups exactly, while two distinct
    slices that happen to share ids (same child via different parents)
    do not collide."""
    d = hashlib.md5()
    d.update(bytes([flag]))
    col = tbl.column("task_id").combine_chunks()
    d.update(col.buffers()[-1].to_pybytes())
    d.update(tbl.column("depth").combine_chunks().buffers()[-1].to_pybytes())
    pu = tbl.column("parent_url").combine_chunks()
    for buf in pu.buffers():
        if buf is not None:
            d.update(buf.to_pybytes())
    return d.digest()


def route_to_buckets_fn(bucket_handles: list, flag: int, no_push: bool = False):
    """map_batches task fn: split the candidate batch by host bucket
    and push each slice to its bucket actor (ack'd — backpressure).
    Emits a 1-row count table; the pipeline's consume triggers it.
    ``no_push`` drops the pushes (perf-isolation experiments only)."""
    n_buckets = len(bucket_handles)

    def fn(t: pa.Table) -> pa.Table:
        t = t.select(CANDIDATE_SCHEMA.names).cast(CANDIDATE_SCHEMA)
        n = t.num_rows
        if n == 0 or no_push:
            return pa.table({"routed": pa.array([n], pa.int64())})
        buckets = bucket_of_hosts(t.column("host"), n_buckets)
        order = np.argsort(buckets, kind="stable")
        sorted_b = buckets[order]
        bounds = np.searchsorted(sorted_b, np.arange(n_buckets + 1))
        futs = []
        for b in range(n_buckets):
            lo, hi = bounds[b], bounds[b + 1]
            if lo == hi:
                continue
            sl = t.take(pa.array(order[lo:hi], pa.int64()))
            futs.append(bucket_handles[b].push.remote(sl, flag, _slice_id(sl, flag)))
        ray.get(futs)
        return pa.table({"routed": pa.array([n], pa.int64())})

    return fn


@ray.remote(num_cpus=0)
class FrontierBucket:
    """One host-hash bucket of the frontier. ``num_cpus=0``: the actor
    is lookaside state plus a short vectorized reduction per epoch — it
    must not hold CPU slots against the fetch stage."""

    def __init__(self, bucket_id: int):
        self.bucket_id = bucket_id
        self._reset_run(None, 0, 0, 0, None)

    def _reset_run(self, shard_handles, n_shards, host_budget, wave_size, robots_seed):
        self.shards = shard_handles
        self.n_shards = n_shards
        self.host_budget = host_budget
        self.wave_size = wave_size
        self.robots_seed = robots_seed
        self.cand_parts: list[pa.Table] = []
        self.res_parts: list[pa.Table] = []
        self.frontier: pa.Table | None = None
        self.capped: pa.Table = CANDIDATE_SCHEMA.empty_table()
        self._folded: set[bytes] = set()

    def reset(self, shard_handles, n_shards, host_budget, wave_size, robots_seed) -> int:
        """Bind the actor to a new engine run (the pool is session-cached
        — engine runs are sequential per driver process)."""
        self._reset_run(shard_handles, n_shards, host_budget, wave_size, robots_seed)
        return self.bucket_id

    def push(self, tbl: pa.Table, flag: int, slice_id: bytes) -> int:
        if slice_id in self._folded:
            return tbl.num_rows
        self._folded.add(slice_id)
        (self.cand_parts if flag == 0 else self.res_parts).append(tbl)
        return tbl.num_rows

    # ---------------------------------------------------------- epoch
    def finalize(self, drop_wave_n: int, sink_dir: str | None) -> int:
        """The epoch reduction — semantics identical to round 2's
        ``map_groups`` fn (pipelines/crawl.py history): residual =
        retained frontier minus the epoch's wave; canonical dedup of
        new candidates (min (depth, parent_url) per (url, priority));
        seen-gate semi-join (read-only contains + stage, batched per
        shard); frontier = fresh ∪ residual, written as this bucket's
        content-addressed checkpoint part; politeness cap + partial
        top-k → ``capped``. Retains the frontier for the next epoch.
        Returns len(capped).

        ``drop_wave_n``: how many rows of this bucket's PREVIOUS capped
        table were selected into the epoch's wave. Because ``capped``
        is sorted by the exact global wave key, the global top-K
        restricted to this bucket is always a prefix — so the wave ids
        to drop are bucket-LOCAL (no cross-actor wave-id broadcast)."""
        res_tables = self.res_parts
        if self.frontier is not None:
            res_tables = res_tables + [self.frontier]
        res = (
            pa.concat_tables(res_tables) if res_tables else CANDIDATE_SCHEMA.empty_table()
        )
        if drop_wave_n and res.num_rows:
            wave_ids = (
                self.capped.column("task_id").slice(0, drop_wave_n).combine_chunks()
            )
            res = res.filter(pc.invert(pc.is_in(res.column("task_id"), value_set=wave_ids)))
        cand = (
            pa.concat_tables(self.cand_parts)
            if self.cand_parts
            else CANDIDATE_SCHEMA.empty_table()
        )
        self.cand_parts, self.res_parts = [], []
        self._folded.clear()

        cand_pd = cand.to_pandas()
        if len(cand_pd):
            # canonical dedup: min (depth, parent_url) per (url, priority)
            cand_pd = cand_pd.sort_values(
                ["depth", "parent_url"], kind="mergesort"
            ).drop_duplicates(subset=["url", "priority"], keep="first")
            ids = [bytes(x) for x in cand_pd["task_id"]]
            # vectorized shard routing (low 8 id bytes → uint64 → mod)
            arr = np.frombuffer(b"".join(ids), dtype=np.uint8).reshape(-1, 16)
            shards_np = (
                arr[:, :8].copy().view("<u8").reshape(-1) % np.uint64(self.n_shards)
            ).astype(np.int64)
            order = np.argsort(shards_np, kind="stable")
            bounds = np.searchsorted(shards_np[order], np.arange(self.n_shards + 1))
            futs = {}
            for s in range(self.n_shards):
                pos = order[bounds[s]:bounds[s + 1]]
                if len(pos):
                    futs[s] = (pos, self.shards[s].contains_batch.remote([ids[p] for p in pos]))
            mask = np.zeros(len(ids), dtype=bool)
            stage_futs = []
            for s, (pos, fut) in futs.items():
                hits = np.asarray(ray.get(fut), dtype=bool)
                mask[pos] = hits
                fresh_ids = [ids[p] for p in pos[~hits]]
                if fresh_ids:
                    stage_futs.append(self.shards[s].stage.remote(fresh_ids))
            if stage_futs:
                ray.get(stage_futs)
            fresh = cand_pd[~mask]
        else:
            fresh = cand_pd
        frontier = pd.concat([fresh, res.to_pandas()], ignore_index=True)
        if len(frontier):
            tbl = (
                pa.Table.from_pandas(frontier, preserve_index=False)
                .select(CANDIDATE_SCHEMA.names)
                .cast(CANDIDATE_SCHEMA)
            )
        else:
            tbl = CANDIDATE_SCHEMA.empty_table()
        self.frontier = tbl
        # frontier-checkpoint side effect (content-addressed part)
        if sink_dir is not None and len(frontier):
            import pyarrow.parquet as pq_mod

            os.makedirs(sink_dir, exist_ok=True)
            part_id = hashlib.md5(
                b"".join(sorted(bytes(x) for x in frontier["task_id"]))
            ).hexdigest()
            tmp = os.path.join(sink_dir, f".part-{part_id}.tmp")
            pq_mod.write_table(tbl, tmp)
            os.replace(tmp, os.path.join(sink_dir, f"part-{part_id}.parquet"))
        # politeness cap + per-bucket partial top-k (the wave key sort)
        g2 = frontier.sort_values(
            SORT_COLS[:2] + ["score", "url"], ascending=_PD_ASC[:4], kind="mergesort"
        )
        ranks = g2.groupby("host", sort=False).cumcount().to_numpy()
        if self.robots_seed is not None:
            from ..pipelines.crawl import _robots_cache

            rc = _robots_cache(self.robots_seed)
            budgets = {h: rc.host_budget(h, self.host_budget) for h in g2["host"].unique()}
            lim = g2["host"].map(budgets).to_numpy()
        else:
            lim = self.host_budget
        if len(g2):
            g2 = g2[ranks < lim]
        if len(g2) > self.wave_size:
            g2 = g2.sort_values(SORT_COLS, ascending=_PD_ASC, kind="mergesort").head(
                self.wave_size
            )
        self.capped = (
            pa.Table.from_pandas(g2, preserve_index=False)
            .select(CANDIDATE_SCHEMA.names)
            .cast(CANDIDATE_SCHEMA)
            if len(g2)
            else CANDIDATE_SCHEMA.empty_table()
        )
        return self.capped.num_rows

    def capped_table(self) -> pa.Table:
        return self.capped

    def capped_keys(self) -> pa.Table:
        """Slim sort-key projection of ``capped`` (already in global
        wave-key order) for the keys-only selection task."""
        return self.capped.select(["priority", "depth", "score", "host", "url"])

    def wave_slice(self, n: int, epoch: int) -> pa.Table:
        """First ``n`` rows of ``capped`` (== this bucket's share of the
        global top-K, by the prefix property) with the epoch column
        stamped — one wave block, read straight out of the actor."""
        t = self.capped.slice(0, n)
        i = t.schema.get_field_index("epoch")
        return t.set_column(
            i, pa.field("epoch", pa.int32()),
            pa.array(np.full(t.num_rows, epoch, np.int32)),
        )


@ray.remote(num_cpus=1)
def select_wave(k: int, record_trace: bool, *key_tables) -> tuple:
    """The global wave cut WITHOUT a sort shuffle: each bucket's capped
    table is already sorted by the global wave key, so global-top-K ∩
    bucket is a PREFIX of that bucket — selection reduces to computing
    64 prefix lengths from the slim keys-only projections in ONE task
    (replaces round 2's per-epoch Dataset sort + limit + repartition:
    two extra executions and an all-to-all, ~3-5 s of barrier at 16+
    cpus). Keys are bounded by min(hosts × budget, buckets × K) rows ×
    five slim columns. Returns (per-bucket counts, sorted trace frame
    or None). Determinism: the same stable mergesort + full-tiebreak
    key as the driver fast path — identical wave on both paths."""
    dfs = []
    for b, t in enumerate(key_tables):
        df = t.to_pandas()
        df["__b"] = b
        dfs.append(df)
    allk = pd.concat(dfs, ignore_index=True)
    allk = allk.sort_values(SORT_COLS, ascending=_PD_ASC, kind="mergesort").head(k)
    ns = np.bincount(allk["__b"].to_numpy(), minlength=len(key_tables)).tolist()
    trace = (
        allk[["url", "depth", "priority"]].reset_index(drop=True) if record_trace else None
    )
    return ns, trace


_PROCESS_BUCKET_POOLS: dict[int, list] = {}


class BucketPool:
    """Driver-side handle to the bucket-actor pool. Actor processes are
    session-cached (spawned once per driver process, rebound per engine
    run via ``reset``) — 32-64 process spawns per run would otherwise
    land inside every measured run."""

    def __init__(self, n_buckets: int, shard_handles: list, n_shards: int,
                 host_budget: int, wave_size: int, robots_seed: int | None):
        self.n_buckets = n_buckets
        self._capped_counts: list[int] = [0] * n_buckets
        self.buckets = self._handles(n_buckets)
        ray.get([
            b.reset.remote(shard_handles, n_shards, host_budget, wave_size, robots_seed)
            for b in self.buckets
        ])

    @staticmethod
    def _handles(n_buckets: int) -> list:
        handles = _PROCESS_BUCKET_POOLS.get(n_buckets)
        if handles is None:
            handles = [FrontierBucket.remote(i) for i in range(n_buckets)]
            _PROCESS_BUCKET_POOLS[n_buckets] = handles
        return handles

    @classmethod
    def warm(cls, n_buckets: int) -> None:
        """Pre-spawn the actor processes (cold-start isolation for
        benchmarks)."""
        ray.get([b.reset.remote(None, 0, 0, 0, None) for b in cls._handles(n_buckets)])

    def handles(self) -> list:
        return list(self.buckets)

    def finalize_all(self, drop_ns: list[int] | None, sink_dir: str | None) -> int:
        """Run the epoch reduction on every bucket in parallel; returns
        the total capped-row count. ``drop_ns[b]`` = how many rows of
        bucket b's previous capped prefix entered the epoch's wave
        (bucket-local residual drop — no wave-id broadcast)."""
        if drop_ns is None:
            drop_ns = [0] * self.n_buckets
        self._capped_counts = ray.get(
            [b.finalize.remote(n, sink_dir) for b, n in zip(self.buckets, drop_ns)]
        )
        return sum(self._capped_counts)

    def capped_counts(self) -> list[int]:
        return list(self._capped_counts)

    def keys_refs(self) -> list:
        """Slim key projections of every bucket (bucket order — index
        IS the bucket id for select_wave)."""
        return [b.capped_keys.remote() for b in self.buckets]

    def wave_refs(self, ns: list[int], epoch: int) -> list:
        """Per-bucket wave slices (non-empty buckets only)."""
        return [
            b.wave_slice.remote(n, epoch) for b, n in zip(self.buckets, ns) if n > 0
        ]

    def capped_refs(self) -> list:
        """Refs to the NON-EMPTY buckets' capped tables only: Ray's sort
        passes an empty input block through with an empty schema, which
        poisons every downstream concat/sort (`from_arrow_refs` has no
        schema argument)."""
        return [
            b.capped_table.remote()
            for b, n in zip(self.buckets, self._capped_counts)
            if n > 0
        ]
