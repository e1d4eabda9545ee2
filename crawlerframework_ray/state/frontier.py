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
nodes), each holding only the HOT PREFIX of its bucket's frontier
partition in RAM. Above ``spill_max_resident`` rows the actor spills
the cold tail — per-host rank ≥ budget × ``spill_slack`` under the
exact cap sort — to an actor-owned content-addressed parquet part,
hard-linked into every epoch checkpoint (checkpoints stay complete
without rewriting cold bytes). Reload is lazy and EXACT: a cold part
is folded back only when it could change the politeness cap — some
cold host's hot count fell below its budget, or the host's worst
admitted hot row no longer outranks its best spilled row (per-host
boundary-key check). Between reloads the cap computed from the hot
prefix is provably identical to the resident-path cap, so the crawl
trace is bit-identical with spill on or off (gated in
tests/test_crawl_stress.py). Actor memory is bounded by
hosts-per-bucket × budget × slack + wave-slice churn instead of total
frontier size — the only structure that previously grew with the
10^10-URL axis.

Reference parity: this is the TaskMaster enqueue path
(crawler/utils/priorityqueue.py:39-49 test-and-set + heap push) as a
sharded, streaming exchange instead of a central BerkeleyDB heap.
"""

from __future__ import annotations

import hashlib
import os
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..stages.expand import CANDIDATE_SCHEMA

# the global wave key (total order; url,priority unique after the gate)
WAVE_SORT_KEYS = [("priority", "ascending"), ("depth", "ascending"),
                  ("score", "descending"), ("host", "ascending"),
                  ("url", "ascending")]


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


FLAG_RETRY = 2  # requeued transient-failure rows: no seen gate, no wave drop


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
        # retry requeues (times_reenqueued > 0, cfg.failures) ride the
        # same exchange under FLAG_RETRY: folded into the frontier AFTER
        # the wave-id drop and WITHOUT the seen gate — the url is
        # already sealed; re-admission is the point
        re_np = (
            t.column("times_reenqueued").to_numpy(zero_copy_only=False)
            if flag == 0
            else None
        )
        if re_np is not None and not (re_np > 0).any():
            re_np = None  # no retries in this batch: single-flag fast path
        futs = []
        for b in range(n_buckets):
            lo, hi = bounds[b], bounds[b + 1]
            if lo == hi:
                continue
            idx = order[lo:hi]
            if re_np is not None and (re_np[idx] > 0).any():
                for fl, sub in ((0, idx[re_np[idx] == 0]), (FLAG_RETRY, idx[re_np[idx] > 0])):
                    if len(sub):
                        sl = t.take(pa.array(sub, pa.int64()))
                        futs.append(
                            bucket_handles[b].push.remote(sl, fl, _slice_id(sl, fl))
                        )
            else:
                sl = t.take(pa.array(idx, pa.int64()))
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
        if not os.environ.get("CFRAY_BUCKET_ARROW_THREADS"):
            # the pool runs ~one actor per CPU; Arrow's default
            # per-process thread pool (= all host cores) makes every
            # actor's sort/take fan out across the whole box at once
            pa.set_cpu_count(1)
            pa.set_io_thread_count(1)
        self.bucket_id = bucket_id
        self._reset_run(None, 0, 0, 0, None)

    def _reset_run(self, shard_handles, n_shards, host_budget, wave_size, robots_seed,
                   spill_dir=None, max_resident=0, spill_slack=8,
                   adaptive=False, backoff_init=None):
        self.shards = shard_handles
        self.n_shards = n_shards
        self.host_budget = host_budget
        self.wave_size = wave_size
        self.robots_seed = robots_seed
        self.cand_parts: list[pa.Table] = []
        self.res_parts: list[pa.Table] = []
        self.retry_parts: list[pa.Table] = []
        self._pending: dict[int, list] = {0: [], 1: [], FLAG_RETRY: []}
        self.frontier: pa.Table | None = None
        self.capped: pa.Table = CANDIDATE_SCHEMA.empty_table()
        self._folded: set[bytes] = set()
        # cold-tail spill state (module docstring): actor-owned parquet
        # parts holding the frontier rows NOT resident in self.frontier
        self.spill_dir = (
            os.path.join(spill_dir, f"bucket-{self.bucket_id}") if spill_dir else None
        )
        self.max_resident = int(max_resident or 0)
        self.spill_slack = int(spill_slack)
        if self.spill_dir:
            import shutil as _shutil

            # unlink prior-run cold parts (checkpoint dirs hold hard
            # links to the same inodes — their bytes survive)
            _shutil.rmtree(self.spill_dir, ignore_errors=True)
        # AIMD politeness backoff (cfg.adaptive_politeness): host ->
        # halving exponent; effective budget = max(1, base >> backoff).
        # +1 per epoch with a transient failure on the host (the retry
        # rows ARE the signal), -1 per clean epoch. Spill/cap-safety
        # keep using the BASE budget — an upper bound on the effective
        # one, so hot-prefix retention stays conservative-exact.
        self.adaptive = bool(adaptive)
        self.backoff: dict[str, int] = dict(backoff_init or {})
        self.cold_parts: list[str] = []
        self.cold_counts: dict[str, int] = {}      # host -> spilled rows
        self.cold_best: dict[str, tuple] = {}      # host -> min cap-key tuple
        self.n_spills = 0
        self.n_reloads = 0

    def reset(self, shard_handles, n_shards, host_budget, wave_size, robots_seed,
              spill_dir=None, max_resident=0, spill_slack=8,
              adaptive=False, backoff_init=None) -> int:
        """Bind the actor to a new engine run (the pool is session-cached
        — engine runs are sequential per driver process)."""
        self._reset_run(shard_handles, n_shards, host_budget, wave_size, robots_seed,
                        spill_dir, max_resident, spill_slack, adaptive, backoff_init)
        return self.bucket_id

    def backoff_snapshot(self) -> dict:
        return dict(self.backoff)

    def set_backoff(self, merged: dict) -> None:
        """Resume restore: each bucket keeps only the hosts that hash
        to it — harmless to store the merged dict (lookups are by this
        bucket's own hosts)."""
        self.backoff = dict(merged)

    COMPACT_EVERY = 32

    @staticmethod
    def _own(tables: list) -> pa.Table:
        """Deep-copy tables into one actor-owned heap table (IPC round
        trip — guaranteed fresh buffers, no plasma references)."""
        cat = pa.concat_tables(tables)
        sink = pa.BufferOutputStream()
        with pa.ipc.new_stream(sink, cat.schema) as w:
            w.write_table(cat)
        return pa.ipc.open_stream(sink.getvalue()).read_all()

    def _compact(self, flag: int, force: bool = False) -> None:
        """Fold pending plasma-backed slices into owned heap memory.
        Retaining every zero-copy pushed slice until finalize meant
        thousands of shared-memory objects across the pool all dropping
        their mappings at once — a munmap/TLB-shootdown storm measured
        at ~250 cpu-s of kernel sys + ~220 cpu-s of hypervisor steal
        per epoch at 1.47M-row waves, inflating every concurrent memcpy
        40-100×. Copying per push put the memcpy on the ack critical
        path instead (~2-4 s of route at 368k waves, A/B-measured), so
        the copy is BATCHED: every COMPACT_EVERY slices, off most acks,
        freeing plasma objects in small waves throughout the route
        phase."""
        pend = self._pending[flag]
        if not pend or (len(pend) < self.COMPACT_EVERY and not force):
            return
        dest = (
            self.cand_parts if flag == 0
            else self.retry_parts if flag == FLAG_RETRY
            else self.res_parts
        )
        dest.append(self._own(pend))
        pend.clear()

    def push(self, tbl: pa.Table, flag: int, slice_id: bytes) -> int:
        if slice_id in self._folded:
            return tbl.num_rows
        self._folded.add(slice_id)
        self._pending[flag].append(tbl)
        self._compact(flag)
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
        import time as _time

        _dbg = os.environ.get("CFRAY_BUCKET_STATS") and self.bucket_id == 0
        _t = _time.monotonic()
        _marks = []

        _c = _time.process_time()

        def _mark(label):
            nonlocal _t, _c
            if _dbg:
                now, cnow = _time.monotonic(), _time.process_time()
                _marks.append(f"{label}={now - _t:.2f}/c{cnow - _c:.2f}")
                _t, _c = now, cnow

        self._compact(0, force=True)
        self._compact(1, force=True)
        self._compact(FLAG_RETRY, force=True)
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
        if self.adaptive and sink_dir is not None:
            # AIMD step — only at an epoch-END finalize (sink_dir set):
            # seed-admission and resume re-cap finalizes process no
            # wave, so no recovery tick may run there (bit-identical
            # resume depends on it). This finalize's retry rows are the
            # epoch's transient failures — additive recovery first,
            # then the multiplicative backoff for hosts that failed
            retry_hosts = set()
            for t in self.retry_parts:
                retry_hosts.update(t.column("host").to_pylist())
            for h in [h for h, v in self.backoff.items() if h not in retry_hosts]:
                self.backoff[h] -= 1
                if self.backoff[h] <= 0:
                    del self.backoff[h]
            for h in retry_hosts:
                self.backoff[h] = min(self.backoff.get(h, 0) + 1, 6)
        if self.retry_parts:
            # transient-failure requeues (cfg.failures): folded AFTER
            # the wave-id drop (their task_id IS in this wave) and
            # never seen-gated — straight back into the frontier
            res = pa.concat_tables([res] + self.retry_parts)
        cand = (
            pa.concat_tables(self.cand_parts)
            if self.cand_parts
            else CANDIDATE_SCHEMA.empty_table()
        )
        self.cand_parts, self.res_parts, self.retry_parts = [], [], []
        self._folded.clear()
        _mark('concat_drop')

        # Everything below runs on Arrow/numpy kernels — the round-3
        # pandas version sorted object-dtype url/host strings three
        # times over the FULL retained frontier every epoch, which went
        # superlinear as the frontier grew (measured 2.25 s → 14.7 s
        # for 250k → 1M rows/bucket; the 1.47M-wave bench's epoch-1
        # finalize hit 26.5 s). Determinism is unchanged: every sort
        # key below is a total order (url,priority unique after the
        # gate), ASCII urls compare identically bytewise (Arrow) and
        # by code point (pandas/oracle), and tied canonical-dedup rows
        # are byte-identical so the winner is too.
        if cand.num_rows:
            cand = cand.combine_chunks()
            _mark('combine')
            # canonical dedup: min (depth, parent_url) per (url, priority)
            order = pc.sort_indices(
                cand,
                sort_keys=[("url", "ascending"), ("priority", "ascending"),
                           ("depth", "ascending"), ("parent_url", "ascending")],
            )
            _mark('sort')
            cand = cand.take(order).combine_chunks()
            _mark('take')
            u = cand.column("url").combine_chunks()
            p = cand.column("priority").combine_chunks().to_numpy()
            first = np.empty(cand.num_rows, dtype=bool)
            first[0] = True
            if cand.num_rows > 1:
                neq_u = pc.not_equal(
                    u.slice(1), u.slice(0, len(u) - 1)
                ).to_numpy(zero_copy_only=False)
                first[1:] = neq_u | (p[1:] != p[:-1])
            cand = cand.filter(pa.array(first))
            _mark('canon_dedup')
            # seen gate: packed-id RPC per shard + vectorized membership
            from ..pipelines.crawl import _fixed16_np

            arr = _fixed16_np(cand.column("task_id"))
            shards_np = (
                arr[:, :8].copy().view("<u8").reshape(-1) % np.uint64(self.n_shards)
            ).astype(np.int64)
            order = np.argsort(shards_np, kind="stable")
            bounds = np.searchsorted(shards_np[order], np.arange(self.n_shards + 1))
            futs = {}
            for s in range(self.n_shards):
                pos = order[bounds[s]:bounds[s + 1]]
                if len(pos):
                    futs[s] = (pos, self.shards[s].contains_packed.remote(arr[pos].tobytes()))
            mask = np.zeros(len(arr), dtype=bool)
            stage_futs = []
            for s, (pos, fut) in futs.items():
                hits = np.frombuffer(ray.get(fut), dtype=np.uint8).astype(bool)
                mask[pos] = hits
                fresh_pos = pos[~hits]
                if len(fresh_pos):
                    stage_futs.append(self.shards[s].stage_packed.remote(arr[fresh_pos].tobytes()))
            if stage_futs:
                ray.get(stage_futs)
            fresh = cand.filter(pa.array(~mask))
            _mark('seen_gate')
        else:
            fresh = cand
        tbl = pa.concat_tables([fresh, res]).combine_chunks()
        _mark('frontier_concat')
        srt, info = self._sort_rank(tbl) if tbl.num_rows else (tbl, None)
        # lazy cold reload — EXACT safety check: fold spilled parts back
        # only when they could change this epoch's politeness cap
        if self.cold_parts and (info is None or self._cap_unsafe(srt, info)):
            tbl = pa.concat_tables([srt, self._load_cold()]).combine_chunks()
            srt, info = self._sort_rank(tbl)
            self.n_reloads += 1
        _mark('sort')
        # frontier-checkpoint side effect: hot part + cold-part links
        # (full frontier = hot ∪ cold is on disk in every epoch dir)
        if sink_dir is not None:
            self._write_checkpoint(srt, sink_dir)
            _mark('ckpt_write')
        # politeness cap + per-bucket partial top-k (the wave key sort)
        if info is not None:
            g2 = srt.filter(pa.array(info["ranks"] < info["lim"]))
            if g2.num_rows > self.wave_size:
                g2 = g2.take(
                    pc.sort_indices(g2, sort_keys=WAVE_SORT_KEYS)
                ).slice(0, self.wave_size)
            self.capped = g2.combine_chunks()
        else:
            self.capped = CANDIDATE_SCHEMA.empty_table()
        _mark('cap')
        # cold-tail spill: retain only the hot prefix beyond the
        # resident threshold (AFTER the checkpoint write — this epoch's
        # hot part still carries the rows being spilled; they enter the
        # linked cold part from the NEXT epoch's checkpoint on)
        if (
            self.max_resident
            and self.spill_dir
            and srt.num_rows > self.max_resident
        ):
            self._spill(srt, info)
        else:
            self.frontier = srt
        _mark('spill')
        if _dbg:
            print(f"[bucket0] rows cand={cand.num_rows} res={res.num_rows} " + " ".join(_marks), flush=True)
        return self.capped.num_rows

    # ------------------------------------------------- cold-tail spill
    def _sort_rank(self, tbl: pa.Table):
        """Cap-key sort + per-host rank/budget arrays (the shared
        machinery of the politeness cap, the reload-safety check and
        the spill cut)."""
        srt = tbl.take(pc.sort_indices(
            tbl,
            sort_keys=[("priority", "ascending"), ("depth", "ascending"),
                       ("score", "descending"), ("url", "ascending")],
        )).combine_chunks()
        henc = pc.dictionary_encode(srt.column("host").combine_chunks())
        codes = henc.indices.to_numpy()
        horder = np.argsort(codes, kind="stable")
        sc = codes[horder]
        n = len(sc)
        starts = np.r_[0, np.flatnonzero(sc[1:] != sc[:-1]) + 1]
        ranks_sorted = np.arange(n) - np.repeat(starts, np.diff(np.r_[starts, n]))
        ranks = np.empty(n, dtype=np.int64)
        ranks[horder] = ranks_sorted
        if self.robots_seed is not None:
            from ..pipelines.crawl import _robots_cache

            rc = _robots_cache(self.robots_seed)
            barr = np.array(
                [rc.host_budget(h, self.host_budget)
                 for h in henc.dictionary.to_pylist()],
                dtype=np.int64,
            )
            lim = barr[codes]
        else:
            barr = None
            lim = self.host_budget
        if self.adaptive and self.backoff:
            # effective = max(1, base >> backoff); base stays the bound
            # used by spill retention + the reload-safety check
            boff = np.array(
                [self.backoff.get(h, 0) for h in henc.dictionary.to_pylist()],
                dtype=np.int64,
            )
            base = barr if barr is not None else np.full(
                len(boff), self.host_budget, np.int64
            )
            lim = np.maximum(1, base >> boff)[codes]
        info = {
            "henc": henc, "codes": codes, "ranks": ranks, "lim": lim,
            "barr": barr, "horder": horder, "starts": starts, "sc": sc,
        }
        return srt, info

    def _host_budget_of(self, host: str) -> int:
        if self.robots_seed is not None:
            from ..pipelines.crawl import _robots_cache

            return _robots_cache(self.robots_seed).host_budget(host, self.host_budget)
        return self.host_budget

    @staticmethod
    def _row_key(srt: pa.Table, i: int) -> tuple:
        """Total-order cap key of row ``i`` (score negated so plain
        tuple `<` runs the exact sort order; urls are unique per
        (url, priority) so ties are impossible)."""
        return (
            srt.column("priority")[i].as_py(),
            srt.column("depth")[i].as_py(),
            -float(srt.column("score")[i].as_py()),
            srt.column("url")[i].as_py(),
        )

    def _cap_unsafe(self, srt: pa.Table, info) -> bool:
        """True iff a spilled row could enter the politeness cap: some
        cold host has fewer hot rows than its budget, or its worst
        admitted hot row (rank budget-1) no longer strictly outranks
        its best spilled row. While False, cap-from-hot ≡ cap-from-full
        (every cold row of host h is outranked by ≥ budget_h hot rows
        of h, so it cannot be in h's top-budget)."""
        hosts = info["henc"].dictionary.to_pylist()
        code_of = {h: c for c, h in enumerate(hosts)}
        starts, sc, horder = info["starts"], info["sc"], info["horder"]
        run_codes = sc[starts] if len(sc) else np.empty(0, np.int64)
        run_of = {int(c): r for r, c in enumerate(run_codes)}
        counts_run = np.diff(np.r_[starts, len(sc)])
        for h, best in self.cold_best.items():
            c = code_of.get(h)
            if c is None:
                return True  # host has cold rows but no hot rows at all
            b = self._host_budget_of(h)
            r = run_of[int(c)]
            if counts_run[r] < b:
                return True  # hot can't even fill the budget
            boundary_i = int(horder[starts[r] + b - 1])
            if not (self._row_key(srt, boundary_i) < best):
                return True  # a cold row would make the cap
        return False

    def _load_cold(self) -> pa.Table:
        """Fold every cold part back into the resident frontier and
        clear the spill state (the checkpoint links keep the bytes
        alive for old epoch dirs)."""
        import pyarrow.parquet as pq_mod

        parts = [pq_mod.read_table(p) for p in self.cold_parts]
        for p in self.cold_parts:
            try:
                os.unlink(p)
            except OSError:
                pass
        self.cold_parts = []
        self.cold_counts = {}
        self.cold_best = {}
        return pa.concat_tables(parts) if parts else CANDIDATE_SCHEMA.empty_table()

    @staticmethod
    def _part_id(t: pa.Table) -> str:
        """Content-addressed part name: md5 over the bytes-sorted task
        ids (row-order-insensitive)."""
        from ..pipelines.crawl import _fixed16_np

        idarr = _fixed16_np(t.column("task_id"))
        v = idarr.view(np.dtype([("a", ">u8"), ("b", ">u8")])).reshape(-1)
        return hashlib.md5(
            idarr[np.argsort(v, order=("a", "b"), kind="stable")].tobytes()
        ).hexdigest()

    def _write_checkpoint(self, srt: pa.Table, sink_dir: str) -> None:
        import pyarrow.parquet as pq_mod

        if srt.num_rows:
            os.makedirs(sink_dir, exist_ok=True)
            part_id = self._part_id(srt)
            tmp = os.path.join(sink_dir, f".part-{part_id}.tmp")
            pq_mod.write_table(srt, tmp)
            os.replace(tmp, os.path.join(sink_dir, f"part-{part_id}.parquet"))
        if self.cold_parts:
            os.makedirs(sink_dir, exist_ok=True)
        for p in self.cold_parts:
            dst = os.path.join(sink_dir, os.path.basename(p))
            try:
                os.link(p, dst)  # same-fs hard link: no byte copy
            except FileExistsError:
                pass
            except OSError:
                import shutil as _shutil

                _shutil.copyfile(p, dst)  # cross-device fallback

    def _spill(self, srt: pa.Table, info) -> None:
        """Cut the cold tail (per-host rank ≥ budget × slack) out of
        the resident frontier into a new actor-owned parquet part,
        recording per-host spilled counts and best (minimum) cap keys
        for the reload-safety check."""
        import pyarrow.parquet as pq_mod

        keep_per_host = (
            info["barr"][info["codes"]] * self.spill_slack
            if info["barr"] is not None
            else self.host_budget * self.spill_slack
        )
        cold_mask = info["ranks"] >= keep_per_host
        if not cold_mask.any():
            self.frontier = srt  # many small hosts: nothing spillable
            return
        cold_new = srt.filter(pa.array(cold_mask))
        self.frontier = srt.filter(pa.array(~cold_mask))
        os.makedirs(self.spill_dir, exist_ok=True)
        part_id = self._part_id(cold_new)
        path = os.path.join(self.spill_dir, f"part-{part_id}.parquet")
        tmp = path + ".tmp"
        pq_mod.write_table(cold_new, tmp)
        os.replace(tmp, path)
        self.cold_parts.append(path)
        self.n_spills += 1
        # per-host bookkeeping: within a host, srt order == cap-key
        # order, so the FIRST spilled row of each host is its best
        hosts = info["henc"].dictionary.to_pylist()
        sp_codes = info["codes"][cold_mask]
        sp_rows = np.flatnonzero(cold_mask)
        uniq, first_idx, cnts = np.unique(sp_codes, return_index=True, return_counts=True)
        for c, fi, cnt in zip(uniq, first_idx, cnts):
            h = hosts[int(c)]
            key = self._row_key(srt, int(sp_rows[fi]))
            old = self.cold_best.get(h)
            if old is None or key < old:
                self.cold_best[h] = key
            self.cold_counts[h] = self.cold_counts.get(h, 0) + int(cnt)

    def spill_stats(self) -> dict:
        return {
            "resident_rows": 0 if self.frontier is None else self.frontier.num_rows,
            "cold_rows": sum(self.cold_counts.values()),
            "cold_parts": len(self.cold_parts),
            "n_spills": self.n_spills,
            "n_reloads": self.n_reloads,
        }

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
    tabs = [
        t.append_column("__b", pa.array(np.full(t.num_rows, b, np.int32)))
        for b, t in enumerate(key_tables)
    ]
    allk = pa.concat_tables(tabs).combine_chunks()
    # Arrow sort, not pandas: the keys include two object-dtype string
    # columns and this single task used to pay an O(K log K) Python
    # string sort per epoch (5-7 s at 1M+ capped rows). The 5-key wave
    # key is a total order (url,priority unique per bucket), so the
    # bytewise Arrow sort is deterministic and — with ASCII urls —
    # identical to the driver fast path's pandas sort.
    order = pc.sort_indices(allk, sort_keys=WAVE_SORT_KEYS)
    top = allk.take(order.slice(0, k))
    ns = np.bincount(
        top.column("__b").to_numpy(zero_copy_only=False), minlength=len(key_tables)
    ).tolist()
    trace = (
        top.select(["url", "depth", "priority"]).to_pandas() if record_trace else None
    )
    return ns, trace


_PROCESS_BUCKET_POOLS: dict[int, list] = {}


class BucketPool:
    """Driver-side handle to the bucket-actor pool. Actor processes are
    session-cached (spawned once per driver process, rebound per engine
    run via ``reset``) — 32-64 process spawns per run would otherwise
    land inside every measured run."""

    def __init__(self, n_buckets: int, shard_handles: list, n_shards: int,
                 host_budget: int, wave_size: int, robots_seed: int | None,
                 spill_dir: str | None = None, max_resident: int = 0,
                 spill_slack: int = 8, adaptive: bool = False):
        self.n_buckets = n_buckets
        self._capped_counts: list[int] = [0] * n_buckets
        self.buckets = self._handles(n_buckets)
        ray.get([
            b.reset.remote(shard_handles, n_shards, host_budget, wave_size, robots_seed,
                           spill_dir, max_resident, spill_slack, adaptive)
            for b in self.buckets
        ])

    def backoff_merged(self) -> dict:
        merged: dict = {}
        for d in ray.get([b.backoff_snapshot.remote() for b in self.buckets]):
            merged.update(d)  # hosts are bucket-disjoint: no collisions
        return merged

    def set_backoff(self, merged: dict) -> None:
        ray.get([b.set_backoff.remote(merged) for b in self.buckets])

    @staticmethod
    def _handles(n_buckets: int) -> list:
        handles = _PROCESS_BUCKET_POOLS.get(n_buckets)
        if handles is None:
            # SPREAD: num_cpus=0 actors would otherwise pack onto the
            # driver's node — on a multi-node cluster the frontier's
            # resident state must land across node RAM, not one heap
            # (gated by tests/test_cluster_sim.py)
            handles = [
                FrontierBucket.options(scheduling_strategy="SPREAD").remote(i)
                for i in range(n_buckets)
            ]
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

    def spill_stats(self) -> dict:
        """Pool-wide spill telemetry (sums + the max resident bucket)."""
        per = ray.get([b.spill_stats.remote() for b in self.buckets])
        return {
            "resident_rows": sum(s["resident_rows"] for s in per),
            "cold_rows": sum(s["cold_rows"] for s in per),
            "cold_parts": sum(s["cold_parts"] for s in per),
            "n_spills": sum(s["n_spills"] for s in per),
            "n_reloads": sum(s["n_reloads"] for s in per),
            "max_bucket_resident": max(s["resident_rows"] for s in per),
        }

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
