"""The crawl engine: frontier epochs as Ray Data pipelines.

Ray-Data restatement of the reference's TaskMaster loop (SURVEY.md §3):
the global heap (priorityqueue.py:46-49) becomes a per-epoch
sort+limit top-k; per-site caps (crawler.cfg:26-185) become per-host
grouped top-k ("politeness budget"); the enqueue dedup gate
(priorityqueue.py:39-43) becomes the sharded cuckoo SeenGate semi-join;
bdb persistence becomes per-epoch parquet checkpoints.

One epoch = ONE pipelined execution with NO shuffle barrier (round 1
spent 4-6 executions; round 2 fused to one execution + one sort-based
groupby — still a ~2-3 s all-to-all barrier per epoch that idled 16+
cpus; each extra execution costs ~1 s fixed — BASELINE.md scaling
decompositions). Round 3 replaces the groupby with the PUSH-based
bucket-actor exchange (state/frontier.py):

  wave ──map_batches(fetch: results parts written as a side effect;
       bytes never enter the object store)──▶ expand ──▶ route: each
       batch pushed to its host-bucket actor WHILE fetch still runs
       (shuffle overlapped with compute). At epoch finalize, every
       bucket actor — in parallel — drops the wave ids from its
       RETAINED frontier (the residual never round-trips through
       disk), canonically dedups the new candidates, runs the
       seen-gate RPC, writes its frontier-checkpoint part, and applies
       the politeness cap + partial top-k ──▶ capped (per-bucket Arrow
       tables, ≤ min(hosts×budget, buckets×wave_size) rows total).
       Same-url candidates share a host, so host-bucketing preserves
       GLOBAL dedup. The global top-``wave_size`` cut runs driver-side
       while capped is small (≤ ``driver_topk_max``), distributed
       sort+limit beyond.

Determinism: full-tiebreak sort keys (priority, depth, -score, host,
url), canonical min-reduction on duplicate candidates, read-only seen
tests during the epoch with sorted insertion at epoch seal. Given the
same seeds + budgets, crawl order, URL-seen membership and cuckoo
digests are bit-identical across runs, cluster sizes and resumes —
verified against the single-process oracle (pipelines/oracle.py) in
tests/test_crawl.py.

Scale notes: the only driver-materialized state is the wave (bounded
by ``wave_size`` / ``driver_topk_max`` — the designed driver budget)
and per-epoch counters. The frontier is never collected: it flows as a
lazy read of the previous epoch's checkpoint parts (page-cache-warm)
unioned with the in-memory fresh blocks, and its checkpoint write is a
pass-through side effect inside E1 — no standalone write execution and
no write→read round trip on the hot path. Wave-id broadcast is one
``ray.put`` per epoch (16 B per url).
"""

from __future__ import annotations

import os
import re
import time
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..config import CrawlConfig
from ..functions.hashing import task_ids_batch
from ..functions.urlnorm import normalize
from ..sources.store import read_table
from ..stages.expand import CANDIDATE_SCHEMA, expander_task_fn
from ..stages.fetch import fetch_write_task_fn
from ..state.frontier import BucketPool, bucket_of_hosts, route_to_buckets_fn, select_wave
from ..state.hashstore import HashClassifier
from ..state import checkpoint as ckpt
from ..state.seen import ShardedSeen

SORT_COLS = ["priority", "depth", "score", "host", "url"]
SORT_DESC = [False, False, True, False, False]
_PD_ASC = [True, True, False, True, True]


@dataclass
class CrawlSummary:
    epochs: int = 0
    fetched_urls: int = 0
    raw_outlinks: int = 0
    fresh_urls: int = 0
    final_frontier: int = 0
    seen_total: int = 0
    wall_sec: float = 0.0
    per_epoch: list = field(default_factory=list)
    trace: list = field(default_factory=list)  # (epoch, url, depth, priority)
    shard_digests: list = field(default_factory=list)
    # failure model (cfg.failures): transient = requeued, permanent = dropped
    failed_transient_urls: int = 0
    failed_permanent_urls: int = 0
    # update-crawl mode only (hash_store passed to run)
    skipped_urls: int = 0
    updated_urls: int = 0
    new_urls: int = 0
    # frontier cold-tail spill telemetry (state/frontier.py)
    spill: dict = field(default_factory=dict)


N_DEDUP_BUCKETS = 64


def resolve_n_buckets(cfg: CrawlConfig) -> int:
    """Frontier bucket-actor count: explicit config, else ≈ one per CPU
    clamped to [8, N_DEDUP_BUCKETS]. On a real cluster this scales with
    node count; semantics are bucket-count-invariant (config.py note)."""
    if cfg.n_buckets:
        return cfg.n_buckets
    ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return min(N_DEDUP_BUCKETS, max(8, ncpu))

_PROCESS_ROBOTS: dict = {}


def _robots_cache(robots_seed: int):
    """Per-worker-process robots cache (fetched/parsed once per host,
    reused across epochs and dataset executions)."""
    rc = _PROCESS_ROBOTS.get(robots_seed)
    if rc is None:
        from ..functions.robots import RobotsCache

        rc = _PROCESS_ROBOTS[robots_seed] = RobotsCache(robots_seed)
    return rc


def _parquet_dir_rows(path: str) -> int:
    """Row count of a parquet directory from file metadata only."""
    import pyarrow.parquet as pq_mod

    total = 0
    for name in os.listdir(path):
        if name.endswith(".parquet"):
            total += pq_mod.read_metadata(os.path.join(path, name)).num_rows
    return total


def _fixed16_np(col) -> "np.ndarray":
    """(n, 16) uint8 view of a fixed_size_binary(16) column — the
    zero-copy path for vectorized task_id math."""
    import numpy as np

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    buf = col.buffers()[-1]
    a = np.frombuffer(buf, dtype=np.uint8)
    off = col.offset * 16
    return a[off : off + len(col) * 16].reshape(-1, 16)




def _cast_candidates(t: pa.Table) -> pa.Table:
    return t.select(CANDIDATE_SCHEMA.names).cast(CANDIDATE_SCHEMA)




class CrawlEngine:
    def __init__(self, cfg: CrawlConfig):
        self.cfg = cfg
        self.seen: ShardedSeen | None = None
        self.buckets: BucketPool | None = None

    # -------------------------------------------------- seed admission
    @staticmethod
    def _seeds_to_candidates(t: pa.Table, robots_seed: int | None = None) -> pa.Table:
        """Seeds (url,host,depth,priority,score) → candidate rows at
        epoch 0 with normalized urls and task ids. With robots enabled,
        disallowed seeds are rejected at admission — the same gate the
        expander applies to children."""
        from ..data.synth import host_of

        if robots_seed is not None:
            from ..functions.robots import RobotsCache

            rc = RobotsCache(robots_seed)
            keep = [
                not rc.disallowed(normalize(u), host_of(normalize(u)))
                for u in t.column("url").to_pylist()
            ]
            t = t.filter(pa.array(keep, pa.bool_()))
        urls = [normalize(u) for u in t.column("url").to_pylist()]
        pri = t.column("priority").to_pylist()

        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "host": pa.array([host_of(u) for u in urls], pa.string()),
                "depth": t.column("depth").cast(pa.int32()),
                "priority": t.column("priority").cast(pa.int32()),
                "score": t.column("score").cast(pa.float32()),
                "task_id": pa.array(task_ids_batch(urls, pri), pa.binary(16)),
                "epoch": pa.array([0] * len(urls), pa.int32()),
                "parent_url": pa.array([""] * len(urls), pa.string()),
                "times_reenqueued": pa.array([0] * len(urls), pa.int32()),
            },
            schema=CANDIDATE_SCHEMA,
        )

    def _route(self, ds: ray.data.Dataset, flag: int, no_push: bool = False) -> None:
        """Execute ``ds`` with a terminal route-to-buckets stage: every
        candidate batch is pushed to its host-bucket actor while the
        upstream (fetch/expand) is still running — the push-based
        replacement for the epoch's sort shuffle (state/frontier.py)."""
        # route batch_size trades push-RPC volume (one ack'd push per
        # non-empty bucket per batch) against TASK granularity: in a
        # fused chain the LARGEST batch_size sets the rows-per-task
        # bundle, so 32k here collapsed a 300k-row wave to 9 tasks and
        # idled half of 16 cores (measured via ds.stats, round 3). 8192
        # keeps ~36-45 tasks/epoch with ~cpus buckets ≈ 2k pushes.
        routed = ds.map_batches(
            route_to_buckets_fn(self.buckets.handles(), flag, no_push=no_push),
            batch_format="pyarrow",
            batch_size=8192,
        )
        if os.environ.get("CFRAY_ROUTE_STATS"):
            print(routed.materialize().stats())
        else:
            routed.count()

    def _finalize_epoch(self, drop_ns: list[int] | None, sink_dir: str | None,
                        commit_epoch: int | None):
        """Parallel per-bucket epoch reduction (dedup → seen-gate →
        frontier part write → politeness cap; FrontierBucket.finalize),
        then the epoch seal. ``drop_ns`` = per-bucket wave prefix
        lengths (the residual drop is bucket-local). Returns
        (capped_refs, n_capped, n_fresh)."""
        t0 = time.monotonic()
        n_capped = self.buckets.finalize_all(drop_ns, sink_dir)
        refs = self.buckets.capped_refs()
        if commit_epoch is None:
            return refs, n_capped, 0
        t1 = time.monotonic()
        # fresh count = what the gate staged (globally unique upstream),
        # read before seal folds the staging sets into the filters
        n_fresh = self.seen.staged_total()
        self.seen.seal(commit_epoch)
        if os.environ.get("CFRAY_FINAL_STATS"):
            print(f"[final] buckets={t1 - t0:.2f}s seal={time.monotonic() - t1:.2f}s")
        return refs, n_capped, n_fresh

    # -------------------------------------------------- wave selection
    def _wave_from_capped(self, capped) -> pd.DataFrame:
        """Global top-``wave_size`` cut over the materialized capped
        set: driver-side while small (bounded by min(hosts × budget,
        buckets × wave_size)), distributed sort+limit beyond
        ``driver_topk_max``. Both paths produce the identical wave
        (total order, full tiebreak). Accepts the driver-resident
        DataFrame the seed fast path produces."""
        cfg = self.cfg
        if isinstance(capped, pd.DataFrame):
            return capped.sort_values(SORT_COLS, ascending=_PD_ASC, kind="mergesort").head(
                cfg.wave_size
            )
        if capped.count() > cfg.driver_topk_max:
            # per-block partial top-k already ran in cap_bucket, so this
            # sort shuffle moves ≤ buckets × wave_size rows
            wave_pd = (
                capped.sort(SORT_COLS, descending=SORT_DESC).limit(cfg.wave_size).to_pandas()
            )
            return wave_pd.sort_values(SORT_COLS, ascending=_PD_ASC, kind="mergesort")
        wave_pd = capped.to_pandas()
        return wave_pd.sort_values(SORT_COLS, ascending=_PD_ASC, kind="mergesort").head(
            cfg.wave_size
        )

    def _wave_dataset(self, wave_pd: pd.DataFrame, epoch: int) -> ray.data.Dataset:
        """Driver-side wave blocks: the wave is already on the driver
        (bounded by wave_size), so slicing it into ~2 blocks/core avoids
        an in-execution Repartition all-to-all and a set_epoch stage."""
        tbl = pa.Table.from_pandas(wave_pd, preserve_index=False)
        tbl = tbl.select(CANDIDATE_SCHEMA.names).cast(CANDIDATE_SCHEMA)
        i = tbl.schema.get_field_index("epoch")
        tbl = tbl.set_column(i, "epoch", pa.array([epoch] * len(tbl), pa.int32()))
        n_cpus_avail = int(ray.cluster_resources().get("CPU", 8))
        # ~4 blocks/core: fine enough that one straggler task costs
        # ~w/(4c), coarse enough that per-task overhead stays small
        n_blocks = max(4, min((len(tbl) // self.cfg.fetch_batch_size) + 1, 4 * n_cpus_avail))
        step = max(1, -(-len(tbl) // n_blocks))
        chunks = [tbl.slice(off, step) for off in range(0, len(tbl), step)]
        return ray.data.from_arrow(chunks)

    # -------------------------------------------------- checkpointing
    def _frontier_dir(self, epoch: int) -> str:
        return os.path.join(ckpt.epoch_dir(self.cfg.workdir, epoch), "frontier")

    def _commit_epoch_checkpoint(self, epoch: int, staging: str, counters: dict) -> None:
        """Commit epoch ``epoch``'s frontier parts (written as a side
        effect of the epoch execution) and then write the manifest.
        Manifest-last ordering means a manifest implies a complete
        frontier on disk."""
        import shutil as _shutil

        cfg = self.cfg
        fdir = self._frontier_dir(epoch)
        os.makedirs(ckpt.epoch_dir(cfg.workdir, epoch), exist_ok=True)
        if not os.path.exists(staging):  # empty frontier produced no parts
            os.makedirs(staging)
            import pyarrow.parquet as _pq

            _pq.write_table(CANDIDATE_SCHEMA.empty_table(), os.path.join(staging, "empty.parquet"))
        if os.path.exists(fdir):
            _shutil.rmtree(fdir)
        os.replace(staging, fdir)
        ckpt.write_checkpoint(
            cfg.workdir,
            epoch,
            self.seen.take_deltas(),
            self.seen.digests(),
            counters,
            cfg.fingerprint(),
            cfg.shard_capacity,
        )

    # -------------------------------------------------- main loop
    def run(self, seeds: pa.Table | None = None, resume: bool = False,
            hash_store=None) -> CrawlSummary:
        """``hash_store`` (state/hashstore.HashStore, update-crawl
        mode): classify every fetched row against the cross-run
        content-hash store inside the fetch task — unchanged rows are
        skipped at the results write, changed/new rows are written with
        ``update_status`` (1/2) and their hashes staged; the store
        seals with each epoch. The crawl schedule (trace) is untouched:
        the seen set stays RUN-scoped dedup, exactly the reference's
        priority-queue vs session_info split."""
        cfg = self.cfg
        t0 = time.monotonic()
        os.makedirs(cfg.workdir, exist_ok=True)
        # Ray Data's default per-operator resource reservation (50%)
        # starves the fused fetch→expand map stage that feeds each
        # epoch's groupby when CPUs are scarce — measured 4× map-stage
        # serialization at 4 CPUs (tasks ran one at a time). The epoch
        # pipeline is a short chain of bounded stages; reservation buys
        # no backpressure safety here, so turn it off for engine runs.
        ray.data.DataContext.get_current().op_resource_reservation_enabled = False
        self.seen = ShardedSeen(cfg.n_shards, cfg.shard_capacity)
        # the host-bucket frontier pool: push-based shuffle target +
        # resident frontier partitions (state/frontier.py)
        if cfg.adaptive_politeness and not cfg.failures:
            raise ValueError(
                "adaptive_politeness needs failures=True: the AIMD signal "
                "is the transient-failure retry stream"
            )
        self.buckets = BucketPool(
            resolve_n_buckets(cfg), self.seen.handles(), cfg.n_shards, cfg.host_budget,
            cfg.wave_size, cfg.web.seed if cfg.robots else None,
            spill_dir=os.path.join(cfg.workdir, "spill"),
            max_resident=cfg.spill_max_resident, spill_slack=cfg.spill_slack,
            adaptive=cfg.adaptive_politeness,
        )
        summary = CrawlSummary()
        import shutil as _shutil

        start_epoch = 0
        capped_refs: list = []
        n_capped = 0
        if resume:
            last = ckpt.latest_epoch(cfg.workdir)
            if last is None:
                resume = False
            else:
                manifest = ckpt.load_manifest(cfg.workdir, last)
                if manifest["config_fingerprint"] != cfg.fingerprint():
                    raise ValueError("checkpoint was written under different semantics")
                self.seen.restore_all(ckpt.load_shards(cfg.workdir, last, cfg.n_shards))
                frontier_dir = self._frontier_dir(last)
                frontier_rows = _parquet_dir_rows(frontier_dir)
                start_epoch = last + 1
                c = manifest["counters"]
                summary.fetched_urls = c["fetched_urls"]
                summary.raw_outlinks = c["raw_outlinks"]
                summary.fresh_urls = c["fresh_urls"]
                summary.skipped_urls = c.get("skipped_urls", 0)
                summary.updated_urls = c.get("updated_urls", 0)
                summary.new_urls = c.get("new_urls", 0)
                if cfg.adaptive_politeness:
                    # restore the AIMD backoff BEFORE the resume cap runs
                    self.buckets.set_backoff(c.get("backoff", {}))
                if frontier_rows > 0:
                    # resumed frontier: route the checkpointed parts into
                    # the bucket pool (one cap-only execution, no seal) —
                    # the actors then hold the frontier exactly as an
                    # uninterrupted run's would
                    self._route(read_table(frontier_dir), 1)
                    capped_refs, n_capped, _ = self._finalize_epoch(None, None, None)
        if not resume:
            if seeds is None:
                raise ValueError("seeds required for a fresh run")
            # seed admission IS the first epoch execution: candidate
            # prep inside tasks → route to the bucket pool → per-bucket
            # dedup/gate/cap at finalize. No frontier write: the seed
            # frontier lives in the actors, and a crash before
            # manifest(0) restarts the run from seeds anyway.
            t_adm = time.monotonic()
            # normalization + md5 task ids over the seed list are CPU
            # work that must not run serially on the driver: chunk the
            # raw seed table and do the candidate prep inside tasks
            robots_seed = cfg.web.seed if cfg.robots else None
            n_cpus_avail = int(ray.cluster_resources().get("CPU", 8))
            step = max(256, -(-len(seeds) // (2 * n_cpus_avail)))
            chunks = [seeds.slice(off, step) for off in range(0, len(seeds), step)]
            seed_cands = ray.data.from_arrow(chunks).map_batches(
                lambda t, _rs=robots_seed: CrawlEngine._seeds_to_candidates(t, _rs),
                batch_format="pyarrow",
            )
            self._route(seed_cands, 0)
            capped_refs, n_capped, n_seed_fresh = self._finalize_epoch(None, None, 0)
            frontier_rows = n_seed_fresh
            summary.fresh_urls += n_seed_fresh
            summary.per_epoch.append(
                {"epoch": -1, "phase": "seed_admission", "fresh": n_seed_fresh,
                 "sec": round(time.monotonic() - t_adm, 2)}
            )

        web_cfg = cfg.web.as_dict()
        for epoch in range(start_epoch, cfg.max_epochs):
            t_epoch = time.monotonic()
            if frontier_rows == 0:
                break
            # wave cut: driver-side while capped is small; beyond
            # driver_topk_max a single keys-only selection task
            # (state/frontier.select_wave) computes the per-bucket
            # PREFIX lengths — no sort shuffle, no repartition, and the
            # wave blocks are read straight out of the bucket actors.
            # Identical total order on both paths.
            wave_input = None
            drop_ns: list[int] | None = None
            if n_capped <= cfg.driver_topk_max:
                capped_pd = (
                    pa.concat_tables(ray.get(capped_refs)).to_pandas()
                    if capped_refs
                    else CANDIDATE_SCHEMA.empty_table().to_pandas()
                )
                wave_pd = self._wave_from_capped(capped_pd)
                n_fetched = len(wave_pd)
                if n_fetched:
                    # per-bucket wave counts (== each bucket's capped
                    # prefix length, by the prefix property)
                    b = bucket_of_hosts(
                        pa.array(wave_pd["host"].to_numpy(), pa.string()),
                        self.buckets.n_buckets,
                    )
                    drop_ns = np.bincount(b, minlength=self.buckets.n_buckets).tolist()
                    if cfg.record_trace:
                        summary.trace.extend(
                            (epoch, r.url, int(r.depth), int(r.priority))
                            for r in wave_pd.itertuples()
                        )
                    wave_input = self._wave_dataset(wave_pd, epoch)
            elif n_capped <= cfg.wave_size and not cfg.record_trace:
                # every capped row is selected — the per-bucket counts
                # ARE the prefix lengths; no selector task needed (with
                # record_trace the selector still runs for the sorted
                # trace order)
                ns = list(self.buckets.capped_counts())
                n_fetched = n_capped
                if n_fetched:
                    drop_ns = ns
                    wave_input = ray.data.from_arrow_refs(
                        self.buckets.wave_refs(ns, epoch)
                    )
            else:
                ns, trace_df = ray.get(
                    select_wave.remote(
                        cfg.wave_size, cfg.record_trace, *self.buckets.keys_refs()
                    )
                )
                n_fetched = sum(ns)
                if n_fetched:
                    drop_ns = ns
                    if cfg.record_trace:
                        summary.trace.extend(
                            (epoch, r.url, int(r.depth), int(r.priority))
                            for r in trace_df.itertuples()
                        )
                    wave_input = ray.data.from_arrow_refs(
                        self.buckets.wave_refs(ns, epoch)
                    )
            t_wave = time.monotonic()
            if not n_fetched:
                break

            # ONE pipelined execution for the whole epoch: fetch
            # (results parts written as a side effect; bytes never enter
            # the object store) → expand → push-route to the bucket
            # actors (shuffle overlapped with fetch — no sort barrier).
            # The residual never leaves the actors: finalize drops the
            # wave ids from each bucket's retained frontier.
            results_dir = ckpt.results_dir(cfg.workdir, epoch)
            staging = f"{results_dir}.staging-{epoch}"
            # a crashed earlier attempt may have left parts in the
            # deterministic staging paths — they must not be merged into
            # this run's commit (the bit-identical-resume contract)
            _shutil.rmtree(staging, ignore_errors=True)
            frontier_staging = self._frontier_dir(epoch) + ".staging"
            _shutil.rmtree(frontier_staging, ignore_errors=True)
            os.makedirs(ckpt.epoch_dir(cfg.workdir, epoch), exist_ok=True)
            candidates = (
                wave_input
                .map_batches(
                    fetch_write_task_fn(
                        web_cfg, staging, verify_rows=cfg.verify_rows,
                        classifier=(
                            None if hash_store is None else
                            HashClassifier(hash_store.handles(), hash_store.n_shards)
                        ),
                        failures=cfg.failures,
                    ),
                    batch_format="pyarrow",
                    batch_size=cfg.fetch_batch_size,
                )
                .map_batches(
                    expander_task_fn(
                        cfg.max_depth, cfg.web.seed, cfg.url_filter,
                        robots_seed=cfg.web.seed if cfg.robots else None,
                    ),
                    batch_format="pyarrow",
                    batch_size=cfg.fetch_batch_size,
                )
            )
            self._route(
                candidates, 0, no_push=bool(os.environ.get("CFRAY_NO_PUSH"))
            )
            t_route = time.monotonic()
            capped_refs, n_capped, n_fresh = self._finalize_epoch(
                drop_ns, frontier_staging, epoch + 1
            )
            t_fetch = time.monotonic()

            # commit this epoch's results partition (atomic rename) and
            # read the outlink counter from the written parts
            import pyarrow.parquet as _pq

            if os.path.exists(results_dir):
                _shutil.rmtree(results_dir)
            if not os.path.exists(staging):  # wave produced no batches
                os.makedirs(staging)
                _pq.write_table(pa.schema([]).empty_table(), os.path.join(staging, "empty.parquet"))
            os.replace(staging, results_dir)

            # raw-outlink counter: summed from the part NAMES (the fetch
            # sink encodes each part's pre-classification n_outlinks sum
            # as ".n<total>"), so the per-epoch roll-up is one listdir —
            # no parquet scan on the epoch's serial path
            raw_outlinks = 0
            n_updated = n_new = 0
            for part in os.listdir(results_dir):
                if not part.endswith(".parquet"):
                    continue
                m = re.search(r"\.n(\d+)(?:\.f(\d+)\.g(\d+))?\.parquet$", part)
                if m:
                    raw_outlinks += int(m.group(1))
                    if m.group(2) is not None:
                        summary.failed_transient_urls += int(m.group(2))
                        summary.failed_permanent_urls += int(m.group(3))
                if hash_store is not None:
                    t = _pq.read_table(os.path.join(results_dir, part), columns=["update_status"])
                    if t.num_columns:
                        st = t.column("update_status")
                        n_updated += int(pa.compute.sum(pa.compute.equal(st, 1).cast(pa.int64())).as_py() or 0)
                        n_new += int(pa.compute.sum(pa.compute.equal(st, 2).cast(pa.int64())).as_py() or 0)
            if hash_store is not None:
                hash_store.seal()
                summary.updated_urls += n_updated
                summary.new_urls += n_new
                summary.skipped_urls += n_fetched - n_updated - n_new

            summary.fetched_urls += n_fetched
            summary.raw_outlinks += raw_outlinks
            summary.fresh_urls += n_fresh
            # commit the epoch's frontier (side-effect parts → atomic
            # rename) and write the manifest LAST — a manifest implies a
            # complete frontier + results on disk
            self._commit_epoch_checkpoint(
                epoch, frontier_staging,
                {
                    **(
                        {"backoff": self.buckets.backoff_merged()}
                        if cfg.adaptive_politeness else {}
                    ),
                    "fetched_urls": summary.fetched_urls,
                    "raw_outlinks": summary.raw_outlinks,
                    "fresh_urls": summary.fresh_urls,
                    # update-mode counters (zero in a plain crawl) ride
                    # in the manifest so an update crawl resumes with
                    # exact totals
                    "skipped_urls": summary.skipped_urls,
                    "updated_urls": summary.updated_urls,
                    "new_urls": summary.new_urls,
                },
            )
            frontier_rows = frontier_rows - n_fetched + n_fresh
            t_results = time.monotonic()

            summary.per_epoch.append(
                {
                    "epoch": epoch,
                    "wave": n_fetched,
                    "raw_outlinks": raw_outlinks,
                    "fresh": n_fresh,
                    "sec_wave": round(t_wave - t_epoch, 2),
                    "sec_fetch": round(t_fetch - t_wave, 2),
                    "sec_route": round(t_route - t_wave, 2),
                    "sec_final": round(t_fetch - t_route, 2),
                    "sec_results": round(t_results - t_fetch, 2),
                }
            )
            summary.epochs = epoch + 1

        summary.final_frontier = frontier_rows
        summary.spill = self.buckets.spill_stats()
        summary.seen_total = self.seen.total_size()
        summary.shard_digests = self.seen.digests()
        summary.wall_sec = time.monotonic() - t0
        return summary
