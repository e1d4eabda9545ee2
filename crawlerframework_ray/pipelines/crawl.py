"""The crawl engine: frontier epochs as Ray Data pipelines.

Ray-Data restatement of the reference's TaskMaster loop (SURVEY.md §3):
the global heap (priorityqueue.py:46-49) becomes a per-epoch
sort+limit top-k; per-site caps (crawler.cfg:26-185) become per-host
grouped top-k ("politeness budget"); the enqueue dedup gate
(priorityqueue.py:39-43) becomes the sharded cuckoo SeenGate semi-join;
bdb persistence becomes per-epoch parquet checkpoints.

One epoch = exactly TWO pipelined executions (the round-1 design spent
4-6, and the ~1 s fixed cost per Ray Data execution dominated wall
time at bench scale — BASELINE.md scaling decomposition):

  E1 (wave select): residual ∪ fresh ──(side-effect: frontier parts
       written for epoch t-1's checkpoint)──▶ groupby(host-bucket)
       per-host politeness cap + per-bucket partial top-k ──▶ capped
       (materialized, ≤ min(hosts×budget, buckets×wave_size)); the
       global top-``wave_size`` cut runs driver-side while capped is
       small (≤ ``driver_topk_max``) and falls back to the distributed
       sort+limit beyond that.
  E2 (epoch body): wave ──map_batches(fetch: results parts written as
       a side effect; bytes never enter the object store)──▶ expand
       ──groupby(task_id-bucket) canonical dedup [shuffle]──▶
       SeenGate semi-join ──▶ fresh rows (materialized).

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
import time
from dataclasses import dataclass, field

import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..config import CrawlConfig
from ..functions.hashing import task_ids_batch
from ..functions.urlnorm import normalize
from ..sources.store import read_table, write_table
from ..stages.expand import CANDIDATE_SCHEMA, expander_task_fn
from ..stages.fetch import fetch_write_task_fn
from ..state.hashstore import HashClassifier
from ..state import checkpoint as ckpt
from ..state.seen import SeenGate, ShardedSeen

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
    # update-crawl mode only (hash_store passed to run)
    skipped_urls: int = 0
    updated_urls: int = 0
    new_urls: int = 0


N_DEDUP_BUCKETS = 64

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


def _add_dedup_bucket(t: pa.Table) -> pa.Table:
    """Shuffle key for candidate dedup: a byte of the task_id. Grouping
    by ~64 buckets instead of per-task_id groups keeps the reduction
    vectorized (one pandas call per bucket, not one Python call per
    duplicate set). Bucket math is a zero-copy numpy view, not a
    per-row loop."""
    import numpy as np

    if len(t) == 0:
        return t.append_column("bucket", pa.array([], pa.int32()))
    arr = _fixed16_np(t.column("task_id"))
    buckets = pa.array((arr[:, 2] % N_DEDUP_BUCKETS).astype(np.int32))
    return t.append_column("bucket", buckets)


def _canonical_dedup_bucket(g: pd.DataFrame) -> pd.DataFrame:
    """Per-bucket canonical reduction: min (depth, parent_url) per
    (url, priority) — matches the serial oracle's
    first-discoverer-in-heap-order rule. Vectorized: stable sort +
    drop_duplicates over the whole bucket."""
    g = g.sort_values(["depth", "parent_url"], kind="mergesort")
    return g.drop_duplicates(subset=["url", "priority"], keep="first").drop(columns=["bucket"])


def _cast_candidates(t: pa.Table) -> pa.Table:
    return t.select(CANDIDATE_SCHEMA.names).cast(CANDIDATE_SCHEMA)


def frontier_sink_fn(staging_dir: str):
    """Pass-through ``map_batches`` stage that persists each frontier
    batch as a parquet part — the frontier checkpoint is a SIDE EFFECT
    of the wave-selection execution, not its own write job. Parts are
    content-addressed (hash of the batch's sorted task ids) so task
    retries overwrite instead of duplicating; the driver renames the
    staging dir into the checkpoint atomically before writing the
    manifest."""
    import hashlib as _hashlib
    import os

    import pyarrow.parquet as pq_mod

    def fn(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch
        os.makedirs(staging_dir, exist_ok=True)
        part_id = _hashlib.md5(b"".join(sorted(batch.column("task_id").to_pylist()))).hexdigest()
        tmp = os.path.join(staging_dir, f".part-{part_id}.tmp")
        pq_mod.write_table(batch, tmp)
        os.replace(tmp, os.path.join(staging_dir, f"part-{part_id}.parquet"))
        return batch

    return fn


class CrawlEngine:
    def __init__(self, cfg: CrawlConfig):
        self.cfg = cfg
        self.seen: ShardedSeen | None = None

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

    def _cap_pipeline(self, frontier: ray.data.Dataset, sink_dir: str | None = None):
        """Politeness cap + per-bucket partial top-k over a frontier
        stream → materialized ``capped`` (≤ min(hosts × budget,
        buckets × wave_size) rows), with an optional side-effect
        frontier-checkpoint write on the way in."""
        cfg = self.cfg
        budget = cfg.host_budget
        wave_size = cfg.wave_size

        def add_host_bucket(t: pa.Table) -> pa.Table:
            hs = t.column("host").to_pylist()
            import zlib

            b = pa.array([zlib.crc32(h.encode()) % N_DEDUP_BUCKETS for h in hs], pa.int32())
            return t.append_column("bucket", b)

        robots_seed = cfg.web.seed if cfg.robots else None

        def cap_bucket(g: pd.DataFrame) -> pd.DataFrame:
            # politeness cap, vectorized per host-bucket: stable sort by
            # the wave key, then per-host head(token budget); a bucket
            # never needs to surface more than wave_size rows globally,
            # so a per-bucket partial top-k bounds what leaves the shuffle
            g = g.sort_values(
                SORT_COLS[:2] + ["score", "url"], ascending=_PD_ASC[:4], kind="mergesort"
            )
            ranks = g.groupby("host", sort=False).cumcount().to_numpy()
            if robots_seed is not None:
                # token-bucket rate model: per-host epoch budget =
                # host_budget >> robots crawl_delay (worker-cached rules)
                rc = _robots_cache(robots_seed)
                budgets = {h: rc.host_budget(h, budget) for h in g["host"].unique()}
                lim = g["host"].map(budgets).to_numpy()
            else:
                lim = budget
            g = g[ranks < lim]
            if len(g) > wave_size:
                g = g.sort_values(SORT_COLS, ascending=_PD_ASC, kind="mergesort").head(wave_size)
            return g.drop(columns=["bucket"])

        pipe = frontier
        if sink_dir is not None:
            pipe = pipe.map_batches(frontier_sink_fn(sink_dir), batch_format="pyarrow")
        return (
            pipe.map_batches(add_host_bucket, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(cap_bucket, batch_format="pandas")
            .map_batches(_cast_candidates, batch_format="pyarrow")
            .materialize()
        )

    def _admit_and_select(self, candidates: ray.data.Dataset,
                          residual: ray.data.Dataset | None,
                          sink_dir: str | None, commit_epoch: int):
        """THE epoch execution (one pipelined run): candidate stream →
        canonical dedup shuffle → seen-gate semi-join → union with the
        residual frontier → side-effect frontier-checkpoint write →
        politeness cap → materialized ``capped`` for the NEXT wave.
        Returns (capped, n_fresh). Seals the epoch on the shards after
        the execution completes (staged sets are complete then)."""
        unique = (
            candidates.map_batches(_add_dedup_bucket, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(_canonical_dedup_bucket, batch_format="pandas")
        )
        # SeenGate is passed as a callable INSTANCE → task pool, not an
        # actor pool: it holds only shard handles (cheap to ship), and
        # task stages avoid per-epoch actor spin-up. Residual rows are
        # already-seen by construction, so they join AFTER the gate.
        fresh = unique.map_batches(_cast_candidates, batch_format="pyarrow").map_batches(
            SeenGate(self.seen.handles(), self.cfg.n_shards),
            batch_format="pyarrow",
            batch_size=8192,
        )
        frontier = fresh.union(residual) if residual is not None else fresh
        capped = self._cap_pipeline(frontier, sink_dir)
        # fresh count = what the gate staged (globally unique upstream),
        # read before seal folds the staging sets into the filters
        n_fresh = self.seen.staged_total()
        self.seen.seal(commit_epoch)
        return capped, n_fresh

    # -------------------------------------------------- wave selection
    def _wave_from_capped(self, capped: ray.data.Dataset) -> pd.DataFrame:
        """Global top-``wave_size`` cut over the materialized capped
        set: driver-side while small (bounded by min(hosts × budget,
        buckets × wave_size)), distributed sort+limit beyond
        ``driver_topk_max``. Both paths produce the identical wave
        (total order, full tiebreak)."""
        cfg = self.cfg
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

    @staticmethod
    def _drop_ids_fn(wave_pd: pd.DataFrame):
        """Residual filter: broadcast the wave's task ids ONCE as an
        Arrow fixed-width array (zero-copy out of the object store —
        a Python set of 16-byte objects costs ~0.3 s to unpickle PER
        TASK at 180k-url waves) and anti-filter with the vectorized
        ``is_in`` kernel."""
        import pyarrow.compute as pc

        ids_arr = pa.array(list(wave_pd["task_id"]), pa.binary(16))
        ids_ref = ray.put(ids_arr)

        def drop_wave_ids(t: pa.Table) -> pa.Table:
            ids = ray.get(ids_ref)
            mask = pc.is_in(t.column("task_id"), value_set=ids)
            return t.filter(pc.invert(mask))

        return drop_wave_ids

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
        summary = CrawlSummary()
        import shutil as _shutil

        start_epoch = 0
        frontier_base: ray.data.Dataset  # disk-backed rows of the CURRENT frontier
        capped: ray.data.Dataset | None = None
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
                frontier_base = read_table(frontier_dir)
                frontier_rows = _parquet_dir_rows(frontier_dir)
                start_epoch = last + 1
                c = manifest["counters"]
                summary.fetched_urls = c["fetched_urls"]
                summary.raw_outlinks = c["raw_outlinks"]
                summary.fresh_urls = c["fresh_urls"]
                if frontier_rows > 0:
                    # resumed wave selection: one cap-only execution
                    capped = self._cap_pipeline(frontier_base, None)
        if not resume:
            if seeds is None:
                raise ValueError("seeds required for a fresh run")
            # seed admission IS the first epoch execution: dedup → gate
            # → side-effect frontier write → cap, one pipelined run.
            # The seed frontier dir is not part of any manifest — a
            # crash before manifest(0) restarts the run from seeds.
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
            seed_dir = os.path.join(cfg.workdir, "ckpt", "seed_frontier")
            seed_staging = seed_dir + ".staging"
            _shutil.rmtree(seed_staging, ignore_errors=True)
            os.makedirs(os.path.dirname(seed_dir), exist_ok=True)
            capped, n_seed_fresh = self._admit_and_select(seed_cands, None, seed_staging, 0)
            if not os.path.exists(seed_staging):
                os.makedirs(seed_staging)
                import pyarrow.parquet as _pq

                _pq.write_table(CANDIDATE_SCHEMA.empty_table(),
                                os.path.join(seed_staging, "empty.parquet"))
            if os.path.exists(seed_dir):
                _shutil.rmtree(seed_dir)
            os.replace(seed_staging, seed_dir)
            frontier_base = read_table(seed_dir)
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
            wave_pd = self._wave_from_capped(capped)
            t_wave = time.monotonic()
            if len(wave_pd) == 0:
                break
            n_fetched = len(wave_pd)
            if cfg.record_trace:
                summary.trace.extend(
                    (epoch, r.url, int(r.depth), int(r.priority))
                    for r in wave_pd.itertuples()
                )
            residual = frontier_base.map_batches(self._drop_ids_fn(wave_pd), batch_format="pyarrow")

            # ONE pipelined execution for the whole epoch: fetch
            # (results parts written as a side effect; bytes never enter
            # the object store) → expand → canonical dedup shuffle →
            # seen-gate semi-join → ∪ residual → frontier-checkpoint
            # side-effect write → politeness cap → next wave candidates.
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
                self._wave_dataset(wave_pd, epoch)
                .map_batches(
                    fetch_write_task_fn(
                        web_cfg, staging, verify_rows=cfg.verify_rows,
                        classifier=(
                            None if hash_store is None else
                            HashClassifier(hash_store.handles(), hash_store.n_shards)
                        ),
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
            capped, n_fresh = self._admit_and_select(
                candidates, residual, frontier_staging, epoch + 1
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

            raw_outlinks = 0
            n_updated = n_new = 0
            status_cols = ["n_outlinks"] + (["update_status"] if hash_store is not None else [])
            for part in os.listdir(results_dir):
                if part.endswith(".parquet"):
                    t = _pq.read_table(os.path.join(results_dir, part), columns=status_cols)
                    if t.num_columns:
                        raw_outlinks += int(pa.compute.sum(t.column("n_outlinks")).as_py() or 0)
                    if hash_store is not None and t.num_columns > 1:
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
                    "fetched_urls": summary.fetched_urls,
                    "raw_outlinks": summary.raw_outlinks,
                    "fresh_urls": summary.fresh_urls,
                },
            )
            frontier_base = read_table(self._frontier_dir(epoch))
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
                    "sec_results": round(t_results - t_fetch, 2),
                }
            )
            summary.epochs = epoch + 1

        summary.final_frontier = frontier_rows
        summary.seen_total = self.seen.total_size()
        summary.shard_digests = self.seen.digests()
        summary.wall_sec = time.monotonic() - t0
        return summary
