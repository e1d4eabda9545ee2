"""The crawl engine: frontier epochs as Ray Data pipelines.

Ray-Data restatement of the reference's TaskMaster loop (SURVEY.md §3):
the global heap (priorityqueue.py:46-49) becomes a per-epoch
sort+limit top-k; per-site caps (crawler.cfg:26-185) become per-host
grouped top-k ("politeness budget"); the enqueue dedup gate
(priorityqueue.py:39-43) becomes the sharded cuckoo SeenGate semi-join;
bdb persistence becomes per-epoch parquet checkpoints.

One epoch:

    frontier ──groupby(host) cap──sort+limit──▶ wave (materialized, ≤wave_size)
       │                                          │ map_batches(Fetcher pool)
       │ residual (wave ids broadcast-filtered)   ▼
       │                                       fetched ──▶ results/epoch=t (atomic)
       │                                          │ map_batches(Expander)
       │                                          ▼
       │                     groupby(url,priority) canonical dedup   [shuffle]
       │                                          │ map_batches(SeenGate)
       │                                          ▼
       └────────────── union ────────────── fresh rows ──▶ frontier t+1 (checkpointed)

Determinism: full-tiebreak sort keys (priority, depth, -score, host,
url), canonical min-reduction on duplicate candidates, read-only seen
tests during the epoch with sorted insertion at epoch seal. Given the
same seeds + budgets, crawl order, URL-seen membership and cuckoo
digests are bit-identical across runs, cluster sizes and resumes —
verified against the single-process oracle (pipelines/oracle.py) in
tests/test_crawl.py.

Scale notes: the only materialized datasets are the wave (bounded by
``wave_size`` — the designed cluster-memory budget) and the fresh set
(bounded by wave_size × branching). The frontier itself streams from /
to parquet each epoch and is never collected on the driver. Wave-id
broadcast is one ``ray.put`` per epoch (16 B per url).
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


N_DEDUP_BUCKETS = 64


def _parquet_dir_rows(path: str) -> int:
    """Row count of a parquet directory from file metadata only."""
    import pyarrow.parquet as pq_mod

    total = 0
    for name in os.listdir(path):
        if name.endswith(".parquet"):
            total += pq_mod.read_metadata(os.path.join(path, name)).num_rows
    return total


def _add_dedup_bucket(t: pa.Table) -> pa.Table:
    """Shuffle key for candidate dedup: a byte of the task_id. Grouping
    by ~64 buckets instead of per-task_id groups keeps the reduction
    vectorized (one pandas call per bucket, not one Python call per
    duplicate set)."""
    ids = t.column("task_id").to_pylist()
    buckets = pa.array([tid[2] % N_DEDUP_BUCKETS for tid in ids], pa.int32())
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


class CrawlEngine:
    def __init__(self, cfg: CrawlConfig):
        self.cfg = cfg
        self.seen: ShardedSeen | None = None

    # -------------------------------------------------- seed admission
    @staticmethod
    def _seeds_to_candidates(t: pa.Table) -> pa.Table:
        """Seeds (url,host,depth,priority,score) → candidate rows at
        epoch 0 with normalized urls and task ids."""
        urls = [normalize(u) for u in t.column("url").to_pylist()]
        pri = t.column("priority").to_pylist()
        from ..data.synth import host_of

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

    def _admit(self, candidates: ray.data.Dataset, commit_epoch: int) -> ray.data.Dataset:
        """Global canonical dedup (shuffle) → seen-gate semi-join →
        materialized fresh rows; seals the epoch on the shards."""
        unique = (
            candidates.map_batches(_add_dedup_bucket, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(_canonical_dedup_bucket, batch_format="pandas")
        )
        # SeenGate is passed as a callable INSTANCE → task pool, not an
        # actor pool: it holds only shard handles (cheap to ship), and
        # task stages avoid per-epoch actor spin-up.
        fresh = unique.map_batches(_cast_candidates, batch_format="pyarrow").map_batches(
            SeenGate(self.seen.handles(), self.cfg.n_shards),
            batch_format="pyarrow",
            batch_size=8192,
        )
        fresh = fresh.materialize()
        self.seen.seal(commit_epoch)
        return fresh

    # -------------------------------------------------- wave selection
    def _select_wave(self, frontier: ray.data.Dataset, epoch: int):
        cfg = self.cfg

        budget = cfg.host_budget

        def add_host_bucket(t: pa.Table) -> pa.Table:
            hs = t.column("host").to_pylist()
            import zlib

            b = pa.array([zlib.crc32(h.encode()) % N_DEDUP_BUCKETS for h in hs], pa.int32())
            return t.append_column("bucket", b)

        def cap_bucket(g: pd.DataFrame) -> pd.DataFrame:
            # politeness cap, vectorized per host-bucket: stable sort by
            # the wave key, then per-host head(budget)
            g = g.sort_values(
                SORT_COLS[:2] + ["score", "url"], ascending=_PD_ASC[:4], kind="mergesort"
            )
            return g.groupby("host", group_keys=False).head(budget).drop(columns=["bucket"])

        capped = (
            frontier.map_batches(add_host_bucket, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(cap_bucket, batch_format="pandas")
        )
        capped = capped.map_batches(_cast_candidates, batch_format="pyarrow").materialize()
        if capped.count() > cfg.wave_size:
            # budget binds: global top-k needs the all-to-all sort
            wave = capped.sort(SORT_COLS, descending=SORT_DESC).limit(cfg.wave_size).materialize()
        else:
            # budget does not bind ⇒ the wave is exactly the capped set
            # regardless of order — skip the sort shuffle entirely (the
            # trace order is recomputed driver-side below either way)
            wave = capped

        wave_pd = wave.to_pandas()  # bounded by wave_size by construction
        wave_pd = wave_pd.sort_values(SORT_COLS, ascending=_PD_ASC, kind="mergesort")
        wave_ids = frozenset(bytes(x) for x in wave_pd["task_id"])
        ids_ref = ray.put(wave_ids)

        def drop_wave_ids(t: pa.Table) -> pa.Table:
            ids = ray.get(ids_ref)
            mask = [tid not in ids for tid in t.column("task_id").to_pylist()]
            return t.filter(pa.array(mask, pa.bool_()))

        residual = frontier.map_batches(drop_wave_ids, batch_format="pyarrow")
        return wave, wave_pd, residual

    # -------------------------------------------------- main loop
    def run(self, seeds: pa.Table | None = None, resume: bool = False) -> CrawlSummary:
        cfg = self.cfg
        t0 = time.monotonic()
        os.makedirs(cfg.workdir, exist_ok=True)
        self.seen = ShardedSeen(cfg.n_shards, cfg.shard_capacity)
        summary = CrawlSummary()

        start_epoch = 0
        frontier: ray.data.Dataset
        if resume:
            last = ckpt.latest_epoch(cfg.workdir)
            if last is None:
                resume = False
            else:
                manifest = ckpt.load_manifest(cfg.workdir, last)
                if manifest["config_fingerprint"] != cfg.fingerprint():
                    raise ValueError("checkpoint was written under different semantics")
                self.seen.restore_all(ckpt.load_shards(cfg.workdir, last, cfg.n_shards))
                frontier_dir = os.path.join(ckpt.epoch_dir(cfg.workdir, last), "frontier")
                frontier = read_table(frontier_dir)
                frontier_rows = _parquet_dir_rows(frontier_dir)
                start_epoch = last + 1
                c = manifest["counters"]
                summary.fetched_urls = c["fetched_urls"]
                summary.raw_outlinks = c["raw_outlinks"]
                summary.fresh_urls = c["fresh_urls"]
        if not resume:
            if seeds is None:
                raise ValueError("seeds required for a fresh run")
            t_adm = time.monotonic()
            seed_cands = ray.data.from_arrow(self._seeds_to_candidates(seeds))
            frontier = self._admit(seed_cands, commit_epoch=0)
            frontier_rows = frontier.count()
            summary.fresh_urls += frontier_rows
            summary.per_epoch.append(
                {"epoch": -1, "phase": "seed_admission", "fresh": frontier_rows,
                 "sec": round(time.monotonic() - t_adm, 2)}
            )

        web_cfg = cfg.web.as_dict()
        for epoch in range(start_epoch, cfg.max_epochs):
            t_epoch = time.monotonic()
            if frontier_rows == 0:
                break
            wave, wave_pd, residual = self._select_wave(frontier, epoch)
            t_wave = time.monotonic()
            if len(wave_pd) == 0:
                break
            n_fetched = len(wave_pd)
            if cfg.record_trace:
                summary.trace.extend(
                    (epoch, r.url, int(r.depth), int(r.priority))
                    for r in wave_pd.itertuples()
                )

            def set_epoch(t: pa.Table, _e=epoch) -> pa.Table:
                i = t.schema.get_field_index("epoch")
                return t.set_column(i, "epoch", pa.array([_e] * len(t), pa.int32()))

            # ONE fused pipelined execution for the whole epoch body:
            # fetch (writing results parts as a side effect; bytes never
            # enter the object store) → expand → canonical dedup shuffle
            # → seen-gate semi-join → materialized slim fresh rows.
            #
            # Parallelism note: map tasks are 1:1 with BLOCKS, and the
            # cap/sort stages can emit a handful of large blocks — left
            # alone, the fetch stage would run nearly serial. Split the
            # wave to ~2 blocks per core (cheap, no shuffle) so the
            # fetch pool is actually saturated.
            n_cpus_avail = int(ray.cluster_resources().get("CPU", 8))
            n_blocks = max(4, min((n_fetched // cfg.fetch_batch_size) + 1, 2 * n_cpus_avail))
            results_dir = ckpt.results_dir(cfg.workdir, epoch)
            staging = f"{results_dir}.staging-{epoch}"
            # a crashed earlier attempt may have left parts in the
            # deterministic staging path — they must not be merged into
            # this run's commit (the bit-identical-resume contract)
            import shutil as _shutil

            _shutil.rmtree(staging, ignore_errors=True)
            candidates = (
                wave.repartition(n_blocks)
                .map_batches(set_epoch, batch_format="pyarrow")
                .map_batches(
                    fetch_write_task_fn(web_cfg, staging, verify_rows=cfg.verify_rows),
                    batch_format="pyarrow",
                    batch_size=cfg.fetch_batch_size,
                )
                .map_batches(
                    expander_task_fn(cfg.max_depth, cfg.web.seed, cfg.url_filter),
                    batch_format="pyarrow",
                    batch_size=cfg.fetch_batch_size,
                )
            )
            fresh = self._admit(candidates, commit_epoch=epoch + 1)
            n_fresh = fresh.count()
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
            for part in os.listdir(results_dir):
                if part.endswith(".parquet"):
                    t = _pq.read_table(os.path.join(results_dir, part), columns=["n_outlinks"])
                    if t.num_columns:
                        raw_outlinks += int(pa.compute.sum(t.column("n_outlinks")).as_py() or 0)
            t_results = time.monotonic()
            t_admit = time.monotonic()

            frontier_next = residual.map_batches(_cast_candidates, batch_format="pyarrow").union(
                fresh.map_batches(_cast_candidates, batch_format="pyarrow")
            )
            frontier_dir = os.path.join(ckpt.epoch_dir(cfg.workdir, epoch), "frontier")
            os.makedirs(ckpt.epoch_dir(cfg.workdir, epoch), exist_ok=True)
            write_table(frontier_next, frontier_dir)
            frontier = read_table(frontier_dir)
            frontier_rows = frontier_rows - n_fetched + n_fresh
            t_frontier = time.monotonic()

            summary.fetched_urls += n_fetched
            summary.raw_outlinks += raw_outlinks
            summary.fresh_urls += n_fresh
            summary.per_epoch.append(
                {
                    "epoch": epoch,
                    "wave": n_fetched,
                    "raw_outlinks": raw_outlinks,
                    "fresh": n_fresh,
                    "sec_wave": round(t_wave - t_epoch, 2),
                    "sec_fetch": round(t_fetch - t_wave, 2),
                    "sec_results": round(t_results - t_fetch, 2),
                    "sec_admit": round(t_admit - t_results, 2),
                    "sec_frontier": round(t_frontier - t_admit, 2),
                }
            )
            counters = {
                "fetched_urls": summary.fetched_urls,
                "raw_outlinks": summary.raw_outlinks,
                "fresh_urls": summary.fresh_urls,
            }
            ckpt.write_checkpoint(
                cfg.workdir,
                epoch,
                self.seen.serialize_all(),
                self.seen.digests(),
                counters,
                cfg.fingerprint(),
            )
            summary.epochs = epoch + 1

        summary.final_frontier = frontier_rows
        summary.seen_total = self.seen.total_size()
        summary.shard_digests = self.seen.digests()
        summary.wall_sec = time.monotonic() - t0
        return summary
