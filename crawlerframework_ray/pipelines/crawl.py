"""The crawl engine: frontier epochs as Ray Data pipelines.

Ray-Data restatement of the reference's TaskMaster loop (SURVEY.md §3):
the global heap (priorityqueue.py:46-49) becomes a per-epoch
sort+limit top-k; per-site caps (crawler.cfg:26-185) become per-host
grouped top-k ("politeness budget"); the enqueue dedup gate
(priorityqueue.py:39-43) becomes the sharded cuckoo SeenGate semi-join;
bdb persistence becomes per-epoch parquet checkpoints.

One epoch = ONE pipelined execution with ONE shuffle (round 1 spent
4-6 executions and round 2's first cut spent two sort shuffles; each
extra execution costs ~1 s fixed and each extra sort barrier idles the
cluster for ~2-3 s at 16+ cpus — BASELINE.md scaling decomposition):

  wave ──map_batches(fetch: results parts written as a side effect;
       bytes never enter the object store)──▶ expand ──∪ residual──▶
       groupby(host-bucket) [THE shuffle] ──▶ per bucket, one
       vectorized group fn: canonical dedup → seen-gate RPC →
       frontier-checkpoint part write → politeness cap + partial
       top-k ──▶ capped (materialized, ≤ min(hosts×budget,
       buckets×wave_size)). Same-url candidates share a host, so
       host-bucketing preserves GLOBAL dedup. The global
       top-``wave_size`` cut runs driver-side while capped is small
       (≤ ``driver_topk_max``), distributed sort+limit beyond.

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




def _set_epoch_fn(epoch: int):
    """Stamp the wave's epoch column inside tasks (distributed wave
    path — the driver never holds the wave rows)."""

    def fn(t: pa.Table) -> pa.Table:
        i = t.schema.get_field_index("epoch")
        return t.set_column(i, "epoch", pa.array([epoch] * len(t), pa.int32()))

    return fn


def _cast_candidates(t: pa.Table) -> pa.Table:
    return t.select(CANDIDATE_SCHEMA.names).cast(CANDIDATE_SCHEMA)




def _flag_and_bucket(flag: int):
    """Cast to the candidate schema and append the union-source flag
    (0 candidate / 1 residual) + host-bucket shuffle key."""
    import zlib

    def fn(t: pa.Table) -> pa.Table:
        t = _cast_candidates(t)
        hs = t.column("host").to_pylist()
        b = pa.array([zlib.crc32(h.encode()) % N_DEDUP_BUCKETS for h in hs], pa.int32())
        flags = pa.array([flag] * len(t), pa.int8())
        return t.append_column("__residual", flags).append_column("bucket", b)

    return fn


def _admit_cap_bucket_fn(shard_handles: list, n_shards: int, budget: int,
                         wave_size: int, robots_seed: int | None, sink_dir: str | None):
    """The per-host-bucket epoch reduction (see _admit_and_select).
    Ships only shard handles; everything inside is vectorized pandas
    plus one batched RPC round per shard. Task retries are safe: dedup
    and cap are pure, staging is a set union of identical ids, and the
    frontier part name is content-addressed."""

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        import hashlib as _hashlib
        import os as _os

        import numpy as _np

        g = g.drop(columns=["bucket"])
        res = g[g["__residual"] == 1].drop(columns=["__residual"])
        cand = g[g["__residual"] == 0].drop(columns=["__residual"])
        if len(cand):
            # canonical dedup: min (depth, parent_url) per (url, priority)
            cand = cand.sort_values(["depth", "parent_url"], kind="mergesort").drop_duplicates(
                subset=["url", "priority"], keep="first"
            )
            # seen-gate semi-join: read-only contains + stage fresh ids,
            # one RPC per shard (candidates are globally unique here —
            # same url ⇒ same host ⇒ same bucket)
            ids = [bytes(x) for x in cand["task_id"]]
            groups: dict[int, list[int]] = {}
            for pos, tid in enumerate(ids):
                groups.setdefault(ShardedSeen.shard_of_id(tid, n_shards), []).append(pos)
            futs = {
                s: shard_handles[s].contains_batch.remote([ids[p] for p in pos])
                for s, pos in groups.items()
            }
            mask = _np.zeros(len(ids), dtype=bool)
            for s, pos in groups.items():
                for p, hit in zip(pos, ray.get(futs[s])):
                    mask[p] = hit
            fresh = cand[~mask]
            fgroups: dict[int, list[bytes]] = {}
            for tid, m in zip(ids, mask):
                if not m:
                    fgroups.setdefault(ShardedSeen.shard_of_id(tid, n_shards), []).append(tid)
            if fgroups:
                ray.get([shard_handles[s].stage.remote(v) for s, v in fgroups.items()])
        else:
            fresh = cand
        frontier = pd.concat([fresh, res], ignore_index=True)
        # frontier-checkpoint side effect (content-addressed part)
        if sink_dir is not None and len(frontier):
            _os.makedirs(sink_dir, exist_ok=True)
            tbl = (
                pa.Table.from_pandas(frontier, preserve_index=False)
                .select(CANDIDATE_SCHEMA.names)
                .cast(CANDIDATE_SCHEMA)
            )
            part_id = _hashlib.md5(
                b"".join(sorted(bytes(x) for x in frontier["task_id"]))
            ).hexdigest()
            tmp = _os.path.join(sink_dir, f".part-{part_id}.tmp")
            pq_write_frontier(tbl, tmp)
            _os.replace(tmp, _os.path.join(sink_dir, f"part-{part_id}.parquet"))
        # politeness cap + per-bucket partial top-k (the wave key sort)
        g2 = frontier.sort_values(
            SORT_COLS[:2] + ["score", "url"], ascending=_PD_ASC[:4], kind="mergesort"
        )
        ranks = g2.groupby("host", sort=False).cumcount().to_numpy()
        if robots_seed is not None:
            # token-bucket rate model: per-host epoch budget =
            # host_budget >> robots crawl_delay (worker-cached rules)
            rc = _robots_cache(robots_seed)
            budgets = {h: rc.host_budget(h, budget) for h in g2["host"].unique()}
            lim = g2["host"].map(budgets).to_numpy()
        else:
            lim = budget
        if len(g2):
            g2 = g2[ranks < lim]
        if len(g2) > wave_size:
            g2 = g2.sort_values(SORT_COLS, ascending=_PD_ASC, kind="mergesort").head(wave_size)
        return g2

    return fn


def pq_write_frontier(tbl: pa.Table, path: str) -> None:
    import pyarrow.parquet as pq_mod

    pq_mod.write_table(tbl, path)



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

    def _admit_and_select(self, candidates: ray.data.Dataset | None,
                          residual: ray.data.Dataset | None,
                          sink_dir: str | None, commit_epoch: int | None):
        """THE epoch execution — ONE shuffle: candidates (flag 0) ∪
        residual (flag 1) → groupby(host-bucket) → per bucket, in one
        vectorized group fn: canonical dedup → seen-gate RPC →
        frontier-checkpoint part write → politeness cap + partial
        top-k → capped. Same-url candidates always share a host, so
        host-bucketing preserves GLOBAL dedup; the earlier two-shuffle
        form (tid-bucket dedup, then host-bucket cap) paid a second
        sort barrier per epoch for nothing (measured ~2-3 s of idle
        cores per epoch at 16+ cpus). Returns (capped, n_fresh); seals
        the shards after the execution unless ``commit_epoch`` is None
        (resume-time cap-only run)."""
        cfg = self.cfg
        parts = []
        if candidates is not None:
            parts.append(candidates.map_batches(_flag_and_bucket(0), batch_format="pyarrow"))
        if residual is not None:
            parts.append(residual.map_batches(_flag_and_bucket(1), batch_format="pyarrow"))
        flagged = parts[0] if len(parts) == 1 else parts[0].union(parts[1])
        fn = _admit_cap_bucket_fn(
            self.seen.handles(), cfg.n_shards, cfg.host_budget, cfg.wave_size,
            cfg.web.seed if cfg.robots else None, sink_dir,
        )
        capped = (
            flagged.groupby("bucket")
            .map_groups(fn, batch_format="pandas")
            .map_batches(_cast_candidates, batch_format="pyarrow")
            .materialize()
        )
        if commit_epoch is None:
            return capped, 0
        # fresh count = what the gate staged (globally unique upstream),
        # read before seal folds the staging sets into the filters
        n_fresh = self.seen.staged_total()
        self.seen.seal(commit_epoch)
        return capped, n_fresh

    def _driver_cap(self, df: pd.DataFrame) -> pd.DataFrame:
        """Driver-side politeness cap over a small frontier — the exact
        global form of ``cap_bucket`` (same stable sort, same per-host
        token budgets; no wave_size truncation, which only bounds the
        shuffle in the distributed form)."""
        cfg = self.cfg
        g = df.sort_values(
            SORT_COLS[:2] + ["score", "url"], ascending=_PD_ASC[:4], kind="mergesort"
        )
        ranks = g.groupby("host", sort=False).cumcount().to_numpy()
        if cfg.robots:
            rc = _robots_cache(cfg.web.seed)
            budgets = {h: rc.host_budget(h, cfg.host_budget) for h in g["host"].unique()}
            lim = g["host"].map(budgets).to_numpy()
        else:
            lim = cfg.host_budget
        return g[ranks < lim]

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

    @staticmethod
    def _drop_ids_fn(ids_arr: pa.Array):
        """Residual filter: broadcast the wave's task ids ONCE as an
        Arrow fixed-width array (zero-copy out of the object store —
        a Python set of 16-byte objects costs ~0.3 s to unpickle PER
        TASK at 180k-url waves) and anti-filter with the vectorized
        ``is_in`` kernel."""
        import pyarrow.compute as pc

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
                summary.skipped_urls = c.get("skipped_urls", 0)
                summary.updated_urls = c.get("updated_urls", 0)
                summary.new_urls = c.get("new_urls", 0)
                if frontier_rows > 0:
                    # resumed wave selection: one cap-only execution
                    capped, _ = self._admit_and_select(None, frontier_base, None, None)
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
            if len(seeds) <= cfg.driver_topk_max:
                # driver fast path (same precedent as _wave_from_capped:
                # identical semantics, two sizes): the prep pipeline is
                # the only distributed step; dedup/gate/cap run as
                # vectorized driver ops on the collected slim rows,
                # skipping two sort barriers and a 10-operator execution
                # whose CPU content is < 1 s. Beyond driver_topk_max the
                # distributed path below produces the identical state.
                import numpy as _np
                import pyarrow.parquet as _pq

                cand_pd = seed_cands.to_pandas()
                # canonical dedup — min (depth, parent_url) per (url, priority),
                # the same rule _admit_cap_bucket_fn applies distributed
                cand_pd = cand_pd.sort_values(
                    ["depth", "parent_url"], kind="mergesort"
                ).drop_duplicates(subset=["url", "priority"], keep="first")
                ids = [bytes(x) for x in cand_pd["task_id"]]
                mask = _np.array(self.seen.contains_batch(ids), dtype=bool)
                fresh_pd = cand_pd[~mask]
                self.seen.stage([tid for tid, m in zip(ids, mask) if not m])
                n_seed_fresh = len(fresh_pd)
                self.seen.seal(0)
                os.makedirs(seed_staging, exist_ok=True)
                tbl = (
                    pa.Table.from_pandas(fresh_pd, preserve_index=False)
                    .select(CANDIDATE_SCHEMA.names)
                    .cast(CANDIDATE_SCHEMA)
                )
                _pq.write_table(tbl, os.path.join(seed_staging, "part-seed.parquet"))
                capped = self._driver_cap(fresh_pd)
            else:
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
            # wave cut: driver-side while capped is small, fully
            # DISTRIBUTED beyond driver_topk_max — the wave then stays a
            # Dataset end-to-end; only the 16-byte ids (residual filter)
            # and, in record_trace mode, three slim columns reach the
            # driver. Identical total order on both paths.
            wave_input = None
            if isinstance(capped, pd.DataFrame) or capped.count() <= cfg.driver_topk_max:
                wave_pd = self._wave_from_capped(capped)
                n_fetched = len(wave_pd)
                if n_fetched:
                    wave_ids = pa.array([bytes(x) for x in wave_pd["task_id"]], pa.binary(16))
                    if cfg.record_trace:
                        summary.trace.extend(
                            (epoch, r.url, int(r.depth), int(r.priority))
                            for r in wave_pd.itertuples()
                        )
                    wave_input = self._wave_dataset(wave_pd, epoch)
            else:
                wave_ds = (
                    capped.sort(SORT_COLS, descending=SORT_DESC)
                    .limit(cfg.wave_size)
                    .materialize()
                )
                n_fetched = wave_ds.count()
                if n_fetched:
                    refs = wave_ds.select_columns(["task_id"]).to_arrow_refs()
                    id_tbl = pa.concat_tables([ray.get(r) for r in refs])
                    wave_ids = id_tbl.column("task_id").combine_chunks()
                    if cfg.record_trace:
                        tr = wave_ds.select_columns(["url", "depth", "priority"]).to_pandas()
                        summary.trace.extend(
                            (epoch, r.url, int(r.depth), int(r.priority))
                            for r in tr.itertuples()
                        )
                    n_cpu_now = int(ray.cluster_resources().get("CPU", 8))
                    # sort+limit emits few fat blocks — split to ~4
                    # blocks/core so fetch tasks saturate the cluster.
                    # The split runs as its OWN tiny execution: an
                    # AllToAll inside the epoch pipeline can deadlock
                    # with op resource reservation disabled.
                    wave_ds = wave_ds.repartition(4 * n_cpu_now).materialize()
                    wave_input = wave_ds.map_batches(
                        _set_epoch_fn(epoch), batch_format="pyarrow"
                    )
            t_wave = time.monotonic()
            if not n_fetched:
                break
            residual = frontier_base.map_batches(
                self._drop_ids_fn(wave_ids), batch_format="pyarrow"
            )

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
                wave_input
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

            # raw-outlink counter: summed from the part NAMES (the fetch
            # sink encodes each part's pre-classification n_outlinks sum
            # as ".n<total>"), so the per-epoch roll-up is one listdir —
            # no parquet scan on the epoch's serial path
            raw_outlinks = 0
            n_updated = n_new = 0
            for part in os.listdir(results_dir):
                if not part.endswith(".parquet"):
                    continue
                m = re.search(r"\.n(\d+)\.parquet$", part)
                if m:
                    raw_outlinks += int(m.group(1))
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
            n_cpu_now = int(ray.cluster_resources().get("CPU", 8))
            frontier_base = read_table(
                self._frontier_dir(epoch), override_num_blocks=2 * n_cpu_now
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
                    "sec_results": round(t_results - t_fetch, 2),
                }
            )
            summary.epochs = epoch + 1

        summary.final_frontier = frontier_rows
        summary.seen_total = self.seen.total_size()
        summary.shard_digests = self.seen.digests()
        summary.wall_sec = time.monotonic() - t0
        return summary
