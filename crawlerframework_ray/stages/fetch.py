"""Fetch stage: the stateful actor-pool `map_batches` callable.

Re-expresses the reference's fetch path — urllib2 GET with retries,
MIME checks, memcache read-through and per-task fetch counters
(crawler/connectors/baseconnector.py:1140-1251, crawler/utils/cache.py:
10-31) — as a Ray Data actor pool: per-actor state (page-store config,
LRU cache, politeness counters) is built ONCE in ``__init__``; each
``__call__`` turns a zero-copy Arrow frontier batch into a fetched-rows
Arrow batch.

The "network" is the deterministic synthetic page store
(data/synth.py): fetch = pure compute, so fetched bytes/captions are
identical on every node and vs the oracle — the basis of the per-row
PSNR/caption invariant.
"""

from __future__ import annotations

from collections import OrderedDict

import pyarrow as pa

from ..data.schemas import PAYLOAD_FIELDS
from ..data.synth import SynthWebConfig, fetch_stitched
from ..functions.hashing import content_hash

FETCHED_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("depth", pa.int32()),
        ("priority", pa.int32()),
        ("score", pa.float32()),
        ("epoch", pa.int32()),
    ]
    + PAYLOAD_FIELDS
    + [
        ("fetch_status", pa.string()),
        ("content_hash", pa.binary(16)),
        ("posted_ts", pa.timestamp("us")),
        ("n_outlinks", pa.int32()),
        ("outlinks", pa.list_(pa.string())),
    ]
)


SLIM_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("depth", pa.int32()),
        ("priority", pa.int32()),
        ("epoch", pa.int32()),
        ("outlinks", pa.list_(pa.string())),
        # 1 = transiently-failed fetch to requeue (cfg.failures): the
        # expander turns it into a seen-gate-bypassing retry candidate.
        # In-flight only (fetch → expand handoff), never checkpointed.
        ("retry", pa.int32()),
    ]
)


def fetch_write_task_fn(web_cfg: dict, staging_dir: str, verify_rows: bool = False,
                        classifier=None, failures: bool = False):
    """Fused fetch+sink stage: fetch the batch, WRITE the full results
    rows (bytes payload included) straight to a parquet part file in
    ``staging_dir`` from inside the task, and return only the slim
    expansion columns downstream.

    Why: the payload `bytes` column dominates row width; returning it
    would put the whole wave in the object store and force a second
    pass to write results. Writing at the fetch task means bytes move
    exactly once (worker → storage), the expansion stream stays narrow,
    and the whole epoch (fetch → expand → dedup → seen-gate) runs as
    ONE pipelined execution. The driver REMOVES any stale
    ``staging_dir`` before launching the epoch and renames it into
    place after the pipeline completes — a crash mid-epoch leaves only
    an orphaned staging dir that the next attempt clears. Parts are
    named by the content hash of the batch's sorted task ids, so a Ray
    task retry OVERWRITES its own part instead of duplicating rows —
    the write is idempotent under the default retry policy.

    ``classifier`` (update-crawl mode, state/hashstore.HashClassifier):
    each fetched row is classified against the cross-run content-hash
    store IN the fetch task — unchanged rows are skipped at the results
    write (the reference's checkSessionInfoReview skip, inside the
    epoch), changed/new rows carry an ``update_status`` column (1
    updated / 2 new). Expansion is unaffected: unchanged pages still
    stream their outlinks downstream."""
    import hashlib as _hashlib
    import os

    import pyarrow.parquet as pq_mod

    key = tuple(sorted(web_cfg.items()))

    def fn(batch: pa.Table) -> pa.Table:
        f = _PROCESS_FETCHERS.get(key)
        if f is None:
            f = _PROCESS_FETCHERS[key] = Fetcher(dict(web_cfg))
        n_retry = n_gone = 0
        retry_slim = None
        # part identity = the INPUT batch (pre-failure-split), so two
        # all-failed batches can never collide on the empty-id name
        orig_task_ids = batch.column("task_id").to_pylist()
        if failures and batch.num_rows:
            # deterministic failure split (data/synth.fetch_status_of):
            # "gone" rows are dropped (counted in the part name),
            # "retry" rows skip the fetch and ride the slim stream as
            # requeue markers — the page store is never touched for a
            # failed fetch, exactly like a real 4xx/5xx
            from ..data.synth import fetch_status_of

            urls_all = batch.column("url").to_pylist()
            epochs_all = batch.column("epoch").to_pylist()
            seed = int(web_cfg["seed"])
            statuses = [
                fetch_status_of(u, int(e), seed) for u, e in zip(urls_all, epochs_all)
            ]
            ok_mask = pa.array([s == "ok" for s in statuses])
            retry_mask = pa.array([s == "retry" for s in statuses])
            n_gone = sum(1 for s in statuses if s == "gone")
            n_retry = sum(1 for s in statuses if s == "retry")
            retry_rows = batch.filter(retry_mask)
            retry_slim = pa.table(
                {
                    "url": retry_rows.column("url"),
                    "host": retry_rows.column("host"),
                    "depth": retry_rows.column("depth"),
                    "priority": retry_rows.column("priority"),
                    "epoch": retry_rows.column("epoch"),
                    "outlinks": pa.array(
                        [[]] * retry_rows.num_rows, pa.list_(pa.string())
                    ),
                    "retry": pa.array([1] * retry_rows.num_rows, pa.int32()),
                },
                schema=SLIM_SCHEMA,
            )
            batch = batch.filter(ok_mask)
        out = f(batch)
        if verify_rows:
            verify_payload_batch(out)
        results = out.drop_columns(["outlinks"])
        # raw-outlink sum of the FETCHED batch (pre-classification: the
        # counter's semantic is outlinks of every fetched page), encoded
        # into the part filename so the driver's per-epoch counter roll-
        # up is an os.listdir, not a parquet scan per part
        n_out_total = int(pa.compute.sum(out.column("n_outlinks")).as_py() or 0)
        if classifier is not None:
            statuses = classifier(
                batch.column("task_id").to_pylist(), results.column("content_hash").to_pylist()
            )
            st = pa.array(statuses, pa.int8())
            results = results.append_column("update_status", st)
            results = results.filter(pa.compute.not_equal(st, 0))
        os.makedirs(staging_dir, exist_ok=True)
        # content-addressed part name: identical input batch ⇒ identical
        # file name, so retries overwrite rather than duplicate
        part_id = _hashlib.md5(b"".join(sorted(orig_task_ids))).hexdigest()
        tmp = os.path.join(staging_dir, f".part-{part_id}.tmp")
        # bytes payloads are already codec-compressed: parquet-level
        # compression, dictionary encoding and min/max statistics on the
        # binary column only burn CPU (statistics copy/compare whole
        # payloads) — disable them
        pq_mod.write_table(
            results,
            tmp,
            compression="none",
            use_dictionary=False,
            write_statistics=False,
        )
        suffix = f".f{n_retry}.g{n_gone}" if failures else ""
        os.replace(
            tmp,
            os.path.join(staging_dir, f"part-{part_id}.n{n_out_total}{suffix}.parquet"),
        )
        slim = out.select(
            [n for n in SLIM_SCHEMA.names if n != "retry"]
        ).append_column("retry", pa.array([0] * out.num_rows, pa.int32()))
        if retry_slim is not None and retry_slim.num_rows:
            slim = pa.concat_tables([slim.cast(SLIM_SCHEMA), retry_slim])
        return slim.cast(SLIM_SCHEMA)

    return fn


def verify_payload_batch(batch: pa.Table) -> None:
    """The per-row invariant (BASELINE.json input_hint), enforced
    in-engine: every fetched row's stored bytes must decode to pixels
    whose recomputed 64-bit average-hash equals the row's ``phash``
    (bit-equality ⇒ decoded-pixel equality class; for lossless fmts the
    bytes ARE the pixels, for qds the codec bounds PSNR ≥ 40 dB by
    construction — tests/test_codecs.py). Raises on the first
    violating row."""
    from ..data import codecs
    from ..data.imageops import average_hash

    fmts = batch.column("fmt").to_pylist()
    datas = batch.column("bytes").to_pylist()
    phashes = batch.column("phash").to_pylist()
    urls = batch.column("url").to_pylist()
    for url, fmt, data, ph in zip(urls, fmts, datas, phashes):
        img = codecs.decode(data, fmt)
        if average_hash(img) != ph:
            raise AssertionError(f"payload invariant violated for {url}: phash mismatch")


def fetcher_task_fn(web_cfg: dict):
    """Task-based fetch stage: a plain function whose per-WORKER-PROCESS
    ``Fetcher`` instance is built once and cached in the module global,
    so repeated dataset executions (one per crawl epoch) reuse warm
    state without paying actor-pool spin-up each epoch. Use this when
    the fetcher state is cheap/reconstructible (synthetic page store);
    use the ``Fetcher`` actor-pool form when state is expensive or
    must NOT be replicated per process (rate-limit budgets, live
    sessions)."""
    key = tuple(sorted(web_cfg.items()))

    def fn(batch):
        f = _PROCESS_FETCHERS.get(key)
        if f is None:
            f = _PROCESS_FETCHERS[key] = Fetcher(dict(web_cfg))
        return f(batch)

    return fn


_PROCESS_FETCHERS: dict = {}


class Fetcher:
    """Actor-pool fetcher. Use as
    ``wave.map_batches(Fetcher, fn_constructor_kwargs={...},
    concurrency=N, batch_format="pyarrow")`` — or via
    ``fetcher_task_fn`` for the task-based form."""

    def __init__(self, web_cfg: dict, cache_size: int = 1024, max_fetches_per_batch: int = 100_000):
        self.cfg = SynthWebConfig(**web_cfg)
        self.cache: OrderedDict[str, dict] = OrderedDict()  # S2 memcache analogue
        self.cache_size = cache_size
        # loop guard analogue of the reference's 1000-fetch cap
        # (baseconnector.py:1213-1220)
        self.max_fetches_per_batch = max_fetches_per_batch
        self.n_fetched = 0
        self.n_cache_hits = 0
        self.per_host_counts: dict[str, int] = {}

    def _fetch_one(self, url: str) -> dict:
        rec = self.cache.get(url)
        if rec is not None:
            self.cache.move_to_end(url)
            self.n_cache_hits += 1
            return rec
        # pagination stitcher (M7): multi-part pages walk continuation
        # pages (cap 5) and concatenate captions
        rec, parts = fetch_stitched(url, self.cfg)
        self.n_fetched += parts
        self.per_host_counts[rec["host"]] = self.per_host_counts.get(rec["host"], 0) + parts
        self.cache[url] = rec
        if len(self.cache) > self.cache_size:
            self.cache.popitem(last=False)
        return rec

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        if len(urls) > self.max_fetches_per_batch:
            raise RuntimeError(f"fetch loop guard: {len(urls)} urls in one batch")
        recs = [self._fetch_one(u) for u in urls]

        cols: dict[str, object] = {
            "url": batch.column("url"),
            "host": batch.column("host"),
            "depth": batch.column("depth"),
            "priority": batch.column("priority"),
            "score": batch.column("score"),
            "epoch": batch.column("epoch"),
        }
        for name, typ in PAYLOAD_FIELDS:
            cols[name] = pa.array([r[name] for r in recs], type=typ)
        cols["fetch_status"] = pa.array(["ok"] * len(recs), pa.string())
        cols["content_hash"] = pa.array(
            [content_hash(r["image_id"], r["caption"]) for r in recs], pa.binary(16)
        )
        cols["posted_ts"] = pa.array([r["posted_ts"] for r in recs], pa.timestamp("us"))
        cols["n_outlinks"] = pa.array([len(r["outlinks"]) for r in recs], pa.int32())
        cols["outlinks"] = pa.array([r["outlinks"] for r in recs], pa.list_(pa.string()))
        return pa.table(cols, schema=FETCHED_SCHEMA)
