"""In-crawl update mode (T5 in-epoch) vs the serial oracle:

base crawl → hash store → drifted-web update crawl. Gates: trace
equality on the drifted web, skip/update/new counts, written-rows set
(unchanged rows must NOT be written), per-shard hash-store digest
equality, and the salt=0 degenerate case (everything skipped)."""

from __future__ import annotations

import dataclasses

import pytest

from crawlerframework_ray.config import CrawlConfig
from crawlerframework_ray.data.synth import SynthWebConfig, seeds_table
from crawlerframework_ray.functions.hashing import task_id
from crawlerframework_ray.pipelines.crawl import CrawlEngine
from crawlerframework_ray.pipelines.oracle import oracle_crawl
from crawlerframework_ray.pipelines.updatecrawl import (
    oracle_update_crawl,
    results_hashes,
    update_crawl,
)


def _cfg(workdir: str, **kw) -> CrawlConfig:
    base = dict(
        web=SynthWebConfig(seed=23, n_hosts=8, path_space=96, max_outlinks=5),
        workdir=workdir,
        max_depth=2,
        wave_size=48,
        host_budget=12,
        n_shards=4,
        shard_capacity=1 << 14,
        max_epochs=3,
        fetch_concurrency=2,
        fetch_batch_size=64,
        record_trace=True,
    )
    base.update(kw)
    return CrawlConfig(**base)


def _drifted(cfg: CrawlConfig, workdir: str, salt: int, permille: int) -> CrawlConfig:
    web = SynthWebConfig(
        **{**cfg.web.as_dict(), "drift_salt": salt, "drift_permille": permille}
    )
    return dataclasses.replace(cfg, web=web, workdir=workdir)


@pytest.fixture(scope="module")
def update_pair(ray_session, tmp_path_factory):
    base_dir = tmp_path_factory.mktemp("updbase")
    cfg = _cfg(str(base_dir / "crawl"))
    seeds = seeds_table(cfg.web, 40)
    CrawlEngine(cfg).run(seeds=seeds)
    prev_oracle = oracle_crawl(cfg, seeds.to_pylist())
    prev_hashes = results_hashes(prev_oracle["results"])

    ucfg = _drifted(cfg, str(base_dir / "update"), salt=7, permille=300)
    summary, store = update_crawl(ucfg, f"{cfg.workdir}/results", seeds)
    oracle = oracle_update_crawl(ucfg, seeds.to_pylist(), prev_hashes)
    return ucfg, summary, store, oracle


def test_update_trace_equality(update_pair):
    _, summary, _, oracle = update_pair
    assert summary.trace == oracle["trace"]


def test_update_counts_match(update_pair):
    _, summary, _, oracle = update_pair
    assert summary.skipped_urls == oracle["counts"]["skipped_urls"]
    assert summary.updated_urls == oracle["counts"]["updated_urls"]
    assert summary.new_urls == oracle["counts"]["new_urls"]
    # drift at 300 permille over a drifted-outlink web must exercise
    # all three statuses, or the fixture proves nothing
    assert summary.skipped_urls > 0
    assert summary.updated_urls > 0
    assert summary.new_urls > 0


def test_update_written_rows_match(update_pair):
    """Results partitions contain exactly the oracle's changed/new rows
    (unchanged rows skipped at the write), statuses per tid equal."""
    import pyarrow.parquet as pq
    import pathlib

    ucfg, _, _, oracle = update_pair
    written = {}
    for p in pathlib.Path(f"{ucfg.workdir}/results").rglob("*.parquet"):
        t = pq.read_table(p, columns=["url", "priority", "update_status"])
        for u, pr, st in zip(
            t.column("url").to_pylist(),
            t.column("priority").to_pylist(),
            t.column("update_status").to_pylist(),
        ):
            written[task_id(u, int(pr))] = st
    expect = {
        task_id(r["url"], int(r["priority"])): r["update_status"] for r in oracle["written"]
    }
    assert written == expect


def test_update_store_digests_match(update_pair):
    _, _, store, oracle = update_pair
    assert store.digests() == oracle["store_digests"]
    assert store.total_size() == len(oracle["store"])


def test_no_drift_all_skipped(ray_session, tmp_path):
    cfg = _cfg(str(tmp_path / "crawl"), max_epochs=2)
    seeds = seeds_table(cfg.web, 30)
    CrawlEngine(cfg).run(seeds=seeds)
    ucfg = dataclasses.replace(cfg, workdir=str(tmp_path / "update"))
    summary, _ = update_crawl(ucfg, f"{cfg.workdir}/results", seeds)
    assert summary.updated_urls == 0
    assert summary.new_urls == 0
    assert summary.skipped_urls == summary.fetched_urls


def test_update_crawl_resume_bit_identical(ray_session, tmp_path):
    """A killed update crawl resumes to the same written-rows set,
    per-status counters and hash-store digests as an uninterrupted run
    (the reference's session_info survived restarts; here the store is
    rebuilt from the previous run's results and post-resume epochs
    classify against the identical committed state)."""
    import dataclasses
    import pathlib

    import pyarrow.parquet as pq

    from crawlerframework_ray.state.hashstore import HashStore

    base = _cfg(str(tmp_path / "base"), max_epochs=2)
    seeds = seeds_table(base.web, 40)
    CrawlEngine(base).run(seeds=seeds)
    prev_results = f"{base.workdir}/results"

    def written(workdir):
        out = {}
        for p in pathlib.Path(f"{workdir}/results").rglob("*.parquet"):
            t = pq.read_table(p, columns=["url", "priority", "update_status"])
            for u, pr, st in zip(*[t.column(c).to_pylist() for c in
                                   ("url", "priority", "update_status")]):
                out[(u, int(pr))] = st
        return out

    ucfg_full = _drifted(base, str(tmp_path / "u_full"), salt=5, permille=300)
    s_full, store_full = update_crawl(ucfg_full, prev_results, seeds)

    # partial run: stop after epoch 0, then resume to completion
    ucfg_part = dataclasses.replace(
        _drifted(base, str(tmp_path / "u_part"), salt=5, permille=300), max_epochs=1
    )
    store1 = HashStore(ucfg_part.n_shards)
    store1.load_from_results(prev_results)
    CrawlEngine(ucfg_part).run(seeds=seeds, hash_store=store1)

    from crawlerframework_ray.pipelines.updatecrawl import resume_update_crawl

    ucfg_resume = dataclasses.replace(ucfg_part, max_epochs=base.max_epochs)
    s_res, store2 = resume_update_crawl(ucfg_resume, prev_results)

    assert (s_res.skipped_urls, s_res.updated_urls, s_res.new_urls) == (
        s_full.skipped_urls, s_full.updated_urls, s_full.new_urls)
    assert written(ucfg_resume.workdir) == written(ucfg_full.workdir)
    assert s_res.shard_digests == s_full.shard_digests
    assert store2.digests() == store_full.digests()


def test_update_crawl_resume_orphan_epoch(ray_session, tmp_path):
    """Crash-window resume: the run dies BETWEEN the results-dir rename
    and the manifest write, leaving an orphan ``results/epoch=N``. The
    resume must NOT overlay that epoch's hashes (the re-executed epoch
    would classify its changed/new rows as UNCHANGED and silently drop
    them) — written rows, counters and store digests must still equal
    the uninterrupted run's."""
    import dataclasses
    import os
    import pathlib
    import shutil

    import pyarrow.parquet as pq

    from crawlerframework_ray.pipelines.updatecrawl import resume_update_crawl
    from crawlerframework_ray.state.hashstore import HashStore

    base = _cfg(str(tmp_path / "base"), max_epochs=2)
    seeds = seeds_table(base.web, 40)
    CrawlEngine(base).run(seeds=seeds)
    prev_results = f"{base.workdir}/results"

    def written(workdir):
        out = {}
        for p in pathlib.Path(f"{workdir}/results").rglob("*.parquet"):
            t = pq.read_table(p, columns=["url", "priority", "update_status"])
            for u, pr, st in zip(*[t.column(c).to_pylist() for c in
                                   ("url", "priority", "update_status")]):
                out[(u, int(pr))] = st
        return out

    ucfg_full = _drifted(base, str(tmp_path / "u_full"), salt=5, permille=300)
    s_full, store_full = update_crawl(ucfg_full, prev_results, seeds)

    # run both epochs, then simulate the crash window by deleting the
    # LAST epoch's manifest while keeping its committed results dir
    ucfg_part = _drifted(base, str(tmp_path / "u_part"), salt=5, permille=300)
    store1 = HashStore(ucfg_part.n_shards)
    store1.load_from_results(prev_results)
    CrawlEngine(ucfg_part).run(seeds=seeds, hash_store=store1)
    last = base.max_epochs - 1
    os.remove(os.path.join(
        ucfg_part.workdir, "ckpt", f"epoch={last:04d}", "manifest.json"))
    assert os.path.isdir(os.path.join(
        ucfg_part.workdir, "results", f"epoch={last:04d}"))  # the orphan

    s_res, store2 = resume_update_crawl(ucfg_part, prev_results)
    assert (s_res.skipped_urls, s_res.updated_urls, s_res.new_urls) == (
        s_full.skipped_urls, s_full.updated_urls, s_full.new_urls)
    assert written(ucfg_part.workdir) == written(ucfg_full.workdir)
    assert store2.digests() == store_full.digests()
