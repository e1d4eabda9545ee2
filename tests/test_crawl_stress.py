"""Stress the fully distributed wave path at a ~10^5-row frontier
(VERDICT r2 order #9): the bit-identical claim must hold where the
driver fast path is actually bypassed by SIZE, not only when forced on
toy waves. Uses a larger synthetic web so epoch frontiers exceed 100k
candidate rows; asserts trace-free summary identity (counters + shard
digests — recording a 10^5-row trace would dominate the runtime)."""

from __future__ import annotations

import dataclasses

import pytest

from crawlerframework_ray.config import CrawlConfig
from crawlerframework_ray.data.synth import SynthWebConfig, seeds_table
from crawlerframework_ray.pipelines.crawl import CrawlEngine


def _stress_cfg(tmp_path, **kw) -> CrawlConfig:
    base = dict(
        web=SynthWebConfig(seed=23, n_hosts=256, path_space=4096, max_outlinks=5),
        workdir=str(tmp_path / "crawl"),
        max_depth=3,
        wave_size=16384,
        host_budget=128,
        n_shards=4,
        shard_capacity=1 << 18,
        max_epochs=2,
        fetch_concurrency=3,
        fetch_batch_size=4096,
        record_trace=False,
    )
    base.update(kw)
    return CrawlConfig(**base)


def _spill_cfg(tmp_path, **kw) -> CrawlConfig:
    """frontier ≫ wave: a wide synthetic web admits ~100k+ frontier
    rows while each epoch fetches only wave_size — the shape where the
    cold-tail spill must engage (spill_max_resident is per BUCKET)."""
    base = dict(
        web=SynthWebConfig(seed=31, n_hosts=64, path_space=4096, max_outlinks=6),
        workdir=str(tmp_path / "crawl"),
        max_depth=3,
        wave_size=2048,
        host_budget=16,
        n_shards=4,
        shard_capacity=1 << 18,
        max_epochs=4,
        fetch_concurrency=3,
        fetch_batch_size=1024,
        record_trace=True,
    )
    base.update(kw)
    return CrawlConfig(**base)


@pytest.mark.stress
def test_spill_bit_identical_and_bounded(ray_session, tmp_path):
    """The round-4 gate for the frontier cold-tail spill
    (state/frontier.py): with spill forced on at a low threshold and a
    tight slack, the crawl trace, counters and shard digests must be
    BIT-IDENTICAL to the all-resident path, actor residency must stay
    bounded (≤ threshold per bucket, ≪ total frontier), and no frontier
    row may be lost (resident + cold == final_frontier)."""
    cfg_res = _spill_cfg(tmp_path / "resident", spill_max_resident=1 << 30)
    seeds = seeds_table(cfg_res.web, 20_000)
    eng_res = CrawlEngine(cfg_res)
    sa = eng_res.run(seeds=seeds)
    assert sa.final_frontier > 10 * cfg_res.wave_size, sa.final_frontier
    assert sa.spill["n_spills"] == 0

    cfg_sp = _spill_cfg(tmp_path / "spill", spill_max_resident=2048, spill_slack=2)
    sb = CrawlEngine(cfg_sp).run(seeds=seeds)

    # bit-identity vs the resident path
    assert sb.trace == sa.trace
    assert sb.shard_digests == sa.shard_digests
    assert sb.fetched_urls == sa.fetched_urls
    assert sb.fresh_urls == sa.fresh_urls
    assert sb.raw_outlinks == sa.raw_outlinks
    assert sb.final_frontier == sa.final_frontier

    # the spill actually engaged and bounded actor residency
    assert sb.spill["n_spills"] > 0
    assert sb.spill["cold_rows"] > 0
    assert sb.spill["max_bucket_resident"] <= 2048
    assert sb.spill["resident_rows"] < sa.spill["resident_rows"]
    # conservation: hot ∪ cold is exactly the frontier
    assert sb.spill["resident_rows"] + sb.spill["cold_rows"] == sb.final_frontier


@pytest.mark.stress
def test_spill_checkpoint_complete_and_resume(ray_session, tmp_path):
    """Epoch checkpoints under spill carry the FULL frontier (hot part
    + hard-linked cold parts), so a resumed run is bit-identical to an
    uninterrupted spill run — and row counts on disk equal hot+cold."""
    import os

    import pyarrow.parquet as pq

    from crawlerframework_ray.state import checkpoint as ckpt

    def cfg_at(d, epochs):
        return _spill_cfg(
            tmp_path / d, workdir=str(tmp_path / d),
            spill_max_resident=2048, spill_slack=2, max_epochs=epochs,
        )

    seeds = seeds_table(cfg_at("full", 4).web, 20_000)
    full = CrawlEngine(cfg_at("full", 4)).run(seeds=seeds)
    assert full.spill["n_spills"] > 0

    # checkpointed frontier rows == hot + cold (nothing dropped)
    last = ckpt.latest_epoch(str(tmp_path / "full"))
    fdir = os.path.join(ckpt.epoch_dir(str(tmp_path / "full"), last), "frontier")
    disk_rows = sum(
        pq.read_metadata(os.path.join(fdir, f)).num_rows
        for f in os.listdir(fdir) if f.endswith(".parquet")
    )
    assert disk_rows == full.final_frontier

    half = CrawlEngine(cfg_at("half", 2)).run(seeds=seeds)
    assert half.spill["n_spills"] > 0
    resumed = CrawlEngine(cfg_at("half", 4)).run(resume=True)
    assert resumed.shard_digests == full.shard_digests
    assert resumed.fetched_urls == full.fetched_urls
    assert resumed.fresh_urls == full.fresh_urls
    assert resumed.final_frontier == full.final_frontier
    tail = [t for t in full.trace if t[0] >= 2]
    assert resumed.trace == tail


@pytest.mark.stress
def test_distributed_wave_identical_at_1e5_frontier(ray_session, tmp_path):
    cfg_a = _stress_cfg(tmp_path / "a")
    seeds = seeds_table(cfg_a.web, 40_000)
    sa = CrawlEngine(cfg_a).run(seeds=seeds)
    # the admitted frontier must actually reach stress scale
    assert sa.fresh_urls > 100_000, sa.fresh_urls
    sb = CrawlEngine(
        dataclasses.replace(_stress_cfg(tmp_path / "b"), driver_topk_max=0)
    ).run(seeds=seeds)
    assert sa.fetched_urls == sb.fetched_urls
    assert sa.fresh_urls == sb.fresh_urls
    assert sa.raw_outlinks == sb.raw_outlinks
    assert sa.shard_digests == sb.shard_digests


@pytest.mark.stress
def test_spill_bit_identical_with_robots_budgets(ray_session, tmp_path):
    """Spill safety with PER-HOST robots budgets (the barr branch of
    _sort_rank/_cap_unsafe/_spill): trace and digests must stay
    bit-identical to the all-resident path when hosts carry different
    politeness budgets from the robots cache."""
    cfg_res = _spill_cfg(
        tmp_path / "res", robots=True, max_epochs=3,
        spill_max_resident=1 << 30,
    )
    seeds = seeds_table(cfg_res.web, 12_000)
    sa = CrawlEngine(cfg_res).run(seeds=seeds)
    assert sa.final_frontier > 4 * cfg_res.wave_size

    cfg_sp = _spill_cfg(
        tmp_path / "sp", robots=True, max_epochs=3,
        spill_max_resident=1024, spill_slack=2,
    )
    sb = CrawlEngine(cfg_sp).run(seeds=seeds)
    assert sb.spill["n_spills"] > 0
    assert sb.trace == sa.trace
    assert sb.shard_digests == sa.shard_digests
    assert sb.fetched_urls == sa.fetched_urls
    assert sb.final_frontier == sa.final_frontier


@pytest.mark.stress
def test_spill_bit_identical_with_failures_and_backoff(ray_session, tmp_path):
    """Interaction gate: the retry fold (flag-routed requeues, folded
    after the wave-id drop) and the AIMD backoff both live in the same
    finalize as the cold-tail spill — with all three active at a low
    spill threshold, the trace must stay bit-identical to the
    all-resident failures+backoff run AND the fixture must exercise
    both machineries (spills > 0, transient failures > 0)."""
    kw = dict(failures=True, adaptive_politeness=True)
    cfg_res = _spill_cfg(tmp_path / "res", spill_max_resident=1 << 30, **kw)
    seeds = seeds_table(cfg_res.web, 20_000)
    sa = CrawlEngine(cfg_res).run(seeds=seeds)
    assert sa.failed_transient_urls > 0
    assert sa.spill["n_spills"] == 0

    cfg_sp = _spill_cfg(tmp_path / "sp", spill_max_resident=2048, spill_slack=2, **kw)
    sb = CrawlEngine(cfg_sp).run(seeds=seeds)
    assert sb.spill["n_spills"] > 0
    assert sb.trace == sa.trace
    assert sb.shard_digests == sa.shard_digests
    assert sb.failed_transient_urls == sa.failed_transient_urls
    assert sb.failed_permanent_urls == sa.failed_permanent_urls
    assert sb.final_frontier == sa.final_frontier
