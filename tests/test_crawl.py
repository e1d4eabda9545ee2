"""Engine-vs-oracle gates (SURVEY.md §5 / §7.1 M3):

- crawl ordering (trace) equality under the same seeds + politeness budget
- final URL-seen membership equality
- cuckoo shard digest equality (canonical state)
- per-row payload invariant: decoded-pixel PSNR (≥40 dB lossy, exact
  lossless), exact caption equality, phash equality
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from crawlerframework_ray.config import CrawlConfig
from crawlerframework_ray.data import codecs
from crawlerframework_ray.data.imageops import average_hash, psnr
from crawlerframework_ray.data.synth import SynthWebConfig, seeds_table
from crawlerframework_ray.pipelines.crawl import CrawlEngine
from crawlerframework_ray.pipelines.oracle import oracle_crawl


def _cfg(tmp_path, **kw) -> CrawlConfig:
    base = dict(
        web=SynthWebConfig(seed=11, n_hosts=8, path_space=96, max_outlinks=5),
        workdir=str(tmp_path / "crawl"),
        max_depth=2,
        wave_size=48,
        host_budget=12,
        n_shards=4,
        shard_capacity=1 << 14,
        max_epochs=4,
        fetch_concurrency=2,
        fetch_batch_size=64,
        record_trace=True,
    )
    base.update(kw)
    return CrawlConfig(**base)


def _seeds(cfg: CrawlConfig, n: int = 40):
    return seeds_table(cfg.web, n)


@pytest.fixture(scope="module")
def crawl_pair(ray_session, tmp_path_factory):
    cfg = _cfg(tmp_path_factory.mktemp("crawl"))
    seeds = _seeds(cfg)
    engine_summary = CrawlEngine(cfg).run(seeds=seeds)
    oracle = oracle_crawl(cfg, seeds.to_pylist())
    return cfg, engine_summary, oracle


def test_trace_equality(crawl_pair):
    _, summary, oracle = crawl_pair
    assert summary.trace, "engine produced no trace"
    assert summary.trace == oracle["trace"]


def test_counters_match(crawl_pair):
    _, summary, oracle = crawl_pair
    assert summary.fetched_urls == oracle["counters"]["fetched_urls"]
    assert summary.raw_outlinks == oracle["counters"]["raw_outlinks"]
    assert summary.fresh_urls == oracle["counters"]["fresh_urls"]
    assert summary.final_frontier == oracle["final_frontier"]


def test_seen_membership_and_digests(crawl_pair):
    cfg, summary, oracle = crawl_pair
    assert summary.shard_digests == oracle["shard_digests"]
    # membership: engine's exact added set equals oracle's
    import ray

    from crawlerframework_ray.state import checkpoint as ckpt

    last = ckpt.latest_epoch(cfg.workdir)
    shards = ckpt.load_shards(cfg.workdir, last, cfg.n_shards)
    engine_added = set()
    for _, added, _ in shards:
        engine_added.update(added)
    assert engine_added == oracle["seen_added"]


def test_per_row_invariant_psnr_caption_phash(crawl_pair):
    cfg, summary, oracle = crawl_pair
    import ray.data

    res = ray.data.read_parquet(f"{cfg.workdir}/results").to_pandas()
    assert len(res) == len(oracle["results"])
    # task identity is (url, priority) — the reference md5s both
    # (taskmanager.py:363-383) — so one url may legitimately be fetched
    # once per distinct priority.
    okey = {(r["url"], r["priority"], r["epoch"]): r for r in oracle["results"]}
    assert len(okey) == len(res)
    for row in res.itertuples():
        o = okey[(row.url, row.priority, row.epoch)]
        assert row.caption == o["caption"], row.url          # exact caption equality
        assert row.phash == o["phash"], row.url
        assert bytes(row.content_hash) == o["content_hash"]
        eng_img = codecs.decode(bytes(row.bytes), row.fmt)
        ora_img = codecs.decode(o["bytes"], o["fmt"])
        assert average_hash(eng_img) == row.phash
        if codecs.is_lossless(row.fmt):
            np.testing.assert_array_equal(eng_img, ora_img)
        else:
            assert psnr(eng_img, ora_img) >= 40.0 or np.array_equal(eng_img, ora_img)


def test_politeness_budget_respected(crawl_pair):
    cfg, summary, _ = crawl_pair
    df = pd.DataFrame(summary.trace, columns=["epoch", "url", "depth", "priority"])
    df["host"] = df["url"].str.split("/").str[2]
    per = df.groupby(["epoch", "host"]).size()
    assert int(per.max()) <= cfg.host_budget
    waves = df.groupby("epoch").size()
    assert int(waves.max()) <= cfg.wave_size


def test_depth_cap(crawl_pair):
    cfg, summary, _ = crawl_pair
    assert max(d for _, _, d, _ in summary.trace) <= cfg.max_depth


def test_rerun_is_deterministic(ray_session, tmp_path):
    cfg1 = _cfg(tmp_path, workdir=str(tmp_path / "a"), max_epochs=3, wave_size=32)
    cfg2 = _cfg(tmp_path, workdir=str(tmp_path / "b"), max_epochs=3, wave_size=32)
    seeds = _seeds(cfg1, 24)
    s1 = CrawlEngine(cfg1).run(seeds=seeds)
    s2 = CrawlEngine(cfg2).run(seeds=seeds)
    assert s1.trace == s2.trace
    assert s1.shard_digests == s2.shard_digests
    assert s1.fetched_urls == s2.fetched_urls


def test_distributed_wave_path_identical(ray_session, tmp_path):
    """driver_topk_max=0 forces the fully distributed seed admission +
    wave cut; trace, counters and shard digests must be bit-identical
    to the driver fast path (same total order on both)."""
    import dataclasses

    cfg_a = _cfg(tmp_path / "a", max_epochs=3)
    seeds = _seeds(cfg_a)
    sa = CrawlEngine(cfg_a).run(seeds=seeds)
    cfg_b = dataclasses.replace(
        _cfg(tmp_path / "b", max_epochs=3), driver_topk_max=0
    )
    sb = CrawlEngine(cfg_b).run(seeds=seeds)
    assert sa.trace == sb.trace
    assert sa.fetched_urls == sb.fetched_urls
    assert sa.fresh_urls == sb.fresh_urls
    assert sa.raw_outlinks == sb.raw_outlinks
    assert sa.shard_digests == sb.shard_digests
