"""Robots.txt politeness gates (north_star: "per-host politeness
buckets with robots.txt caching"): trace equality vs the serial oracle
with robots ON, and the hard invariant that a disallowed URL is never
fetched."""

from __future__ import annotations

import pandas as pd
import pytest

from crawlerframework_ray.config import CrawlConfig
from crawlerframework_ray.data.synth import SynthWebConfig, host_of, seeds_table
from crawlerframework_ray.functions.robots import (
    RobotsCache,
    parse_robots_txt,
    synth_robots_txt,
)
from crawlerframework_ray.pipelines.crawl import CrawlEngine
from crawlerframework_ray.pipelines.oracle import oracle_crawl

WEB = SynthWebConfig(seed=11, n_hosts=8, path_space=96, max_outlinks=5)


def test_parse_robots_txt():
    rules = parse_robots_txt(
        "User-agent: *\nDisallow: /p/3\nDisallow: /p/7\nCrawl-delay: 2\n# comment\n"
    )
    assert rules.disallow_prefixes == ("/p/3", "/p/7")
    assert rules.crawl_delay == 2


def test_synth_robots_deterministic_and_varied():
    txts = {h: synth_robots_txt(f"h{h}.example.test", WEB.seed) for h in range(32)}
    assert txts == {h: synth_robots_txt(f"h{h}.example.test", WEB.seed) for h in range(32)}
    rules = [parse_robots_txt(t) for t in txts.values()]
    assert any(r.disallow_prefixes for r in rules), "no host restricts — fixture too weak"
    assert any(r.crawl_delay > 0 for r in rules), "no host throttles — fixture too weak"
    assert any(not r.disallow_prefixes and r.crawl_delay == 0 for r in rules)


def test_robots_cache_fetches_once_per_host():
    rc = RobotsCache(WEB.seed)
    for _ in range(5):
        rc.rules("h1.example.test")
        rc.rules("h2.example.test")
    assert rc.n_fetches == 2


def _cfg(tmp_path, **kw) -> CrawlConfig:
    base = dict(
        web=WEB, workdir=str(tmp_path / "crawl"), max_depth=2, wave_size=48,
        host_budget=12, n_shards=4, shard_capacity=1 << 14, max_epochs=4,
        fetch_concurrency=2, fetch_batch_size=64, record_trace=True, robots=True,
    )
    base.update(kw)
    return CrawlConfig(**base)


@pytest.fixture(scope="module")
def robots_crawl(ray_session, tmp_path_factory):
    cfg = _cfg(tmp_path_factory.mktemp("robots"))
    seeds = seeds_table(cfg.web, 40)
    summary = CrawlEngine(cfg).run(seeds=seeds)
    oracle = oracle_crawl(cfg, seeds.to_pylist())
    return cfg, summary, oracle


def test_robots_trace_equality(robots_crawl):
    _, summary, oracle = robots_crawl
    assert summary.trace, "engine produced no trace"
    assert summary.trace == oracle["trace"]
    assert summary.shard_digests == oracle["shard_digests"]


def test_disallowed_urls_never_fetched(robots_crawl):
    cfg, summary, _ = robots_crawl
    rc = RobotsCache(cfg.web.seed)
    fetched = [u for _, u, _, _ in summary.trace]
    assert fetched
    assert not any(rc.disallowed(u, host_of(u)) for u in fetched)


def test_robots_actually_bites(robots_crawl, ray_session, tmp_path):
    """The gate must be observable: the same crawl with robots OFF
    fetches at least one URL the robots run excluded."""
    cfg, summary, _ = robots_crawl
    off = _cfg(tmp_path, workdir=str(tmp_path / "off"), robots=False)
    s_off = CrawlEngine(off).run(seeds=seeds_table(off.web, 40))
    rc = RobotsCache(cfg.web.seed)
    off_urls = {u for _, u, _, _ in s_off.trace}
    assert any(rc.disallowed(u, host_of(u)) for u in off_urls), (
        "fixture never exercises a disallow rule — weaken nothing, pick a richer web"
    )


def test_crawl_delay_budget_respected(robots_crawl):
    cfg, summary, _ = robots_crawl
    rc = RobotsCache(cfg.web.seed)
    df = pd.DataFrame(summary.trace, columns=["epoch", "url", "depth", "priority"])
    df["host"] = df["url"].map(host_of)
    per = df.groupby(["epoch", "host"]).size()
    for (_, host), n in per.items():
        assert n <= rc.host_budget(host, cfg.host_budget), (host, n)
