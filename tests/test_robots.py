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


# RFC 9309 §2.2.2 longest-match precedence conformance
# (robots_txt, path, expected_allowed)
_PRECEDENCE_TABLE = [
    # no matching rule -> allowed
    ("User-agent: *\nDisallow: /q", "/p/1", True),
    # plain prefix disallow bites
    ("User-agent: *\nDisallow: /p", "/p/1", False),
    # longer Allow carve-out beats shorter Disallow
    ("User-agent: *\nDisallow: /p\nAllow: /p/1", "/p/12", True),
    ("User-agent: *\nDisallow: /p\nAllow: /p/1", "/p/2", False),
    # longer Disallow beats shorter Allow (rule order irrelevant)
    ("User-agent: *\nAllow: /folder\nDisallow: /folder/", "/folder/page", False),
    ("User-agent: *\nAllow: /folder\nDisallow: /folder/", "/folder", True),
    # equal length -> Allow wins, in either order
    ("User-agent: *\nAllow: /page\nDisallow: /page", "/page", True),
    ("User-agent: *\nDisallow: /page\nAllow: /page", "/page", True),
    # '*' wildcard matches any octet sequence
    ("User-agent: *\nDisallow: /p/*7", "/p/17", False),
    ("User-agent: *\nDisallow: /p/*7", "/p/171", False),
    ("User-agent: *\nDisallow: /p/*7", "/p/18", True),
    # trailing '$' anchors the end of the path
    ("User-agent: *\nDisallow: /p/*7$", "/p/17", False),
    ("User-agent: *\nDisallow: /p/*7$", "/p/171", True),
    ("User-agent: *\nDisallow: /*.php$", "/index.php", False),
    ("User-agent: *\nDisallow: /*.php$", "/index.php?x=1", True),
    # wildcard pattern length counts its octets for precedence
    ("User-agent: *\nAllow: /p/1\nDisallow: /p/*3$", "/p/13", False),
    ("User-agent: *\nAllow: /p/1\nDisallow: /p/*3$", "/p/19", True),
    # empty Disallow is no rule
    ("User-agent: *\nDisallow:", "/anything", True),
    # Disallow: / blocks everything, Allow: / longest-ties it open
    ("User-agent: *\nDisallow: /", "/p/1", False),
    ("User-agent: *\nDisallow: /\nAllow: /", "/p/1", True),
]


@pytest.mark.parametrize("txt,path,want", _PRECEDENCE_TABLE)
def test_rfc9309_precedence(txt, path, want):
    assert parse_robots_txt(txt).allowed(path) is want


def test_rfc9309_group_selection():
    from crawlerframework_ray.functions.robots import DEFAULT_UA

    txt = (
        "Disallow: /ignored-no-group\n"          # rule before any UA line: ignored
        "User-agent: *\nDisallow: /star\nCrawl-delay: 1\n\n"
        "User-agent: graft\nDisallow: /short\n\n"
        f"User-agent: {DEFAULT_UA}\nDisallow: /exact\nCrawl-delay: 3\n"
    )
    # most specific agent (longest prefix of the product token) wins;
    # the star group does NOT also apply
    r = parse_robots_txt(txt, DEFAULT_UA)
    assert not r.allowed("/exact/x")
    assert r.allowed("/star/x")
    assert r.allowed("/short/x")
    assert r.crawl_delay == 3
    # shorter-prefix agent selected for a UA that only matches it
    r2 = parse_robots_txt(txt, "graftb")
    assert not r2.allowed("/short/x")
    assert r2.allowed("/exact/x")
    # unknown UA falls back to *
    r3 = parse_robots_txt(txt, "otherbot")
    assert not r3.allowed("/star/x")
    assert r3.crawl_delay == 1
    assert r3.allowed("/ignored-no-group/x")


def test_rfc9309_consecutive_agents_share_group():
    txt = "User-agent: a\nUser-agent: b\nDisallow: /x\n"
    assert not parse_robots_txt(txt, "a").allowed("/x/1")
    assert not parse_robots_txt(txt, "b").allowed("/x/1")
    assert parse_robots_txt(txt, "c").allowed("/x/1")


def test_rfc9309_same_agent_groups_merge():
    txt = (
        "User-agent: *\nDisallow: /a\n\n"
        "User-agent: *\nDisallow: /b\n"
    )
    r = parse_robots_txt(txt)
    assert not r.allowed("/a/1")
    assert not r.allowed("/b/1")


def test_synth_robots_exercises_rfc_features():
    """The synthetic web must exercise wildcard rules, Allow
    carve-outs and specific-agent override groups somewhere in a
    64-host span — otherwise the engine's RFC matcher is dead code."""
    txts = [synth_robots_txt(f"h{h}.example.test", WEB.seed) for h in range(64)]
    assert any("*" in t.split("User-agent: *", 1)[1].split("User-agent:", 1)[0].replace("Crawl-delay", "")
               and "Allow: " in t for t in txts), "no wildcard+allow tier host"
    assert any("User-agent: graftbot" in t for t in txts), "no specific-agent host"
    # a specific-agent group must actually override the * group for
    # at least one (host, url): disallowed for graftbot, not for *
    hit = False
    for h, t in enumerate(txts):
        star = parse_robots_txt(t, "someotherbot")
        mine = parse_robots_txt(t, "graftbot")
        for p in range(10):
            path = f"/p/{p}"
            if star.allowed(path) and not mine.allowed(path):
                hit = True
    assert hit, "specific group never overrides * — fixture too weak"


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
