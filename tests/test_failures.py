"""Fetch-failure semantics (cfg.failures): trace/digest equality vs the
serial oracle under the deterministic failure model, retry-requeue past
the seen gate, and the hard invariants that permanently-gone URLs never
reach results while transiently-failed URLs are refetched."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from crawlerframework_ray.config import CrawlConfig
from crawlerframework_ray.data.synth import SynthWebConfig, fetch_status_of, seeds_table
from crawlerframework_ray.pipelines.crawl import CrawlEngine
from crawlerframework_ray.pipelines.oracle import oracle_crawl

WEB = SynthWebConfig(seed=13, n_hosts=8, path_space=96, max_outlinks=5)


def _cfg(tmp_path, **kw) -> CrawlConfig:
    base = dict(
        web=WEB, workdir=str(tmp_path / "crawl"), max_depth=2, wave_size=48,
        host_budget=12, n_shards=4, shard_capacity=1 << 14, max_epochs=5,
        fetch_concurrency=2, fetch_batch_size=64, record_trace=True, failures=True,
    )
    base.update(kw)
    return CrawlConfig(**base)


@pytest.fixture(scope="module")
def failure_crawl(ray_session, tmp_path_factory):
    cfg = _cfg(tmp_path_factory.mktemp("failures"))
    seeds = seeds_table(cfg.web, 40)
    summary = CrawlEngine(cfg).run(seeds=seeds)
    oracle = oracle_crawl(cfg, seeds.to_pylist())
    return cfg, summary, oracle


def _results_df(cfg):
    import pandas as pd

    frames = []
    results_root = os.path.join(cfg.workdir, "results")
    for epoch_dir in sorted(os.listdir(results_root)):
        rdir = os.path.join(results_root, epoch_dir)
        if not os.path.isdir(rdir):
            continue
        for part in os.listdir(rdir):
            if part.endswith(".parquet"):
                t = pq.read_table(os.path.join(rdir, part))
                if t.num_rows:
                    frames.append(t.select(["url", "epoch", "fetch_status"]).to_pandas())
    return pd.concat(frames, ignore_index=True)


def test_failure_trace_equality(failure_crawl):
    _, summary, oracle = failure_crawl
    assert summary.trace, "engine produced no trace"
    assert summary.trace == oracle["trace"]
    assert summary.shard_digests == oracle["shard_digests"]


def test_failure_counters_match_oracle(failure_crawl):
    _, summary, oracle = failure_crawl
    assert summary.failed_transient_urls == oracle["counters"]["failed_transient"]
    assert summary.failed_permanent_urls == oracle["counters"]["failed_permanent"]
    assert summary.fetched_urls == oracle["counters"]["fetched_urls"]
    assert summary.raw_outlinks == oracle["counters"]["raw_outlinks"]
    # fixture strength: both failure classes must actually occur
    assert summary.failed_transient_urls > 0, "no transient failure — fixture too weak"
    assert summary.failed_permanent_urls > 0, "no permanent failure — fixture too weak"


def test_gone_urls_never_in_results(failure_crawl):
    cfg, summary, _ = failure_crawl
    df = _results_df(cfg)
    assert len(df)
    assert (df["fetch_status"] == "ok").all()
    statuses = {
        u: fetch_status_of(u, int(e), cfg.web.seed)
        for u, e in zip(df["url"], df["epoch"])
    }
    assert all(s == "ok" for s in statuses.values())
    gone_in_trace = [
        u for e, u, _, _ in summary.trace if fetch_status_of(u, e, cfg.web.seed) == "gone"
    ]
    assert gone_in_trace, "no gone URL was ever scheduled — fixture too weak"
    assert not set(gone_in_trace) & set(df["url"])


def test_transient_urls_retried_and_fetched(failure_crawl):
    cfg, summary, _ = failure_crawl
    df = _results_df(cfg)
    failed = [
        (e, u) for e, u, _, _ in summary.trace
        if fetch_status_of(u, e, cfg.web.seed) == "retry"
    ]
    assert failed, "no transient failure scheduled — fixture too weak"
    # at least one transiently-failed URL must be re-scheduled in a
    # later epoch (the requeue bypassed the seen gate) and succeed
    refetched = [
        (e, u) for e, u in failed
        if any(u2 == u and e2 > e for e2, u2, _, _ in summary.trace)
    ]
    assert refetched, "no retry was ever re-scheduled — requeue path dead"
    ok_urls = set(df["url"])
    assert any(u in ok_urls for _, u in refetched)


def test_failures_off_is_unchanged(ray_session, tmp_path):
    """The flag-off path must be byte-identical to the pre-failure
    engine: same trace as an oracle run with failures off, and every
    scheduled URL lands in results exactly once."""
    cfg = _cfg(tmp_path, failures=False, workdir=str(tmp_path / "off"))
    seeds = seeds_table(cfg.web, 40)
    summary = CrawlEngine(cfg).run(seeds=seeds)
    oracle = oracle_crawl(cfg, seeds.to_pylist())
    assert summary.trace == oracle["trace"]
    assert summary.failed_transient_urls == 0
    assert summary.failed_permanent_urls == 0
    df = _results_df(cfg)
    assert sorted(df["url"]) == sorted(u for _, u, _, _ in summary.trace)


def test_failures_resume_bit_identical(ray_session, tmp_path):
    """A killed run resumes through retry rows bit-identically: the
    requeued transient failures live in the frontier checkpoint like
    any other frontier row."""
    from crawlerframework_ray.state import checkpoint as ckpt

    seeds = seeds_table(WEB, 40)
    full = CrawlEngine(_cfg(tmp_path, workdir=str(tmp_path / "full"))).run(seeds=seeds)

    half_dir = str(tmp_path / "half")
    half = CrawlEngine(_cfg(tmp_path, workdir=half_dir, max_epochs=2)).run(seeds=seeds)
    assert half.epochs == 2
    assert ckpt.latest_epoch(half_dir) == 1
    # the interrupted run must have pending retries for the resume to carry
    assert half.failed_transient_urls > 0, "no retry pending at the cut — fixture too weak"

    resumed = CrawlEngine(_cfg(tmp_path, workdir=half_dir, max_epochs=5)).run(resume=True)
    assert resumed.shard_digests == full.shard_digests
    tail = [t for t in full.trace if t[0] >= 2]
    assert resumed.trace == tail
    assert (
        half.failed_transient_urls + resumed.failed_transient_urls
        == full.failed_transient_urls
    )
    assert (
        half.failed_permanent_urls + resumed.failed_permanent_urls
        == full.failed_permanent_urls
    )


@pytest.fixture(scope="module")
def adaptive_crawl(ray_session, tmp_path_factory):
    cfg = _cfg(
        tmp_path_factory.mktemp("adaptive"),
        adaptive_politeness=True, host_budget=8, max_epochs=6,
    )
    seeds = seeds_table(cfg.web, 40)
    summary = CrawlEngine(cfg).run(seeds=seeds)
    oracle = oracle_crawl(cfg, seeds.to_pylist())
    return cfg, summary, oracle


def test_adaptive_politeness_trace_equality(adaptive_crawl):
    _, summary, oracle = adaptive_crawl
    assert summary.trace
    assert summary.trace == oracle["trace"]
    assert summary.shard_digests == oracle["shard_digests"]


def test_adaptive_politeness_actually_backs_off(adaptive_crawl):
    """After an epoch in which host h had a transient failure, epoch
    e+1 must schedule at most max(1, budget >> 1) rows of h — and the
    fixture must actually exercise that clamp below the base budget."""
    import collections

    cfg, summary, _ = adaptive_crawl
    per = collections.Counter()
    failed_hosts_by_epoch: dict[int, set] = collections.defaultdict(set)
    sched = collections.defaultdict(int)
    for e, u, _, _ in summary.trace:
        h = u.split("://", 1)[1].split("/", 1)[0]
        sched[(e, h)] += 1
        if fetch_status_of(u, e, cfg.web.seed) == "retry":
            failed_hosts_by_epoch[e].add(h)
    clamped = 0
    for e, hosts in failed_hosts_by_epoch.items():
        for h in hosts:
            nxt = sched.get((e + 1, h), 0)
            assert nxt <= max(1, cfg.host_budget >> 1), (e, h, nxt)
            if 0 < nxt <= cfg.host_budget >> 1 and sched[(e, h)] > nxt:
                clamped += 1
    assert clamped > 0, "backoff never visibly clamped a host — fixture too weak"


def test_adaptive_politeness_resume_bit_identical(ray_session, tmp_path):
    from crawlerframework_ray.state import checkpoint as ckpt

    kw = dict(adaptive_politeness=True, host_budget=8, max_epochs=6)
    seeds = seeds_table(WEB, 40)
    full = CrawlEngine(
        _cfg(tmp_path, workdir=str(tmp_path / "full"), **kw)
    ).run(seeds=seeds)
    half_dir = str(tmp_path / "half")
    half_kw = dict(kw, max_epochs=3)
    half = CrawlEngine(_cfg(tmp_path, workdir=half_dir, **half_kw)).run(seeds=seeds)
    assert ckpt.latest_epoch(half_dir) == 2
    resumed = CrawlEngine(_cfg(tmp_path, workdir=half_dir, **kw)).run(resume=True)
    assert resumed.shard_digests == full.shard_digests
    assert resumed.trace == [t for t in full.trace if t[0] >= 3]


def test_adaptive_requires_failures(ray_session, tmp_path):
    cfg = _cfg(tmp_path, adaptive_politeness=True, failures=False)
    with pytest.raises(ValueError, match="adaptive_politeness needs failures"):
        CrawlEngine(cfg).run(seeds=seeds_table(WEB, 8))
