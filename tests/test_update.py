"""Update-mode / versioning (T5, D4, J4) and the CLI surface."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

from crawlerframework_ray.config import CrawlConfig
from crawlerframework_ray.data.synth import SynthWebConfig, seeds_table
from crawlerframework_ray.pipelines.crawl import CrawlEngine


@pytest.fixture(scope="module")
def crawl_results(ray_session, tmp_path_factory):
    cfg = CrawlConfig(
        web=SynthWebConfig(seed=31, n_hosts=6, path_space=64, max_outlinks=4),
        workdir=str(tmp_path_factory.mktemp("upd") / "run"),
        max_depth=2, wave_size=24, host_budget=8, n_shards=4,
        shard_capacity=1 << 13, max_epochs=3, fetch_batch_size=32,
    )
    summary = CrawlEngine(cfg).run(seeds=seeds_table(cfg.web, 20))
    return cfg, summary


def test_recrawl_unchanged_when_web_identical(crawl_results):
    from crawlerframework_ray.pipelines.update import recrawl_changes

    cfg, _ = crawl_results
    df = recrawl_changes(f"{cfg.workdir}/results", cfg.web, salt=0).to_pandas()
    assert len(df) > 0
    assert not df["changed"].any()  # same web ⇒ skip everything (D4 skip path)


def test_recrawl_detects_drift_with_salt(crawl_results):
    from crawlerframework_ray.pipelines.update import recrawl_changes

    cfg, _ = crawl_results
    df = recrawl_changes(f"{cfg.workdir}/results", cfg.web, salt=0xBEEF).to_pandas()
    assert df["changed"].all()  # new seed ⇒ every page's content differs


def test_mark_latest_versioning(crawl_results):
    from crawlerframework_ray.pipelines.update import mark_latest

    cfg, summary = crawl_results
    df = mark_latest(f"{cfg.workdir}/results").to_pandas()
    assert len(df) == summary.fetched_urls
    per_key = df.groupby(["url", "priority"])["is_latest"].sum()
    assert (per_key == 1).all()  # exactly one latest row per task identity
    # a url fetched in only one epoch is its own latest
    assert df[df["is_latest"]]["epoch"].ge(0).all()


def test_cli_crawl_and_resume(tmp_path):
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)
    workdir = str(tmp_path / "cli")
    base = [
        sys.executable, "-m", "crawlerframework_ray", "crawl",
        "--workdir", workdir, "--seeds", "12", "--wave", "16",
        "--hosts", "6", "--path-space", "64", "--shards", "2",
        "--num-cpus", "4", "--verify-rows",
    ]
    out1 = subprocess.run(base + ["--epochs", "1"], env=env, cwd="/root/repo",
                          capture_output=True, text=True, timeout=240)
    assert out1.returncode == 0, out1.stderr[-2000:]
    r1 = json.loads(out1.stdout.strip().splitlines()[-1])
    assert r1["epochs"] == 1 and r1["fetched_urls"] > 0

    out2 = subprocess.run(base + ["--epochs", "2", "--resume"], env=env, cwd="/root/repo",
                          capture_output=True, text=True, timeout=240)
    assert out2.returncode == 0, out2.stderr[-2000:]
    r2 = json.loads(out2.stdout.strip().splitlines()[-1])
    assert r2["epochs"] == 2
    assert r2["fetched_urls"] > r1["fetched_urls"]
