"""In-flight worker-crash recovery.

The checkpoint tests prove a KILLED RUN resumes bit-identically; this
gate proves the complementary claim — a worker that dies MID-EPOCH,
after its content-addressed part already landed (stages/fetch.py
``fetch_write_task_fn``), is retried by Ray and the retry OVERWRITES
its own part instead of duplicating rows. A disturbed run must equal an
undisturbed run in trace, counters, digests and the full written
results set (the reference had no such property: a crashed connector
process re-crawled on the next schedule and appended duplicate posts).
"""

from __future__ import annotations

import os

import pandas as pd
import pytest

from crawlerframework_ray.config import CrawlConfig
from crawlerframework_ray.data.synth import SynthWebConfig, seeds_table
from crawlerframework_ray.pipelines import crawl as crawl_mod


def _cfg(tmp_path, name: str) -> CrawlConfig:
    return CrawlConfig(
        web=SynthWebConfig(seed=11, n_hosts=8, path_space=96, max_outlinks=5),
        workdir=str(tmp_path / name),
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


def _results(workdir: str) -> pd.DataFrame:
    import ray.data

    df = ray.data.read_parquet(f"{workdir}/results").to_pandas()
    df["content_hash"] = df["content_hash"].map(bytes)
    df["bytes"] = df["bytes"].map(bytes)
    return df.sort_values(["url", "priority", "epoch"]).reset_index(drop=True)


def test_fetch_worker_crash_retry_is_idempotent(ray_session, tmp_path, monkeypatch):
    marker = str(tmp_path / "fault-fired")
    real_factory = crawl_mod.fetch_write_task_fn

    def faulty_factory(*args, **kw):
        inner = real_factory(*args, **kw)

        def fn(batch):
            out = inner(batch)
            # die exactly once, AFTER the part file landed — the worst
            # case for duplication: the retry re-fetches the same batch
            # and re-writes the same part name
            if not os.path.exists(marker):
                with open(marker, "w"):
                    pass
                os._exit(1)
            return out

        return fn

    seeds_n = 40
    cfg_clean = _cfg(tmp_path, "clean")
    clean = crawl_mod.CrawlEngine(cfg_clean).run(seeds=seeds_table(cfg_clean.web, seeds_n))

    monkeypatch.setattr(crawl_mod, "fetch_write_task_fn", faulty_factory)
    cfg_fault = _cfg(tmp_path, "fault")
    fault = crawl_mod.CrawlEngine(cfg_fault).run(seeds=seeds_table(cfg_fault.web, seeds_n))

    assert os.path.exists(marker), "fault never fired — test exercised nothing"

    assert fault.trace == clean.trace
    assert fault.fetched_urls == clean.fetched_urls
    assert fault.raw_outlinks == clean.raw_outlinks
    assert fault.fresh_urls == clean.fresh_urls
    assert fault.final_frontier == clean.final_frontier
    assert fault.shard_digests == clean.shard_digests

    a, b = _results(cfg_clean.workdir), _results(cfg_fault.workdir)
    assert len(a) == len(b)
    pd.testing.assert_frame_equal(
        a.drop(columns=["epoch"]).reset_index(drop=True),
        b.drop(columns=["epoch"]).reset_index(drop=True),
    )
    # epochs too: the crash must not shift work across epochs
    assert a["epoch"].tolist() == b["epoch"].tolist()
