"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in crawlerframework_ray) calls ``ray.init``/``ray.shutdown``.
"""

from __future__ import annotations

import tempfile
from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline: the Ray-Data crawl engine over the
    deterministic synthetic web (BASELINE.json north_rule), seeded at
    smoke scale; sf0.001 documents set the corpus-derived seed count.
    Returns the fetched-results Dataset (payload follows input_hint)."""
    import ray.data

    from crawlerframework_ray.config import CrawlConfig
    from crawlerframework_ray.data.synth import SynthWebConfig, seeds_table
    from crawlerframework_ray.pipelines.crawl import CrawlEngine

    docs = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id"]
    )
    n_seeds = min(64, max(16, docs.count() // 16))

    cfg = CrawlConfig(
        web=SynthWebConfig(seed=42, n_hosts=8, path_space=128, max_outlinks=5),
        workdir=tempfile.mkdtemp(prefix="cfray-entry-"),
        max_depth=2,
        wave_size=64,
        host_budget=16,
        n_shards=4,
        shard_capacity=1 << 14,
        max_epochs=3,
        fetch_concurrency=2,
        fetch_batch_size=64,
        robots=True,  # RFC 9309 admission gate + crawl-delay budgets ON
        failures=True,  # deterministic 4xx/5xx model + retry requeue ON
    )
    summary = CrawlEngine(cfg).run(seeds=seeds_table(cfg.web, n_seeds))
    assert summary.fetched_urls > 0
    return ray.data.read_parquet(f"{cfg.workdir}/results")


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from crawlerframework_ray.pipelines import queries as q

    return q.QUERIES


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each SQL-expressible query."""
    from crawlerframework_ray.pipelines import queries as q

    return q.ORACLE_SQL
