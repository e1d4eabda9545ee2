"""crawlerframework_ray — a from-scratch Ray-Data-native crawl/data engine.

Re-expresses the query and data-processing capabilities of
jsyadav/CrawlerFramework (see SURVEY.md) as idiomatic Ray Data:
``ray.data.Dataset`` pipelines of ``map_batches`` over zero-copy Arrow
batches, actor pools for stateful stages (fetchers, URL-seen cuckoo
shards), and groupby/sort/repartition shuffles for the wide steps.

Subpackages
-----------
- ``data``      — Arrow schemas, numpy image codecs, phash/PSNR kernels,
                  deterministic synthetic web generator (the fetch oracle).
- ``functions`` — pure scalar/batch functions: URL normalization, keyword
                  boolean filter DSL, text statistics, hashing.
- ``state``     — cuckoo filter, sharded URL-seen actor pool, checkpoints.
- ``stages``    — map_batches stage callables (fetch, expand, dedup, ANN,
                  multimodal).
- ``sources``   — table layer (parquet now, lance when available), seeds.
- ``pipelines`` — the crawl epoch loop, the single-process reference
                  oracle, and the query catalog driving the duckdb gate.

Nothing in this package calls ``ray.init``/``ray.shutdown``; sessions are
owned by the driver, ``bench.py`` and the test fixture.
"""

__version__ = "0.1.0"
