"""End-to-end composition: crawl → alignment filter → phash dedup →
partitioned export, verified against a serial mirror.

This is the full media-ingest story in one run — the crawl engine's
results parquet (image+caption payload rows, the input_hint schema)
feeds the SAME catalog stages (AlignmentScoreStage, bucketed grouped
dedup) and lands in a hive-partitioned sink, and the distributed
output must equal a serial recomputation over the identical results
files row for row. Gates that the engine's output schema and the
corpus-prep stages actually compose, not just pass their own tests.
"""

from __future__ import annotations

import glob
import hashlib
import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _crawl_workdir():
    from crawlerframework_ray.config import CrawlConfig
    from crawlerframework_ray.data.synth import SynthWebConfig, seeds_table
    from crawlerframework_ray.pipelines.crawl import CrawlEngine

    cfg = CrawlConfig(
        web=SynthWebConfig(seed=42, n_hosts=8, path_space=128, max_outlinks=4),
        workdir=tempfile.mkdtemp(prefix="cfray-e2e-"),
        max_depth=2, wave_size=64, host_budget=16, n_shards=4,
        shard_capacity=1 << 14, max_epochs=2, fetch_batch_size=64,
    )
    CrawlEngine(cfg).run(seeds=seeds_table(cfg.web, 32))
    return cfg


ALIGN_TAU = 28  # keep rows whose two-tower score is at least this


def _serial_mirror(results_dir: str) -> pd.DataFrame:
    """Independent serial recomputation: decode every fetched payload,
    score, filter, keep min-image_id per phash, count per host."""
    from crawlerframework_ray.data import codecs
    from crawlerframework_ray.data.imageops import average_hash

    rows = []
    for part in sorted(glob.glob(f"{results_dir}/**/*.parquet", recursive=True)):
        t = pq.read_table(part, columns=["host", "image_id", "bytes", "fmt", "caption"])
        for h, i, b, f, c in zip(*[t.column(n).to_pylist() for n in
                                   ["host", "image_id", "bytes", "fmt", "caption"]]):
            ph = average_hash(codecs.decode(bytes(b), f))
            cap64 = int.from_bytes(hashlib.md5(c.encode("utf-8")).digest()[:8], "big")
            score = 64 - bin((ph & 0xFFFFFFFFFFFFFFFF) ^ cap64).count("1")
            if score >= ALIGN_TAU:
                rows.append((h, i, ph))
    df = pd.DataFrame(rows, columns=["host", "image_id", "phash"])
    # keep-first = min image_id per phash (deterministic, order-free)
    keep = df.sort_values("image_id", kind="mergesort").groupby("phash", as_index=False).first()
    return (
        keep.groupby("host", as_index=False)
        .agg(n_kept=("image_id", "size"))
        .astype({"n_kept": "int64"})
        .sort_values("host")
        .reset_index(drop=True)
    )


@pytest.mark.usefixtures("ray_session")
def test_crawl_to_corpus_export_matches_serial_mirror():
    import ray.data

    from crawlerframework_ray.stages.agg import bucketed_group_agg
    from crawlerframework_ray.stages.multimodal import AlignmentScoreStage

    cfg = _crawl_workdir()
    results_dir = f"{cfg.workdir}/results"

    # host must ride along through the alignment stage: attach it to
    # image_id (stage passes image_id through untouched)
    ds = ray.data.read_parquet(
        results_dir, columns=["host", "image_id", "bytes", "fmt", "caption"]
    )

    def tag(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        tagged = pc.binary_join_element_wise(t["host"], t["image_id"], "|")
        return t.drop_columns(["host", "image_id"]).append_column("image_id", tagged)

    scored = ds.map_batches(tag, batch_format="pyarrow").map_batches(
        AlignmentScoreStage, batch_format="pyarrow", batch_size=128,
        concurrency=2, num_cpus=0.5,
    )

    def flt(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(pc.greater_equal(t["align_score"], ALIGN_TAU))
        host = pc.list_element(pc.split_pattern(t["image_id"], "|"), 0)
        img = pc.list_element(pc.split_pattern(t["image_id"], "|"), 1)
        return pa.table({"host": host, "image_id": img, "phash": t["phash"]})

    kept = bucketed_group_agg(
        scored.map_batches(flt, batch_format="pyarrow"),
        ["phash"],
        lambda g: g.sort_values("image_id", kind="mergesort")
        .groupby("phash", as_index=False)
        .first(),
    )

    out_dir = tempfile.mkdtemp(prefix="cfray-e2e-out-")
    kept.write_parquet(out_dir, partition_cols=["host"])

    back = ray.data.read_parquet(out_dir).to_pandas()
    got = (
        back.groupby("host", as_index=False)
        .agg(n_kept=("image_id", "size"))
        .astype({"n_kept": "int64"})
        .sort_values("host")
        .reset_index(drop=True)
    )
    # partition_cols round-trips host as a hive partition (categorical)
    got["host"] = got["host"].astype(str)

    exp = _serial_mirror(results_dir)
    pd.testing.assert_frame_equal(got, exp)
    assert exp["n_kept"].sum() > 0  # the filter keeps a real corpus
    # every host directory is a separate resumable partition
    hosts = {os.path.basename(p).split("=", 1)[1] for p in glob.glob(f"{out_dir}/host=*")}
    assert hosts == set(exp["host"])
