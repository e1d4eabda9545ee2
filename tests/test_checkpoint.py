"""Kill-and-resume must be bit-identical (SURVEY.md §7.1 M4).

A run stopped after 2 epochs and resumed to 4 must produce exactly the
state of an uninterrupted 4-epoch run: same shard digests, same seen
membership, same results rows, same final frontier.
"""

from __future__ import annotations

import pandas as pd
import pytest

from crawlerframework_ray.config import CrawlConfig
from crawlerframework_ray.data.synth import SynthWebConfig, seeds_table
from crawlerframework_ray.pipelines.crawl import CrawlEngine
from crawlerframework_ray.state import checkpoint as ckpt


def _cfg(workdir: str, max_epochs: int) -> CrawlConfig:
    return CrawlConfig(
        web=SynthWebConfig(seed=23, n_hosts=6, path_space=64, max_outlinks=4),
        workdir=workdir,
        max_depth=2,
        wave_size=24,
        host_budget=8,
        n_shards=4,
        shard_capacity=1 << 13,
        max_epochs=max_epochs,
        fetch_concurrency=2,
        fetch_batch_size=32,
        record_trace=True,
    )


def _results_df(workdir: str) -> pd.DataFrame:
    import ray.data

    df = ray.data.read_parquet(f"{workdir}/results").to_pandas()
    df["bytes"] = df["bytes"].map(bytes)
    df["content_hash"] = df["content_hash"].map(bytes)
    return df.sort_values(["epoch", "url", "priority"]).reset_index(drop=True)[
        ["epoch", "url", "priority", "depth", "caption", "phash", "content_hash", "bytes"]
    ]


def test_resume_bit_identical(ray_session, tmp_path):
    seeds_cfg = _cfg(str(tmp_path / "x"), 4)
    seeds = seeds_table(seeds_cfg.web, 20)

    full = CrawlEngine(_cfg(str(tmp_path / "full"), 4)).run(seeds=seeds)

    half_dir = str(tmp_path / "half")
    half = CrawlEngine(_cfg(half_dir, 2)).run(seeds=seeds)
    assert half.epochs == 2
    assert ckpt.latest_epoch(half_dir) == 1

    resumed = CrawlEngine(_cfg(half_dir, 4)).run(resume=True)

    assert resumed.shard_digests == full.shard_digests
    assert resumed.fetched_urls == full.fetched_urls
    assert resumed.fresh_urls == full.fresh_urls
    assert resumed.raw_outlinks == full.raw_outlinks
    assert resumed.final_frontier == full.final_frontier
    # resumed trace covers epochs 2..3 — must equal the full run's tail
    tail = [t for t in full.trace if t[0] >= 2]
    assert resumed.trace == tail

    pd.testing.assert_frame_equal(_results_df(half_dir), _results_df(str(tmp_path / "full")))

    # seen membership identical
    fa = ckpt.load_shards(str(tmp_path / "full"), 3, 4)
    ha = ckpt.load_shards(half_dir, 3, 4)
    assert [sorted(a) for _, a, _ in fa] == [sorted(a) for _, a, _ in ha]


def test_resume_rejects_changed_semantics(ray_session, tmp_path):
    d = str(tmp_path / "c")
    cfg = _cfg(d, 2)
    CrawlEngine(cfg).run(seeds=seeds_table(cfg.web, 10))
    bad = _cfg(d, 4)
    bad.host_budget = 99
    with pytest.raises(ValueError, match="different semantics"):
        CrawlEngine(bad).run(resume=True)


def test_resume_without_checkpoint_needs_seeds(ray_session, tmp_path):
    cfg = _cfg(str(tmp_path / "none"), 2)
    with pytest.raises(ValueError, match="seeds required"):
        CrawlEngine(cfg).run(resume=True)


def test_replay_detects_corrupted_delta(ray_session, tmp_path):
    """load_shards verifies the replayed filters against the manifest's
    shard digests — a truncated delta file must raise, not resume into
    divergent dedup state."""
    import os
    import struct

    d = str(tmp_path / "c")
    cfg = _cfg(d, 2)
    CrawlEngine(cfg).run(seeds=seeds_table(cfg.web, 20))
    # drop the last id from one shard's epoch-1 delta (keep the framing
    # valid: rewrite the entry count)
    path = os.path.join(ckpt.epoch_dir(d, 1), "deltas", "shard_00.bin")
    with open(path, "rb") as f:
        data = f.read()
    (n_entries,) = struct.unpack_from("<I", data, 0)
    off = 4
    entries = []
    for _ in range(n_entries):
        seal_epoch, n_ids = struct.unpack_from("<iI", data, off)
        off += 8
        ids = [data[off + 16 * i: off + 16 * (i + 1)] for i in range(n_ids)]
        off += 16 * n_ids
        entries.append((seal_epoch, ids))
    assert any(ids for _, ids in entries), "fixture must have ids to corrupt"
    for i, (se, ids) in enumerate(entries):
        if ids:
            entries[i] = (se, ids[:-1])
            break
    out = [struct.pack("<I", len(entries))]
    for se, ids in entries:
        out.append(struct.pack("<iI", se, len(ids)))
        out.extend(ids)
    with open(path, "wb") as f:
        f.write(b"".join(out))
    with pytest.raises(ValueError, match="replay mismatch"):
        ckpt.load_shards(d, 1, 4)


def test_gc_checkpoints_resume_bit_identical(ray_session, tmp_path):
    """Checkpoint GC (base snapshot at the retention floor + old epoch
    dirs deleted): resume AFTER gc must be bit-identical to the
    uninterrupted run, load_shards through the base must reproduce the
    exact manifest digests, and the crawl OUTPUT (results/) must be
    untouched."""
    import os

    from crawlerframework_ray.state.checkpoint import gc_checkpoints

    seeds = seeds_table(_cfg(str(tmp_path / "x"), 4).web, 20)
    full = CrawlEngine(_cfg(str(tmp_path / "full"), 4)).run(seeds=seeds)

    half_dir = str(tmp_path / "half")
    CrawlEngine(_cfg(half_dir, 2)).run(seeds=seeds)
    pre = ckpt.load_shards(half_dir, 1, 4)

    out = gc_checkpoints(half_dir, keep_last=1)
    assert out["floor"] == 1 and out["removed_epochs"] == 1
    assert not os.path.isdir(ckpt.epoch_dir(half_dir, 0))
    assert os.path.isdir(os.path.join(half_dir, "results", "epoch=0000"))  # output kept

    # replay through the base == replay through the full chain
    post = ckpt.load_shards(half_dir, 1, 4)
    assert [(b, a, e) for b, a, e in post] == [(b, a, e) for b, a, e in pre]

    resumed = CrawlEngine(_cfg(half_dir, 4)).run(resume=True)
    assert resumed.shard_digests == full.shard_digests
    assert resumed.fetched_urls == full.fetched_urls
    assert resumed.final_frontier == full.final_frontier
    tail = [t for t in full.trace if t[0] >= 2]
    assert resumed.trace == tail

    # gc is idempotent and re-runnable after more epochs
    out2 = gc_checkpoints(half_dir, keep_last=1)
    assert out2["floor"] == 3 and out2["removed_epochs"] == 2
    post2 = ckpt.load_shards(half_dir, 3, 4)
    fa = ckpt.load_shards(str(tmp_path / "full"), 3, 4)
    assert [sorted(a) for _, a, _ in post2] == [sorted(a) for _, a, _ in fa]
