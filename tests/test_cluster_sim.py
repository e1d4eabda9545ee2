"""Multi-node proof on a simulated Ray cluster (VERDICT r4 order #1).

``ray.cluster_utils.Cluster`` stands in for the north_rule's
fixed-size multi-node cluster: 4 virtual nodes (separate raylets and
object stores) with distinct resources, two advertising the
token-class node labels. The full CrawlEngine runs there in a
subprocess (so the virtual cluster cannot collide with the suite's
session-scoped local Ray), and this module gates:

- crawl TRACE bit-identity vs the serial single-process oracle — the
  same oracle the single-node gates (tests/test_crawl.py) compare
  against, so single-node == multi-node transitively;
- URL-seen cuckoo shard DIGEST equality (canonical state);
- counters (fetched / raw outlinks / fresh / final frontier);
- the SeenShard + FrontierBucket state actors actually SPREAD across
  the virtual nodes (scheduling_strategy="SPREAD" — num_cpus=0 state
  would otherwise pack one node's RAM);
- the T3 node-label affinity path places each TokenWorker on a node
  that advertises its token class's custom resource
  (state/affinity.py; reference analogue crawler/taskmaster.py:130-155
  serving remote crawlnodes, crawler/crawlnode.py:102-138).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_JOB = os.path.join(_REPO, "tests", "cluster_sim_job.py")


@pytest.fixture(scope="module")
def sim(tmp_path_factory):
    out = tmp_path_factory.mktemp("sim") / "result.json"
    env = dict(os.environ)
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    # the virtual cluster must not adopt the suite's RAY_ADDRESS=local
    env.pop("RAY_ADDRESS", None)
    proc = subprocess.run(
        [sys.executable, _JOB, str(out)],
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, (
        f"cluster sim job failed\nstdout:\n{proc.stdout[-4000:]}"
        f"\nstderr:\n{proc.stderr[-4000:]}"
    )
    return json.loads(out.read_text())


@pytest.fixture(scope="module")
def sim_resumed(tmp_path_factory):
    """The killed-job clause: 2 epochs on one virtual cluster, then a
    FRESH virtual cluster resumes the checkpoint to the full 4."""
    root = tmp_path_factory.mktemp("simres")
    workdir = str(root / "work")
    env = dict(os.environ)
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("RAY_ADDRESS", None)
    outs = {}
    for mode in ("half", "resume"):
        out = root / f"{mode}.json"
        proc = subprocess.run(
            [sys.executable, _JOB, str(out), mode, workdir],
            env=env,
            capture_output=True,
            text=True,
            timeout=900,
        )
        assert proc.returncode == 0, (
            f"{mode} job failed\nstdout:\n{proc.stdout[-4000:]}"
            f"\nstderr:\n{proc.stderr[-4000:]}"
        )
        outs[mode] = json.loads(out.read_text())
    return outs


@pytest.fixture(scope="module")
def sim_rf(tmp_path_factory):
    """robots+failures engine config (the entry() shape) on the
    virtual cluster."""
    out = tmp_path_factory.mktemp("simrf") / "result.json"
    env = dict(os.environ)
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("RAY_ADDRESS", None)
    proc = subprocess.run(
        [sys.executable, _JOB, str(out), "rf"],
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, (
        f"rf job failed\nstdout:\n{proc.stdout[-4000:]}"
        f"\nstderr:\n{proc.stderr[-4000:]}"
    )
    return json.loads(out.read_text())


@pytest.fixture(scope="module")
def oracle():
    """Serial single-process oracle over the job's exact config —
    ray-free, computed in this process."""
    import tempfile

    from crawlerframework_ray.config import CrawlConfig
    from crawlerframework_ray.data.synth import SynthWebConfig, seeds_table
    from crawlerframework_ray.pipelines.oracle import oracle_crawl

    cfg = CrawlConfig(
        web=SynthWebConfig(seed=11, n_hosts=8, path_space=96, max_outlinks=5),
        workdir=tempfile.mkdtemp(prefix="cfray-sim-oracle-"),
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
    return oracle_crawl(cfg, seeds_table(cfg.web, 40).to_pylist())


def test_four_nodes_up(sim):
    assert sim["n_alive_nodes"] == 4


def test_trace_bit_identical_across_cluster(sim, oracle):
    got = [tuple(t) for t in sim["trace"]]
    assert got, "cluster engine produced no trace"
    assert got == oracle["trace"]


def test_shard_digests_match(sim, oracle):
    assert sim["shard_digests"] == oracle["shard_digests"]


def test_counters_match(sim, oracle):
    c = sim["counters"]
    assert c["fetched_urls"] == oracle["counters"]["fetched_urls"]
    assert c["raw_outlinks"] == oracle["counters"]["raw_outlinks"]
    assert c["fresh_urls"] == oracle["counters"]["fresh_urls"]
    assert c["final_frontier"] == oracle["final_frontier"]


def test_killed_job_resumes_bit_identical_on_fresh_cluster(sim_resumed, oracle):
    half, resumed = sim_resumed["half"], sim_resumed["resume"]
    assert half["counters"]["fetched_urls"] > 0
    # resumed cumulative state == the uninterrupted oracle run
    assert resumed["shard_digests"] == oracle["shard_digests"]
    assert resumed["counters"]["fetched_urls"] == oracle["counters"]["fetched_urls"]
    assert resumed["counters"]["fresh_urls"] == oracle["counters"]["fresh_urls"]
    assert resumed["counters"]["final_frontier"] == oracle["final_frontier"]
    # the resumed trace is the full run's tail (epochs 2..3)
    tail = [t for t in oracle["trace"] if t[0] >= 2]
    assert [tuple(t) for t in resumed["trace"]] == tail


def test_robots_failures_config_bit_identical_on_cluster(sim_rf):
    """The full production shape — RFC 9309 robots admission,
    deterministic 4xx/5xx failure model, transient retry requeued past
    the seen gate — replays bit-identically on the 4-node cluster vs
    the serial oracle, with both failure classes actually occurring."""
    import tempfile

    from crawlerframework_ray.config import CrawlConfig
    from crawlerframework_ray.data.synth import SynthWebConfig, seeds_table
    from crawlerframework_ray.pipelines.oracle import oracle_crawl

    cfg = CrawlConfig(
        web=SynthWebConfig(seed=13, n_hosts=8, path_space=96, max_outlinks=5),
        workdir=tempfile.mkdtemp(prefix="cfray-sim-rf-oracle-"),
        max_depth=2,
        wave_size=48,
        host_budget=12,
        n_shards=4,
        shard_capacity=1 << 14,
        max_epochs=5,
        fetch_concurrency=2,
        fetch_batch_size=64,
        record_trace=True,
        robots=True,
        failures=True,
    )
    oracle = oracle_crawl(cfg, seeds_table(cfg.web, 40).to_pylist())
    got = [tuple(t) for t in sim_rf["trace"]]
    assert got == oracle["trace"]
    assert sim_rf["shard_digests"] == oracle["shard_digests"]
    c = sim_rf["counters"]
    assert c["fetched_urls"] == oracle["counters"]["fetched_urls"]
    assert c["failed_transient_urls"] == oracle["counters"]["failed_transient"]
    assert c["failed_permanent_urls"] == oracle["counters"]["failed_permanent"]
    assert c["failed_transient_urls"] > 0
    assert c["failed_permanent_urls"] > 0


def test_state_actors_spread_across_nodes(sim):
    shard_nodes = {n for n in sim["actor_nodes"].get("SeenShard", []) if n}
    bucket_nodes = {n for n in sim["actor_nodes"].get("FrontierBucket", []) if n}
    # 4 shards / ≥8 buckets over 4 nodes: SPREAD must use several nodes
    assert len(shard_nodes) >= 2, f"seen shards packed: {shard_nodes}"
    assert len(bucket_nodes) >= 3, f"frontier buckets packed: {bucket_nodes}"
    assert len(shard_nodes | bucket_nodes) >= 3


def test_token_affinity_schedules_onto_labeled_nodes(sim):
    placed = sim["token_worker_nodes"]
    assert set(placed) == {"0", "1"}
    for t, node in placed.items():
        allowed = sim["label_nodes"][t]
        assert node in allowed, (
            f"token worker {t} on node {node}, but class label advertised "
            f"only on {allowed}"
        )
    # the two classes live on two DIFFERENT remote nodes in this topology
    assert placed["0"] != placed["1"]
