"""Multi-node simulation job: run the full CrawlEngine on a virtual
Ray cluster (``ray.cluster_utils.Cluster`` — several raylets, separate
object stores, one machine) and dump everything the gate needs as JSON.

Run as a SUBPROCESS of tests/test_cluster_sim.py so the virtual
cluster can never collide with the session-scoped local Ray instance
the rest of the suite shares. The cluster is the north_rule's
``ray job submit``-on-N-nodes shape at test scale: 4 nodes with
distinct resources, two of which advertise the token-class node
labels the T3 affinity path (state/affinity.py) schedules onto
(reference analogue: TaskMaster serving remote crawlnodes,
crawler/taskmaster.py:130-155, crawler/crawlnode.py:102-138).

Usage: python tests/cluster_sim_job.py OUT_JSON [MODE [WORKDIR]]

MODE (default ``full``): ``full`` = 4 epochs from seeds; ``half`` = 2
epochs from seeds into WORKDIR (the job that gets "killed"); ``resume``
= resume WORKDIR's checkpoint to 4 epochs in a FRESH virtual cluster —
the north_rule's killed-``ray job submit``-resumes-bit-identically
clause, at test scale; ``rf`` = the robots+failures engine config
(RFC 9309 admission + deterministic 4xx/5xx with retry requeue — the
``entry()`` shape) on the virtual cluster, 5 epochs.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time


def main(out_path: str, mode: str = "full", workdir: str | None = None) -> None:
    from ray.cluster_utils import Cluster

    cluster = Cluster()
    # head: driver-only shape (the job-submission node)
    cluster.add_node(num_cpus=2, resources={"head_node": 1})
    # two worker nodes advertising one token-class node label each —
    # the `ray start --resources` form of session/quota locality
    cluster.add_node(num_cpus=4, resources={"token_class_0": 4})
    cluster.add_node(num_cpus=4, resources={"token_class_1": 4})
    # one plain compute node
    cluster.add_node(num_cpus=4)

    import ray

    ray.init(address=cluster.address, include_dashboard=False,
             logging_level="ERROR")
    deadline = time.monotonic() + 60
    while len([n for n in ray.nodes() if n["Alive"]]) < 4:
        if time.monotonic() > deadline:
            raise TimeoutError("virtual cluster nodes did not come up")
        time.sleep(0.5)

    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from crawlerframework_ray.config import CrawlConfig
    from crawlerframework_ray.data.synth import SynthWebConfig, seeds_table
    from crawlerframework_ray.pipelines.crawl import CrawlEngine

    # EXACTLY tests/test_crawl._cfg's geometry: the single-node
    # engine-vs-oracle gates run this config, so trace/digest equality
    # here proves single-node == 4-virtual-node bit-identity
    if mode == "rf":
        # tests/test_failures._cfg's geometry: robots admission +
        # deterministic failure model + retry requeue, on the cluster
        cfg = CrawlConfig(
            web=SynthWebConfig(seed=13, n_hosts=8, path_space=96, max_outlinks=5),
            workdir=workdir or tempfile.mkdtemp(prefix="cfray-sim-rf-"),
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
    else:
        cfg = CrawlConfig(
            web=SynthWebConfig(seed=11, n_hosts=8, path_space=96, max_outlinks=5),
            workdir=workdir or tempfile.mkdtemp(prefix="cfray-sim-"),
            max_depth=2,
            wave_size=48,
            host_budget=12,
            n_shards=4,
            shard_capacity=1 << 14,
            max_epochs=2 if mode == "half" else 4,
            fetch_concurrency=2,
            fetch_batch_size=64,
            record_trace=True,
        )
    if mode == "resume":
        summary = CrawlEngine(cfg).run(resume=True)
    else:
        summary = CrawlEngine(cfg).run(seeds=seeds_table(cfg.web, 40))

    # where did the state actors land? (GCS-backed actor table — the
    # dashboard API server is off in this sandbox)
    def live_actors() -> list[dict]:
        return [
            a for a in ray._private.state.actors().values()
            if a.get("State") == "ALIVE"
        ]

    actor_nodes: dict[str, list[str]] = {}
    for a in live_actors():
        cls = a.get("ActorClassName", "")
        if cls in ("SeenShard", "FrontierBucket", "TokenWorker"):
            actor_nodes.setdefault(cls, []).append(
                a.get("Address", {}).get("NodeID", "")
            )

    # node-label affinity: spawn the token workers WITH resource
    # pinning and record which node each landed on vs which nodes
    # advertise its class label
    from crawlerframework_ray.state.affinity import make_token_workers

    names, handles = make_token_workers(2, "simjob", use_resources=True)
    label_nodes = {
        t: sorted(
            n["NodeID"] for n in ray.nodes()
            if n["Alive"] and f"token_class_{t}" in n["Resources"]
        )
        for t in range(2)
    }
    token_worker_nodes: dict[str, str] = {}
    for a in live_actors():
        name = a.get("Name", "")
        if a.get("ActorClassName") == "TokenWorker" and name.startswith(
            "cfray-token-simjob-"
        ):
            token_worker_nodes[name.rsplit("-", 1)[1]] = (
                a.get("Address", {}).get("NodeID", "")
            )

    out = {
        "n_alive_nodes": len([n for n in ray.nodes() if n["Alive"]]),
        "trace": [list(t) for t in summary.trace],
        "shard_digests": list(summary.shard_digests),
        "counters": {
            "fetched_urls": summary.fetched_urls,
            "raw_outlinks": summary.raw_outlinks,
            "fresh_urls": summary.fresh_urls,
            "final_frontier": summary.final_frontier,
            "failed_transient_urls": summary.failed_transient_urls,
            "failed_permanent_urls": summary.failed_permanent_urls,
        },
        "actor_nodes": actor_nodes,
        "label_nodes": {str(k): v for k, v in label_nodes.items()},
        "token_worker_nodes": token_worker_nodes,
    }
    with open(out_path, "w") as f:
        json.dump(out, f)
    ray.shutdown()
    cluster.shutdown()


if __name__ == "__main__":
    main(sys.argv[1], *(sys.argv[2:4]))
