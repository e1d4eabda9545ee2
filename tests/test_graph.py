"""Partition-independence gates for the exact-integer iterative ops.

The pagerank_hosts / kmeans_cluster_embeddings docstrings claim the
fixed-point arithmetic makes results bit-identical regardless of
partitioning; these tests run the same input at 1 block and at 8
blocks and assert full equality (float variants would fail this)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _pagerank(blocks: int) -> pd.DataFrame:
    import ray.data

    from crawlerframework_ray.stages.graph import (
        distinct_edges,
        host_edges,
        pagerank_int,
    )

    ds = ray.data.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id"], override_num_blocks=blocks
    )
    return (
        pagerank_int(distinct_edges(host_edges(ds, n_hosts=64)), iters=4)
        .sort_values("host")
        .reset_index(drop=True)
    )


def test_pagerank_partition_independent(ray_session):
    a = _pagerank(1)
    b = _pagerank(8)
    assert a.equals(b)
    # ranks genuinely differentiate hosts (not a constant vector)
    assert a["rank"].nunique() > 16


def _kmeans(blocks: int) -> pd.DataFrame:
    import ray.data

    from crawlerframework_ray.stages.similarity import kmeans_cluster_int

    ds = ray.data.read_parquet(
        f"{SF}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        override_num_blocks=blocks,
    )
    return (
        kmeans_cluster_int(ds, n_clusters=8, iters=2)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )


def test_kmeans_partition_independent(ray_session):
    a = _kmeans(1)
    b = _kmeans(8)
    assert a.equals(b)
    assert a["cluster"].nunique() == 8


def test_kmeans_assign_ties_to_smallest():
    from crawlerframework_ray.stages.similarity import kmeans_assign_int

    x = np.array([[0, 0]], dtype=np.int64)
    cents = np.array([[1, 0], [-1, 0], [0, 1]], dtype=np.int64)  # all dist 1
    assert kmeans_assign_int(x, cents)[0] == 0


def _components(blocks: int) -> pd.DataFrame:
    import ray.data

    from crawlerframework_ray.stages.graph import (
        block_host_edges,
        min_label_components,
        undirected_closure,
    )

    ds = ray.data.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id"], override_num_blocks=blocks
    )
    return (
        min_label_components(undirected_closure(block_host_edges(ds, n_hosts=64, block=8)))
        .sort_values("host")
        .reset_index(drop=True)
    )


def test_components_partition_independent(ray_session):
    a = _components(1)
    b = _components(8)
    assert a.equals(b)
    # the block construction must yield >1 component (non-trivial fixpoint)
    assert a["component"].nunique() > 1
    # component id is the min host id of the component — every member >= it
    assert (a["host"] >= a["component"]).all()


def _hops(blocks: int) -> pd.DataFrame:
    import ray.data

    from crawlerframework_ray.stages.graph import (
        bfs_hops_int,
        block_host_edges,
        undirected_closure,
    )

    ds = ray.data.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id"], override_num_blocks=blocks
    )
    edges = undirected_closure(block_host_edges(ds, n_hosts=64, block=8))
    return (
        bfs_hops_int(edges, seeds=np.array([0, 1, 2], dtype=np.int64), iters=6)
        .sort_values("host")
        .reset_index(drop=True)
    )


def test_bfs_partition_independent(ray_session):
    a = _hops(1)
    b = _hops(8)
    assert a.equals(b)
    # seeds are at distance 0; hosts outside the seed block unreached
    assert (a.set_index("host").loc[[0, 1, 2], "hops"] == 0).all()
    assert (a[a["host"] >= 8]["hops"] == -1).all()
    assert (a["hops"] > 0).any()  # and some non-seed host IS reached


def _hits(blocks: int) -> pd.DataFrame:
    import ray.data

    from crawlerframework_ray.stages.graph import distinct_edges, hits_int, host_edges

    ds = ray.data.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id"], override_num_blocks=blocks
    )
    return (
        hits_int(distinct_edges(host_edges(ds, n_hosts=64)), iters=3)
        .sort_values("host")
        .reset_index(drop=True)
    )


def test_hits_partition_independent(ray_session):
    a = _hits(1)
    b = _hits(8)
    assert a.equals(b)
    assert a["hub"].nunique() > 16 and a["authority"].nunique() > 16


def _kcore(blocks: int) -> pd.DataFrame:
    import ray.data

    from crawlerframework_ray.stages.graph import (
        distinct_edges,
        kcore_int,
        tiered_host_edges,
        undirected_closure,
    )

    ds = ray.data.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id"], override_num_blocks=blocks
    )
    edges = distinct_edges(undirected_closure(tiered_host_edges(ds, n_hosts=64, core=16)))
    return kcore_int(edges, k=3, iters=8).sort_values("host").reset_index(drop=True)


def test_kcore_partition_independent(ray_session):
    a = _kcore(1)
    b = _kcore(8)
    assert a.equals(b)
    # the peel must actually discriminate: some hosts in-core, some out
    assert 0 < a["in_core"].sum() < len(a)
    # every survivor keeps >= k neighbors inside the core; peeled hosts report 0
    assert (a.loc[a["in_core"] == 1, "core_degree"] >= 3).all()
    assert (a.loc[a["in_core"] == 0, "core_degree"] == 0).all()


# ---------------------------------------------------------------------
# Dataset-resident node state (VERDICT r4 order #2): with the switch
# forced, every graph algorithm must produce BIT-IDENTICAL results to
# the broadcast-vector path — the driver never holds a node vector.


def _edges(kind: str):
    import ray.data

    from crawlerframework_ray.stages.graph import (
        block_host_edges,
        distinct_edges,
        host_edges,
        tiered_host_edges,
        undirected_closure,
    )

    ds = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    if kind == "directed":
        return distinct_edges(host_edges(ds, n_hosts=64))
    if kind == "blocks":
        return undirected_closure(block_host_edges(ds, n_hosts=64, block=8))
    return distinct_edges(undirected_closure(tiered_host_edges(ds, n_hosts=64, core=16)))


def test_pagerank_dataset_state_identical(ray_session):
    from crawlerframework_ray.stages.graph import pagerank_int

    a = pagerank_int(_edges("directed"), iters=4, node_state="driver")
    b = pagerank_int(_edges("directed"), iters=4, node_state="dataset")
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))
    # and the auto switch picks dataset when forced low
    c = pagerank_int(_edges("directed"), iters=4, driver_state_max=1)
    assert a.reset_index(drop=True).equals(c.reset_index(drop=True))


def test_trustrank_dataset_state_identical(ray_session):
    from crawlerframework_ray.stages.graph import pagerank_int

    seeds = np.array([0, 1, 2], dtype=np.int64)
    a = pagerank_int(_edges("directed"), iters=4, seeds=seeds, node_state="driver")
    b = pagerank_int(_edges("directed"), iters=4, seeds=seeds, node_state="dataset")
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_components_dataset_state_identical(ray_session):
    from crawlerframework_ray.stages.graph import min_label_components

    a = min_label_components(_edges("blocks"), node_state="driver")
    b = min_label_components(_edges("blocks"), node_state="dataset")
    assert a.reset_index(drop=True).equals(
        b.reset_index(drop=True)[["host", "component"]]
    )


def test_bfs_dataset_state_identical(ray_session):
    from crawlerframework_ray.stages.graph import bfs_hops_int

    seeds = np.array([0, 1, 2], dtype=np.int64)
    a = bfs_hops_int(_edges("blocks"), seeds=seeds, iters=3, node_state="driver")
    b = bfs_hops_int(_edges("blocks"), seeds=seeds, iters=3, node_state="dataset")
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_hits_dataset_state_identical(ray_session):
    from crawlerframework_ray.stages.graph import hits_int

    a = hits_int(_edges("directed"), iters=2, node_state="driver")
    b = hits_int(_edges("directed"), iters=2, node_state="dataset")
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_kcore_dataset_state_identical(ray_session):
    from crawlerframework_ray.stages.graph import kcore_int

    a = kcore_int(_edges("tiered"), k=3, iters=3, node_state="driver")
    b = kcore_int(_edges("tiered"), k=3, iters=3, node_state="dataset")
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_bellman_ford_dataset_state_identical(ray_session):
    from crawlerframework_ray.stages.graph import bellman_ford_int

    def w(src, dst):
        return (src * 7 + dst * 3) % 5 + 1

    seeds = np.array([0, 1, 2], dtype=np.int64)
    a = bellman_ford_int(_edges("blocks"), seeds=seeds, iters=3, weight_fn=w,
                         node_state="driver")
    b = bellman_ford_int(_edges("blocks"), seeds=seeds, iters=3, weight_fn=w,
                         node_state="dataset")
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def _scc(blocks: int) -> pd.DataFrame:
    import ray.data

    from crawlerframework_ray.stages.graph import (
        bowtie_host_edges,
        distinct_edges,
        scc_fb_trim,
    )

    ds = ray.data.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id"], override_num_blocks=blocks
    )
    return (
        scc_fb_trim(distinct_edges(bowtie_host_edges(ds)))
        .sort_values("host")
        .reset_index(drop=True)
    )


def _tarjan(edges: pd.DataFrame) -> dict[int, int]:
    """Serial iterative Tarjan — the independent oracle tier (no shared
    arithmetic with the distributed trim/color/backward kernel)."""
    adj: dict[int, list[int]] = {}
    nodes: set[int] = set()
    for s, d in zip(edges["src"], edges["dst"]):
        adj.setdefault(int(s), []).append(int(d))
        nodes.add(int(s))
        nodes.add(int(d))
    for v in adj.values():
        v.sort()
    index: dict[int, int] = {}
    low: dict[int, int] = {}
    on: set[int] = set()
    stack: list[int] = []
    comp: dict[int, int] = {}
    counter = [0]
    for root in sorted(nodes):
        if root in index:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on.add(v)
            recursed = False
            succ = adj.get(v, [])
            for i in range(pi, len(succ)):
                w = succ[i]
                if w not in index:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    recursed = True
                    break
                if w in on:
                    low[v] = min(low[v], index[w])
            if recursed:
                continue
            if low[v] == index[v]:
                members = []
                while True:
                    w = stack.pop()
                    on.discard(w)
                    members.append(w)
                    if w == v:
                        break
                m = min(members)
                for w in members:
                    comp[w] = m
            work.pop()
            if work:
                u, _ = work[-1]
                low[u] = min(low[u], low[v])
    return comp


def test_scc_matches_serial_tarjan(ray_session):
    import ray.data

    from crawlerframework_ray.stages.graph import bowtie_host_edges, distinct_edges

    ds = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    edges = distinct_edges(bowtie_host_edges(ds)).to_pandas()
    want = _tarjan(edges)
    got = _scc(1)
    assert dict(zip(got["host"], got["scc_id"])) == want
    # the planted bow-tie exercises every phase: a giant SCC (the
    # chorded core), >=4 small 3-cycle SCCs, and trimmed singletons
    sizes = got.groupby("scc_id").size()
    assert sizes.max() == 8            # core
    assert (sizes == 3).sum() == 4     # fed 3-cycles
    assert (sizes == 1).sum() > 10     # IN/OUT tiers + chain singletons


def test_scc_partition_independent(ray_session):
    a = _scc(1)
    b = _scc(8)
    assert a.equals(b)


def _bowtie_edges():
    import ray.data

    from crawlerframework_ray.stages.graph import bowtie_host_edges, distinct_edges

    ds = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    return distinct_edges(bowtie_host_edges(ds))


def test_opic_dataset_state_identical(ray_session):
    from crawlerframework_ray.stages.graph import opic_int

    a = opic_int(_bowtie_edges(), rounds=3, node_state="driver")
    b = opic_int(_bowtie_edges(), rounds=3, node_state="dataset")
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))
    c = opic_int(_bowtie_edges(), rounds=3, driver_state_max=1)
    assert a.reset_index(drop=True).equals(c.reset_index(drop=True))


def test_opic_cash_conserved_and_differentiates(ray_session):
    from crawlerframework_ray.stages.graph import opic_int

    scale = 10**12
    out = opic_int(_bowtie_edges(), scale=scale, rounds=4)
    # the integer ledger conserves total cash exactly every round
    assert int(out["cash"].sum()) == scale
    # importance genuinely differentiates the bow-tie tiers: the
    # recirculating core outranks the never-receiving IN tier
    core = out[out["host"] < 8]["importance"]
    in_tier = out[(out["host"] >= 16) & (out["host"] < 24)]["importance"]
    assert core.min() > in_tier.max()


def test_scc_dataset_state_identical(ray_session):
    from crawlerframework_ray.stages.graph import scc_fb_trim

    a = scc_fb_trim(_bowtie_edges(), node_state="driver")
    # forced-low auto switch exercises BOTH the dispatch and the
    # dataset-resident path in one run (the path itself is ~30 sweeps
    # of shuffle pairs — one run keeps the suite's wall-time sane)
    b = scc_fb_trim(_bowtie_edges(), driver_state_max=1)
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_co_citation_pairs_and_dual(ray_session):
    """Hand-built 4-node citation graph: s1 and s2 both cite {a, b} —
    co-citation support(a,b)=2; a and b are both cited by {s1, s2} —
    coupling support(s1,s2)=2. The hub-degree guard drops a planted
    high-out-degree hub's contribution identically to a serial mirror."""
    import ray.data

    from crawlerframework_ray.stages.graph import co_citation_pairs

    edges = [
        {"src": 10, "dst": 1}, {"src": 10, "dst": 2},
        {"src": 11, "dst": 1}, {"src": 11, "dst": 2},
        {"src": 12, "dst": 1},  # cites only a: no pair
        {"src": 10, "dst": 1},  # duplicate edge must not double-count
    ]
    ds = ray.data.from_items(edges)
    cc = co_citation_pairs(ds, min_support=2).to_pandas()
    assert list(zip(cc["host_a"], cc["host_b"], cc["support"])) == [(1, 2, 2)]

    bc = co_citation_pairs(ray.data.from_items(edges), min_support=2, dual=True).to_pandas()
    assert list(zip(bc["host_a"], bc["host_b"], bc["support"])) == [(10, 11, 2)]


def test_co_citation_degree_under_skew_guard():
    """The df_cap=256 hub guard is provably lossless on the gate graph:
    max in/out degree of the derived 64-host edge set is far below it."""
    import duckdb

    for sf in ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]:
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
        )
        deg = con.execute("""
            WITH e AS (SELECT DISTINCT src, dst FROM (
              SELECT doc_id % 64 AS src, (doc_id * 7 + doc_id // 64 + 1) % 64 AS dst FROM documents
              UNION ALL
              SELECT doc_id % 64, (doc_id * 13 + doc_id // 64 + 5) % 64 FROM documents)
              WHERE src != dst)
            SELECT GREATEST(
              (SELECT MAX(c) FROM (SELECT COUNT(*) c FROM e GROUP BY src)),
              (SELECT MAX(c) FROM (SELECT COUNT(*) c FROM e GROUP BY dst)))
        """).fetchone()[0]
        assert deg < 256 // 4, sf


def test_salsa_dataset_state_identical(ray_session):
    from crawlerframework_ray.stages.graph import salsa_int

    a = salsa_int(_edges("directed"), iters=2, node_state="driver")
    b = salsa_int(_edges("directed"), iters=2, node_state="dataset")
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_salsa_mass_conserved(ray_session):
    # SALSA's defining property vs HITS: each sweep is (sub)stochastic,
    # so total authority mass never exceeds the injected n*scale (it
    # only leaks through integer floors and dangling nodes)
    from crawlerframework_ray.stages.graph import PAGERANK_SCALE, salsa_int

    out = salsa_int(_edges("directed"), iters=2)
    n = len(out)
    assert 0 < int(out["authority"].sum()) <= n * PAGERANK_SCALE
    assert 0 < int(out["hub"].sum()) <= n * PAGERANK_SCALE


def test_anf_dataset_state_identical(ray_session):
    from crawlerframework_ray.stages.graph import anf_neighborhood_int

    a = anf_neighborhood_int(_edges("directed"), iters=4, node_state="driver")
    b = anf_neighborhood_int(_edges("directed"), iters=4, node_state="dataset")
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_anf_monotone_and_bounded(ray_session):
    from crawlerframework_ray.stages.graph import anf_neighborhood_int

    out = anf_neighborhood_int(_edges("directed"), iters=6)
    n = out["n_pairs"].to_numpy()
    assert (np.diff(n) >= 0).all()          # reachability closure grows
    assert int(n[0]) ** 2 >= int(n[-1])     # ≤ n^2 pairs
    assert int(out["is_eff_diameter"].sum()) == 1


def test_hyperball_tracks_exact_anf(ray_session):
    # 4096-register HLL counters on a 64-node closure: the estimate
    # must track the exact neighborhood function within 2% at every t
    from crawlerframework_ray.stages.graph import (
        anf_neighborhood_int,
        hyperball_neighborhood,
    )

    exact = anf_neighborhood_int(_edges("directed"), iters=4)["n_pairs"].to_numpy()
    est = hyperball_neighborhood(_edges("directed"), iters=4)["nhat_pairs"].to_numpy()
    assert (np.abs(est - exact) <= np.maximum(2, exact * 2 // 100)).all()


def test_ktruss_four_rounds_is_fixpoint(ray_session):
    # the catalog query's 4-round spec equals the true 4-truss on the
    # gate graphs: one more peel round changes nothing
    from crawlerframework_ray.pipelines.queries import ktruss_host_edges

    out = ktruss_host_edges("/root/testdata/sf0.001")
    e = out[["host_a", "host_b"]].to_numpy()
    n = int(e.max()) + 1
    adj = np.zeros((n, n), bool)
    adj[e[:, 0], e[:, 1]] = True
    adj |= adj.T
    common = adj.astype(np.int64) @ adj.astype(np.int64)
    sup = common[e[:, 0], e[:, 1]]
    assert (sup >= 2).all()
    assert (sup == out["support"].to_numpy()).all()


def test_harmonic_dataset_state_identical(ray_session):
    from crawlerframework_ray.stages.graph import harmonic_centrality_int

    a = harmonic_centrality_int(_edges("directed"), iters=4, node_state="driver")
    b = harmonic_centrality_int(_edges("directed"), iters=4, node_state="dataset")
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))
