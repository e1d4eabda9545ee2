"""Iterative link-graph algorithms over a host graph (PageRank family).

Link analysis is the natural companion to the reference's crawl domain
(its frontier IS a link graph: outlink extraction in
crawler/connectors/baseconnector.py feeds the task queue); the
reference itself never ranks hosts, so this is one of the
beyond-the-reference training/crawl-prioritization ops the brief asks
for (crawl scheduling by authority).

Design for 100 TB / 10^8-host graphs:

- **The edge set is the invariant side of the iteration** — derived
  once, globally deduplicated via a bounded-cardinality bucketed
  shuffle, then ``materialize()``d so the 4 power iterations re-read
  blocks from the object store instead of recomputing the derivation.
- **Fixed-point int64 arithmetic** (scale 10^12): every per-iteration
  contribution is an integer, so cross-partition sums are exactly
  associative — the distributed result is bit-identical to any serial
  or SQL evaluation regardless of partitioning. Float PageRank cannot
  make that guarantee (sum order differs per shuffle).
- **Rank/out-degree vectors broadcast, edges streamed**: each
  iteration ships the (nodes, rank, outdeg) arrays to the object
  store ONCE (``ray.put``) and every edge batch resolves them
  zero-copy; the heavy side (edges) never leaves its blocks. For a
  host graph the vector side is ~10^-2 of the edge bytes (10^8 hosts
  vs 10^10 edges); beyond broadcastable size the identical loop runs
  with a bucketed hash-join attach of ranks onto edges (stages/joins
  pattern) — the iteration structure does not change.
- **Integer accumulation via ``np.add.at``** (not bincount weights,
  which are float64 and lose exactness past 2^53).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .agg import bucketed_group_agg

PAGERANK_SCALE = 10**12
DAMP_NUM, DAMP_DEN = 85, 100  # 0.85 damping as an exact ratio


def host_edges(ds, n_hosts: int = 64):
    """Derive the deterministic per-document host-link edge list
    (src host -> dst host; self-loops dropped, batch-level dedup;
    global dedup is the caller's ``distinct_edges``)."""

    def fn(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy().astype(np.int64)
        src = ids % n_hosts
        da = (ids * 7 + ids // n_hosts + 1) % n_hosts
        db = (ids * 13 + ids // n_hosts + 5) % n_hosts
        s = np.concatenate([src, src])
        d = np.concatenate([da, db])
        keep = s != d
        e = np.unique(np.stack([s[keep], d[keep]], axis=1), axis=0)
        return pa.table(
            {
                "src": pa.array(e[:, 0], pa.int64()),
                "dst": pa.array(e[:, 1], pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def distinct_edges(edges):
    """Global (src, dst) dedup: bounded bucketed shuffle (each bucket
    holds ~|E|/64 edge rows — size buckets to worker heap at scale)."""
    return bucketed_group_agg(
        edges, ["src", "dst"], lambda g: g.drop_duplicates(ignore_index=True)
    )


def pagerank_int(
    edges_ds,
    scale: int = PAGERANK_SCALE,
    iters: int = 4,
    seeds: np.ndarray | None = None,
) -> pd.DataFrame:
    """Power iteration in exact integer arithmetic.

    Returns a frame (host, rank) with
    ``rank_{t+1}[h] = base(h) + (85 * sum_{(s,h) in E} (rank_t[s] // od[s])) // 100``.
    With ``seeds=None`` (classic PageRank): ``base = (15 * scale //
    100) // N`` for every host, ``rank_0 = scale // N``. With a seed
    array (TrustRank, Gyöngyi et al. 2004 — the biased restart that
    propagates trust from a vetted seed set): teleport mass and the
    initial vector concentrate ENTIRELY on the seeds — ``base =
    (15 * scale // 100) // |S|`` on seeds and 0 elsewhere, ``rank_0 =
    scale // |S|`` on seeds and 0 elsewhere — so unlinked hosts score
    exactly 0. Dangling mass is not redistributed (both sides of the
    oracle agree)."""
    import ray

    edges = edges_ds.materialize()

    # out-degree: per-batch partial counts -> bucketed sum (one small
    # shuffle; result is one row per host — at 10^8 hosts this stays a
    # Dataset and the broadcast below becomes a hash-join attach)
    def od_partial(t: pa.Table) -> pa.Table:
        u, c = np.unique(t.column("src").to_numpy(), return_counts=True)
        return pa.table(
            {"src": pa.array(u, pa.int64()), "od": pa.array(c, pa.int64())}
        )

    od_df = bucketed_group_agg(
        edges.map_batches(od_partial, batch_format="pyarrow"),
        ["src"],
        lambda g: g.groupby("src", as_index=False)["od"].sum(),
    ).to_pandas()

    def node_partial(t: pa.Table) -> pa.Table:
        h = np.unique(
            np.concatenate(
                [t.column("src").to_numpy(), t.column("dst").to_numpy()]
            )
        )
        return pa.table({"h": pa.array(h, pa.int64())})

    nodes = np.sort(
        bucketed_group_agg(
            edges.map_batches(node_partial, batch_format="pyarrow"),
            ["h"],
            lambda g: g.drop_duplicates(ignore_index=True),
        )
        .to_pandas()["h"]
        .to_numpy()
        .astype(np.int64)
    )
    n = len(nodes)
    od = np.zeros(n, np.int64)
    od[np.searchsorted(nodes, od_df["src"].to_numpy())] = od_df["od"].to_numpy()

    if seeds is None:
        base = np.full(n, (15 * scale // 100) // n, np.int64)
        rank = np.full(n, scale // n, np.int64)
    else:
        is_seed = np.isin(nodes, seeds)
        # the teleport denominator is the LITERAL seed-set size (the SQL
        # oracle divides by it) — a seed host absent from the edge-derived
        # node set must fail loudly, not silently shift the mass split
        if int(is_seed.sum()) != len(seeds):
            missing = np.setdiff1d(np.asarray(seeds, np.int64), nodes)
            raise ValueError(f"seed hosts absent from graph: {missing.tolist()}")
        base = np.where(is_seed, (15 * scale // 100) // len(seeds), 0).astype(np.int64)
        rank = np.where(is_seed, scale // len(seeds), 0).astype(np.int64)

    for _ in range(iters):
        state_ref = ray.put((nodes, rank, od))

        def contrib(t: pa.Table) -> pa.Table:
            nds, rk, odeg = ray.get(state_ref)  # zero-copy views
            si = np.searchsorted(nds, t.column("src").to_numpy())
            c = rk[si] // odeg[si]
            d = t.column("dst").to_numpy()
            u, inv = np.unique(d, return_inverse=True)
            acc = np.zeros(len(u), np.int64)
            np.add.at(acc, inv, c)  # exact int accumulation
            return pa.table(
                {"dst": pa.array(u, pa.int64()), "s": pa.array(acc, pa.int64())}
            )

        in_df = bucketed_group_agg(
            edges.map_batches(contrib, batch_format="pyarrow"),
            ["dst"],
            lambda g: g.groupby("dst", as_index=False)["s"].sum(),
        ).to_pandas()
        in_sum = np.zeros(n, np.int64)
        in_sum[np.searchsorted(nodes, in_df["dst"].to_numpy())] = in_df[
            "s"
        ].to_numpy()
        rank = base + DAMP_NUM * in_sum // DAMP_DEN

    return pd.DataFrame({"host": nodes, "rank": rank.astype(np.int64)})


def triangle_counts(edges_ds, n_hosts: int) -> pd.DataFrame:
    """Per-host triangle counts on the undirected host graph — the
    multi-way graph join pattern (each triangle found exactly once as
    an ordered wedge a<b<c closed by edge (a,c)):

    1. canonicalize: (min,max) per directed edge, global dedup (one
       bounded shuffle);
    2. wedge join: edges ⋈ edges on b=a' (bucketed hash join — the
       all-to-all is on hash(mid-vertex), so a hub vertex's wedges land
       in one bucket: salt hubs via hash_join(n_salts) at scale);
    3. close: wedges semi-joined against the edge set on the composite
       key a·n_hosts+c (int-packed — swap to a string key when vertex
       ids exceed 2^31);
    4. explode each triangle's three corners → bounded groupby count.
    """
    from .joins import hash_join

    canon = bucketed_group_agg(
        edges_ds.map_batches(
            lambda t: pa.table(
                {
                    "a": pa.array(
                        np.minimum(t.column("src").to_numpy(), t.column("dst").to_numpy()),
                        pa.int64(),
                    ),
                    "b": pa.array(
                        np.maximum(t.column("src").to_numpy(), t.column("dst").to_numpy()),
                        pa.int64(),
                    ),
                }
            ),
            batch_format="pyarrow",
        ),
        ["a", "b"],
        lambda g: g.drop_duplicates(ignore_index=True),
    )

    left = canon.map_batches(
        lambda t: pa.table({"mid": t.column("b"), "lo": t.column("a")}),
        batch_format="pyarrow",
    )
    right = canon.map_batches(
        lambda t: pa.table({"mid": t.column("a"), "hi": t.column("b")}),
        batch_format="pyarrow",
    )
    wedges = hash_join(left, right, key="mid", left_cols=["lo"], right_cols=["hi"])

    wk = wedges.map_batches(
        lambda t: pa.table(
            {
                "ac": pa.array(
                    t.column("lo").to_numpy() * n_hosts + t.column("hi").to_numpy(),
                    pa.int64(),
                ),
                "x": t.column("lo"), "y": t.column("mid"), "z": t.column("hi"),
            }
        ),
        batch_format="pyarrow",
    )
    ek = canon.map_batches(
        lambda t: pa.table(
            {
                "ac": pa.array(
                    t.column("a").to_numpy() * n_hosts + t.column("b").to_numpy(),
                    pa.int64(),
                ),
                "one": pa.array(np.ones(len(t), np.int64), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    tris = hash_join(wk, ek, key="ac", left_cols=["x", "y", "z"], right_cols=["one"])

    corners = tris.map_batches(
        lambda t: pa.table(
            {
                "host": pa.array(
                    np.concatenate(
                        [t.column("x").to_numpy(), t.column("y").to_numpy(),
                         t.column("z").to_numpy()]
                    ),
                    pa.int64(),
                )
            }
        ),
        batch_format="pyarrow",
    )
    out = bucketed_group_agg(
        corners,
        ["host"],
        lambda g: g.groupby("host", as_index=False).agg(n_triangles=("host", "size")),
    ).to_pandas()
    return out.astype({"host": "int64", "n_triangles": "int64"})


def block_host_edges(ds, n_hosts: int = 64, block: int = 8):
    """Deterministic BLOCK-partitioned host edge list: every edge stays
    inside its host's block of ``block`` hosts, so the graph decomposes
    into n_hosts/block disjoint clusters by construction — the shape
    connected-components and seeded-BFS need to produce non-trivial
    answers (a single dense component would make both queries
    constant). Same per-doc derivation discipline as host_edges."""

    def fn(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy().astype(np.int64)
        src = ids % n_hosts
        base = (src // block) * block
        da = base + (ids * 5 + ids // n_hosts + 1) % block
        db = base + (ids * 11 + 3) % block
        s = np.concatenate([src, src])
        d = np.concatenate([da, db])
        keep = s != d
        e = np.unique(np.stack([s[keep], d[keep]], axis=1), axis=0)
        return pa.table(
            {
                "src": pa.array(e[:, 0], pa.int64()),
                "dst": pa.array(e[:, 1], pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def tiered_host_edges(ds, n_hosts: int = 64, core: int = 16):
    """Deterministic degree-TIERED host edge list: hosts below
    ``core`` form a dense near-clique (per-doc edge to another core
    host), hosts at/above ``core`` hang off a binary tree
    (edge h -> h // 2). Under k-core peeling this cascades — the tree
    leaves peel in sweep 1, their parents in sweep 2, and only the
    dense core survives — the shape kcore needs for a non-trivial
    answer (block_host_edges is a near-clique where nothing peels).
    Same per-doc derivation discipline as host_edges."""

    def fn(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy().astype(np.int64)
        src = ids % n_hosts
        in_core = src < core
        dst = np.where(
            in_core,
            (src + 1 + ids % (core - 1)) % core,
            src // 2,
        )
        keep = src != dst
        e = np.unique(np.stack([src[keep], dst[keep]], axis=1), axis=0)
        return pa.table(
            {
                "src": pa.array(e[:, 0], pa.int64()),
                "dst": pa.array(e[:, 1], pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def undirected_closure(edges):
    """Edge set plus its reverse (the undirected form min-label
    components require) — one map_batches, dedup is the caller's
    distinct_edges."""

    def fn(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy()
        d = t.column("dst").to_numpy()
        return pa.table(
            {
                "src": pa.array(np.concatenate([s, d]), pa.int64()),
                "dst": pa.array(np.concatenate([d, s]), pa.int64()),
            }
        )

    return edges.map_batches(fn, batch_format="pyarrow")


def _graph_nodes(edges) -> np.ndarray:
    """Sorted distinct vertex ids of a (src, dst) edge Dataset — one
    bounded shuffle (same pattern as pagerank_int's node derivation)."""

    def node_partial(t: pa.Table) -> pa.Table:
        h = np.unique(
            np.concatenate([t.column("src").to_numpy(), t.column("dst").to_numpy()])
        )
        return pa.table({"h": pa.array(h, pa.int64())})

    return np.sort(
        bucketed_group_agg(
            edges.map_batches(node_partial, batch_format="pyarrow"),
            ["h"],
            lambda g: g.drop_duplicates(ignore_index=True),
        )
        .to_pandas()["h"]
        .to_numpy()
        .astype(np.int64)
    )


def _propagate_min(edges, nodes: np.ndarray, state: np.ndarray) -> np.ndarray:
    """One synchronous min-propagation sweep: every edge (s, d) offers
    ``state[s]`` to d; returns the per-node minimum offer (np.iinfo max
    where no edge arrives). Edge blocks stream; the (nodes, state)
    vector ships once per sweep via ray.put and is resolved zero-copy
    in every batch — the 10^8-vertex form keeps state as a Dataset and
    swaps the broadcast for a bucketed hash-join attach, identical
    sweep semantics (stages/graph.py module docstring)."""
    import ray

    ref = ray.put((nodes, state))

    def sweep(t: pa.Table) -> pa.Table:
        nds, st = ray.get(ref)  # zero-copy views
        si = np.searchsorted(nds, t.column("src").to_numpy())
        offer = st[si]
        d = t.column("dst").to_numpy()
        u, inv = np.unique(d, return_inverse=True)
        acc = np.full(len(u), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(acc, inv, offer)
        return pa.table(
            {"dst": pa.array(u, pa.int64()), "m": pa.array(acc, pa.int64())}
        )

    got = bucketed_group_agg(
        edges.map_batches(sweep, batch_format="pyarrow"),
        ["dst"],
        lambda g: g.groupby("dst", as_index=False)["m"].min(),
    ).to_pandas()
    incoming = np.full(len(nodes), np.iinfo(np.int64).max, np.int64)
    incoming[np.searchsorted(nodes, got["dst"].to_numpy())] = got["m"].to_numpy()
    return incoming


def _propagate_sum(edges, nodes: np.ndarray, state: np.ndarray,
                   reverse: bool = False) -> np.ndarray:
    """One synchronous sum-propagation sweep: every edge (s, d) adds
    ``state[s]`` into d (or, with ``reverse``, ``state[d]`` into s) —
    the kernel HITS shares with pagerank_int. Integer ``np.add.at``
    accumulation, so cross-partition sums are exactly associative;
    same broadcast-vector / streamed-edges shape as _propagate_min."""
    import ray

    ref = ray.put((nodes, state))
    src_col, dst_col = ("dst", "src") if reverse else ("src", "dst")

    def sweep(t: pa.Table) -> pa.Table:
        nds, st = ray.get(ref)
        si = np.searchsorted(nds, t.column(src_col).to_numpy())
        offer = st[si]
        d = t.column(dst_col).to_numpy()
        u, inv = np.unique(d, return_inverse=True)
        acc = np.zeros(len(u), np.int64)
        np.add.at(acc, inv, offer)
        return pa.table(
            {"dst": pa.array(u, pa.int64()), "m": pa.array(acc, pa.int64())}
        )

    got = bucketed_group_agg(
        edges.map_batches(sweep, batch_format="pyarrow"),
        ["dst"],
        lambda g: g.groupby("dst", as_index=False)["m"].sum(),
    ).to_pandas()
    incoming = np.zeros(len(nodes), np.int64)
    incoming[np.searchsorted(nodes, got["dst"].to_numpy())] = got["m"].to_numpy()
    return incoming


def hits_int(edges_ds, iters: int = 3) -> pd.DataFrame:
    """HITS hubs/authorities in UNNORMALIZED exact int64 (Kleinberg
    1999 without the per-iteration L2 normalization — the norm is the
    one transcendental step, so it is not taken and the iteration
    count is bounded instead; scores grow ~(principal eigenvalue)^iters,
    safe in int64 for small iters × bounded degree, asserted).
    ``a_t(v) = Σ_{(u,v)} h_{t-1}(u)``, ``h_t(u) = Σ_{(u,v)} a_t(v)``
    from h_0 = 1. The caller must supply a DEDUPLICATED edge set
    (sum, unlike min, is not idempotent under duplicate edges).
    Partition-invariant, bit-equal to the unrolled SQL."""
    edges = edges_ds.materialize()
    nodes = _graph_nodes(edges)
    hub = np.ones(len(nodes), np.int64)
    auth = np.zeros(len(nodes), np.int64)
    for _ in range(iters):
        auth = _propagate_sum(edges, nodes, hub)
        hub = _propagate_sum(edges, nodes, auth, reverse=True)
        assert max(int(hub.max()), int(auth.max())) < 2**53, "HITS int64 headroom"
    return pd.DataFrame(
        {"host": nodes, "hub": hub.astype(np.int64), "authority": auth.astype(np.int64)}
    )


def min_label_components(edges_ds) -> pd.DataFrame:
    """Weakly-connected components by synchronous min-label
    propagation (label(v) starts as v; each sweep takes the min over
    neighbors; fixpoint = component id = min vertex id reachable).
    The caller must supply the edge set with BOTH directions present
    (undirected closure). Converges in graph-diameter sweeps; the
    driver sees one changed-count per sweep, never the labels of more
    than one vector (Dataset-resident at 10^8-vertex scale, see
    _propagate_min). Returns (host, component), exact — label ids are
    integers, min is associative, so the result is partition-invariant
    and matches a serial/SQL transitive-closure evaluation bit for bit.
    """
    edges = edges_ds.materialize()
    nodes = _graph_nodes(edges)
    label = nodes.copy()
    while True:
        incoming = _propagate_min(edges, nodes, label)
        new = np.minimum(label, incoming)
        if (new != label).sum() == 0:
            break
        label = new
    return pd.DataFrame({"host": nodes, "component": label.astype(np.int64)})


def bfs_hops_int(edges_ds, seeds: np.ndarray, iters: int, inf: int = 999) -> pd.DataFrame:
    """Bounded breadth-first hop distance from a seed set over a
    directed edge Dataset (supply both directions for undirected
    semantics) — the crawl-depth analysis: how many link hops from the
    seed hosts each host sits. Exactly ``iters`` synchronous sweeps of
    ``d(v) = min(d(v), min_{(u,v) in E} d(u) + 1)`` in int64 with
    ``inf`` as the not-yet-reached sentinel, so the result is the
    ≤ iters-hop distance (-1 where unreached) and matches an unrolled
    SQL evaluation exactly. Same broadcast-vector / streamed-edges
    shape as pagerank_int."""
    edges = edges_ds.materialize()
    nodes = _graph_nodes(edges)
    dist = np.where(np.isin(nodes, seeds), 0, inf).astype(np.int64)
    for _ in range(iters):
        incoming = _propagate_min(edges, nodes, dist + 1)
        # dist+1 may push the sentinel past inf; LEAST against the old
        # dist (<= inf) restores the cap, matching the SQL's LEAST
        dist = np.minimum(dist, incoming)
        dist = np.minimum(dist, inf)
    hops = np.where(dist >= inf, -1, dist).astype(np.int64)
    return pd.DataFrame({"host": nodes, "hops": hops})


def kcore_int(edges_ds, k: int = 3, iters: int = 8) -> pd.DataFrame:
    """k-core decomposition by synchronous peeling (Seidman 1983;
    Batagelj–Zaveršnik's bulk variant): exactly ``iters`` sweeps of
    "drop every node whose degree among still-active nodes is < k",
    all nodes dropped in a sweep simultaneously, then the surviving
    subgraph's degrees. Synchronous bulk peeling is deterministic and
    partition-invariant (each sweep is one integer _propagate_sum of
    the 0/1 active vector over streamed edge blocks), so the result is
    bit-identical to the unrolled SQL evaluation; with iters ≥ the
    peel depth the fixpoint is reached and the survivors are the exact
    k-core. The caller must supply the DEDUPLICATED undirected edge
    set (sum, unlike min, is not idempotent under duplicates).
    Returns (host, in_core, core_degree) — core_degree is the degree
    inside the surviving subgraph, 0 for peeled hosts."""
    edges = edges_ds.materialize()
    nodes = _graph_nodes(edges)
    active = np.ones(len(nodes), np.int64)
    for _ in range(iters):
        deg = _propagate_sum(edges, nodes, active)
        active = active * (deg >= k).astype(np.int64)
    core_deg = _propagate_sum(edges, nodes, active) * active
    return pd.DataFrame(
        {
            "host": nodes,
            "in_core": active.astype(np.int64),
            "core_degree": core_deg.astype(np.int64),
        }
    )


def bellman_ford_int(
    edges_ds, seeds: np.ndarray, iters: int, weight_fn, inf: int = 999_999
) -> pd.DataFrame:
    """Bounded WEIGHTED shortest paths (synchronous Bellman–Ford):
    exactly ``iters`` sweeps of ``d(v) = min(d(v), min_{(u,v)}
    d(u) + w(u,v))`` with integer weights from the deterministic
    ``weight_fn(src, dst) -> int64 array`` — the weighted sibling of
    bfs_hops_int (crawl cost = politeness-delay-weighted hops, not
    plain depth). For undirected semantics supply both edge
    directions AND a symmetric weight_fn, else the reversed edges get
    different costs. Integer min-plus relaxation is associative —
    bit-identical to the unrolled SQL at any partitioning; same
    broadcast-vector / streamed-edges shape as _propagate_min, with
    the weight added edge-local inside the sweep."""
    import ray

    edges = edges_ds.materialize()
    nodes = _graph_nodes(edges)
    dist = np.where(np.isin(nodes, seeds), 0, inf).astype(np.int64)
    for _ in range(iters):
        ref = ray.put((nodes, dist))

        def sweep(t: pa.Table) -> pa.Table:
            nds, st = ray.get(ref)
            s = t.column("src").to_numpy()
            d = t.column("dst").to_numpy()
            offer = st[np.searchsorted(nds, s)] + weight_fn(s, d)
            u, inv = np.unique(d, return_inverse=True)
            acc = np.full(len(u), np.iinfo(np.int64).max, np.int64)
            np.minimum.at(acc, inv, offer)
            return pa.table({"dst": pa.array(u, pa.int64()), "m": pa.array(acc, pa.int64())})

        got = bucketed_group_agg(
            edges.map_batches(sweep, batch_format="pyarrow"),
            ["dst"],
            lambda g: g.groupby("dst", as_index=False)["m"].min(),
        ).to_pandas()
        incoming = np.full(len(nodes), np.iinfo(np.int64).max, np.int64)
        incoming[np.searchsorted(nodes, got["dst"].to_numpy())] = got["m"].to_numpy()
        dist = np.minimum(np.minimum(dist, incoming), inf)
    cost = np.where(dist >= inf, -1, dist).astype(np.int64)
    return pd.DataFrame({"host": nodes, "cost": cost})
