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


def pagerank_int(edges_ds, scale: int = PAGERANK_SCALE, iters: int = 4) -> pd.DataFrame:
    """Power iteration in exact integer arithmetic.

    Returns a frame (host, rank) with
    ``rank_{t+1}[h] = base + (85 * sum_{(s,h) in E} (rank_t[s] // od[s])) // 100``
    and ``base = (15 * scale // 100) // N``, ``rank_0 = scale // N``.
    Dangling mass is not redistributed (both sides of the oracle agree).
    """
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

    base = (15 * scale // 100) // n
    rank = np.full(n, scale // n, np.int64)

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
