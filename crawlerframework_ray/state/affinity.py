"""Token-affinity routing (operator T3).

The reference's only placement-control mechanism: tasks carrying a
token were parked in a named queue and served ONLY by the worker bound
to that token (crawler/utils/namedqueue.py:3-41; the get-protocol in
taskmaster.py:77-121) — session logins, API quota buckets and cookie
jars stayed on one process.

Ray-native restatement: token → a dedicated named ACTOR holding the
token-bound state; a ``map_batches`` router stage splits each batch by
token and RPCs each slice to its token's actor. On a real cluster the
same routing uses custom resources / node labels per token class; the
actor form is the strongest guarantee (state lives exactly once).

Determinism: token = md5(key) first-hex-char — a pure function shared
with the DuckDB oracle (``ascii(substr(md5(k),1,1)) % n``).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import ray


def token_of(key: str, n_tokens: int) -> int:
    """Stable token id; expressible in SQL as
    ``ascii(substr(md5(key),1,1)) % n_tokens``."""
    return ord(hashlib.md5(key.encode()).hexdigest()[0]) % n_tokens


@ray.remote(num_cpus=0)
class TokenWorker:
    """The token-bound session: processes only its token's rows and
    keeps per-key counters (the state whose locality T3 exists for)."""

    def __init__(self, token: int):
        self.token = token
        self.counts: dict[str, int] = {}
        self.n_batches = 0
        self._folded: set[bytes] = set()

    def process(self, keys: list[str], batch_id: bytes | None = None) -> int:
        # idempotent under Ray task retries: a re-sent slice carries the
        # same deterministic batch_id and is folded in exactly once
        if batch_id is not None:
            if batch_id in self._folded:
                return len(keys)
            self._folded.add(batch_id)
        self.n_batches += 1
        for k in keys:
            self.counts[k] = self.counts.get(k, 0) + 1
        return len(keys)

    def report(self) -> tuple[int, dict[str, int]]:
        return self.token, dict(self.counts)


class AffinityRouter:
    """map_batches callable: split the batch by token, RPC each slice
    to its token's named worker, pass rows through with a ``token``
    column. Worker handles resolve by NAME once per worker process —
    no per-task borrower registration."""

    _cache: dict = {}

    def __init__(self, worker_names: list[str], key_column: str):
        self.worker_names = worker_names
        self.key_column = key_column

    def _workers(self):
        key = tuple(self.worker_names)
        h = AffinityRouter._cache.get(key)
        if h is None:
            h = AffinityRouter._cache[key] = [ray.get_actor(n) for n in self.worker_names]
        return h

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_tokens = len(self.worker_names)
        keys = batch.column(self.key_column).to_pylist()
        tokens = [token_of(k, n_tokens) for k in keys]
        groups: dict[int, list[str]] = {}
        for k, t in zip(keys, tokens):
            groups.setdefault(t, []).append(k)
        workers = self._workers()
        # deterministic per-slice id makes the RPC idempotent: a task
        # retry re-sends byte-identical slices, folded in exactly once
        ray.get([
            workers[t].process.remote(
                ks, hashlib.md5("\x00".join(ks).encode()).digest()
            )
            for t, ks in groups.items()
        ])
        return batch.append_column("token", pa.array(tokens, pa.int64()))


def token_resources_available(n_tokens: int, prefix: str = "token_class_") -> bool:
    """True iff the cluster advertises a custom resource per token
    class (``token_class_0..n-1`` — set via ``ray start
    --resources='{"token_class_0": 1, ...}'`` on the nodes that hold
    that class's sessions/quota). The survey's node-label form of T3
    (namedqueue.py:3-41): placement becomes a scheduler constraint
    instead of only an actor-identity guarantee."""
    have = ray.cluster_resources()
    return all(f"{prefix}{t}" in have for t in range(n_tokens))


def make_token_workers(n_tokens: int, run_id: str,
                       use_resources: bool | None = None) -> tuple[list[str], list]:
    """Spawn the named token workers; returns (names, handles). The
    router ships only the names — but the CALLER must hold the handles
    for the query's lifetime (a named actor without a live handle is
    garbage-collected). Blocks until every actor is registered so the
    router's ``ray.get_actor`` cannot race the spawn.

    ``use_resources`` (default: auto-detect): when the cluster
    advertises per-token-class custom resources, each worker is pinned
    to its class's nodes via ``resources={token_class_t: 0.001}`` — the
    node-label scheduling form on a real cluster; identical semantics
    single-node (the actor is still the sole owner of the token's
    state; the resource only constrains WHERE it lives)."""
    if use_resources is None:
        use_resources = token_resources_available(n_tokens)
    names = [f"cfray-token-{run_id}-{t}" for t in range(n_tokens)]
    handles = [
        TokenWorker.options(
            name=name,
            **({"resources": {f"token_class_{t}": 0.001}} if use_resources else {}),
        ).remote(t)
        for t, name in enumerate(names)
    ]
    ray.get([h.report.remote() for h in handles])
    return names, handles
