"""Engine configuration.

The knobs mirror the reference's crawler.cfg surface (SURVEY.md §6):
``max_depth`` ↔ max_recursion (crawler.cfg:197-198), ``host_budget`` ↔
per-site listing caps (crawler.cfg:26-185), ``wave_size`` ↔ the global
queue-drain budget, priorities per taskmanager.py:156-163.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, field

from .data.synth import SynthWebConfig


@dataclass
class CrawlConfig:
    web: SynthWebConfig = field(default_factory=SynthWebConfig)
    workdir: str = "/tmp/crawlerframework_ray"
    max_depth: int = 2              # level cap (reference max_recursion=1..2)
    wave_size: int = 1024           # global fetch budget per epoch (top-k)
    host_budget: int = 32           # politeness: max urls per host per wave
    n_shards: int = 8               # URL-seen cuckoo shards (≥ parallelism at scale)
    shard_capacity: int = 1 << 17   # per-shard filter capacity
    max_epochs: int = 8
    url_filter: str | None = None   # optional regex gate on expansions (M6)
    robots: bool = False            # robots.txt admission gate + crawl-delay
                                    # token-bucket budgets (functions/robots.py)
    adaptive_politeness: bool = False  # AIMD per-host budget backoff fed by
                                    # transient-failure signals (requires
                                    # failures=True); state/frontier.py
    failures: bool = False          # deterministic fetch-failure model
                                    # (data/synth.fetch_status_of): permanent
                                    # "gone" URLs dropped, transient "retry"
                                    # URLs requeued past the seen gate
    fetch_concurrency: int = 4      # fetcher actor-pool size
    fetch_batch_size: int = 256
    record_trace: bool = False      # keep per-epoch wave ordering (tests)
    verify_rows: bool = False       # enforce the per-row payload invariant in-engine
    # wave selection runs the global top-k on the driver while the
    # host-capped candidate set is at most this many rows (it is bounded
    # by min(hosts × host_budget, buckets × wave_size)); beyond it the
    # distributed sort+limit path runs instead. Not semantics-bearing:
    # both paths produce the identical wave (total order, full tiebreak).
    driver_topk_max: int = 1 << 20
    # frontier host-hash bucket-actor count (state/frontier.py). None →
    # sized to the cluster (≈ one bucket per CPU, 8..64): the push
    # exchange pays one ack'd RPC per (route batch, non-empty bucket),
    # so over-bucketing a small cluster multiplies push count for no
    # extra parallelism. NOT semantics-bearing: dedup, politeness and
    # wave selection are bucket-count-invariant (same url ⇒ same host ⇒
    # one bucket; the wave cut is an exact global merge of per-bucket
    # prefixes).
    n_buckets: int | None = None
    # frontier cold-tail spill (state/frontier.py): above this many
    # RESIDENT rows a bucket actor cuts its per-host cold tail (cap-key
    # rank ≥ host budget × spill_slack) into an actor-owned parquet
    # part, hard-linked into each epoch checkpoint; reload is lazy and
    # guarded by an exact cap-safety check. Bounds actor memory by
    # hosts-per-bucket × budget × slack instead of total frontier size
    # (the 10^10-URL axis). NOT semantics-bearing — trace / digests /
    # checkpoints are bit-identical with spill on or off (gated in
    # tests/test_crawl_stress.py) — so neither knob is fingerprinted.
    spill_max_resident: int = 1 << 20
    spill_slack: int = 8

    def fingerprint(self) -> str:
        """Stable hash of the semantics-bearing knobs — stamped into
        checkpoint manifests so a resume with different semantics is
        rejected instead of silently diverging."""
        payload = {
            "web": self.web.as_dict(),
            "max_depth": self.max_depth,
            "wave_size": self.wave_size,
            "host_budget": self.host_budget,
            "n_shards": self.n_shards,
            "shard_capacity": self.shard_capacity,
            "url_filter": self.url_filter,
            "robots": self.robots,
            "failures": self.failures,
            "adaptive_politeness": self.adaptive_politeness,
        }
        return hashlib.sha256(json.dumps(payload, sort_keys=True).encode()).hexdigest()[:16]

    @classmethod
    def from_dict(cls, d: dict) -> "CrawlConfig":
        """Build from a plain JSON-shaped dict (the ``--config`` file of
        ``python -m crawlerframework_ray crawl``): field names are the
        dataclass's own, with the synthetic-web parameters nested under
        ``web``. Unknown keys fail loudly — a typo'd knob must not
        silently fall back to a default on a 10^10-URL job."""
        d = dict(d)
        web_d = d.pop("web", {})
        unknown = set(web_d) - {f for f in SynthWebConfig.__dataclass_fields__}
        if unknown:
            raise ValueError(f"unknown web config keys: {sorted(unknown)}")
        if "formats" in web_d:
            web_d["formats"] = tuple(web_d["formats"])
        unknown = set(d) - {f for f in cls.__dataclass_fields__} - {"web"}
        if unknown:
            raise ValueError(f"unknown crawl config keys: {sorted(unknown)}")
        return cls(web=SynthWebConfig(**web_d), **d)
