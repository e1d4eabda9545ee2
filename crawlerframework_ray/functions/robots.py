"""Robots.txt politeness: per-host rules with worker-side caching and
a token-bucket rate model (operator T4/O5 — the north_star's "per-host
politeness buckets with robots.txt caching").

The reference applied per-site politeness as hard-coded sleeps and
per-connector caps (crawler/connectors/googleconnector.py:58 politeness
sleep; crawler.cfg:26-185 per-site listing caps) and never parsed
robots.txt. Here the contract is the real one:

- every host serves a (deterministic, synthetic) ``robots.txt``;
- workers fetch it ONCE per host and cache the parsed rules (an LRU —
  the "robots cache" every production crawler carries);
- ``Disallow:`` path prefixes gate frontier ADMISSION (a disallowed URL
  never enters the frontier, so it can never be fetched);
- ``Crawl-delay: k`` maps to a token-bucket rate: the per-host wave
  budget is ``host_budget >> k`` (tokens refill each epoch, bucket
  capacity = one epoch's refill) — the discrete-epoch form of
  requests-per-second throttling.

Everything is a pure function of (seed, host), so the engine's
distributed admission and the serial oracle agree exactly — robots
decisions are part of the trace-equality gate (tests/test_robots.py).
"""

from __future__ import annotations

import hashlib
from collections import OrderedDict
from dataclasses import dataclass


def synth_robots_txt(host: str, seed: int) -> str:
    """The synthetic web's robots.txt for ``host`` — a pure function of
    (seed, host). ~30% of hosts disallow 1-2 path prefixes; ~25%
    declare a crawl delay."""
    d = hashlib.sha256(f"{seed}|robots|{host}".encode()).digest()
    lines = ["User-agent: *"]
    if d[0] % 10 < 3:
        for i in range(1 + d[1] % 2):
            lines.append(f"Disallow: /p/{d[2 + i] % 10}")
    if d[4] % 4 == 0:
        lines.append(f"Crawl-delay: {1 + d[5] % 2}")
    return "\n".join(lines)


@dataclass(frozen=True)
class RobotsRules:
    disallow_prefixes: tuple
    crawl_delay: int  # 0 = unthrottled; budget divider is 2**crawl_delay


def parse_robots_txt(txt: str) -> RobotsRules:
    """Minimal robots.txt parser: ``Disallow`` path prefixes and
    ``Crawl-delay`` under ``User-agent: *`` (the only agent the synth
    web emits)."""
    prefixes: list[str] = []
    delay = 0
    for line in txt.splitlines():
        line = line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "disallow" and val:
            prefixes.append(val)
        elif key == "crawl-delay" and val.isdigit():
            delay = int(val)
    return RobotsRules(tuple(prefixes), delay)


def _path_of(url: str) -> str:
    rest = url.split("://", 1)[-1]
    slash = rest.find("/")
    return rest[slash:] if slash >= 0 else "/"


class RobotsCache:
    """Per-worker robots cache: host → parsed rules, fetched once and
    LRU-capped. The ``fetch`` seam is the synthetic web here; a real
    deployment swaps in an HTTP GET of ``/robots.txt``."""

    def __init__(self, seed: int, cache_size: int = 65536):
        self.seed = seed
        self.cache: OrderedDict[str, RobotsRules] = OrderedDict()
        self.cache_size = cache_size
        self.n_fetches = 0

    def rules(self, host: str) -> RobotsRules:
        r = self.cache.get(host)
        if r is not None:
            self.cache.move_to_end(host)
            return r
        r = parse_robots_txt(synth_robots_txt(host, self.seed))
        self.n_fetches += 1
        self.cache[host] = r
        if len(self.cache) > self.cache_size:
            self.cache.popitem(last=False)
        return r

    def disallowed(self, url: str, host: str) -> bool:
        rules = self.rules(host)
        if not rules.disallow_prefixes:
            return False
        path = _path_of(url)
        return any(path.startswith(p) for p in rules.disallow_prefixes)

    def host_budget(self, host: str, base_budget: int) -> int:
        """Token-bucket epoch budget: base budget divided by
        2**crawl_delay, floor 1."""
        return max(1, base_budget >> self.rules(host).crawl_delay)
