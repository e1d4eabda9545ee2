"""Robots.txt politeness: RFC 9309 rules with worker-side caching and
a token-bucket rate model (operator T4/O5 — the north_star's "per-host
politeness buckets with robots.txt caching").

The reference applied per-site politeness as hard-coded sleeps and
per-connector caps (crawler/connectors/googleconnector.py:58 politeness
sleep; crawler.cfg:26-185 per-site listing caps) and never parsed
robots.txt. Here the contract is the real one — the Robots Exclusion
Protocol as published (RFC 9309, Koster et al. 2022):

- **agent groups**: consecutive ``User-agent`` lines open a group;
  the crawler obeys exactly ONE group — the most specific matching
  agent (longest case-insensitive prefix of its product token), with
  ``*`` as the fallback (RFC 9309 §2.2.1);
- **Allow + Disallow with longest-match precedence**: the rule whose
  pattern has the most octets wins; on a tie Allow wins; no matching
  rule means allowed (RFC 9309 §2.2.2);
- **wildcards**: ``*`` matches any octet sequence, ``$`` anchors the
  end of the path (RFC 9309 §2.2.3 "Special Characters");
- workers fetch each host's file ONCE and LRU-cache the parsed groups
  (the "robots cache" every production crawler carries); disallowed
  URLs are rejected at frontier ADMISSION, so they can never be
  fetched;
- ``Crawl-delay: k`` (the de-facto extension RFC 9309 §2.2.4 permits
  as "other records") maps to a token-bucket rate: the per-host wave
  budget is ``host_budget >> k`` (tokens refill each epoch, bucket
  capacity = one epoch's refill) — the discrete-epoch form of
  requests-per-second throttling.

Matching is over raw octets of the URL path (the synthetic web is
ASCII; percent-encoding normalization is the URL normalizer's job,
functions/urlnorm.py, which runs before admission). Everything is a
pure function of (seed, host), so the engine's distributed admission
and the serial oracle agree exactly — robots decisions are part of
the trace-equality gate (tests/test_robots.py).
"""

from __future__ import annotations

import hashlib
import re
from collections import OrderedDict
from dataclasses import dataclass

#: The engine's product token (RFC 9309 §2.2.1) — what specific
#: ``User-agent:`` lines are matched against.
DEFAULT_UA = "graftbot"


def synth_robots_txt(host: str, seed: int) -> str:
    """The synthetic web's robots.txt for ``host`` — a pure function of
    (seed, host). Tiers (disjoint by the d[0] % 10 band so every form
    occurs across hosts): ~30% prefix-disallow 1-2 paths, ~20% use the
    RFC 9309 special characters (a ``*…$`` suffix disallow plus a
    prefix ``Allow`` carve-out whose precedence is decided by
    longest-match), ~25% declare a crawl delay, and ~20% publish a
    specific ``User-agent: graftbot`` group that OVERRIDES the ``*``
    group for this crawler (RFC: one group applies, not a union)."""
    d = hashlib.sha256(f"{seed}|robots|{host}".encode()).digest()
    lines = ["User-agent: *"]
    if d[0] % 10 < 3:
        for i in range(1 + d[1] % 2):
            lines.append(f"Disallow: /p/{d[2 + i] % 10}")
    elif d[0] % 10 < 5:
        lines.append(f"Disallow: /p/*{d[6] % 10}$")
        lines.append(f"Allow: /p/{d[7] % 10}")
    if d[4] % 4 == 0:
        lines.append(f"Crawl-delay: {1 + d[5] % 2}")
    if d[8] % 5 == 0:
        lines.append("")
        lines.append(f"User-agent: {DEFAULT_UA}")
        lines.append(f"Disallow: /p/{d[9] % 10}")
        if d[10] % 2 == 0:
            lines.append(f"Crawl-delay: {1 + d[11] % 3}")
    return "\n".join(lines)


@dataclass(frozen=True)
class RobotsRules:
    """The single RFC 9309 group selected for one crawler: ordered
    (is_allow, pattern) rules plus the group's crawl delay."""

    rules: tuple  # ((is_allow: bool, pattern: str), ...)
    crawl_delay: int  # 0 = unthrottled; budget divider is 2**crawl_delay

    @property
    def disallow_prefixes(self) -> tuple:
        """Legacy diagnostic view: the Disallow patterns."""
        return tuple(p for allow, p in self.rules if not allow)

    def allowed(self, path: str) -> bool:
        """RFC 9309 §2.2.2 longest-match precedence: among matching
        rules the longest pattern (most octets) wins; Allow wins
        ties; no match → allowed."""
        best_len = -1
        best_allow = True
        for is_allow, pattern in self.rules:
            if len(pattern) < best_len or (len(pattern) == best_len and not is_allow):
                continue  # cannot change the verdict
            if _pattern_matches(pattern, path):
                best_len = len(pattern)
                best_allow = is_allow
        return True if best_len < 0 else best_allow


_PATTERN_CACHE: dict[str, re.Pattern] = {}


def _pattern_matches(pattern: str, path: str) -> bool:
    """RFC 9309 §2.2.3: ``*`` matches any octet sequence, a trailing
    ``$`` anchors the end of the path; otherwise the pattern matches
    any path it prefixes. Plain prefixes take the fast path."""
    if "*" not in pattern and not pattern.endswith("$"):
        return path.startswith(pattern)
    rx = _PATTERN_CACHE.get(pattern)
    if rx is None:
        pat = pattern
        anchored = pat.endswith("$")
        if anchored:
            pat = pat[:-1]
        parts = [re.escape(p) for p in pat.split("*")]
        rx = re.compile("(?s)" + ".*".join(parts) + (r"\Z" if anchored else ""))
        if len(_PATTERN_CACHE) > 4096:
            _PATTERN_CACHE.clear()
        _PATTERN_CACHE[pattern] = rx
    return rx.match(path) is not None


def parse_robots_groups(txt: str):
    """Parse robots.txt into RFC 9309 groups:
    ``[(agents, rules, crawl_delay), ...]`` where ``agents`` are
    lowercased product tokens, ``rules`` are ordered
    ``(is_allow, pattern)`` pairs, and rules before any ``User-agent``
    line are ignored (they belong to no group, §2.2.1). Consecutive
    ``User-agent`` lines share one group; an empty Allow/Disallow
    value is no rule."""
    groups: list[tuple[list, list, list]] = []
    current: tuple[list, list, list] | None = None
    in_agents = False
    for raw in txt.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            if not in_agents:
                current = ([], [], [0])
                groups.append(current)
                in_agents = True
            current[0].append(val.lower())
            continue
        in_agents = False
        if current is None:
            continue  # rule outside any group: ignored per RFC
        if key in ("allow", "disallow"):
            if val:
                current[1].append((key == "allow", val))
        elif key == "crawl-delay" and val.isdigit():
            current[2][0] = int(val)
    return [
        (tuple(agents), tuple(rules), delay[0])
        for agents, rules, delay in groups
    ]


def select_group(groups, ua: str = DEFAULT_UA) -> RobotsRules:
    """RFC 9309 §2.2.1 group selection: the group whose agent token is
    the LONGEST case-insensitive prefix of the crawler's product token
    wins; ``*`` groups apply only when no specific group matches. If
    several groups name the same agent their rules merge (the RFC's
    "combine into one group" clause)."""
    ua = ua.lower()
    best_len = -1
    chosen_rules: list = []
    chosen_delay = 0
    for agents, rules, delay in groups:
        score = -1
        for agent in agents:
            if agent == "*":
                score = max(score, 0)
            elif ua.startswith(agent):
                score = max(score, len(agent))
        if score < 0:
            continue
        if score > best_len:
            best_len = score
            chosen_rules = list(rules)
            chosen_delay = delay
        elif score == best_len:
            chosen_rules.extend(rules)
            chosen_delay = max(chosen_delay, delay)
    return RobotsRules(tuple(chosen_rules), chosen_delay)


def parse_robots_txt(txt: str, ua: str = DEFAULT_UA) -> RobotsRules:
    """Parse + select: the one RFC 9309 group this crawler obeys."""
    return select_group(parse_robots_groups(txt), ua)


def _path_of(url: str) -> str:
    rest = url.split("://", 1)[-1]
    slash = rest.find("/")
    return rest[slash:] if slash >= 0 else "/"


class RobotsCache:
    """Per-worker robots cache: host → selected rules, fetched once and
    LRU-capped. The ``fetch`` seam is the synthetic web here; a real
    deployment swaps in an HTTP GET of ``/robots.txt``."""

    def __init__(self, seed: int, cache_size: int = 65536, ua: str = DEFAULT_UA):
        self.seed = seed
        self.ua = ua
        self.cache: OrderedDict[str, RobotsRules] = OrderedDict()
        self.cache_size = cache_size
        self.n_fetches = 0

    def rules(self, host: str) -> RobotsRules:
        r = self.cache.get(host)
        if r is not None:
            self.cache.move_to_end(host)
            return r
        r = parse_robots_txt(synth_robots_txt(host, self.seed), self.ua)
        self.n_fetches += 1
        self.cache[host] = r
        if len(self.cache) > self.cache_size:
            self.cache.popitem(last=False)
        return r

    def disallowed(self, url: str, host: str) -> bool:
        rules = self.rules(host)
        if not rules.rules:
            return False
        return not rules.allowed(_path_of(url))

    def host_budget(self, host: str, base_budget: int) -> int:
        """Token-bucket epoch budget: base budget divided by
        2**crawl_delay, floor 1."""
        return max(1, base_budget >> self.rules(host).crawl_delay)
