"""Search-engine seeders (operator S4, SURVEY.md §2.1).

The reference built SERP URLs from workspace query terms and parsed
result pages into frontier links (crawler/connectors/
googlesiteconnector.py:24-40 and the google/naver/daum family). The
Ray-native form: a seed *generator* — query terms → deterministic
result-url lists → frontier seed rows — expressed as
``from_items`` + ``flat_map``-style batch expansion, feeding
``CrawlEngine.run(seeds=...)`` directly.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

from ..data.synth import SynthWebConfig, _skewed_host, host_of, make_url


def serp_urls(queryterm: str, cfg: SynthWebConfig, n_results: int = 10) -> list[str]:
    """Deterministic 'search results' for a query term: the synthetic
    SERP is n_results urls drawn by hashing (term, rank) — stable
    across engines/runs like everything else in the synthetic web."""
    out = []
    for rank in range(n_results):
        d = hashlib.sha256(f"{cfg.seed}|serp|{queryterm}|{rank}".encode()).digest()
        hid = _skewed_host(int.from_bytes(d[0:2], "little"), cfg.n_hosts)
        pid = int.from_bytes(d[2:5], "little") % cfg.path_space
        out.append(make_url(hid, pid))
    seen: set[str] = set()
    uniq = []
    for u in out:
        if u not in seen:
            seen.add(u)
            uniq.append(u)
    return uniq


def seeds_from_queryterms(
    queryterms: list[str], cfg: SynthWebConfig, n_results: int = 10, priority: int = 1
) -> pa.Table:
    """Query terms → seed frontier table (on-demand priority 1, like
    the reference's crawlNow-seeded search tasks)."""
    rows = {"url": [], "host": [], "depth": [], "priority": [], "score": [], "queryterm": []}
    seen: set[str] = set()
    for term in queryterms:
        for u in serp_urls(term, cfg, n_results):
            if u in seen:
                continue
            seen.add(u)
            d = hashlib.sha256(f"{cfg.seed ^ 0x5EED}|{u}".encode()).digest()
            rows["url"].append(u)
            rows["host"].append(host_of(u))
            rows["depth"].append(0)
            rows["priority"].append(priority)
            rows["score"].append(int.from_bytes(d[1:4], "little") / 0x1000000)
            rows["queryterm"].append(term)
    return pa.table(
        {
            "url": pa.array(rows["url"], pa.string()),
            "host": pa.array(rows["host"], pa.string()),
            "depth": pa.array(rows["depth"], pa.int32()),
            "priority": pa.array(rows["priority"], pa.int32()),
            "score": pa.array(rows["score"], pa.float32()),
            "queryterm": pa.array(rows["queryterm"], pa.string()),
        }
    )
