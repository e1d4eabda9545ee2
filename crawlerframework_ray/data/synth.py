"""Deterministic synthetic web — the fetch oracle.

Replaces the network for both engines (SURVEY.md §7.0): the Ray engine's
fetcher actors and the single-process reference oracle both "fetch" by
calling the same pure function ``page_record(url, cfg)``, derived from
``sha256(seed|url)``. Same url + seed ⇒ identical image bytes, caption,
phash and outlinks on every node — this is what makes the per-row
invariant (decoded-pixel PSNR, caption equality) and the crawl-trace
equality gate well-defined with zero network.

The URL universe is ``http://h{H}.example.test/p/{P}`` with host ids
Zipf-ish skewed (quadratic transform) so a few hosts dominate — this
exercises the politeness caps and host-salting paths, mirroring the
reference's per-site caps (crawler.cfg:26-185).

The web is *infinite*: any url has a well-defined page. A 10^10-URL
frontier needs no stored page table; small parquet snapshots for the
duckdb-oracle checks are materialized with ``pages_table``.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from . import codecs
from .imageops import average_hash
from .schemas import PAGES_SCHEMA

# 64-word deterministic caption vocabulary.
WORDS = (
    "amber basalt cedar delta ember fjord garnet harbor iris juniper "
    "krill lotus marble nectar onyx prism quartz raven sable tundra "
    "umber violet willow xenon yarrow zephyr anchor beacon cobalt drift "
    "echo flint grove hollow ingot jasper kelp lumen mesa nimbus orchid "
    "pine quill reef slate thorn vale wren apex bluff crest dune eyrie "
    "forge glade heath inlet knoll ledge moor notch outcrop pass ridge"
).split()

EPOCH_BASE_US = 1_577_836_800_000_000  # 2020-01-01T00:00:00Z in microseconds


@dataclass(frozen=True)
class SynthWebConfig:
    """Pure-function parameters of the synthetic web. Hashable/broadcastable."""

    seed: int = 42
    n_hosts: int = 32
    path_space: int = 2048          # distinct paths per web
    max_outlinks: int = 6
    size_shift: int = 0             # image dims 8<<(k+shift): 0 → 8-32 px, 2 → 32-128 px
    # content drift between crawls (update-mode testing): a nonzero
    # drift_permille re-seeds ~that fraction of pages (content AND
    # outlinks) chosen by a stable per-url hash of drift_salt — the
    # rest of the web is byte-identical to drift=(0,0)
    drift_salt: int = 0
    drift_permille: int = 0
    formats: tuple = field(default=codecs.FORMATS)

    def as_dict(self) -> dict:
        return {
            "seed": self.seed,
            "n_hosts": self.n_hosts,
            "path_space": self.path_space,
            "max_outlinks": self.max_outlinks,
            "size_shift": self.size_shift,
            "drift_salt": self.drift_salt,
            "drift_permille": self.drift_permille,
        }


def make_url(host_id: int, path_id: int) -> str:
    return f"http://h{host_id}.example.test/p/{path_id}"


def host_of(url: str) -> str:
    # fast path for canonical synthetic urls: scheme://host/...
    rest = url.split("://", 1)[-1]
    return rest.split("/", 1)[0].split(":", 1)[0].lower()


def _skewed_host(u16: int, n_hosts: int) -> int:
    """Map a uniform 16-bit value to a host id with quadratic skew
    (host 0 is ~hottest) — the skew that politeness salting must absorb."""
    frac = u16 / 65536.0
    return int(n_hosts * frac * frac) % n_hosts


def _parse_ids(url: str) -> tuple[int, int]:
    """(host_id, path_id) for canonical synthetic urls; (-1, hash) otherwise."""
    try:
        host, _, path = url.split("://", 1)[1].partition("/")
        hid = int(host.split(".", 1)[0][1:])
        pid = int(path.rsplit("/", 1)[-1])
        return hid, pid
    except (ValueError, IndexError):
        d = hashlib.sha256(url.encode()).digest()
        return -1, int.from_bytes(d[:4], "little")


def _digest(url: str, seed: int) -> bytes:
    return hashlib.sha256(f"{seed}|{url}".encode()).digest()


def effective_seed(url: str, cfg: SynthWebConfig) -> int:
    """The page's content seed under drift: a stable per-url coin
    (independent of the content digest) flips ~drift_permille/1000 of
    pages to a drift-salted seed. Pure function — shared by engine and
    oracle, so both sides see the identical drifted web."""
    if cfg.drift_permille:
        hd = hashlib.sha256(f"drift|{cfg.drift_salt}|{url}".encode()).digest()
        if int.from_bytes(hd[:2], "little") % 1000 < cfg.drift_permille:
            return cfg.seed ^ ((0x9E3779B9 * (cfg.drift_salt or 1)) & 0x7FFFFFFF)
    return cfg.seed


def page_record(url: str, cfg: SynthWebConfig) -> dict:
    """The pure fetch function: url → full page row (PAGES_SCHEMA fields)."""
    d = _digest(url, effective_seed(url, cfg))
    w = 8 << (d[0] % 3 + cfg.size_shift)  # default 8/16/32 px
    h = 8 << (d[1] % 3 + cfg.size_shift)
    fmt = cfg.formats[d[2] % len(cfg.formats)]

    rng = np.random.Generator(np.random.PCG64(int.from_bytes(d[8:16], "little")))
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    data = codecs.encode(img, fmt)
    # phash of the *stored* (possibly lossy-roundtripped) image so that a
    # consumer recomputing from `bytes` gets bit-equal phash.
    phash = average_hash(codecs.decode(data, fmt))

    n_words = 4 + d[3] % 5
    caption = " ".join(
        WORDS[int.from_bytes(d[4 + 2 * i : 6 + 2 * i], "little") % len(WORDS)]
        for i in range(n_words)
    )

    host_id, path_id = _parse_ids(url)
    outlinks = _outlinks(url, d, cfg)
    posted_ts = EPOCH_BASE_US + (path_id % cfg.path_space) * 7_919_000_000 + abs(host_id) * 13_000_000

    return {
        "url": url,
        "host": host_of(url),
        "image_id": d[:8].hex(),
        "bytes": data,
        "w": int(w),
        "h": int(h),
        "fmt": fmt,
        "caption": caption,
        "phash": int(phash),
        "outlinks": outlinks,
        "posted_ts": int(posted_ts),
    }


def _outlinks(url: str, d: bytes, cfg: SynthWebConfig) -> list[str]:
    """Deterministic outlinks: absolute same-host / cross-host (skewed),
    root-relative, dot-relative, self and duplicate links — exercising
    url normalization (M1), self-link removal (D2) and in-batch dedup
    (D3) exactly as the reference's link extractor sees them
    (crawler/connectors/htmlconnector.py:182-217)."""
    k = d[20] % (cfg.max_outlinks + 1)
    links: list[str] = []
    for i in range(k):
        ld = hashlib.sha256(d[:16] + bytes([i])).digest()
        kind = ld[0] % 10
        pid = int.from_bytes(ld[1:4], "little") % cfg.path_space
        if kind == 0:
            links.append(url)  # self link
        elif kind == 1:
            links.append(f"../p/{pid}")  # dot-relative
        elif kind == 2:
            links.append(f"/p/{pid}")  # root-relative
        elif kind in (3, 4, 5):
            hid = _skewed_host(int.from_bytes(ld[4:6], "little"), cfg.n_hosts)
            links.append(make_url(hid, pid))  # cross-host absolute
        elif kind == 9 and links:
            links.append(links[0])  # duplicate
        else:
            links.append(make_url(_parse_ids(url)[0] % max(cfg.n_hosts, 1), pid))
    return links


def n_parts_of(url: str, cfg: SynthWebConfig) -> int:
    """~25% of pages are multi-part articles of 2-4 pages (the
    reference's pagination: a thread/article continues over 'next'
    pages, crawler/connectors/baseconnector.py:1255-1401)."""
    d = _digest(url, effective_seed(url, cfg))
    return 1 + d[6] % 4 if d[6] % 8 < 2 else 1


def fetch_stitched(url: str, cfg: SynthWebConfig, max_parts: int = 5) -> tuple[dict, int]:
    """Pagination stitcher (operator M7): fetch the page; when it is
    multi-part, walk continuation pages (cap ``max_parts``, reference
    cap 5 at htmlconnector.py:98) and concatenate their captions.
    Outlinks/image/phash stay those of the first page. Returns
    (page_record_like_dict, pages_fetched). Shared verbatim by the
    engine fetcher and the serial oracle so the stitched caption is the
    per-row invariant on multi-part pages too."""
    rec = page_record(url, cfg)
    parts = min(n_parts_of(url, cfg), max_parts)
    if parts > 1:
        caps = [rec["caption"]]
        for k in range(2, parts + 1):
            caps.append(page_record(f"{url}?part={k}", cfg)["caption"])
        rec = dict(rec)
        rec["caption"] = " ".join(caps)
    return rec, parts


def pages_for_urls(urls, cfg: SynthWebConfig) -> pa.Table:
    """Vectorized-ish batch fetch: list of urls → PAGES_SCHEMA table."""
    recs = [page_record(u, cfg) for u in urls]
    cols = {name: [r[name] for r in recs] for name in PAGES_SCHEMA.names}
    cols["posted_ts"] = pa.array(cols["posted_ts"], type=pa.timestamp("us"))
    return pa.table(cols, schema=PAGES_SCHEMA)


def seed_urls(cfg: SynthWebConfig, n_seeds: int) -> list[str]:
    """Deterministic seed list: spread across hosts (round-robin with a
    skew toward low host ids, matching where the synthetic web's mass is)."""
    out = []
    for i in range(n_seeds):
        sd = hashlib.sha256(f"{cfg.seed}|seed|{i}".encode()).digest()
        hid = _skewed_host(int.from_bytes(sd[0:2], "little"), cfg.n_hosts)
        pid = int.from_bytes(sd[2:5], "little") % cfg.path_space
        out.append(make_url(hid, pid))
    # dedup preserving order (seed lists in the reference are unique per
    # task_identifier — taskmanager.py:363-383)
    seen: set[str] = set()
    uniq = []
    for u in out:
        if u not in seen:
            seen.add(u)
            uniq.append(u)
    return uniq


def seeds_table(cfg: SynthWebConfig, n_seeds: int) -> pa.Table:
    """FIXTURES.md F2: seed frontier rows with priority/score mix."""
    urls = seed_urls(cfg, n_seeds)
    rows = {"url": [], "host": [], "depth": [], "priority": [], "score": []}
    for u in urls:
        sd = _digest(u, cfg.seed ^ 0x5EED)
        rows["url"].append(u)
        rows["host"].append(host_of(u))
        rows["depth"].append(0)
        # mostly scheduled (97), ~1/8 on-demand (1) — reference formula
        # priority = 96/frequency + 1 (taskmanager.py:156-163)
        rows["priority"].append(1 if sd[0] % 8 == 0 else 97)
        rows["score"].append(int.from_bytes(sd[1:4], "little") / 0x1000000)
    return pa.table(
        {
            "url": pa.array(rows["url"], pa.string()),
            "host": pa.array(rows["host"], pa.string()),
            "depth": pa.array(rows["depth"], pa.int32()),
            "priority": pa.array(rows["priority"], pa.int32()),
            "score": pa.array(rows["score"], pa.float32()),
        }
    )


# ---- deterministic fetch-failure model (engine failures=True) --------
#
# The reference's fetch path wraps urllib2 GET in retry loops
# (crawler/connectors/baseconnector.py fetch retries); the synthetic
# web's failure model makes that semantics testable and exactly
# mirrorable by the serial oracle:
#
# - ~3% of URLs are PERMANENTLY gone ("gone", an HTTP 404/410 class):
#   never retried, never in results.
# - ~10% are TRANSIENTLY failing ("retry", a 429/503 class) — but only
#   in epochs matching the URL's failure-phase residue, so a requeued
#   URL deterministically SUCCEEDS on its next selection (no attempt
#   counter needed anywhere: the retry window has passed by
#   construction). Phase period 4.
# - everything else fetches "ok".
#
# Pure function of (url, epoch, seed): the engine's distributed fetch
# tasks and the serial oracle agree exactly.

FAIL_PHASE_PERIOD = 4


def fetch_status_of(url: str, epoch: int, seed: int) -> str:
    d = _digest(url, seed ^ 0xFA11)
    b = d[0] % 100
    if b < 3:
        return "gone"
    if b < 13 and d[1] % FAIL_PHASE_PERIOD == epoch % FAIL_PHASE_PERIOD:
        return "retry"
    return "ok"
