"""Synthetic web determinism + payload invariants (FIXTURES.md F1/F2)."""

from __future__ import annotations

import numpy as np

from crawlerframework_ray.data import codecs
from crawlerframework_ray.data.imageops import average_hash, psnr
from crawlerframework_ray.data.synth import (
    SynthWebConfig,
    make_url,
    page_record,
    pages_for_urls,
    seed_urls,
    seeds_table,
)

CFG = SynthWebConfig(seed=7, n_hosts=8, path_space=64, max_outlinks=5)


def test_page_record_deterministic():
    u = make_url(2, 11)
    a, b = page_record(u, CFG), page_record(u, CFG)
    assert a == b
    c = page_record(u, SynthWebConfig(seed=8, n_hosts=8, path_space=64))
    assert c["bytes"] != a["bytes"]


def test_payload_invariants():
    for pid in range(20):
        r = page_record(make_url(pid % 4, pid), CFG)
        img = codecs.decode(r["bytes"], r["fmt"])
        assert img.shape == (r["h"], r["w"], 3)
        assert average_hash(img) == r["phash"]
        assert r["caption"] and all(w.isalpha() for w in r["caption"].split())
        assert 0 <= len(r["outlinks"]) <= CFG.max_outlinks
        # stored bytes decode within the lossy tolerance of a re-encode
        if r["fmt"] == "qds":
            again = codecs.decode(codecs.encode(img, "qds"), "qds")
            assert psnr(img, again) == float("inf") or psnr(img, again) >= 40.0


def test_pages_table_schema_and_rows():
    urls = seed_urls(CFG, 16)
    t = pages_for_urls(urls, CFG)
    assert t.num_rows == len(urls)
    assert t.column("url").to_pylist() == urls
    assert set(t.column("fmt").to_pylist()) <= set(codecs.FORMATS)


def test_seeds_table_priorities_and_scores():
    t = seeds_table(CFG, 64)
    pri = set(t.column("priority").to_pylist())
    assert pri <= {1, 97} and 97 in pri
    scores = np.array(t.column("score").to_pylist())
    assert ((scores >= 0) & (scores < 1)).all()
    urls = t.column("url").to_pylist()
    assert len(set(urls)) == len(urls)


def test_host_skew_exists():
    """A few hosts should dominate outlink targets (exercises salting)."""
    from collections import Counter

    c: Counter = Counter()
    for i in range(200):
        r = page_record(make_url(i % 8, i), CFG)
        for l in r["outlinks"]:
            if l.startswith("http://"):
                c[l.split("/")[2]] += 1
    counts = sorted(c.values(), reverse=True)
    assert counts[0] >= 3 * counts[-1]
