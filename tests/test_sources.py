"""Source/rules/parse/streaming operator tests (S4/S6/S9, J6, M2, M7, M12)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pytest

from crawlerframework_ray.data.synth import SynthWebConfig, fetch_stitched, n_parts_of, make_url


# ---------------------------------------------------------------- M7

def test_pagination_stitcher_caps_and_stitches():
    cfg = SynthWebConfig(seed=3, n_hosts=8, path_space=4096)
    multi = single = None
    for pid in range(300):
        u = make_url(pid % 8, pid)
        k = n_parts_of(u, cfg)
        if k > 1 and multi is None:
            multi = u
        if k == 1 and single is None:
            single = u
        if multi and single:
            break
    assert multi and single
    rec_m, parts_m = fetch_stitched(multi, cfg)
    rec_s, parts_s = fetch_stitched(single, cfg)
    assert parts_s == 1
    assert 2 <= parts_m <= 5
    # stitched caption = base caption followed by continuation captions
    from crawlerframework_ray.data.synth import page_record

    base = page_record(multi, cfg)
    assert rec_m["caption"].startswith(base["caption"] + " ")
    assert len(rec_m["caption"]) > len(base["caption"])
    assert rec_m["bytes"] == base["bytes"]  # image stays part 1
    assert rec_s["caption"] == page_record(single, cfg)["caption"]


# ---------------------------------------------------------------- M2 dispatch

def test_parser_registry_longest_suffix_dispatch():
    from crawlerframework_ray.stages.parse import DEFAULT_PLUGINS, ParserRegistry

    reg = ParserRegistry(DEFAULT_PLUGINS)
    assert reg.match("h0.example.test").name == "forum"
    assert reg.match("h1.example.test").name == "forum"
    assert reg.match("h5.example.test").name == "news"  # broader suffix
    assert reg.match("other.host").name == "generic"


def test_parser_registry_batch_dispatch_and_entities():
    from crawlerframework_ray.stages.parse import ParserRegistry

    batch = pa.table(
        {
            "host": ["h0.example.test", "h5.example.test", "zzz"],
            "caption": ["alpha beta gamma", "hello world", "x"],
            "posted_ts": pa.array([1, 2, 3], pa.timestamp("us")),
        }
    )
    out = ParserRegistry()(batch)
    df = out.to_pandas().set_index("host")
    assert df.loc["h0.example.test", "entity"] == "post"
    assert df.loc["h5.example.test", "entity"] == "article"
    assert df.loc["zzz", "entity"] == "page"
    ents = dict(df.loc["h0.example.test", "entities"])
    assert ents["ei_word_count"] == "3" and ents["et_first_word"] == "alpha"


# ---------------------------------------------------------------- M12 rules

def test_rules_stage_semantics():
    from crawlerframework_ray.functions.rules import Rule, RulesStage

    rules = [
        Rule("keyword", "data", "add_tag", "analytics"),
        Rule("keyword", "spam", "drop", ""),
        Rule("lang_is", "zh", "add_tag", "zh-doc"),
        Rule("keyword", "hot", "set_relevancy", "0.9"),
    ]
    stage = RulesStage(rules, text_column="text", lang_column="lang")
    batch = pa.table(
        {
            "text": ["data rules", "spam data", "hot data topic", "nothing"],
            "lang": ["en", "en", "zh", "zh"],
        }
    )
    out = stage(batch).to_pandas()
    assert len(out) == 3  # spam row dropped
    assert out.iloc[0]["tags"] == "analytics"
    assert out.iloc[1]["tags"] == "analytics zh-doc"  # sorted
    assert out.iloc[1]["relevancy"] == 0.9
    assert out.iloc[2]["tags"] == "zh-doc"


# ---------------------------------------------------------------- S9/J6 csv

def test_csv_source_paths(ray_session, tmp_path):
    from crawlerframework_ray.sources.csvsource import export_events_csv, read_csv_with_paths

    csv_dir = export_events_csv("/root/testdata/sf0.001", str(tmp_path / "csv"))
    df = read_csv_with_paths(csv_dir).to_pandas().set_index("id").sort_index()
    assert df.loc[0, "parent_id"] == -1 and df.loc[0, "path"] == "0"
    assert df.loc[7, "parent_id"] == 0 and df.loc[7, "path"] == "0.7"
    assert df.loc[7, "parent_label"] == df.loc[0, "label"]
    assert pd.isna(df.loc[0, "parent_label"])


# ---------------------------------------------------------------- S6 stream

def test_microbatch_chain_equals_batch(ray_session):
    from crawlerframework_ray.pipelines.streaming import micro_batch_chain, stream_result_frame

    chained = stream_result_frame(micro_batch_chain("/root/testdata/sf0.001", batch_rows=50))
    oneshot = stream_result_frame(micro_batch_chain("/root/testdata/sf0.001", batch_rows=10**9))
    pd.testing.assert_frame_equal(chained, oneshot)
    assert chained["watermark_us"].iloc[0] > 0


def test_microbatch_chain_watermark_monotone(ray_session):
    from crawlerframework_ray.pipelines.streaming import micro_batch_chain

    s1 = micro_batch_chain("/root/testdata/sf0.001", batch_rows=100, max_batches=3)
    s2 = micro_batch_chain("/root/testdata/sf0.001", batch_rows=100, max_batches=6)
    assert s2.watermark_us >= s1.watermark_us
    assert s1.n_batches == 3 and s2.n_batches == 6


# ---------------------------------------------------------------- S4 seeder

def test_search_seeder_deterministic_and_unique():
    from crawlerframework_ray.sources.seeder import seeds_from_queryterms, serp_urls

    cfg = SynthWebConfig(seed=42, n_hosts=32, path_space=4096)
    a = serp_urls("amber", cfg, 10)
    b = serp_urls("amber", cfg, 10)
    assert a == b and len(set(a)) == len(a)
    assert serp_urls("basalt", cfg, 10) != a
    t = seeds_from_queryterms(["amber", "basalt"], cfg, n_results=10)
    urls = t.column("url").to_pylist()
    assert len(set(urls)) == len(urls)
    assert set(t.column("priority").to_pylist()) == {1}


def test_search_seeds_feed_the_engine(ray_session, tmp_path):
    from crawlerframework_ray.config import CrawlConfig
    from crawlerframework_ray.pipelines.crawl import CrawlEngine
    from crawlerframework_ray.sources.seeder import seeds_from_queryterms

    web = SynthWebConfig(seed=5, n_hosts=8, path_space=64, max_outlinks=3)
    seeds = seeds_from_queryterms(["amber"], web, n_results=8)
    cfg = CrawlConfig(
        web=web, workdir=str(tmp_path / "w"), max_depth=1, wave_size=16,
        host_budget=8, n_shards=2, shard_capacity=1 << 12, max_epochs=2,
        fetch_batch_size=16,
    )
    s = CrawlEngine(cfg).run(seeds=seeds.drop_columns(["queryterm"]))
    assert s.fetched_urls > 0


def test_sitemap_build_parse_roundtrip():
    from crawlerframework_ray.sources.sitemap import build_sitemap_xml, parse_sitemap

    entries = [
        {"loc": "http://h3.example.test/p/7", "lastmod": "2024-01-05",
         "changefreq": "daily", "priority": "0.7"},
        {"loc": "http://h3.example.test/p/9", "lastmod": "2023-12-31",
         "changefreq": "yearly", "priority": "1.0"},
    ]
    xml = build_sitemap_xml("h3.example.test", entries)
    assert "http://www.sitemaps.org/schemas/sitemap/0.9" in xml
    out = parse_sitemap(xml)
    assert [e["loc"] for e in out] == [e["loc"] for e in entries]
    assert [e["lastmod"] for e in out] == ["2024-01-05", "2023-12-31"]
    assert [e["priority_milli"] for e in out] == [700, 1000]
    assert [e["changefreq"] for e in out] == ["daily", "yearly"]


def test_sitemap_priority_parse_is_exact_string_math():
    from crawlerframework_ray.sources.sitemap import build_sitemap_xml, parse_sitemap

    for d in range(1, 11):
        p = "1.0" if d == 10 else f"0.{d}"
        xml = build_sitemap_xml(
            "h0.example.test",
            [{"loc": "http://h0.example.test/p/1", "lastmod": "2024-01-01",
              "changefreq": "daily", "priority": p}],
        )
        assert parse_sitemap(xml)[0]["priority_milli"] == d * 100


def test_sitemap_parse_rejects_malformed_priority():
    import pytest as _pytest

    from crawlerframework_ray.sources.sitemap import build_sitemap_xml, parse_sitemap

    xml = build_sitemap_xml(
        "h0.example.test",
        [{"loc": "http://h0.example.test/p/1", "lastmod": "2024-01-01",
          "changefreq": "daily", "priority": "0.55"}],
    )
    with _pytest.raises(ValueError):
        parse_sitemap(xml)


def test_sitemap_index_round_trip():
    from crawlerframework_ray.sources.sitemap import (
        build_sitemap_index_xml,
        build_sitemap_xml,
        parse_sitemap_index,
    )

    entries = [
        {"loc": "http://h0.example.test/sitemap-0.xml", "lastmod": "2024-01-03"},
        {"loc": "http://h0.example.test/sitemap-1.xml", "lastmod": "2024-02-07"},
    ]
    xml = build_sitemap_index_xml(entries)
    assert parse_sitemap_index(xml) == entries


def test_sitemap_index_rejects_urlset():
    import pytest

    from crawlerframework_ray.sources.sitemap import (
        build_sitemap_xml,
        parse_sitemap_index,
    )

    urlset = build_sitemap_xml(
        "h0.example.test",
        [{"loc": "http://h0.example.test/p/1", "lastmod": "2024-01-01",
          "changefreq": "daily", "priority": "0.5"}],
    )
    with pytest.raises(ValueError, match="not a sitemapindex"):
        parse_sitemap_index(urlset)


def test_sitemap_seeded_engine_crawl(ray_session, tmp_path):
    """S4b → T2 integration: the engine seeded straight from PARSED
    sitemap documents (priority milli mapped onto the frontier's
    priority key, highest priority first) reproduces the serial
    oracle's trace on the same seed rows — the sitemap protocol feeds
    the real frontier, not just the catalog query."""
    import pyarrow as pa

    from crawlerframework_ray.config import CrawlConfig
    from crawlerframework_ray.data.synth import SynthWebConfig, host_of, seed_urls
    from crawlerframework_ray.pipelines.crawl import CrawlEngine
    from crawlerframework_ray.pipelines.oracle import oracle_crawl
    from crawlerframework_ray.sources.sitemap import build_sitemap_xml, parse_sitemap

    web = SynthWebConfig(seed=17, n_hosts=8, path_space=96, max_outlinks=5)
    urls = seed_urls(web, 36)
    # one sitemap per host, then the consumer side parses them back
    by_host: dict[str, list] = {}
    for i, u in enumerate(urls):
        by_host.setdefault(host_of(u), []).append(
            {"loc": u, "lastmod": "2024-01-02", "changefreq": "daily",
             "priority": f"0.{1 + i % 9}"}
        )
    parsed = []
    for host, entries in sorted(by_host.items()):
        xml = build_sitemap_xml(host, entries)
        for e in parse_sitemap(xml):
            parsed.append(e)
    # sitemap priority (milli, higher = more important) → frontier
    # priority key (lower fetches first)
    seeds = pa.table(
        {
            "url": pa.array([e["loc"] for e in parsed], pa.string()),
            "host": pa.array([host_of(e["loc"]) for e in parsed], pa.string()),
            "depth": pa.array([0] * len(parsed), pa.int32()),
            "priority": pa.array(
                [1000 - e["priority_milli"] for e in parsed], pa.int32()
            ),
            "score": pa.array([0.5] * len(parsed), pa.float32()),
        }
    )
    cfg = CrawlConfig(
        web=web, workdir=str(tmp_path / "sm"), max_depth=1, wave_size=24,
        host_budget=8, n_shards=4, shard_capacity=1 << 13, max_epochs=3,
        fetch_concurrency=2, fetch_batch_size=32, record_trace=True,
    )
    summary = CrawlEngine(cfg).run(seeds=seeds)
    oracle = oracle_crawl(cfg, seeds.to_pylist())
    assert summary.trace
    assert summary.trace == oracle["trace"]
    assert summary.shard_digests == oracle["shard_digests"]
    # the sitemap priorities actually shape the wave: epoch-0 fetches
    # are the highest-priority (lowest key) seed rows
    e0 = [p for e, u, d, p in summary.trace if e == 0]
    rest = [p for e, u, d, p in summary.trace if e > 0 and d == 0]
    if rest:
        assert max(e0) <= min(rest)
