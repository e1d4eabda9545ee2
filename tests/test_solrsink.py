"""K3 Solr-sink analogue: index commit / pruned query / boolean
filter. The pruning test is the load-bearing one — it PROVES the
query touches only the buckets its terms hash into, by corrupting
every other bucket and requiring the query to still succeed."""

from __future__ import annotations

import glob
import os

import pandas as pd
import pytest
import ray.data

from crawlerframework_ray.sources.solrsink import (
    DICT_DIR,
    POSTINGS_DIR,
    boolean_and,
    commit_index,
    load_manifest,
    search_topk,
    term_bucket,
    term_dfs,
)

SF = "/root/testdata/sf0.001"
QUERIES = [(0, ["dup", "merge"]), (1, ["vector", "hash", "join"])]


@pytest.fixture(scope="module")
def index_dir(ray_session, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("solr-idx"))
    ds = ray.data.read_parquet(
        os.path.join(SF, "documents.parquet"),
        columns=["doc_id", "text", "lang", "source"],
    )
    commit_index(ds, out, n_buckets=8, stored_columns=("lang", "source"))
    return out


def _docs() -> pd.DataFrame:
    return pd.read_parquet(os.path.join(SF, "documents.parquet"))


def test_manifest_counts(index_dir):
    man = load_manifest(index_dir)
    docs = _docs()
    assert man["n_docs"] == len(docs)
    assert man["total_len"] == int(docs["text"].str.split(" ").str.len().sum())


def test_uncommitted_index_refused(tmp_path):
    with pytest.raises(FileNotFoundError, match="manifest"):
        load_manifest(str(tmp_path))


def test_dictionary_df_exact(index_dir):
    docs = _docs()
    terms = ["dup", "merge", "vector", "zzz-not-a-term"]
    want = {
        t: int(docs["text"].str.split(" ").map(lambda xs, t=t: t in xs).sum())
        for t in terms
    }
    assert term_dfs(index_dir, terms) == want


def test_search_matches_scan_path(ray_session, index_dir):
    from crawlerframework_ray.stages.retrieval import bm25_topk

    ds = ray.data.read_parquet(
        os.path.join(SF, "documents.parquet"), columns=["doc_id", "text"]
    )
    scan = bm25_topk(ds, QUERIES, k=10).reset_index(drop=True)
    idx = search_topk(index_dir, QUERIES, k=10).reset_index(drop=True)
    pd.testing.assert_frame_equal(scan, idx)


def test_query_reads_only_needed_buckets(index_dir):
    """Corrupt every postings/dictionary bucket the query terms do NOT
    hash into; the query must still answer (bit-identically). If the
    engine read a corrupted bucket, parquet decode would raise."""
    man = load_manifest(index_dir)
    needed = {term_bucket(t, man["n_buckets"]) for _, ts in QUERIES for t in ts}
    assert len(needed) < man["n_buckets"], "test needs at least one unqueried bucket"
    before = search_topk(index_dir, QUERIES, k=10)
    corrupted = 0
    for sub in (POSTINGS_DIR, DICT_DIR):
        for b in range(man["n_buckets"]):
            if b in needed:
                continue
            for f in glob.glob(os.path.join(index_dir, sub, f"bucket={b}", "*.parquet")):
                with open(f, "wb") as fh:
                    fh.write(b"\x00not parquet\x00")
                corrupted += 1
    assert corrupted > 0
    after = search_topk(index_dir, QUERIES, k=10)
    pd.testing.assert_frame_equal(before, after)
    # and reading a corrupted bucket's term DOES fail — the corruption is real
    bad_bucket = next(b for b in range(man["n_buckets"]) if b not in needed)
    bad_term = next(
        f"t{i}" for i in range(10_000)
        if term_bucket(f"t{i}", man["n_buckets"]) == bad_bucket
    )
    with pytest.raises(Exception):
        term_dfs(index_dir, [bad_term])


def test_coalesced_commit_identical_and_fewer_files(ray_session, tmp_path):
    """coalesce=True must change only the FILE LAYOUT (≈1 file per
    bucket instead of blocks×buckets), never the query answers."""
    ds = ray.data.read_parquet(
        os.path.join(SF, "documents.parquet"), columns=["doc_id", "text"]
    ).repartition(6)
    plain, packed = str(tmp_path / "plain"), str(tmp_path / "packed")
    commit_index(ds, plain, n_buckets=8, batch_size=100)
    commit_index(ds, packed, n_buckets=8, coalesce=True, batch_size=100)
    pd.testing.assert_frame_equal(
        search_topk(plain, QUERIES, k=10), search_topk(packed, QUERIES, k=10)
    )
    n_plain = len(glob.glob(os.path.join(plain, POSTINGS_DIR, "**", "*.parquet")))
    n_packed = len(glob.glob(os.path.join(packed, POSTINGS_DIR, "**", "*.parquet")))
    assert n_packed <= 8 < n_plain, (n_packed, n_plain)


def test_boolean_and_matches_pandas(ray_session, tmp_path):
    # fresh index (the shared one is corrupted by the pruning test)
    out = str(tmp_path / "idx")
    ds = ray.data.read_parquet(
        os.path.join(SF, "documents.parquet"),
        columns=["doc_id", "text", "lang", "source"],
    )
    commit_index(ds, out, n_buckets=8, stored_columns=("lang", "source"))
    got = (
        boolean_and(out, ["dup", "merge"], ["lang", "source"])
        .to_pandas()
        .sort_values("doc_id", kind="mergesort")
        .reset_index(drop=True)
        .astype({"doc_id": "int64"})
    )
    docs = _docs()
    toks = docs["text"].str.split(" ").map(set)
    mask = toks.map(lambda s: "dup" in s and "merge" in s)
    want = (
        docs.loc[mask, ["doc_id", "lang", "source"]]
        .sort_values("doc_id", kind="mergesort")
        .reset_index(drop=True)
        .astype({"doc_id": "int64"})
    )
    pd.testing.assert_frame_equal(got[["doc_id", "lang", "source"]], want)


def test_merge_matches_single_build(ray_session, index_dir, tmp_path):
    """Split → per-half commit → merge must reproduce the single-build
    index exactly: identical manifests, identical dictionary dfs,
    identical search results."""
    from crawlerframework_ray.sources.solrsink import merge_indexes

    ds = ray.data.read_parquet(
        os.path.join(SF, "documents.parquet"),
        columns=["doc_id", "text", "lang", "source"],
    )
    lo = ds.map_batches(lambda df: df[df["doc_id"] < 250], batch_format="pandas")
    hi = ds.map_batches(lambda df: df[df["doc_id"] >= 250], batch_format="pandas")
    commit_index(lo, str(tmp_path / "lo"), n_buckets=8, stored_columns=("lang", "source"))
    commit_index(hi, str(tmp_path / "hi"), n_buckets=8, stored_columns=("lang", "source"))
    man = merge_indexes([str(tmp_path / "lo"), str(tmp_path / "hi")], str(tmp_path / "m"))

    assert man == load_manifest(index_dir)
    terms = ["dup", "merge", "vector", "hash", "join"]
    assert term_dfs(str(tmp_path / "m"), terms) == term_dfs(index_dir, terms)
    merged = search_topk(str(tmp_path / "m"), QUERIES, k=10)
    single = search_topk(index_dir, QUERIES, k=10)
    pd.testing.assert_frame_equal(merged, single)


def test_merge_rejects_duplicate_doc_ids(ray_session, index_dir, tmp_path):
    """Overlapping doc-id sets must fail loudly at merge time (the
    id-bucketed doc store co-locates any cross-segment duplicate)."""
    from crawlerframework_ray.sources.solrsink import merge_indexes

    with pytest.raises((ValueError, ray.exceptions.RayTaskError)):
        merge_indexes([index_dir, index_dir], str(tmp_path / "bad"))


def test_merge_rejects_layout_mismatch(ray_session, index_dir, tmp_path):
    """Different n_buckets across segments is a layout error."""
    from crawlerframework_ray.sources.solrsink import merge_indexes

    ds = ray.data.read_parquet(
        os.path.join(SF, "documents.parquet"), columns=["doc_id", "text"]
    )
    commit_index(ds, str(tmp_path / "other"), n_buckets=4)
    with pytest.raises(ValueError, match="layout mismatch"):
        merge_indexes([index_dir, str(tmp_path / "other")], str(tmp_path / "bad"))


def test_phrase_search_exact_counts(ray_session, tmp_path):
    """Hand corpus with known phrase occurrences: simple bigram,
    OVERLAPPING duplicate-term matches ('a a' in 'a a a' matches at
    positions 0 AND 1 — the naive chain double- or under-counts), a
    trigram, and a doc with the terms present but never adjacent."""
    import ray.data

    from crawlerframework_ray.sources.solrsink import commit_index, phrase_search

    docs = [
        {"doc_id": 1, "text": "x part filter y part filter"},  # 2 matches q1
        {"doc_id": 2, "text": "part y filter"},                # terms, not adjacent
        {"doc_id": 3, "text": "a a a"},                        # 'a a' at 0 and 1
        {"doc_id": 4, "text": "m g c m g c"},                  # trigram twice
        {"doc_id": 5, "text": "nothing here"},
    ]
    idx = str(tmp_path / "posidx")
    commit_index(ray.data.from_items(docs), idx, n_buckets=4, positions=True)
    out = phrase_search(
        idx,
        [(1, ["part", "filter"]), (2, ["a", "a"]), (3, ["m", "g", "c"])],
    )
    got = {(int(r.query_id), int(r.doc_id)): int(r.n_matches)
           for r in out.itertuples(index=False)}
    assert got == {(1, 1): 2, (2, 3): 2, (3, 4): 2}


def test_phrase_search_requires_positions(ray_session, tmp_path):
    import pytest
    import ray.data

    from crawlerframework_ray.sources.solrsink import commit_index, phrase_search

    idx = str(tmp_path / "nopos")
    commit_index(
        ray.data.from_items([{"doc_id": 1, "text": "a b"}]), idx, n_buckets=4
    )
    with pytest.raises(ValueError, match="positions"):
        phrase_search(idx, [(1, ["a", "b"])])
