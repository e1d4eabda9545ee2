"""BM25 / RRF gates: partition independence of the integer scoring
(the exactness claim), corpus-stats fold correctness vs a serial
count, and RRF fusion determinism on a constructed tie."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"

QUERIES = [(0, ["dup", "merge"]), (1, ["vector", "hash", "join"])]


def _bm25(blocks: int, batch_size: int) -> pd.DataFrame:
    import ray.data

    from crawlerframework_ray.stages.retrieval import bm25_topk

    ds = ray.data.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "text"], override_num_blocks=blocks
    )
    return bm25_topk(ds, QUERIES, k=10, batch_size=batch_size).reset_index(drop=True)


def test_bm25_partition_independent(ray_session):
    a = _bm25(1, 8192)
    b = _bm25(8, 64)
    assert a.equals(b)
    assert len(a) == 20 and a["score"].nunique() > 10


def test_corpus_stats_match_serial(ray_session):
    import ray.data

    from crawlerframework_ray.stages.retrieval import corpus_stats

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    texts = t.column("text").to_pylist()
    terms = ["dup", "merge", "vector"]
    n, total, dfs = corpus_stats(
        ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"],
                              override_num_blocks=4),
        terms,
    )
    assert n == len(texts)
    assert total == sum(len(x.split(" ")) for x in texts)
    for term in terms:
        assert dfs[term] == sum(term in x.split(" ") for x in texts)


def test_rrf_fuse_exact_and_deterministic():
    from crawlerframework_ray.stages.retrieval import rrf_fuse

    a = pd.DataFrame({"query_id": [0, 0, 0], "neighbor_id": [10, 11, 12], "rank": [1, 2, 3]})
    b = pd.DataFrame({"query_id": [0, 0, 0], "neighbor_id": [11, 13, 10], "rank": [1, 2, 3]})
    out = rrf_fuse([a, b], k=4)
    s = out.set_index("neighbor_id")["rrf_score"]
    assert s[11] == 10**6 // 62 + 10**6 // 61  # rank2 in a, rank1 in b
    assert s[10] == 10**6 // 61 + 10**6 // 63
    # 12 (rank3 only in a) vs 13 (rank2 only in b): 13 scores higher
    assert s[13] == 10**6 // 62 and s[12] == 10**6 // 63
    assert out["neighbor_id"].tolist() == [11, 10, 13, 12]
    assert out["rank"].tolist() == [1, 2, 3, 4]


def test_bm25_idf_monotone():
    from crawlerframework_ray.stages.retrieval import bm25_idf

    vals = [bm25_idf(500, df) for df in (1, 25, 100, 400, 500)]
    assert vals == sorted(vals, reverse=True)
    assert vals[-1] == 0  # df == N -> zero idf, not negative
