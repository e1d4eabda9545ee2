"""Partition-independence + edge-case gates for the corpus n-gram /
SemDeDup family (the SQL-oracle gate in test_queries.py checks values;
these check the docstring claims that don't show up there: results are
bit-identical regardless of block layout, and degenerate documents are
handled the same way the oracle handles them)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

SF = "/root/testdata/sf0.001"


def _docs(blocks: int):
    import ray.data

    return ray.data.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "text"],
        override_num_blocks=blocks,
    )


def _lm(blocks: int) -> pd.DataFrame:
    from crawlerframework_ray.functions.ngrams import lm_score

    return (
        lm_score(lambda: _docs(blocks))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
        .astype({"doc_id": "int64", "lm_score": "int64", "n_bigrams": "int64"})
    )


def test_lm_score_partition_independent(ray_session):
    a = _lm(1)
    b = _lm(8)
    assert a.equals(b)
    assert (a["lm_score"] >= a["n_bigrams"]).all()  # every bigram counts itself


def _semdedup(blocks: int) -> pd.DataFrame:
    from crawlerframework_ray.stages.similarity import semdedup_int

    import ray.data

    ds = ray.data.read_parquet(
        f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"],
        override_num_blocks=blocks,
    )
    return (
        semdedup_int(ds, n_clusters=4, iters=2)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
        .astype({"vec_id": "int64", "cluster": "int64", "keep": "int64"})
    )


def test_semdedup_partition_independent(ray_session):
    a = _semdedup(1)
    b = _semdedup(8)
    assert a.equals(b)


def test_semdedup_drops_exact_twin(ray_session):
    """An exact duplicate vector with a larger id is dropped; the
    original is kept."""
    import numpy as np
    import ray.data

    from crawlerframework_ray.stages.similarity import semdedup_int

    rng = np.random.Generator(np.random.PCG64(7))
    vecs = rng.normal(size=(40, 16)).astype(np.float32)
    vecs = np.vstack([vecs, vecs[3:4]])  # twin of id 3 at id 40
    t = pa.table(
        {
            "vec_id": pa.array(list(range(41)), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float32())),
        }
    )
    out = (
        semdedup_int(ray.data.from_arrow(t), n_clusters=2, iters=2)
        .to_pandas()
        .set_index("vec_id")
    )
    assert out.loc[3, "keep"] == 1
    assert out.loc[40, "keep"] == 0
    assert out.loc[40, "cluster"] == out.loc[3, "cluster"]


def test_ngram_degenerate_docs(ray_session):
    """Docs with <2 tokens produce no bigrams (dropped from lm_score,
    matching the oracle); encode still emits one row per token."""
    import ray.data

    from crawlerframework_ray.functions.ngrams import (
        build_vocab,
        encode_documents,
        lm_score,
    )

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["solo", "a b a b", ""], pa.string()),
        }
    )
    mk = lambda: ray.data.from_arrow(t)  # noqa: E731
    lm = lm_score(mk).to_pandas()
    assert set(lm["doc_id"]) == {1}  # "solo" and "" have no bigrams
    # doc 1: bigrams a-b (x2), b-a (x1); model counts 2,1 -> score 2*2+1*1
    assert int(lm.loc[lm.doc_id == 1, "lm_score"].iloc[0]) == 5
    vocab = build_vocab(mk(), size=2)
    enc = encode_documents(mk(), vocab).to_pandas()
    # one row per token; '' text has ZERO tokens (DuckDB string_split
    # parity — "".split(" ") would wrongly yield [''])
    assert len(enc) == 1 + 4 + 0
    assert (enc["doc_id"] != 2).all()


def test_bpe_train_partition_independent(ray_session):
    """The merge table must be bit-identical at 1 block and 8 blocks
    (deterministic winner: count DESC, pair ASC)."""
    import ray.data

    from crawlerframework_ray.functions.ngrams import bpe_train

    def run(blocks: int):
        ds = ray.data.read_parquet(
            f"{SF}/documents.parquet", columns=["text"], override_num_blocks=blocks
        )
        return bpe_train(ds, n_merges=4)

    a, b = run(1), run(8)
    assert a.equals(b)
    assert len(a) == 4 and (a["pair_count"] > 0).all()


def test_heavy_hitters_batch_size_independent(ray_session):
    """The exact-recount output may not depend on how the stream was
    chunked: different batch sizes produce different MG summaries, but
    the verified top-k must be identical."""
    import ray.data

    from crawlerframework_ray.stages.sketch import heavy_hitter_terms

    def run(bs: int):
        ds = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["text"])

        # heavy_hitter_terms fixes batch_size internally; emulate the
        # boundary change by repartitioning the input instead
        return heavy_hitter_terms(
            ds.repartition(1 if bs == 0 else 8), k=8, slots=64
        )

    a, b = run(0), run(1)
    assert a[["rank", "term", "cnt"]].equals(b[["rank", "term", "cnt"]])


def test_cdc_chunk_spec_invariants():
    # lengths partition the payload; every chunk within [1, CMAX];
    # a mid-doc insertion only perturbs chunks near the edit point
    # (the content-defined property fixed-size blocking lacks)
    from crawlerframework_ray.functions.cdc import CMAX, chunk_lengths

    base = ("the quick brown fox jumps over the lazy dog and runs far away "
            * 40).encode()
    ls = chunk_lengths(base)
    assert sum(ls) == len(base)
    assert all(1 <= x <= CMAX for x in ls)
    assert chunk_lengths(b"") == [] and chunk_lengths(b"short") == [5]

    import hashlib

    def keys(d: bytes) -> list[bytes]:
        out, pos = [], 0
        for ln in chunk_lengths(d):
            out.append(hashlib.md5(d[pos:pos + ln]).digest())
            pos += ln
        return out

    edited = base[:1200] + b"INSERTED TEXT HERE" + base[1200:]
    a, b = set(keys(base)), set(keys(edited))
    # the shared prefix and suffix chunks survive the edit
    assert len(a & b) >= len(a) * 2 // 3
