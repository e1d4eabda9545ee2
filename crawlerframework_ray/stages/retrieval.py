"""Lexical ranked retrieval (BM25) and rank fusion (RRF) as Ray Data
stages.

The reference ships documents to Solr and lets Solr rank
(crawler/utils/solrinterface.py — the K3 sink); here ranking itself is
the distributed operator, the missing half of the inverted-index query
(queries.inverted_index_terms builds the postings; this scores them).

Exactness discipline (the repo-wide rule): BM25 with k1 = 1.2 = 6/5 and
b = 0.75 = 3/4 is evaluated in EXACT integer arithmetic so the
distributed result hash-matches the SQL oracle bit for bit:

- idf surrogate  ``idf(t) = ((N - df) * 10^6) // (df + 1)`` — monotone
  in df like log((N-df+.5)/(df+.5)) but rational, so both engines agree
  exactly (ln is transcendental and libm-dependent).
- per-term score: multiply the classic
  ``tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))`` through by
  ``10 * total_len`` (avgdl = total_len/N as an exact rational):
  ``contrib = (idf * 22 * total * tf) // (10*total*tf + 3*total + 9*dl*N)``
  — one floor division per (doc, term), integer sum per doc, so the
  score is partition-invariant.

Scale shape: corpus stats (N, total_len, per-term df for the ≤ dozens
of query terms) fold as per-batch integer partials — the driver sees
one row per batch, never the corpus. Scoring is a second stateless
pass emitting per-batch partial top-k (k·|Q| rows per batch), merged by
one tiny groupby(query_id) — identical to the ANN partial-top-k shape
(stages/similarity.py). Nothing corpus-sized ever leaves the blocks.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

IDF_SCALE = 10**6
RRF_SCALE = 10**6
RRF_C = 60


def bm25_idf(n_docs: int, df: int) -> int:
    """Rational idf surrogate — exact, monotone-decreasing in df."""
    return ((n_docs - df) * IDF_SCALE) // (df + 1)


def corpus_stats(ds, terms: list[str], *, id_column: str = "doc_id",
                 text_column: str = "text", batch_size: int = 8192):
    """(N, total_len, {term: df}) via per-batch integer partials; the
    driver folds one fixed-width row per batch."""
    terms = list(terms)

    def partial(t: pa.Table) -> pa.Table:
        dfs = dict.fromkeys(terms, 0)
        n, total = 0, 0
        for txt in t.column(text_column).to_pylist():
            toks = txt.split(" ")
            n += 1
            total += len(toks)
            tokset = set(toks)
            for term in terms:
                if term in tokset:
                    dfs[term] += 1
        cols = {"n": [n], "total": [total]}
        cols.update({f"df_{i}": [dfs[term]] for i, term in enumerate(terms)})
        return pa.table({k: pa.array(v, pa.int64()) for k, v in cols.items()})

    f = ds.map_batches(partial, batch_format="pyarrow", batch_size=batch_size).to_pandas()
    n_docs = int(f["n"].sum())
    total_len = int(f["total"].sum())
    dfs = {term: int(f[f"df_{i}"].sum()) for i, term in enumerate(terms)}
    return n_docs, total_len, dfs


class BM25TopK:
    """map_batches actor stage: score every doc in the batch against
    every query (integer BM25 above), emit per-batch partial top-k.
    A doc is a candidate for a query iff it contains ≥1 query term
    (score may still floor to 0 — the SQL tf-join has the same
    semantics). Query plans (term lists + idf ints) broadcast once."""

    def __init__(self, plan_ref, k: int, id_column: str = "doc_id",
                 text_column: str = "text"):
        plan = ray.get(plan_ref) if not isinstance(plan_ref, tuple) else plan_ref
        # plan = (queries: list[(qid, [terms])], idf: {term: int}, N, total)
        self.queries, self.idf, self.n_docs, self.total = plan
        self.k = k
        self.id_column, self.text_column = id_column, text_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_column).to_numpy()
        rows: list[tuple[int, int, int]] = []
        for did, txt in zip(ids, batch.column(self.text_column).to_pylist()):
            toks = txt.split(" ")
            dl = len(toks)
            tf = Counter(toks)
            for qid, qterms in self.queries:
                score, hit = 0, False
                for term in qterms:
                    f = tf.get(term, 0)
                    if f:
                        hit = True
                        score += (self.idf[term] * 22 * self.total * f) // (
                            10 * self.total * f + 3 * self.total + 9 * dl * self.n_docs
                        )
                if hit:
                    rows.append((qid, int(did), score))
        if not rows:
            return pa.table(
                {"query_id": pa.array([], pa.int64()),
                 "doc_id": pa.array([], pa.int64()),
                 "score": pa.array([], pa.int64())}
            )
        df = pd.DataFrame(rows, columns=["query_id", "doc_id", "score"])
        df = (
            df.sort_values(["query_id", "score", "doc_id"],
                           ascending=[True, False, True], kind="mergesort")
            .groupby("query_id", sort=False)
            .head(self.k)
        )
        return pa.table(
            {"query_id": pa.array(df["query_id"].to_numpy(), pa.int64()),
             "doc_id": pa.array(df["doc_id"].to_numpy(), pa.int64()),
             "score": pa.array(df["score"].to_numpy(), pa.int64())}
        )


def bm25_topk(ds, queries: list[tuple[int, list[str]]], *, k: int = 10,
              id_column: str = "doc_id", text_column: str = "text",
              batch_size: int = 8192) -> pd.DataFrame:
    """Two streaming passes: stats fold, then score + partial top-k;
    final per-query top-k over k×batches bounded rows."""
    terms = sorted({t for _, qt in queries for t in qt})
    n_docs, total, dfs = corpus_stats(
        ds, terms, id_column=id_column, text_column=text_column, batch_size=batch_size
    )
    idf = {t: bm25_idf(n_docs, dfs[t]) for t in terms}
    plan_ref = ray.put((queries, idf, n_docs, total))
    partial = ds.map_batches(
        BM25TopK,
        fn_constructor_kwargs={"plan_ref": plan_ref, "k": k,
                               "id_column": id_column, "text_column": text_column},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=2, num_cpus=0.5,
    ).to_pandas()
    out = (
        partial.sort_values(["query_id", "score", "doc_id"],
                            ascending=[True, False, True], kind="mergesort")
        .groupby("query_id", sort=False)
        .head(k)
        .reset_index(drop=True)
    )
    out["rank"] = out.groupby("query_id", sort=False).cumcount() + 1
    return out.astype({"query_id": "int64", "doc_id": "int64",
                       "score": "int64", "rank": "int64"})


def rrf_fuse(ranked_lists: list[pd.DataFrame], *, k: int = 5,
             c: int = RRF_C, scale: int = RRF_SCALE) -> pd.DataFrame:
    """Reciprocal Rank Fusion over already-bounded top-k lists (each
    frame: query_id, neighbor_id, rank). Contribution is the integer
    ``scale // (c + rank)`` so fused scores are exact and associative;
    inputs are k·|Q| rows each, so the fuse is a driver-side merge by
    the same bounded-result rule as ann_recall_eval."""
    parts = []
    for f in ranked_lists:
        g = f[["query_id", "neighbor_id", "rank"]].copy()
        g["rrf_score"] = (scale // (c + g["rank"].astype("int64"))).astype("int64")
        parts.append(g[["query_id", "neighbor_id", "rrf_score"]])
    fused = (
        pd.concat(parts, ignore_index=True)
        .groupby(["query_id", "neighbor_id"], as_index=False)["rrf_score"]
        .sum()
    )
    fused = (
        fused.sort_values(["query_id", "rrf_score", "neighbor_id"],
                          ascending=[True, False, True], kind="mergesort")
        .groupby("query_id", sort=False)
        .head(k)
        .reset_index(drop=True)
    )
    fused["rank"] = fused.groupby("query_id", sort=False).cumcount() + 1
    return fused.astype({"query_id": "int64", "neighbor_id": "int64",
                         "rrf_score": "int64", "rank": "int64"})
