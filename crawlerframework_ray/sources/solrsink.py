"""Full-text search-index sink + pruned-read query engine — the
Ray-Data analogue of the reference's Solr sink (K3).

The reference POSTs every parsed post to a Solr core inside save()
(crawler/connectors/baseconnector.py:566-581, the commented-out
``####SAVING TO SOLR`` block calling ``saveToSolr``) and lets Solr
build the inverted index and rank queries. Here the INDEX ITSELF is
the sink artifact, and both halves are distributed Ray Data jobs:

- ``commit_index``: tokenize → postings (term, doc_id, tf, dl) written
  as TERM-HASH-BUCKETED parquet (``postings/bucket=K/``), a per-term
  dictionary with exact document frequencies (same bucketing), and a
  doc store of stored fields partitioned by ``doc_id % n_buckets`` —
  with a manifest written LAST, so a crashed build never looks
  committed (Solr's commit semantics; same manifest-last idiom as the
  frontier checkpoint).
- ``search_topk``: ranked retrieval that reads ONLY the buckets the
  query terms hash into (partition-pruned file list + a pushed-down
  ``term IN (...)`` parquet filter), scores postings with the exact
  integer BM25 of stages/retrieval.py (same k1=1.2, b=0.75
  integerization — index-path results are bit-identical to the
  scan-path ``bm25_topk`` and to the SQL oracle), and merges bounded
  per-bucket partial top-k.
- ``boolean_and``: Solr's filter-query form — docs containing ALL
  terms, via the same pruned postings read, a bucketed per-doc match
  count, and a partitioned hash join back to the doc store for the
  stored fields.

Scale shape: a query touches |terms| dictionary rows and |terms|
posting buckets out of ``n_buckets`` — never the corpus. Posting rows
carry ``dl`` (the doc length norm) denormalized, exactly as production
engines store per-doc norms beside the posting, so scoring needs no
join against the doc store. The index build is two streaming passes
over the source text (postings, doc store) plus one column-pruned
pass over the written artifacts for the dictionary and corpus stats.
"""

from __future__ import annotations

import glob
import json
import os
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.dataset as pds
import ray.data

from ..stages.agg import bucketed_group_agg
from ..stages.retrieval import bm25_idf

POSTINGS_DIR = "postings"
POSITIONS_DIR = "positional"
DICT_DIR = "dictionary"
DOCSTORE_DIR = "docstore"
MANIFEST = "manifest.json"
N_INDEX_BUCKETS = 32


def term_bucket(term: str, n_buckets: int) -> int:
    """Stable cross-process term → bucket hash (crc32, like the
    repo's other content-derived routing keys)."""
    return zlib.crc32(term.encode()) % n_buckets


def _bucket_files(root: str, sub: str, buckets: list[int]) -> list[str]:
    files: list[str] = []
    for b in sorted(set(buckets)):
        files.extend(sorted(glob.glob(os.path.join(root, sub, f"bucket={b}", "*.parquet"))))
    return files


def commit_index(
    ds: ray.data.Dataset,
    out_dir: str,
    *,
    n_buckets: int = N_INDEX_BUCKETS,
    id_column: str = "doc_id",
    text_column: str = "text",
    stored_columns: tuple[str, ...] = (),
    coalesce: bool = False,
    batch_size: int = 2048,
    positions: bool = False,
) -> dict:
    """Build and atomically commit the index under ``out_dir``.
    Returns the manifest. ``ds`` must carry ``id_column``,
    ``text_column`` and every ``stored_columns`` column.

    ``coalesce=False`` (default) streams postings straight into the
    partitioned write — shuffle-free, but each input block contributes
    one file per bucket it touches (fine up to ~10^3 blocks). For a
    large corpus pass ``coalesce=True``: one bucketed shuffle
    co-locates each bucket's postings so the write emits ~one file per
    bucket instead of blocks×buckets small files."""
    os.makedirs(out_dir, exist_ok=True)
    stored = list(stored_columns)

    def postings_batch(t: pa.Table) -> pa.Table:
        ids = t.column(id_column).to_numpy()
        toks = pd.Series(t.column(text_column).to_pylist()).str.split(" ")
        dl = toks.str.len().to_numpy(dtype=np.int64)
        flat = pd.DataFrame(
            {"doc_id": np.repeat(ids.astype(np.int64), dl),
             "term": np.concatenate([np.asarray(x, dtype=object) for x in toks])}
        )
        tf = flat.groupby(["doc_id", "term"], sort=False).size().reset_index(name="tf")
        dl_map = pd.Series(dl, index=ids.astype(np.int64))
        bucket = np.fromiter(
            (zlib.crc32(s.encode()) % n_buckets for s in tf["term"]),
            dtype=np.int64, count=len(tf),
        )
        return pa.table({
            "term": pa.array(tf["term"], pa.string()),
            "doc_id": pa.array(tf["doc_id"].to_numpy(np.int64), pa.int64()),
            "tf": pa.array(tf["tf"].to_numpy(np.int64), pa.int64()),
            "dl": pa.array(dl_map.loc[tf["doc_id"]].to_numpy(np.int64), pa.int64()),
            "bucket": pa.array(bucket, pa.int64()),
        })

    post = ds.map_batches(postings_batch, batch_format="pyarrow", batch_size=batch_size)
    if coalesce:
        post = post.groupby("bucket").map_groups(
            lambda g: g, batch_format="pandas"
        )
    post.write_parquet(os.path.join(out_dir, POSTINGS_DIR), partition_cols=["bucket"])

    if positions:
        # Positional postings — one (term, doc_id, pos) row per token
        # occurrence, same term-hash bucketing as the tf postings so a
        # phrase query prunes to its terms' buckets. Opt-in: positions
        # roughly double index bytes (Lucene's omitTermFreqAndPositions
        # trade-off, inverted).
        def pos_batch(t: pa.Table) -> pa.Table:
            ids = t.column(id_column).to_numpy().astype(np.int64)
            toks = pd.Series(t.column(text_column).to_pylist()).str.split(" ")
            dl = toks.str.len().to_numpy(dtype=np.int64)
            if len(dl) == 0 or int(dl.sum()) == 0:
                return pa.table({
                    "term": pa.array([], pa.string()),
                    "doc_id": pa.array([], pa.int64()),
                    "pos": pa.array([], pa.int64()),
                    "bucket": pa.array([], pa.int64()),
                })
            terms = np.concatenate([np.asarray(x, dtype=object) for x in toks])
            pos = np.concatenate([np.arange(n, dtype=np.int64) for n in dl])
            bucket = np.fromiter(
                (zlib.crc32(s.encode()) % n_buckets for s in terms),
                dtype=np.int64, count=len(terms),
            )
            return pa.table({
                "term": pa.array(terms, pa.string()),
                "doc_id": pa.array(np.repeat(ids, dl), pa.int64()),
                "pos": pa.array(pos, pa.int64()),
                "bucket": pa.array(bucket, pa.int64()),
            })

        ppost = ds.map_batches(pos_batch, batch_format="pyarrow", batch_size=batch_size)
        if coalesce:
            ppost = ppost.groupby("bucket").map_groups(lambda g: g, batch_format="pandas")
        ppost.write_parquet(os.path.join(out_dir, POSITIONS_DIR), partition_cols=["bucket"])

    # Dictionary: exact df per term — a column-pruned read of the
    # postings just written (term only; one row per (term, doc) by
    # construction, so df == row count), folded per-batch then through
    # one bucketed reduce.
    post_files = _bucket_files(out_dir, POSTINGS_DIR, list(range(n_buckets)))
    post_terms = ray.data.read_parquet(post_files, columns=["term"])

    def df_partial(t: pa.Table) -> pa.Table:
        vc = pd.Series(t.column("term").to_pylist()).value_counts()
        return pa.table({
            "term": pa.array(vc.index.to_numpy(dtype=object), pa.string()),
            "df": pa.array(vc.to_numpy(np.int64), pa.int64()),
        })

    def df_fold(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("term", as_index=False)["df"].sum()
        out["bucket"] = np.fromiter(
            (zlib.crc32(s.encode()) % n_buckets for s in out["term"]),
            dtype=np.int64, count=len(out),
        )
        return out.astype({"df": "int64"})

    bucketed_group_agg(
        post_terms.map_batches(df_partial, batch_format="pyarrow"), ["term"], df_fold
    ).write_parquet(os.path.join(out_dir, DICT_DIR), partition_cols=["bucket"])

    # Doc store: stored fields + the length norm, partitioned by doc id.
    def store_batch(t: pa.Table) -> pa.Table:
        ids = t.column(id_column).to_numpy().astype(np.int64)
        toks = pd.Series(t.column(text_column).to_pylist()).str.split(" ")
        cols = {
            "doc_id": pa.array(ids, pa.int64()),
            "dl": pa.array(toks.str.len().to_numpy(np.int64), pa.int64()),
            "bucket": pa.array(ids % n_buckets, pa.int64()),
        }
        for c in stored:
            cols[c] = t.column(c)
        return pa.table(cols)

    ds.map_batches(store_batch, batch_format="pyarrow", batch_size=4096).write_parquet(
        os.path.join(out_dir, DOCSTORE_DIR), partition_cols=["bucket"]
    )

    # Corpus stats from the written doc store (columnar: dl only).
    store_files = _bucket_files(out_dir, DOCSTORE_DIR, list(range(n_buckets)))
    dl_ds = ray.data.read_parquet(store_files, columns=["dl"])

    def stats_partial(t: pa.Table) -> pa.Table:
        a = t.column("dl").to_numpy()
        return pa.table({"n": pa.array([len(a)], pa.int64()),
                         "total": pa.array([int(a.sum())], pa.int64())})

    st = dl_ds.map_batches(stats_partial, batch_format="pyarrow").to_pandas()
    manifest = {
        "version": 1,
        "n_buckets": n_buckets,
        "n_docs": int(st["n"].sum()),
        "total_len": int(st["total"].sum()),
        "stored_columns": stored,
        "positions": positions,
    }
    tmp = os.path.join(out_dir, MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(out_dir, MANIFEST))  # commit point
    return manifest


def load_manifest(out_dir: str) -> dict:
    path = os.path.join(out_dir, MANIFEST)
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"index at {out_dir} has no manifest — build crashed or never "
            "committed (manifest is written last)"
        )
    with open(path) as f:
        return json.load(f)


def _pruned_read(out_dir: str, sub: str, buckets: list[int],
                 columns: list[str], flt) -> ray.data.Dataset:
    files = _bucket_files(out_dir, sub, buckets)
    if not files:
        raise FileNotFoundError(f"no {sub} files for buckets {buckets} under {out_dir}")
    return ray.data.read_parquet(files, columns=columns, filter=flt)


def term_dfs(out_dir: str, terms: list[str]) -> dict[str, int]:
    """Exact df for each term — reads only the terms' dictionary
    buckets with a pushed-down IN filter; absent terms are df=0."""
    man = load_manifest(out_dir)
    b = man["n_buckets"]
    uniq = sorted(set(terms))
    d = _pruned_read(
        out_dir, DICT_DIR, [term_bucket(t, b) for t in uniq], ["term", "df"],
        pds.field("term").isin(uniq),
    ).to_pandas()
    out = dict.fromkeys(uniq, 0)
    out.update(zip(d["term"], d["df"].astype(int)))
    return out


def search_topk(out_dir: str, queries: list[tuple[int, list[str]]], *,
                k: int = 10) -> pd.DataFrame:
    """Ranked retrieval FROM the committed index: per-posting integer
    BM25 contributions (identical formula to stages/retrieval.BM25TopK)
    summed per (query_id, doc_id) through one bucketed reduce that also
    emits per-bucket partial top-k; the driver merges ≤ buckets·|Q|·k
    rows. Returns (query_id, doc_id, score, rank), rank 1-based, ties
    by doc_id — bit-identical to the scan-path ``bm25_topk``."""
    man = load_manifest(out_dir)
    n_b, n_docs, total = man["n_buckets"], man["n_docs"], man["total_len"]
    terms = sorted({t for _, qt in queries for t in qt})
    dfs = term_dfs(out_dir, terms)
    idf = {t: bm25_idf(n_docs, dfs[t]) for t in terms}
    # term → the (query_id, idf) fan-out rows it contributes to
    qt = pd.DataFrame(
        [(t, qid, idf[t]) for qid, qterms in queries for t in qterms],
        columns=["term", "query_id", "idf"],
    )
    post = _pruned_read(
        out_dir, POSTINGS_DIR, [term_bucket(t, n_b) for t in terms],
        ["term", "doc_id", "tf", "dl"], pds.field("term").isin(terms),
    )

    def contrib(t: pa.Table) -> pa.Table:
        df = t.to_pandas().merge(qt, on="term", how="inner")
        tf = df["tf"].to_numpy(np.int64)
        dl = df["dl"].to_numpy(np.int64)
        iv = df["idf"].to_numpy(np.int64)
        score = (iv * 22 * total * tf) // (10 * total * tf + 3 * total + 9 * dl * n_docs)
        part = pd.DataFrame({
            "query_id": df["query_id"].to_numpy(np.int64),
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "score": score,
        }).groupby(["query_id", "doc_id"], as_index=False)["score"].sum()
        return pa.Table.from_pandas(part.astype("int64"), preserve_index=False)

    def topk_fold(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["query_id", "doc_id"], as_index=False)["score"].sum()
        return (
            s.sort_values(["query_id", "score", "doc_id"],
                          ascending=[True, False, True], kind="mergesort")
            .groupby("query_id", sort=False).head(k)
        )

    partial = bucketed_group_agg(
        post.map_batches(contrib, batch_format="pyarrow"), ["query_id", "doc_id"], topk_fold
    ).to_pandas()
    out = (
        partial.sort_values(["query_id", "score", "doc_id"],
                            ascending=[True, False, True], kind="mergesort")
        .groupby("query_id", sort=False).head(k).reset_index(drop=True)
    )
    out["rank"] = out.groupby("query_id", sort=False).cumcount() + 1
    return out.astype({"query_id": "int64", "doc_id": "int64",
                       "score": "int64", "rank": "int64"})


def boolean_and(out_dir: str, terms: list[str],
                columns: list[str]) -> ray.data.Dataset:
    """Solr filter-query: docs containing ALL ``terms``, with
    ``columns`` fetched from the doc store via a partitioned hash
    join (the matched-id set stays a Dataset — never driver-resident).
    Returns a Dataset of (doc_id, *columns)."""
    from ..stages.joins import hash_join

    man = load_manifest(out_dir)
    n_b = man["n_buckets"]
    uniq = sorted(set(terms))
    need = len(uniq)
    post = _pruned_read(
        out_dir, POSTINGS_DIR, [term_bucket(t, n_b) for t in uniq],
        ["term", "doc_id"], pds.field("term").isin(uniq),
    )

    def match_fold(g: pd.DataFrame) -> pd.DataFrame:
        hits = g.groupby("doc_id", as_index=False)["term"].nunique()
        return hits.loc[hits["term"] == need, ["doc_id"]].astype("int64")

    matched = bucketed_group_agg(post, ["doc_id"], match_fold)
    store_files = _bucket_files(out_dir, DOCSTORE_DIR, list(range(n_b)))
    store = ray.data.read_parquet(store_files, columns=["doc_id"] + columns)
    return hash_join(matched, store, "doc_id", ["doc_id"], columns)


def phrase_search(out_dir: str, phrases: list[tuple[int, list[str]]],
                  ) -> pd.DataFrame:
    """Positional PHRASE query — Lucene/Solr's PhraseQuery form, the
    search mechanism the per-doc keyword scan cannot express at index
    scale: the phrase's terms' POSITIONAL posting buckets are read
    pruned (|terms| buckets out of n_buckets, pushed-down IN filter —
    never the corpus), each posting row fans out to its (query_id,
    term_idx) uses with positions rebased by term index (adj = pos −
    term_idx: a phrase occurrence starts at p iff every term_idx
    contributes adj = p), and one bounded bucketed reduce per
    (query_id, doc_id) counts the start positions where the distinct
    term_idx count equals the phrase length. Duplicate-term phrases
    ("order order") are handled by that distinct-count — a single
    token can serve two term slots only at two different adj values.
    Returns (query_id, doc_id, n_matches), n_matches = exact phrase
    occurrence count. Requires ``commit_index(..., positions=True)``."""
    from ..stages.agg import bucketed_group_agg as _bga

    man = load_manifest(out_dir)
    if not man.get("positions"):
        raise ValueError("index was committed without positions=True")
    n_b = man["n_buckets"]
    terms = sorted({t for _, ph in phrases for t in ph})
    fan = pd.DataFrame(
        [(t, qid, i, len(ph)) for qid, ph in phrases for i, t in enumerate(ph)],
        columns=["term", "query_id", "term_idx", "phrase_len"],
    )
    post = _pruned_read(
        out_dir, POSITIONS_DIR, [term_bucket(t, n_b) for t in terms],
        ["term", "doc_id", "pos"], pds.field("term").isin(terms),
    )

    def expand(t: pa.Table) -> pa.Table:
        df = t.to_pandas().merge(fan, on="term", how="inner")
        return pa.table({
            "query_id": pa.array(df["query_id"].to_numpy(np.int64), pa.int64()),
            "doc_id": pa.array(df["doc_id"].to_numpy(np.int64), pa.int64()),
            "adj": pa.array(
                df["pos"].to_numpy(np.int64) - df["term_idx"].to_numpy(np.int64),
                pa.int64()),
            "term_idx": pa.array(df["term_idx"].to_numpy(np.int64), pa.int64()),
            "phrase_len": pa.array(df["phrase_len"].to_numpy(np.int64), pa.int64()),
        })

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        grp = g.groupby(["query_id", "doc_id", "adj"], as_index=False).agg(
            k=("term_idx", "nunique"), pl=("phrase_len", "first")
        )
        hit = grp[grp["k"] == grp["pl"]]
        out = (
            hit.groupby(["query_id", "doc_id"], as_index=False)
            .size()
            .rename(columns={"size": "n_matches"})
        )
        return out.astype("int64")

    res = _bga(
        post.map_batches(expand, batch_format="pyarrow"), ["query_id", "doc_id"], fold
    ).to_pandas()
    if res.empty or "query_id" not in res.columns:
        res = pd.DataFrame(
            {c: pd.Series([], dtype="int64") for c in ["query_id", "doc_id", "n_matches"]}
        )
    return (
        res.sort_values(["query_id", "doc_id"], kind="mergesort")
        .reset_index(drop=True)
        .astype("int64")
    )


def merge_indexes(src_dirs: list[str], out_dir: str) -> dict:
    """Lucene-style SEGMENT MERGE: combine N committed indexes over
    disjoint doc-id sets into one committed index, entirely as
    streaming Ray Data passes over the segments' artifacts — postings
    re-coalesce per term bucket (one bucketed shuffle), dictionary
    document frequencies fold by term sum, doc stores union with a
    per-bucket duplicate-id check (doc stores are id-bucketed, so a
    cross-segment duplicate ALWAYS co-locates and is caught without a
    global distinct). Manifest written last, same commit semantics as
    ``commit_index``. The reference delegated this lifecycle to Solr's
    own segment merging (baseconnector.py:566-581 saveToSolr +
    commit); here it is a first-class distributed op.

    All segments must share ``n_buckets`` and ``stored_columns``;
    raises ``ValueError`` on mismatch or on duplicate doc ids."""
    mans = [load_manifest(s) for s in src_dirs]
    n_b = mans[0]["n_buckets"]
    stored = mans[0]["stored_columns"]
    for m, s in zip(mans, src_dirs):
        if m["n_buckets"] != n_b or m["stored_columns"] != stored:
            raise ValueError(f"segment {s} layout mismatch: {m}")
    os.makedirs(out_dir, exist_ok=True)

    # Postings: one read over every segment's posting files, term
    # bucket recomputed (the hive bucket column does not survive an
    # explicit-file read), coalesced so the merged index has ~one
    # file per bucket regardless of segment count.
    post_files = [
        f for s in src_dirs for f in _bucket_files(s, POSTINGS_DIR, list(range(n_b)))
    ]

    def rebucket_terms(t: pa.Table) -> pa.Table:
        b = np.fromiter(
            (zlib.crc32(s.encode()) % n_b for s in t.column("term").to_pylist()),
            dtype=np.int64, count=len(t),
        )
        return t.append_column("bucket", pa.array(b, pa.int64()))

    (
        ray.data.read_parquet(post_files, columns=["term", "doc_id", "tf", "dl"])
        .map_batches(rebucket_terms, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(lambda g: g, batch_format="pandas")
        .write_parquet(os.path.join(out_dir, POSTINGS_DIR), partition_cols=["bucket"])
    )

    # Dictionary: df is additive across disjoint segments — one
    # bucketed term-sum fold over every segment's dictionary rows.
    dict_files = [
        f for s in src_dirs for f in _bucket_files(s, DICT_DIR, list(range(n_b)))
    ]

    def df_fold(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("term", as_index=False)["df"].sum()
        out["bucket"] = np.fromiter(
            (zlib.crc32(s.encode()) % n_b for s in out["term"]),
            dtype=np.int64, count=len(out),
        )
        return out.astype({"df": "int64"})

    bucketed_group_agg(
        ray.data.read_parquet(dict_files, columns=["term", "df"]), ["term"], df_fold
    ).write_parquet(os.path.join(out_dir, DICT_DIR), partition_cols=["bucket"])

    # Doc store: union with the co-located duplicate check.
    store_files = [
        f for s in src_dirs for f in _bucket_files(s, DOCSTORE_DIR, list(range(n_b)))
    ]

    def check_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if g["doc_id"].duplicated().any():
            dup = int(g.loc[g["doc_id"].duplicated(), "doc_id"].iloc[0])
            raise ValueError(f"duplicate doc_id {dup} across merged segments")
        return g

    def rebucket_ids(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy().astype(np.int64)
        return t.append_column(
            "bucket", pa.array(ids % n_b, pa.int64())
        )

    (
        ray.data.read_parquet(store_files, columns=["doc_id", "dl"] + stored)
        .map_batches(rebucket_ids, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(check_bucket, batch_format="pandas")
        .write_parquet(os.path.join(out_dir, DOCSTORE_DIR), partition_cols=["bucket"])
    )

    manifest = {
        "version": 1,
        "n_buckets": n_b,
        "n_docs": int(sum(m["n_docs"] for m in mans)),
        "total_len": int(sum(m["total_len"] for m in mans)),
        "stored_columns": stored,
        # positional segments are not merged (yet): a merged index
        # honestly reports no positions rather than serving stale ones
        "positions": False,
    }
    tmp = os.path.join(out_dir, MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(out_dir, MANIFEST))  # commit point
    return manifest
