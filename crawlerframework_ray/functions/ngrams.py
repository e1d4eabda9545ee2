"""Corpus n-gram language-model ops — the "train a cheap LM on the
corpus, score every document against it" family of a training-data
pipeline (KenLM-style familiarity/quality scoring, tokenizer-vocabulary
construction, corpus token-id encoding). Beyond-reference LLM-pipeline
ops (the reference stops at per-document term counts,
crawler/extractor.py:206-216); everything here is exact integer
arithmetic so the DuckDB oracle reproduces results bit-for-bit.

Scale shape:
- "training" = corpus bigram counts: per-batch PARTIAL counts (the
  combiner — the shuffle moves one row per distinct bigram per doc,
  never one per token) → one bounded ``bucketed_group_agg`` shuffle.
- scoring = a bucketed hash join of the per-doc bigram partials
  against the model (both sides partitioned on hash(bigram)), then a
  second bounded groupby(doc) sum. Two passes over the input (train,
  score) — no mid-pipeline materialization of the corpus.
- vocabulary top-V: after the grouped count each term exists exactly
  ONCE globally, so per-block top-V → driver merge of ≤ blocks×V rows
  is exact; only the V-row vocab ever reaches the driver, shipped back
  ONCE via ``ray.put``.
"""

from __future__ import annotations

from collections import Counter
from itertools import chain

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..stages.agg import bucketed_group_agg

VOCAB_SIZE = 256


def _tokens(txt: str) -> list[str]:
    """Space-split tokens, matching DuckDB ``string_split(text, ' ')``
    exactly: the empty string yields ZERO tokens (Python's
    ``"".split(" ")`` would yield [''] — verified divergence), while
    interior runs of spaces yield '' tokens on both sides."""
    return txt.split(" ") if txt else []


def _doc_bigram_partials(t: pa.Table) -> pa.Table:
    """(doc_id, bigram, occ): per-document bigram multiplicities — the
    2-token case of :func:`_doc_window_partials` (a bigram IS a k=2
    rolling window; one implementation, two column names)."""
    return _doc_window_partials(t, 2, out_column="bigram")


def exploded_bigrams(ds) -> "ray.data.Dataset":
    return ds.map_batches(_doc_bigram_partials, batch_format="pyarrow", batch_size=4096)


def bigram_model(ds) -> "ray.data.Dataset":
    """(bigram, cnt): total corpus occurrences per bigram. One bounded
    shuffle over the per-doc partials."""
    return bucketed_group_agg(
        exploded_bigrams(ds),
        ["bigram"],
        lambda g: g.groupby("bigram", as_index=False)["occ"].sum().rename(columns={"occ": "cnt"}),
    )


def lm_score(docs_factory) -> "ray.data.Dataset":
    """(doc_id, lm_score, n_bigrams): familiarity of each document under
    the corpus bigram LM — sum over the doc's bigram INSTANCES of the
    corpus count of that bigram (exact int64). ``docs_factory`` is a
    zero-arg callable returning the documents Dataset; it is called
    twice (train pass, score pass) so neither pass materializes."""
    from ..stages.joins import hash_join

    model = bigram_model(docs_factory())
    pairs = hash_join(
        exploded_bigrams(docs_factory()),
        model,
        key="bigram",
        left_cols=["doc_id", "occ"],
        right_cols=["cnt"],
        how="inner",
    )

    def per_doc(g: pd.DataFrame) -> pd.DataFrame:
        g = g.assign(__prod=g["occ"].to_numpy() * g["cnt"].to_numpy())
        out = g.groupby("doc_id", as_index=False).agg(
            lm_score=("__prod", "sum"), n_bigrams=("occ", "sum")
        )
        return out

    return bucketed_group_agg(pairs, ["doc_id"], per_doc)


def _doc_window_partials(t: pa.Table, k: int, out_column: str = "win") -> pa.Table:
    """(doc_id, <out_column>, occ): per-document k-token window
    multiplicities (rolling exact-substring shingles, the span-dedup
    unit; k=2 is the bigram case)."""
    ids = t.column("doc_id").to_numpy()
    doc_out: list = []
    win_out: list = []
    occ_out: list = []
    for doc_id, txt in zip(ids, t.column("text").to_pylist()):
        toks = _tokens(txt)
        c = Counter(
            " ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)
        )
        doc_out.extend([int(doc_id)] * len(c))
        win_out.extend(c.keys())
        occ_out.extend(c.values())
    return pa.table(
        {
            "doc_id": pa.array(doc_out, pa.int64()),
            out_column: pa.array(win_out, pa.string()),
            "occ": pa.array(occ_out, pa.int64()),
        }
    )


def dup_window_stats(docs_factory, k: int = 8) -> "ray.data.Dataset":
    """(doc_id, n_windows, dup_windows): exact-substring duplication
    stats — for each document, how many of its k-token windows occur
    ≥2 times anywhere in the corpus (the Lee-et-al duplicated-span
    filter metric, on whole windows so every count is exact int64).
    Same two-pass train/score shape as :func:`lm_score`: corpus window
    counts via one bounded groupby(win) shuffle, then a bucketed hash
    join of the per-doc partials against the model and a bounded
    groupby(doc) reduction. Documents shorter than k tokens have no
    windows and drop out (mirrored by the oracle)."""
    from ..stages.joins import hash_join

    model = bucketed_group_agg(
        docs_factory().map_batches(
            lambda t: _doc_window_partials(t, k), batch_format="pyarrow", batch_size=4096
        ),
        ["win"],
        lambda g: g.groupby("win", as_index=False)["occ"].sum().rename(columns={"occ": "cnt"}),
    )
    pairs = hash_join(
        docs_factory().map_batches(
            lambda t: _doc_window_partials(t, k), batch_format="pyarrow", batch_size=4096
        ),
        model,
        key="win",
        left_cols=["doc_id", "occ"],
        right_cols=["cnt"],
        how="inner",
    )

    def per_doc(g: pd.DataFrame) -> pd.DataFrame:
        occ = g["occ"].to_numpy()
        dup = occ * (g["cnt"].to_numpy() >= 2)
        return (
            g.assign(__dup=dup)
            .groupby("doc_id", as_index=False)
            .agg(n_windows=("occ", "sum"), dup_windows=("__dup", "sum"))
        )

    return bucketed_group_agg(pairs, ["doc_id"], per_doc)


def term_count_partials(ds) -> "ray.data.Dataset":
    """(term, cnt) corpus term frequencies — partial per-batch Counter
    then one bounded grouped sum (the A4 shape)."""

    def partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for txt in t.column("text").to_pylist():
            c.update(_tokens(txt))
        return pa.table(
            {
                "term": pa.array(list(c.keys()), pa.string()),
                "cnt": pa.array(list(c.values()), pa.int64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=8192)
    return bucketed_group_agg(
        partials, ["term"], lambda g: g.groupby("term", as_index=False)["cnt"].sum()
    )


def build_vocab(ds, size: int = VOCAB_SIZE) -> pd.DataFrame:
    """Top-``size`` terms by (cnt DESC, term ASC) → (term, token_id)
    with ids 0..V-1 in rank order. After the grouped count every term
    appears exactly once globally, so a per-block top-``size`` prefix
    feeds an exact driver merge of ≤ blocks×size candidate rows."""

    def per_block_top(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(
            ["cnt", "term"], ascending=[False, True], kind="mergesort"
        ).head(size)

    cand = term_count_partials(ds).map_batches(per_block_top, batch_format="pandas").to_pandas()
    top = (
        cand.sort_values(["cnt", "term"], ascending=[False, True], kind="mergesort")
        .head(size)
        .reset_index(drop=True)
    )
    top["token_id"] = np.arange(len(top), dtype=np.int64)
    return top[["term", "token_id"]]


def encode_documents(ds, vocab: pd.DataFrame) -> "ray.data.Dataset":
    """(doc_id, pos, token_id): every token of every document encoded
    against the vocabulary (OOV → -1). The vocab ships ONCE via
    ``ray.put``; per-batch encoding is a vectorized Series.map over the
    flattened token stream, positions via one arange subtraction."""
    lut = pd.Series(
        vocab["token_id"].to_numpy(), index=vocab["term"].to_numpy(), dtype="int64"
    )
    ref = ray.put(lut)

    def encode(t: pa.Table) -> pa.Table:
        lk: pd.Series = ray.get(ref)
        ids = t.column("doc_id").to_numpy()
        toks_per = [_tokens(s) for s in t.column("text").to_pylist()]
        lens = np.fromiter((len(x) for x in toks_per), dtype=np.int64, count=len(toks_per))
        flat = pd.Series(list(chain.from_iterable(toks_per)), dtype="object")
        tids = flat.map(lk).fillna(-1).astype(np.int64).to_numpy()
        doc = np.repeat(ids.astype(np.int64), lens)
        starts = np.cumsum(lens) - lens
        pos = np.arange(int(lens.sum()), dtype=np.int64) - np.repeat(starts, lens)
        return pa.table(
            {
                "doc_id": pa.array(doc, pa.int64()),
                "pos": pa.array(pos, pa.int64()),
                "token_id": pa.array(tids, pa.int64()),
            }
        )

    return ds.map_batches(encode, batch_format="pyarrow", batch_size=4096)


DSIR_N_BUCKETS = 1024


def _bucket64(term: str) -> int:
    import hashlib

    return int.from_bytes(hashlib.md5(term.encode("utf-8")).digest()[:8], "big") % DSIR_N_BUCKETS


def dsir_importance(docs_factory, target_lang: str = "en",
                    n_buckets: int = DSIR_N_BUCKETS) -> "ray.data.Dataset":
    """(doc_id, target_mass, raw_mass): DSIR-style hashed n-gram
    importance features (Xie et al. 2023 'Data Selection for Language
    Models via Importance Resampling', unigram-bucket form): every
    token hashes into one of ``n_buckets`` buckets; the target
    distribution is the token mass of the ``target_lang`` subset, the
    raw distribution is the whole corpus. A document's importance
    features are the sums of target/raw bucket masses over ITS tokens —
    exact int64, ratio left to the consumer so no floats enter the
    pipeline. Scale shape: the feature pass reduces to TWO fixed
    n_buckets-long int vectors (a driver combine of n_buckets-row
    partials — constant size regardless of corpus), broadcast ONCE;
    the scoring pass is one stateless map_batches."""
    assert n_buckets == DSIR_N_BUCKETS, "_bucket64 and the SQL oracle fix 1024 buckets"

    def partial_buckets(t: pa.Table) -> pa.Table:
        tgt = np.zeros(n_buckets, np.int64)
        raw = np.zeros(n_buckets, np.int64)
        for lang, txt in zip(t.column("lang").to_pylist(), t.column("text").to_pylist()):
            for tok in _tokens(txt):
                b = _bucket64(tok)
                raw[b] += 1
                if lang == target_lang:
                    tgt[b] += 1
        idx = np.flatnonzero(raw)
        return pa.table(
            {"bucket": pa.array(idx, pa.int64()),
             "tgt": pa.array(tgt[idx], pa.int64()),
             "raw": pa.array(raw[idx], pa.int64())}
        )

    parts = (
        docs_factory()
        .map_batches(partial_buckets, batch_format="pyarrow", batch_size=8192)
        .to_pandas()
    )  # ≤ n_buckets rows per batch; the combine is O(n_buckets), not O(corpus)
    g = parts.groupby("bucket").sum()
    tgt = np.zeros(n_buckets, np.int64)
    raw = np.zeros(n_buckets, np.int64)
    tgt[g.index.to_numpy()] = g["tgt"].to_numpy()
    raw[g.index.to_numpy()] = g["raw"].to_numpy()
    ref = ray.put((tgt, raw))

    def score(t: pa.Table) -> pa.Table:
        tg, rw = ray.get(ref)
        ids, tm, rm = [], [], []
        for doc_id, txt in zip(t.column("doc_id").to_numpy(), t.column("text").to_pylist()):
            bs = np.fromiter((_bucket64(tok) for tok in _tokens(txt)), dtype=np.int64)
            ids.append(int(doc_id))
            tm.append(int(tg[bs].sum()))
            rm.append(int(rw[bs].sum()))
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()),
             "target_mass": pa.array(tm, pa.int64()),
             "raw_mass": pa.array(rm, pa.int64())}
        )

    return docs_factory().map_batches(score, batch_format="pyarrow", batch_size=8192)


BPE_SEP = "\x1f"  # symbol separator inside the carried word encoding


def bpe_train(docs_ds, n_merges: int = 8) -> pd.DataFrame:
    """Distributed BPE tokenizer training (Sennrich et al. 2016, the
    word-frequency-table formulation every production BPE trainer
    uses): the corpus collapses ONCE to (word, cnt) via the bounded
    grouped count — the only corpus-scale pass — then each merge
    round is a map_batches pair-count partial over the WORD table
    (vocab-sized, not corpus-sized) + one bounded grouped sum; the
    winning pair (count DESC, (left,right) ASC — exactly
    deterministic) is broadcast back and applied by a second
    map_batches. Returns the merge table
    (step, left, right, merged, pair_count) — the trained tokenizer.

    At 100 TB the word table is ~10^7 rows (Heaps' law), so each round
    shuffles megabytes, not the corpus; the driver only ever sees the
    per-bucket pair sums (bounded by distinct pairs)."""

    words = term_count_partials(docs_ds).map_batches(
        lambda df: pd.DataFrame(
            {"syms": [BPE_SEP.join(w) for w in df["term"]], "cnt": df["cnt"]}
        ),
        batch_format="pandas",
    ).materialize()  # vocab-sized; the invariant side of the iteration

    merges: list[tuple[int, str, str, str, int]] = []
    for step in range(1, n_merges + 1):
        def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
            c: Counter = Counter()
            for syms, cnt in zip(df["syms"], df["cnt"]):
                s = syms.split(BPE_SEP)
                for a, b in zip(s, s[1:]):
                    c[(a, b)] += int(cnt)
            if not c:
                return pd.DataFrame({"left": [], "right": [], "w": []})
            ls, rs = zip(*c.keys())
            return pd.DataFrame({"left": ls, "right": rs, "w": list(c.values())})

        pairs = bucketed_group_agg(
            words.map_batches(pair_partial, batch_format="pandas"),
            ["left", "right"],
            lambda g: g.groupby(["left", "right"], as_index=False)["w"].sum(),
        ).to_pandas()
        if pairs.empty:
            break
        top = pairs.sort_values(
            ["w", "left", "right"], ascending=[False, True, True], kind="mergesort"
        ).iloc[0]
        left, right, wcnt = str(top["left"]), str(top["right"]), int(top["w"])
        merged = left + right
        merges.append((step, left, right, merged, wcnt))

        ref = ray.put((left, right, merged))

        def apply_merge(df: pd.DataFrame) -> pd.DataFrame:
            lf, rt, mg = ray.get(ref)
            out = []
            for syms in df["syms"]:
                s = syms.split(BPE_SEP)
                res, i = [], 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == lf and s[i + 1] == rt:
                        res.append(mg)
                        i += 2
                    else:
                        res.append(s[i])
                        i += 1
                out.append(BPE_SEP.join(res))
            return pd.DataFrame({"syms": out, "cnt": df["cnt"]})

        words = words.map_batches(apply_merge, batch_format="pandas").materialize()

    return pd.DataFrame(
        merges, columns=["step", "left", "right", "merged", "pair_count"]
    ).astype({"step": "int64", "pair_count": "int64"})


def bpe_apply(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Apply trained merges to one word, in training order, each
    exhaustively left-to-right — the exact inverse-side contract of
    :func:`bpe_train` (and of the serial golden)."""
    syms = list(word)
    for left, right in merges:
        res, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                res.append(left + right)
                i += 2
            else:
                res.append(syms[i])
                i += 1
        syms = res
    return syms


def bpe_encode_documents(docs_ds, merges_df: pd.DataFrame) -> "ray.data.Dataset":
    """(doc_id, pos, piece): every document tokenized by the trained
    BPE — space-split words, each word segmented by the merge table
    (broadcast ONCE via ray.put; a per-actor LRU of word→pieces makes
    the common case one dict hit, since word frequency is Zipfian).
    One stateless map_batches pass; the corpus-scale tokenization step
    that feeds sequence packing."""
    pairs = list(zip(merges_df["left"].tolist(), merges_df["right"].tolist()))
    ref = ray.put(pairs)

    def encode(t: pa.Table) -> pa.Table:
        mg = ray.get(ref)
        cache: dict[str, list[str]] = {}
        ids_out: list[int] = []
        pos_out: list[int] = []
        piece_out: list[str] = []
        for doc_id, txt in zip(t.column("doc_id").to_numpy(), t.column("text").to_pylist()):
            pos = 0
            for w in _tokens(txt):
                pieces = cache.get(w)
                if pieces is None:
                    pieces = bpe_apply(w, mg)
                    if len(cache) < 1 << 16:
                        cache[w] = pieces
                for p in pieces:
                    ids_out.append(int(doc_id))
                    pos_out.append(pos)
                    piece_out.append(p)
                    pos += 1
        return pa.table(
            {
                "doc_id": pa.array(ids_out, pa.int64()),
                "pos": pa.array(pos_out, pa.int64()),
                "piece": pa.array(piece_out, pa.string()),
            }
        )

    return docs_ds.map_batches(encode, batch_format="pyarrow", batch_size=4096)


def _doc_segment_rows(t: pa.Table, k: int) -> pa.Table:
    """(doc_id, seg_idx, seg, seg_toks): the document cut into
    NON-overlapping k-token segments (last segment may be short) — the
    paragraph-dedup unit. Unlike the rolling windows above, segments
    partition the document, so kept-segment counts reassemble into a
    deduplicated corpus size."""
    ids = t.column("doc_id").to_numpy()
    doc_out: list = []
    idx_out: list = []
    seg_out: list = []
    tok_out: list = []
    for doc_id, txt in zip(ids, t.column("text").to_pylist()):
        toks = _tokens(txt)
        for j in range(0, (len(toks) + k - 1) // k):
            part = toks[j * k : (j + 1) * k]
            doc_out.append(int(doc_id))
            idx_out.append(j)
            seg_out.append(" ".join(part))
            tok_out.append(len(part))
    return pa.table(
        {
            "doc_id": pa.array(doc_out, pa.int64()),
            "seg_idx": pa.array(idx_out, pa.int64()),
            "seg": pa.array(seg_out, pa.string()),
            "seg_toks": pa.array(tok_out, pa.int64()),
        }
    )


def segment_dedup_stats(docs_factory, k: int = 8) -> "ray.data.Dataset":
    """(doc_id, n_segs, kept_segs, kept_tokens): CCNet-style
    segment-level exact deduplication with reassembly accounting
    (Wenzek et al. 2020 dedupe by paragraph hash; the synthetic corpus
    has no newlines, so the 'paragraph' is a non-overlapping k-token
    segment). A segment instance is KEPT iff it is the corpus-first
    occurrence of its content under the total order (doc_id, seg_idx);
    every other instance is dropped. Per document we report how many
    segments it had, how many survive, and how many tokens survive —
    i.e. the doc's size in the deduplicated corpus.

    Scale shape (no joins, no driver state):
    1. winner pass: segment rows → ONE bounded groupby(hash(seg))
       shuffle; inside each co-located group the winner is the
       lexicographic (doc_id, seg_idx) minimum. Keyed by the segment
       STRING (bucketed by its hash), so results are exact — no
       fingerprint-collision caveat.
    2. reassembly: winner rows (one per DISTINCT segment) union'd with
       per-doc totals (computed batch-locally — a document never spans
       rows) → one bounded groupby(doc_id) sum.
    """

    def totals(t: pa.Table) -> pa.Table:
        s = _doc_segment_rows(t, k)
        df = (
            s.to_pandas()
            .groupby("doc_id", as_index=False)
            .agg(n_segs=("seg_idx", "size"))
        )
        df["kept_segs"] = np.int64(0)
        df["kept_tokens"] = np.int64(0)
        return pa.Table.from_pandas(df.astype("int64"), preserve_index=False)

    def pick_first(g: pd.DataFrame) -> pd.DataFrame:
        w = (
            g.sort_values(["doc_id", "seg_idx"], kind="mergesort")
            .groupby("seg", as_index=False)
            .first()
        )
        return pd.DataFrame(
            {
                "doc_id": w["doc_id"].astype("int64"),
                "n_segs": np.int64(0),
                "kept_segs": np.int64(1),
                "kept_tokens": w["seg_toks"].astype("int64"),
            }
        )

    winners = bucketed_group_agg(
        docs_factory().map_batches(
            lambda t: _doc_segment_rows(t, k), batch_format="pyarrow", batch_size=4096
        ),
        ["seg"],
        pick_first,
    )
    both = docs_factory().map_batches(totals, batch_format="pyarrow", batch_size=4096).union(winners)
    return bucketed_group_agg(
        both,
        ["doc_id"],
        lambda g: g.groupby("doc_id", as_index=False)[
            ["n_segs", "kept_segs", "kept_tokens"]
        ].sum(),
    )
