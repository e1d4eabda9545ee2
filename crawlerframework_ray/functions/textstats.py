"""Text-analysis kernels for large-scale training-data pipelines:
language ID (n-gram heuristic), quality scoring, token counting,
document fingerprinting.

These generalize the reference's text utils — stripHtml / cleanUnicode
(crawler/utils/utils.py:100-139,468-477), the NLTK pipeline slot
(crawler/utils/nlp.py), junk-ratio math (utils.py:430-448) — into
vectorized per-batch functions suitable for ``map_batches``. Integer
outputs are preferred where a DuckDB oracle must reproduce them
bit-for-bit.
"""

from __future__ import annotations

import re

import numpy as np

WS_RE = re.compile(r"\s+")
WORD_RE = re.compile(r"\w+", re.UNICODE)
# a BPE-ish segmentation: word pieces, numbers, or single non-space marks
BPE_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]")
NON_ALNUM_SPACE_RE = re.compile(r"[^A-Za-z0-9 ]")

STOPWORDS = frozenset(
    "the a an and or of to in is are was were be been it this that for on with as at by from".split()
)

# tiny deterministic character-trigram profiles for a handful of
# languages — a from-scratch n-gram heuristic (not a port of any model)
_LANG_TRIGRAMS = {
    "en": ("the", "ing", "and", "ion", "ent", "her", "for", "tha"),
    "es": ("de ", "la ", "que", "el ", "en ", "ión", "ado", "os "),
    "de": ("ein", "ich", "der", "und", "sch", "die", "en ", "ung"),
    "fr": ("le ", "es ", "de ", "ent", "ion", "que", "la ", "eur"),
    "zh": tuple(),  # CJK detected by codepoint range instead
}


def ws_token_count(text: str) -> int:
    """Whitespace token count — matches DuckDB
    ``array_length(regexp_split_to_array(trim(text), '\\s+'))``."""
    t = text.strip()
    return 0 if not t else len(WS_RE.split(t))


def bpe_token_count(text: str) -> int:
    """BPE-ish piece count (letters runs / digit runs / marks)."""
    return len(BPE_RE.findall(text))


def punct_count(text: str) -> int:
    """Characters that are not [A-Za-z0-9 ] — integer so oracles match."""
    return len(text) - len(NON_ALNUM_SPACE_RE.sub("", text))


def stopword_ratio(text: str) -> float:
    toks = [t.lower() for t in WORD_RE.findall(text)]
    if not toks:
        return 0.0
    return sum(t in STOPWORDS for t in toks) / len(toks)


def quality_score(text: str) -> float:
    """Composite quality heuristic in [0,1]: length, punctuation
    density, stopword presence, mean word length — the spirit of the
    reference's link-to-text junk ratio (utils.py:430-448) applied to
    documents."""
    n = len(text)
    if n == 0:
        return 0.0
    toks = WORD_RE.findall(text)
    if not toks:
        return 0.0
    mean_len = sum(len(t) for t in toks) / len(toks)
    len_score = min(n / 200.0, 1.0)
    punct_score = 1.0 - min(punct_count(text) / max(n, 1) * 4.0, 1.0)
    stop = stopword_ratio(text)
    stop_score = 1.0 - min(abs(stop - 0.3) / 0.3, 1.0)
    word_score = 1.0 - min(abs(mean_len - 5.0) / 5.0, 1.0)
    return round(0.3 * len_score + 0.2 * punct_score + 0.25 * stop_score + 0.25 * word_score, 6)


def detect_lang(text: str) -> str:
    """Character n-gram heuristic language ID. Returns a language code
    or 'und'."""
    if any("一" <= c <= "鿿" for c in text[:400]):
        return "zh"
    low = text.lower()[:1000]
    best, best_score = "und", 0
    for lang, grams in _LANG_TRIGRAMS.items():
        if not grams:
            continue
        score = sum(low.count(g) for g in grams)
        if score > best_score:
            best, best_score = lang, score
    return best if best_score >= 2 else "und"


def char_ngrams(text: str, n: int = 5) -> set[str]:
    t = " ".join(text.lower().split())
    if len(t) < n:
        return {t} if t else set()
    return {t[i : i + n] for i in range(len(t) - n + 1)}


def word_shingles(text: str, k: int = 3) -> set[str]:
    toks = [t.lower() for t in WORD_RE.findall(text)]
    if len(toks) < k:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


class TextStatsStage:
    """map_batches callable adding integer text statistics columns."""

    def __init__(self, text_column: str = "text"):
        self.text_column = text_column

    def __call__(self, batch):
        import pyarrow as pa

        texts = batch.column(self.text_column).to_pylist()
        batch = batch.append_column("n_chars_calc", pa.array([len(t) for t in texts], pa.int64()))
        batch = batch.append_column("n_tokens", pa.array([ws_token_count(t) for t in texts], pa.int64()))
        batch = batch.append_column("n_punct", pa.array([punct_count(t) for t in texts], pa.int64()))
        batch = batch.append_column(
            "n_bpe_tokens", pa.array([bpe_token_count(t) for t in texts], pa.int64())
        )
        return batch


def repetition_stats(text: str) -> tuple[int, int, int, int]:
    """Gopher-style repetition measures over the whitespace token
    stream (Rae et al. 2021 §A1.1 repetition filters, re-expressed on
    tokens since the synthetic corpus has no line structure):
    (n_bigrams, top_bigram_cnt, n_trigrams, dup_trigram_cnt).

    Integer outputs only — the keep decision is made by integer
    cross-multiplication so the DuckDB oracle matches exactly.
    """
    from collections import Counter

    toks = text.split(" ")
    bg = Counter(zip(toks, toks[1:]))
    n_bg = max(len(toks) - 1, 0)
    top = max(bg.values()) if bg else 0
    tg = Counter(zip(toks, toks[1:], toks[2:]))
    n_tg = max(len(toks) - 2, 0)
    dup_tg = n_tg - len(tg)
    return n_bg, top, n_tg, dup_tg


class RepetitionStatsStage:
    """map_batches callable: per-doc repetition stats + keep flag
    (keep iff top-bigram fraction <= 18% AND duplicate-trigram
    fraction <= 30%, both as exact integer comparisons)."""

    def __init__(self, text_column: str = "text"):
        self.text_column = text_column

    def __call__(self, batch):
        import pyarrow as pa

        stats = [repetition_stats(t) for t in batch.column(self.text_column).to_pylist()]
        n_bg, top, n_tg, dup = (
            [s[i] for s in stats] for i in range(4)
        )
        keep = [
            t * 100 <= b * 18 and d * 100 <= g * 30
            for b, t, g, d in stats
        ]
        batch = batch.append_column("n_bigrams", pa.array(n_bg, pa.int64()))
        batch = batch.append_column("top_bigram_cnt", pa.array(top, pa.int64()))
        batch = batch.append_column("n_trigrams", pa.array(n_tg, pa.int64()))
        batch = batch.append_column("dup_trigram_cnt", pa.array(dup, pa.int64()))
        return batch.append_column("keep", pa.array(keep, pa.bool_()))


def normalize_text(text: str) -> str:
    """Unicode hygiene as one pure scalar (M10, the visible form of the
    cleanUnicode pass utils.py:468-477): NFKC compatibility fold
    (fullwidth forms, NBSP → space, combining sequences composed),
    casefold, then collapse every whitespace run to a single space and
    strip. Deterministic; identical across processes."""
    import unicodedata

    n = unicodedata.normalize("NFKC", text).casefold()
    return " ".join(n.split())
