"""Text-analysis kernel unit tests (no Ray needed)."""

from __future__ import annotations

from crawlerframework_ray.functions.hashing import content_hash, fingerprint64, task_id
from crawlerframework_ray.functions.textstats import (
    bpe_token_count,
    char_ngrams,
    detect_lang,
    jaccard,
    punct_count,
    quality_score,
    stopword_ratio,
    word_shingles,
    ws_token_count,
)


def test_ws_token_count():
    assert ws_token_count("a b  c") == 3
    assert ws_token_count("  a\tb\nc  ") == 3
    assert ws_token_count("") == 0
    assert ws_token_count("one") == 1


def test_bpe_token_count():
    assert bpe_token_count("hello world") == 2
    assert bpe_token_count("hello, world!") == 4  # , and ! are pieces
    assert bpe_token_count("abc123") == 2  # letter run + digit run


def test_punct_count():
    assert punct_count("a, b. c!") == 3
    assert punct_count("plain text 123") == 0


def test_stopword_ratio_and_quality():
    assert stopword_ratio("the cat and the dog") == 3 / 5
    assert 0.0 <= quality_score("The quick brown fox jumps over the lazy dog.") <= 1.0
    assert quality_score("") == 0.0
    assert quality_score("x" * 600) < quality_score(
        "The pipeline reads data and writes results to the table in a stream."
    )


def test_detect_lang_heuristic():
    assert detect_lang("The thing is that the theory of the things for that matter") == "en"
    assert detect_lang("la casa de el que en la ciudad de los que") == "es"
    assert detect_lang("ich und der einen schönen und die schule und") == "de"
    assert detect_lang("这是一个中文句子") == "zh"
    assert detect_lang("zzz qqq") == "und"


def test_shingles_and_jaccard():
    a = word_shingles("one two three four", 2)
    assert ("one two" in a) and ("three four" in a)
    assert jaccard(a, a) == 1.0
    assert jaccard(a, set()) == 0.0
    assert jaccard(set(), set()) == 1.0
    assert char_ngrams("abcd", 3) == {"abc", "bcd"}


def test_hashing_determinism():
    assert task_id("http://x/", 1) == task_id("http://x/", 1)
    assert task_id("http://x/", 1) != task_id("http://x/", 2)
    assert len(task_id("u", 1)) == 16
    assert fingerprint64("abc") == fingerprint64("abc")
    assert fingerprint64("abc") != fingerprint64("abd")
    assert -(2**63) <= fingerprint64("abc") < 2**63
    assert content_hash("a", "b") == content_hash("b", "a")  # sorted fields
