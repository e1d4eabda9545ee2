"""Aho–Corasick automaton vs brute-force overlapping counts."""

from __future__ import annotations

import numpy as np

from crawlerframework_ray.functions.multipattern import AhoCorasick


def _brute(text: str, pat: str) -> int:
    return sum(
        1 for i in range(len(text) - len(pat) + 1)
        if text[i:i + len(pat)] == pat
    )


def test_overlapping_and_nested_counts():
    pats = ["aba", "ba", "a", "abab", "c"]
    ac = AhoCorasick(pats)
    for text in ["ababa", "abababab", "aaaa", "cabac", "", "b", "ababab" * 3]:
        got = ac.count(text)
        want = np.array([_brute(text, p) for p in pats])
        assert (got == want).all(), (text, got, want)


def test_deterministic_random_streams():
    rng = np.random.default_rng(7)
    alphabet = "abc "
    pats = ["ab", "abc", "b c", "ca", "aa", "c a b"]
    ac = AhoCorasick(pats)
    for _ in range(40):
        n = int(rng.integers(0, 200))
        text = "".join(alphabet[i] for i in rng.integers(0, len(alphabet), n))
        got = ac.count(text)
        want = np.array([_brute(text, p) for p in pats])
        assert (got == want).all()


def test_word_phrase_patterns():
    pats = ["join order", "batch batch", "window"]
    ac = AhoCorasick(pats)
    text = "window join order batch batch batch window windowindow"
    got = ac.count(text)
    # "batch batch batch" holds TWO overlapping "batch batch";
    # "windowindow" holds two overlapping "window"
    assert got.tolist() == [1, 2, 4]
