"""Multi-pattern substring scanning: the Aho–Corasick automaton
(Aho & Corasick, CACM 1975) behind an actor-pool ``map_batches`` stage.

The reference scans page text for workspace keyword sets one pattern at
a time (`crawler/baseconnector.py` keyword filtering loops patterns per
page); at 100 TB the right shape is ONE automaton pass per document —
O(len(text) + matches) regardless of pattern-set size — with the
automaton built once per actor in ``__init__``, never per batch.

Counts are ALL (overlapping) occurrences: a match is recorded at every
end position, for every pattern on the output chain — the exact
semantics a position-expansion SQL oracle reproduces independently.
"""

from __future__ import annotations

from collections import deque

import numpy as np
import pandas as pd
import pyarrow as pa


class AhoCorasick:
    """Classic goto/fail/output automaton over raw characters.

    ``count(text)`` returns an int64 vector of per-pattern occurrence
    counts (all overlapping occurrences; nested patterns each counted
    via the output chain).
    """

    def __init__(self, patterns: list[str]):
        if len(set(patterns)) != len(patterns):
            raise ValueError("duplicate patterns")
        self.patterns = list(patterns)
        # trie: list of dicts char -> state
        self.goto: list[dict[str, int]] = [{}]
        self.out: list[list[int]] = [[]]
        for pi, p in enumerate(self.patterns):
            if not p:
                raise ValueError("empty pattern")
            s = 0
            for ch in p:
                nxt = self.goto[s].get(ch)
                if nxt is None:
                    nxt = len(self.goto)
                    self.goto[s][ch] = nxt
                    self.goto.append({})
                    self.out.append([])
                s = nxt
            self.out[s].append(pi)
        # failure links (BFS) + output-chain folding
        self.fail = [0] * len(self.goto)
        q: deque[int] = deque()
        for s in self.goto[0].values():
            q.append(s)
        while q:
            r = q.popleft()
            for ch, s in self.goto[r].items():
                q.append(s)
                f = self.fail[r]
                while f and ch not in self.goto[f]:
                    f = self.fail[f]
                nxt = self.goto[f].get(ch, 0)
                # root children enter the queue with fail already 0;
                # for depth>=2 states nxt is strictly shallower than s
                self.fail[s] = 0 if nxt == s else nxt
                self.out[s] = self.out[s] + self.out[self.fail[s]]

    def count(self, text: str) -> np.ndarray:
        counts = np.zeros(len(self.patterns), dtype=np.int64)
        s = 0
        goto, fail, out = self.goto, self.fail, self.out
        for ch in text:
            while s and ch not in goto[s]:
                s = fail[s]
            s = goto[s].get(ch, 0)
            for pi in out[s]:
                counts[pi] += 1
        return counts


class MultiPatternScanStage:
    """Actor-pool stage: automaton built ONCE per actor (``__init__``),
    each batch folds to per-pattern partials (n_matches, n_docs) — the
    driver-visible output after the final groupby is O(patterns)."""

    def __init__(self, patterns: list[str]):
        self.ac = AhoCorasick(patterns)
        self.patterns = np.asarray(patterns, dtype=object)

    def __call__(self, t: pa.Table) -> pd.DataFrame:
        n_matches = np.zeros(len(self.patterns), dtype=np.int64)
        n_docs = np.zeros(len(self.patterns), dtype=np.int64)
        for txt in t.column("text").to_pylist():
            c = self.ac.count(txt)
            n_matches += c
            n_docs += c > 0
        return pd.DataFrame(
            {
                "pattern": self.patterns,
                "n_matches": n_matches,
                "n_docs": n_docs,
            }
        ).astype({"n_matches": "int64", "n_docs": "int64"})
