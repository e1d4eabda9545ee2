"""NER + sentiment stages (operator T6's text-model slots).

The reference ran Stanford NER over extracted text
(crawler/extractors/stanfordner.py:1-71 — a socket call per document
to a Java tagger) and a lexicon sentiment scorer inside the connector
callback (crawler/connectors/baseconnector.py:444-516). Neither model
ships in this environment, so — exactly like the translation stage
(functions/translate.py) — the MODEL is a deterministic fake behind
the real Ray shape: a callable class for ``map_batches`` (actor pool),
gazetteers/lexicon "loaded" once per actor in ``__init__``, batched
pure inference in ``__call__``. Swapping in a real tagger touches only
``_load_model``.

Both fakes are SQL-expressible (token-set membership over a
whitespace split), so the catalog queries carry full DuckDB oracles:

- NER: capitalized tokens classified by gazetteer membership
  (PERSON / ORG / LOC dictionaries — the broadcast-dict pattern the
  reference used for its gender dictionary, utils.py:47-76).
- Sentiment: signed lexicon sum over tokens → score + label; the
  synthetic corpus carries the lexicon words naturally ("fast",
  "slow", "dup", …), so this operator needs NO planted text.
"""

from __future__ import annotations

import pyarrow as pa

PERSONS = ("Alice", "Bob", "Carol", "Dave", "Erin", "Frank")
ORGS = ("Acme", "Globex", "Initech", "Umbrella")
LOCS = ("Paris", "London", "Tokyo", "Oslo", "Lima")

# signed sentiment lexicon over the synthetic corpus vocabulary
SENTIMENT = {
    "fast": 1,
    "big": 1,
    "vector": 1,
    "spark": 1,
    "slow": -1,
    "small": -1,
    "dup": -1,
    "skew": -1,
}


class NerSentimentStage:
    """map_batches callable: ``text`` → entity counts
    (``n_person``/``n_org``/``n_loc``), ``first_person``, sentiment
    ``sent_score`` and ``sent_label`` (pos / neg / neutral)."""

    def __init__(self, text_column: str = "text"):
        self.text_column = text_column
        self.model = self._load_model()

    @staticmethod
    def _load_model():
        # the per-actor load step (a real tagger would open the model
        # here); the fake's "weights" are the gazetteers + lexicon
        return {
            "person": frozenset(PERSONS),
            "org": frozenset(ORGS),
            "loc": frozenset(LOCS),
            "sentiment": dict(SENTIMENT),
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = self.model
        texts = batch.column(self.text_column).to_pylist()
        n_p, n_o, n_l, first_p, score, label = [], [], [], [], [], []
        for t in texts:
            toks = t.split(" ")
            p = [w for w in toks if w in m["person"]]
            n_p.append(len(p))
            n_o.append(sum(1 for w in toks if w in m["org"]))
            n_l.append(sum(1 for w in toks if w in m["loc"]))
            first_p.append(p[0] if p else "")
            s = sum(m["sentiment"].get(w, 0) for w in toks)
            score.append(s)
            label.append("pos" if s > 0 else ("neg" if s < 0 else "neutral"))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_person": pa.array(n_p, pa.int64()),
                "n_org": pa.array(n_o, pa.int64()),
                "n_loc": pa.array(n_l, pa.int64()),
                "first_person": pa.array(first_p, pa.string()),
                "sent_score": pa.array(score, pa.int64()),
                "sent_label": pa.array(label, pa.string()),
            }
        )
