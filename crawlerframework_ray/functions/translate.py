"""Translation stage (operator M13) — the external-model actor shape.

The reference called Google's translation HTTP API per page
(crawler/connectors/baseconnector.py:833-856: translate body+title when
the workspace's target language differs). No network exists here, so
the MODEL is a deterministic fake — word-level transformation — but the
Ray-side shape is the real one a neural MT model needs: a callable
CLASS for ``map_batches`` (actor pool), the model "loaded" once in
``__init__``, batched vectorized inference in ``__call__``, and a
``tgt_lang`` tag column. Swapping in a real model touches only
``_load_model`` / ``_translate_batch``.

The fake is SQL-expressible (per-word ``reverse``), so the catalog
query carries a full DuckDB oracle rather than a rows-only check.
"""

from __future__ import annotations

import pyarrow as pa

WORD_SPLIT = " "


class TranslationStage:
    """map_batches callable: ``text`` → ``translated`` + ``tgt_lang``."""

    def __init__(self, text_column: str = "text", tgt_lang: str = "xx"):
        self.text_column = text_column
        self.tgt_lang = tgt_lang
        self.model = self._load_model(tgt_lang)

    @staticmethod
    def _load_model(tgt_lang: str):
        # the expensive step in real life (weights onto device); here a
        # marker object proving per-actor init happens once
        return {"tgt": tgt_lang, "loaded": True}

    @staticmethod
    def _translate_batch(texts: list[str]) -> list[str]:
        # deterministic fake MT: reverse each whitespace token — batched,
        # pure, and reproducible by the DuckDB oracle
        return [WORD_SPLIT.join(w[::-1] for w in t.split(WORD_SPLIT)) for t in texts]

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_column).to_pylist()
        batch = batch.append_column(
            "translated", pa.array(self._translate_batch(texts), pa.string())
        )
        return batch.append_column(
            "tgt_lang", pa.array([self.tgt_lang] * len(texts), pa.string())
        )
