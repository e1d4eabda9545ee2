"""Rules engine (operator M12, SURVEY.md §2.2).

The reference evaluated per-workspace rule rows "if Checks.X(param)
then Actions.Y(param)" on every page (crawler/utils/checksandactions.py:
20-49, applied at baseconnector.py:859-871). Here a rule is a (check,
action) pair compiled once per worker; the rule list is broadcast by
closure and applied vectorized per batch.

Checks: keyword boolean expression match (M8 DSL), lang equality,
quality threshold. Actions: add a tag, set relevancy, drop the row.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa

from .keywordfilter import CompiledExpression
from .textstats import quality_score


@dataclass(frozen=True)
class Rule:
    check: str        # "keyword" | "lang_is" | "quality_below"
    check_param: str
    action: str       # "add_tag" | "set_relevancy" | "drop"
    action_param: str


class RulesStage:
    """map_batches callable: compile checks once, evaluate per row,
    emit ``tags`` (sorted, space-joined — deterministic) and
    ``relevancy`` columns; drop rows whose matched rule says so."""

    def __init__(self, rules: list[Rule], text_column: str = "text",
                 lang_column: str | None = None):
        self.rules = list(rules)
        self.text_column = text_column
        self.lang_column = lang_column
        self.compiled = {
            r.check_param: CompiledExpression(r.check_param)
            for r in self.rules
            if r.check == "keyword"
        }

    def _check(self, rule: Rule, text: str, lang: str | None) -> bool:
        if rule.check == "keyword":
            return self.compiled[rule.check_param].matches(text)
        if rule.check == "lang_is":
            return lang == rule.check_param
        if rule.check == "quality_below":
            return quality_score(text) < float(rule.check_param)
        raise ValueError(f"unknown check {rule.check}")

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_column).to_pylist()
        langs = (
            batch.column(self.lang_column).to_pylist()
            if self.lang_column and self.lang_column in batch.schema.names
            else [None] * len(texts)
        )
        tags_out, relevancy_out, keep = [], [], []
        for text, lang in zip(texts, langs):
            tags: set[str] = set()
            relevancy = 1.0
            dropped = False
            for rule in self.rules:
                if not self._check(rule, text, lang):
                    continue
                if rule.action == "add_tag":
                    tags.add(rule.action_param)
                elif rule.action == "set_relevancy":
                    relevancy = float(rule.action_param)
                elif rule.action == "drop":
                    dropped = True
                    break
                else:
                    raise ValueError(f"unknown action {rule.action}")
            keep.append(not dropped)
            tags_out.append(" ".join(sorted(tags)))
            relevancy_out.append(relevancy)
        batch = batch.append_column("tags", pa.array(tags_out, pa.string()))
        batch = batch.append_column("relevancy", pa.array(relevancy_out, pa.float64()))
        return batch.filter(pa.array(keep, pa.bool_()))
