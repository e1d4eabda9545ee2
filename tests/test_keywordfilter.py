"""Keyword boolean DSL conformance (FIXTURES.md F6 truth table)."""

from __future__ import annotations

import pytest

from crawlerframework_ray.functions.keywordfilter import CompiledExpression

DOC = "The quick Error Rate was measured; data-driven models spark joy. Preprocessing helps."

CASES = [
    ("data", True),
    ("banana", False),
    ("data and models", True),
    ("data and banana", False),
    ("data or banana", True),
    ("banana or kiwi", False),
    ("not banana", True),
    ("not data", False),
    ("data and not banana", True),
    ("data and not models", False),
    ('"error rate"', True),
    ('"rate error"', False),
    ('"data driven models"', True),  # punctuation splits to tokens
    ("(data or banana) and (models or kiwi)", True),
    ("(banana or kiwi) and data", False),
    ("pre*", True),       # prefix wildcard: Preprocessing
    ("zzz*", False),
    ("*processing", True),  # suffix wildcard
    ("*zzz", False),
    ("data models", True),   # implicit AND
    ("data banana", False),
    ("not (banana or kiwi)", True),
    ("QUICK and ERROR", True),  # case-insensitive
]


@pytest.mark.parametrize("expr,expected", CASES)
def test_expression(expr, expected):
    assert CompiledExpression(expr).matches(DOC) is expected


def test_unbalanced_parens_raise():
    with pytest.raises(ValueError):
        CompiledExpression("(data and (models)").matches(DOC)


def test_exclusion_semantics():
    """baseconnector.py:283-301: exclusion match drops, filter must match."""
    from crawlerframework_ray.functions.keywordfilter import KeywordFilterStage
    import pyarrow as pa

    stage = KeywordFilterStage("text", filter_expression="data", exclude_expression="spam*")
    batch = pa.table({"text": ["data here", "data but spammy", "no match", "spam data"]})
    kept = stage(batch).column("text").to_pylist()
    assert kept == ["data here"]
