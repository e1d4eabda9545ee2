"""Boolean keyword filter DSL (operator M8, SURVEY.md §2.2).

Same expression language as the reference's keyword filter
(crawler/keywordfilter.py:22-136 + tokenizer crawler/utils/pshlex.py):
infix boolean expressions over a document's word set —

    ``data and (model or "error rate") and not spam*``

- bare words match a token exactly (case-insensitive)
- ``"quoted phrases"`` match as consecutive-token subsequences
- ``pre*`` prefix / ``*suf`` suffix wildcards
- ``and`` / ``or`` / ``not`` with parentheses; shunting-yard parse

Implemented from scratch: compile once per actor (the expression →
RPN), evaluate per document against a frozenset of tokens. The filter
semantics used by the engine mirror baseconnector.py:218-342: an
exclusion match drops the row, a filter expression must match to keep
the row.
"""

from __future__ import annotations

import re

TOKEN_RE = re.compile(r"\w+", re.UNICODE)

_PRECEDENCE = {"not": 3, "and": 2, "or": 1}


def tokenize_doc(text: str) -> list[str]:
    return [t.lower() for t in TOKEN_RE.findall(text)]


def _lex(expression: str) -> list[str]:
    out: list[str] = []
    i, n = 0, len(expression)
    while i < n:
        c = expression[i]
        if c.isspace():
            i += 1
        elif c in "()":
            out.append(c)
            i += 1
        elif c == '"':
            j = expression.index('"', i + 1)
            out.append(expression[i : j + 1])
            i = j + 1
        else:
            m = re.match(r"[^\s()\"]+", expression[i:])
            out.append(m.group(0))
            i += len(m.group(0))
    return out


def _to_rpn(tokens: list[str]) -> list[str]:
    """Shunting-yard with implicit AND between adjacent terms."""
    out: list[str] = []
    ops: list[str] = []
    prev_term = False
    for tok in tokens:
        low = tok.lower()
        if low in _PRECEDENCE:
            while (
                ops
                and ops[-1] != "("
                and _PRECEDENCE.get(ops[-1], 0) >= _PRECEDENCE[low]
                and low != "not"
            ):
                out.append(ops.pop())
            ops.append(low)
            prev_term = False
        elif tok == "(":
            if prev_term:
                _push_and(out, ops)
            ops.append(tok)
            prev_term = False
        elif tok == ")":
            while ops and ops[-1] != "(":
                out.append(ops.pop())
            if not ops:
                raise ValueError("unbalanced parentheses")
            ops.pop()
            prev_term = True
        else:
            if prev_term:
                _push_and(out, ops)
            out.append(tok)
            prev_term = True
    while ops:
        op = ops.pop()
        if op == "(":
            raise ValueError("unbalanced parentheses")
        out.append(op)
    return out


def _push_and(out: list[str], ops: list[str]) -> None:
    while ops and ops[-1] != "(" and _PRECEDENCE.get(ops[-1], 0) >= _PRECEDENCE["and"]:
        out.append(ops.pop())
    ops.append("and")


class CompiledExpression:
    """A keyword expression compiled to RPN; evaluate per document."""

    def __init__(self, expression: str):
        self.expression = expression
        self.rpn = _to_rpn(_lex(expression))

    def _match_term(self, term: str, tokens: list[str], token_set: frozenset) -> bool:
        term = term.lower()
        if term.startswith('"') and term.endswith('"'):
            phrase = tokenize_doc(term[1:-1])
            if not phrase:
                return False
            k = len(phrase)
            return any(tokens[i : i + k] == phrase for i in range(len(tokens) - k + 1))
        if term.endswith("*") and not term.startswith("*"):
            pre = term[:-1]
            return any(t.startswith(pre) for t in token_set)
        if term.startswith("*") and not term.endswith("*"):
            suf = term[1:]
            return any(t.endswith(suf) for t in token_set)
        return term in token_set

    def matches(self, text: str) -> bool:
        tokens = tokenize_doc(text)
        token_set = frozenset(tokens)
        stack: list[bool] = []
        for tok in self.rpn:
            if tok == "not":
                stack.append(not stack.pop())
            elif tok == "and":
                b, a = stack.pop(), stack.pop()
                stack.append(a and b)
            elif tok == "or":
                b, a = stack.pop(), stack.pop()
                stack.append(a or b)
            else:
                stack.append(self._match_term(tok, tokens, token_set))
        if len(stack) != 1:
            raise ValueError(f"bad expression: {self.expression!r}")
        return stack[0]


class KeywordFilterStage:
    """map_batches callable: compile expressions once per actor, keep
    rows where the filter expression matches and no exclusion matches
    (baseconnector.py:283-301 semantics)."""

    def __init__(
        self,
        text_column: str,
        filter_expression: str | None = None,
        exclude_expression: str | None = None,
    ):
        self.text_column = text_column
        self.filter = CompiledExpression(filter_expression) if filter_expression else None
        self.exclude = CompiledExpression(exclude_expression) if exclude_expression else None

    def __call__(self, batch):
        import pyarrow as pa

        texts = batch.column(self.text_column).to_pylist()
        mask = []
        for t in texts:
            keep = True
            if self.exclude is not None and self.exclude.matches(t):
                keep = False
            elif self.filter is not None and not self.filter.matches(t):
                keep = False
            mask.append(keep)
        return batch.filter(pa.array(mask, pa.bool_()))
