"""Query catalog: the operator-coverage surface for the duckdb gate.

Each entry is one operator/pipeline from SURVEY.md §2 re-expressed as a
Ray Data pipeline over the driver's TPC-H-ish tables; ORACLE_SQL holds
the DuckDB-equivalent statement where SQL can express the semantics.
Column names match between both sides (the driver hashes values under
sorted column names).
"""

from __future__ import annotations

QUERIES: dict = {}
ORACLE_SQL: dict = {}


def register(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE_SQL[name] = sql
        return fn

    return deco
