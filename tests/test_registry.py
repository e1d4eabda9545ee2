"""Registry invariants the driver's gate depends on.

The external correctness gate samples the FIRST 50 registry entries,
and the sf0.1 sweep tier skips exactly the golden-backed oracles —
both contracts live in data (dict order, GOLDEN_QUERIES), so guard
them with tests: a refactor that silently reorders the registry or
drops the golden flag would redirect the hard driver signal away from
the engine-critical code without failing anything else.
"""

from __future__ import annotations

from crawlerframework_ray.pipelines import queries as q


def test_sample_window_is_first_50():
    names = list(q.QUERIES)
    assert names[:50] == q._SAMPLE_WINDOW
    assert len(q._SAMPLE_WINDOW) == 50
    assert len(set(q._SAMPLE_WINDOW)) == 50


def test_every_query_has_an_oracle():
    missing = [n for n in q.QUERIES if n not in q.ORACLE_SQL]
    assert not missing, f"rows-only entries appeared: {missing}"
    stale = [n for n in q.ORACLE_SQL if n not in q.QUERIES]
    assert not stale


def test_golden_flag_matches_oracle_text():
    # the explicit set equals the ground truth (oracle reads the
    # absolute goldens path) — the invariant the sweep's --skip-goldens
    # tier relies on
    truth = {n for n, s in q.ORACLE_SQL.items() if q._GOLDEN_DIR in s}
    assert q.GOLDEN_QUERIES == truth
    assert len(q.GOLDEN_QUERIES) > 0


def test_catalog_frozen_size():
    # round-5 freeze (VERDICT r4 order #3): 440 entries. Growing this
    # number requires a new ENGINE capability needing a gate — update
    # this count (and _SAMPLE_WINDOW if engine-critical) deliberately.
    assert len(q.QUERIES) == 440
