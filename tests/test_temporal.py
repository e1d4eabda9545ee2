"""Direct unit gates for the tier-3 temporal grammar (the catalog
oracle covers the planted distribution; these pin the helper edge
cases a uniform plant might miss)."""

from __future__ import annotations

import pyarrow as pa

from crawlerframework_ray.functions.temporal import (
    MONTH_LEN,
    TemporalExtractStageV3,
    ordinal_suffix,
)


def test_ordinal_suffix_edges():
    want = {1: "st", 2: "nd", 3: "rd", 4: "th", 11: "th", 12: "th",
            13: "th", 21: "st", 22: "nd", 23: "rd", 24: "th", 28: "th"}
    assert {d: ordinal_suffix(d) for d in want} == want


def test_month_lengths_non_leap():
    assert MONTH_LEN[1] == 28  # 2026 anchor year is not a leap year
    assert sum(MONTH_LEN) == 365


def test_v3_forms_on_handcrafted_text():
    stage = TemporalExtractStageV3()
    batch = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([
            "see you tomorrow and reply in 2 weeks at noon",
            "due June 3rd close by end of February at midnight yesterday",
            "no dates here",
        ], pa.string()),
    })
    out = stage(batch).to_pandas()
    # doc 0: tomorrow=2026-01-02, in 2 weeks=2026-01-15 -> min 01-02; noon
    r0 = out.iloc[0]
    assert (r0["n_bare"], r0["n_inrel"], r0["n_namedtime"]) == (1, 1, 1)
    assert r0["min_date3"] == "2026-01-02"
    assert r0["min_time3"] == "12:00"
    # doc 1: June 3rd=2026-06-03, end of Feb=2026-02-28 (non-leap),
    # yesterday=2025-12-31 -> min is yesterday; midnight
    r1 = out.iloc[1]
    assert (r1["n_monthday"], r1["n_eom"], r1["n_bare"], r1["n_namedtime"]) == (1, 1, 1, 1)
    assert r1["min_date3"] == "2025-12-31"
    assert r1["min_time3"] == "00:00"
    # doc 2: nothing
    r2 = out.iloc[2]
    assert r2["min_date3"] == "" and r2["min_time3"] == ""
    assert (r2[["n_bare", "n_inrel", "n_monthday", "n_eom", "n_namedtime"]] == 0).all()
