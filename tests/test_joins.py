"""Hot-key salting (survey §7.3): a pathological key holding 50% of the
probe rows must (a) produce exactly the unsalted/oracle join result and
(b) have its per-task peak rows bounded by ~hot/n_salts — the skew
contract hash_join's docstring promises."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray as _ray  # noqa: F401  (imported lazily inside tests via fixture)

N_EVENTS = 20_000
HOT_USER = 7


def _skewed_frames():
    """events: 50% of rows share user_id=HOT_USER; users: one row per id."""
    rng = np.random.default_rng(417)
    half = N_EVENTS // 2
    uid = np.concatenate([
        np.full(half, HOT_USER, dtype=np.int64),
        rng.integers(100, 600, size=N_EVENTS - half),
    ])
    ev = pd.DataFrame({
        "user_id": uid,
        "event_id": np.arange(N_EVENTS, dtype=np.int64),
        "amount": rng.integers(0, 1000, size=N_EVENTS).astype("int64"),
    })
    us = pd.DataFrame({
        "user_id": np.unique(uid),
    })
    us["segment"] = (us["user_id"] % 5).astype("int64")
    return ev, us


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("how", ["inner", "left"])
def test_salted_hash_join_matches_oracle(ray_session, how):
    import ray

    from crawlerframework_ray.stages.joins import hash_join

    ev, us = _skewed_frames()
    if how == "left":
        # leave some probe keys unmatched to exercise left semantics
        us = us[us["user_id"] % 7 != 3].reset_index(drop=True)
    oracle = ev.merge(us, on="user_id", how=how)

    out = hash_join(
        ray.data.from_pandas(ev), ray.data.from_pandas(us),
        "user_id", ["event_id", "amount"], ["segment"],
        how=how, n_buckets=8, n_salts=8,
    ).to_pandas()

    a, b = _canon(out), _canon(oracle)
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b)
    for c in a.columns:
        # unmatched left rows come back None (object) from Arrow vs NaN
        # (float) from pandas — compare on a common float/NaN footing
        av = pd.to_numeric(a[c], errors="raise").astype("float64").to_numpy()
        bv = pd.to_numeric(b[c], errors="raise").astype("float64").to_numpy()
        mask = np.isnan(av) & np.isnan(bv)
        assert ((av == bv) | mask).all(), c


def test_salting_bounds_per_task_peak_rows(ray_session):
    """The hot key's probe rows spread over n_salts sub-buckets.
    Verified with the SAME deterministic bucket/salt functions the join
    uses — the load each merge task receives is exactly the (bucket,
    salt) group size, and content-derived salts make it reproducible."""
    from crawlerframework_ray.stages.joins import _bucket_of, _salt_of

    ev, _ = _skewed_frames()
    n_buckets, n_salts = 8, 8
    hot = ev[ev["user_id"] == HOT_USER]
    assert len(hot) == N_EVENTS // 2

    # unsalted: every hot row lands in ONE bucket → one task holds >=50%
    unsalted = _bucket_of(ev["user_id"], n_buckets)
    hot_bucket = unsalted[ev["user_id"].to_numpy() == HOT_USER]
    assert np.unique(hot_bucket).size == 1

    # salted: hot rows spread across n_salts sub-buckets, peak bounded
    cols = ["user_id", "event_id", "amount"]
    salted = unsalted * n_salts + _salt_of(ev[cols], n_salts)
    hot_loads = pd.Series(salted[ev["user_id"].to_numpy() == HOT_USER]).value_counts()
    assert hot_loads.size == n_salts
    # per-task peak <= hot/n_salts * 1.5 slack (content hash is ~uniform)
    assert hot_loads.max() <= int(len(hot) / n_salts * 1.5)
