"""Golomb–Rice codec: round-trip + closed-form size + optimal-k sweep."""

from __future__ import annotations

import numpy as np
import pytest

from crawlerframework_ray.data.rice import (
    rice_best_k,
    rice_decode,
    rice_encode,
    rice_gaps,
    rice_total_bits,
)


def _check(vals, k):
    vals = np.asarray(vals, dtype=np.int64)
    packed = rice_encode(vals, k)
    bits = rice_total_bits(rice_gaps(vals), k)
    assert len(packed) == (bits + 7) // 8
    assert np.array_equal(rice_decode(packed, len(vals), k), vals)


def test_round_trip_shapes():
    for k in (0, 1, 3, 7):
        _check([0], k)
        _check([5], k)
        _check([0, 1, 2, 3, 4], k)
        _check([3, 10, 200, 201, 4096], k)


def test_random_round_trips():
    rng = np.random.default_rng(11)
    for _ in range(25):
        n = int(rng.integers(1, 120))
        u = int(rng.integers(n, n * 40 + 2))
        vals = np.sort(rng.choice(u, size=n, replace=False))
        k = rice_best_k(rice_gaps(vals))
        _check(vals, k)


def test_best_k_is_argmin():
    vals = np.array([0, 64, 128, 192, 256, 320], dtype=np.int64)
    gaps = rice_gaps(vals)
    k = rice_best_k(gaps)
    bits = [rice_total_bits(gaps, kk) for kk in range(21)]
    assert bits[k] == min(bits)
    assert k == bits.index(min(bits))  # smallest k on ties


def test_rejects_bad_input():
    with pytest.raises(ValueError):
        rice_gaps(np.array([], dtype=np.int64))
    with pytest.raises(ValueError):
        rice_gaps(np.array([4, 4], dtype=np.int64))
