"""Elias–Fano codec: round-trip + closed-form size on adversarial and
random sorted sets."""

from __future__ import annotations

import numpy as np
import pytest

from crawlerframework_ray.data.eliasfano import (
    ef_bit_size,
    ef_decode,
    ef_encode,
)


def _check(vals):
    vals = np.asarray(vals, dtype=np.int64)
    packed, l = ef_encode(vals)
    l2, bits = ef_bit_size(len(vals), int(vals[-1]))
    assert l == l2
    assert len(packed) == (bits + 7) // 8
    assert np.array_equal(ef_decode(packed, len(vals), l), vals)


def test_edge_shapes():
    _check([0])
    _check([7])
    _check([0, 1, 2, 3])          # dense: u//m == 1, l == 0
    _check([0, 1000000])          # sparse pair
    _check(np.arange(0, 4096, 7))
    _check([5, 6, 1 << 40])


def test_random_sets():
    rng = np.random.default_rng(3)
    for _ in range(30):
        n = int(rng.integers(1, 300))
        u = int(rng.integers(n, n * 50 + 2))
        vals = np.sort(rng.choice(u, size=n, replace=False))
        _check(vals)


def test_rejects_bad_input():
    with pytest.raises(ValueError):
        ef_encode(np.array([], dtype=np.int64))
    with pytest.raises(ValueError):
        ef_encode(np.array([3, 3], dtype=np.int64))
    with pytest.raises(ValueError):
        ef_encode(np.array([5, 2], dtype=np.int64))
