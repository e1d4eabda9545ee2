"""Deterministic hash-threshold sampling (training-data subsampling).

The reference's only sampling was a display-time ``show_sample`` in its
XLS exporter (crawler/utils/export_xls.py); a 100-TB corpus pipeline
needs real per-stratum downsampling (e.g. cap the dominant language).
This sampler is a pure row function — Knuth multiplicative hash of the
id against a per-stratum parts-per-million threshold — so it is
embarrassingly parallel (no shuffle, no state, no RNG), reproducible
across cluster sizes and retries, and expressible in ANSI SQL for the
oracle: ``((id * 2654435761) % 4294967296) % 1000000 < rate_ppm``.
"""

from __future__ import annotations

import numpy as np

KNUTH = 2654435761
M32 = 4_294_967_296
PPM = 1_000_000


def hash_ppm(ids: np.ndarray) -> np.ndarray:
    """Deterministic uniform draw in [0, 1e6) per id (uint64 math —
    no 2^64 wrap for any int64 id × KNUTH)."""
    h = (ids.astype(np.uint64) * np.uint64(KNUTH)) % np.uint64(M32)
    return (h % np.uint64(PPM)).astype(np.int64)


def stratified_sample_mask(
    ids: np.ndarray, strata: list[str], rates_ppm: dict[str, int], default_ppm: int = 0
) -> np.ndarray:
    """Boolean keep-mask: id is kept iff its hash draw falls under its
    stratum's ppm rate."""
    draw = hash_ppm(ids)
    thresholds = np.array([rates_ppm.get(s, default_ppm) for s in strata], dtype=np.int64)
    return draw < thresholds
