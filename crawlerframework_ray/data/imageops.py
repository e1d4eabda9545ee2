"""Image kernels: PSNR and 64-bit average perceptual hash.

These are the scorer-stage kernels (the T6 "model" slot of the
reference, SURVEY.md §2.3 — crawler/utils/nlp.py loaded NLTK pickles
once per process; here the analogous stateful stage decodes images and
computes phash/PSNR). Pure numpy, vectorized where shapes allow.
"""

from __future__ import annotations

import numpy as np


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images.

    Returns ``inf`` for identical images.
    """
    if a.shape != b.shape:
        raise ValueError(f"shape mismatch {a.shape} vs {b.shape}")
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10((255.0 * 255.0) / mse)


def _block_mean_gray(img: np.ndarray, n: int = 8) -> np.ndarray:
    """Grayscale + block-mean downsample to n×n. Requires h,w divisible
    by n (the synthetic generator only emits power-of-two sizes ≥ 8)."""
    h, w, _ = img.shape
    if h < n or w < n:
        # nearest-neighbor upsample so every n×n cell is non-empty
        # (augmentation crops can go below 8px; power-of-two dims make
        # the repeat land exactly on a multiple of n)
        img = img.repeat(-(-n // h), axis=0).repeat(-(-n // w), axis=1)
        h, w = img.shape[0], img.shape[1]
    if h % n or w % n:
        # crop to the largest multiple — keeps the kernel total
        h2, w2 = (h // n) * n, (w // n) * n
        img = img[:h2, :w2]
        h, w = h2, w2
    gray = img.astype(np.float64).mean(axis=2)
    return gray.reshape(n, h // n, n, w // n).mean(axis=(1, 3))


def average_hash(img: np.ndarray) -> int:
    """64-bit average hash as a *signed* int64 (Arrow ``phash: int64``).

    8×8 block-mean grayscale; bit i (MSB-first, row-major) set when the
    cell exceeds the global mean. Deterministic across platforms.
    """
    cells = _block_mean_gray(img, 8)
    bits = (cells > cells.mean()).flatten()
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    # reinterpret the uint64 bit pattern as int64
    return int(np.uint64(val).astype(np.int64))


def hamming64(a: int, b: int) -> int:
    """Hamming distance between two 64-bit hashes stored as int64."""
    x = (int(a) ^ int(b)) & 0xFFFFFFFFFFFFFFFF
    return bin(x).count("1")


def block_mean_pool(img: np.ndarray, k: int) -> np.ndarray:
    """k×k block-mean blur at constant size: floor-mean each k×k block,
    then nearest-neighbor re-expand — the deterministic integer blur
    used to PLANT focus levels for the sharpness gate (dims must be
    multiples of k; synthetic sizes are powers of two)."""
    h, w, c = img.shape
    blk = img.astype(np.int64).reshape(h // k, k, w // k, k, c).sum(axis=(1, 3)) // (k * k)
    return np.repeat(np.repeat(blk, k, axis=0), k, axis=1).astype(np.uint8)
