"""Deterministic pure-numpy video and audio containers.

The reference treats every payload as an opaque blob on disk fetched by
the connector loop (crawler/connectors/baseconnector.py:1140-1251);
this repo's multimodal rows carry the payload in a ``bytes: binary``
column with a ``fmt: string`` discriminator. No media libraries exist
in this environment, so — exactly like the image codecs in
``data/codecs.py`` — the video/audio containers are implemented from
scratch on numpy + zlib + struct, and the corpora are synthesized
deterministically (a pure function of an integer seed), so every stage
over them is oracle-checkable.

- ``qvd`` — lossless video: header (w, h, n_frames, fps) +
  zlib-compressed concatenation of raw RGB uint8 frames.
- ``qau`` — lossless audio: header (n_samples, sample_rate) +
  zlib-compressed int16 little-endian mono PCM.

External containers (mp4/webm/mp3/ogg/…) stay stubbed behind
``NotImplementedError`` in stages/multimodal.py — their decode needs
ffmpeg/soundfile; the Ray-side plumbing is shared with these codecs.

All synthesis is integer arithmetic (no float accumulation), so the
serial golden generators in tools/make_goldens.py reproduce stage
outputs bit-exactly WITHOUT going through the encode→decode round trip.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

VIDEO_FORMATS = ("qvd",)
AUDIO_FORMATS = ("qau",)


# ------------------------------------------------------------ synthesis

def synth_video(seed: int, w: int = 32, h: int = 32, n_frames: int = 16) -> np.ndarray:
    """Deterministic (n_frames, h, w, 3) uint8 video.

    Frame f is a seed-keyed integer gradient rolled horizontally by a
    seed-dependent stride and brightness-stepped per frame — so
    consecutive frames differ (frame sampling is observable) and every
    pixel is a pure integer function of (seed, f, y, x, c).
    """
    seed = int(seed) & 0x7FFFFFFF
    r = (seed * 2654435761) & 0xFFFFFFFF
    ys = np.arange(h, dtype=np.int64)[:, None]
    xs = np.arange(w, dtype=np.int64)[None, :]
    base = (ys * 31 + xs * 17 + r) % 256  # (h, w)
    stride = 1 + seed % 5
    frames = np.empty((n_frames, h, w, 3), dtype=np.uint8)
    for f in range(n_frames):
        plane = np.roll(base, f * stride, axis=1)
        for c in range(3):
            frames[f, :, :, c] = ((plane + f * 7 + c * 85) % 256).astype(np.uint8)
    return frames


def scene_lengths(seed: int) -> list[int]:
    """Planted scene structure of :func:`synth_scene_video` — the
    number of scenes and each scene's frame count as a pure function of
    the seed, restated by the golden generator so the scene-cut
    DETECTOR is gated against construction arithmetic it never sees."""
    seed = int(seed) & 0x7FFFFFFF
    n_scenes = 2 + seed % 3
    return [4 + ((seed >> 8) + 5 * j) % 3 for j in range(n_scenes)]


def synth_scene_video(seed: int, w: int = 32, h: int = 32) -> np.ndarray:
    """Deterministic multi-scene clip with HARD cuts: each scene is an
    independent seed-keyed noise plane brightness-stepped +3 per frame
    (within-scene adjacent-frame mean |diff| ≈ 6/pixel incl. mod-256
    wraps), while scene boundaries jump to an independent plane
    (mean |diff| ≈ 85/pixel) — a >10× separation for threshold-based
    scene-cut detection. Pixels are pure integer functions of
    (seed, scene, y, x, c); scene count/lengths come from
    :func:`scene_lengths`."""
    seed = int(seed) & 0x7FFFFFFF
    frames: list[np.ndarray] = []
    for j, n_f in enumerate(scene_lengths(seed)):
        rng = np.random.Generator(np.random.PCG64(seed * 1_000_003 + j * 7_777_777))
        base = rng.integers(0, 256, size=(h, w), dtype=np.int64)
        for f in range(n_f):
            plane = (base + f * 3) % 256
            for_c = [(plane + c * 85) % 256 for c in range(3)]
            frames.append(np.stack(for_c, axis=2).astype(np.uint8))
    return np.stack(frames)


def plant_audio_defects(seed: int) -> tuple[list[int], int]:
    """Planted defect layout for the audio-quality gate, as pure seed
    arithmetic (restated by the golden generator, never by the
    detector): over the default 8-window layout (8192 samples / 1024),
    ``seed % 3`` silent windows on even indices and — when
    ``(seed >> 2) % 2`` — one hard-clipped window on an odd index
    (disjoint from the silent ones by parity). Returns
    (silent_window_indices, clipped_window_index_or_-1)."""
    seed = int(seed) & 0x7FFFFFFF
    sil = [2 * ((seed + j) % 4) for j in range(seed % 3)]
    clip = 2 * ((seed * 3) % 4) + 1 if (seed >> 2) % 2 else -1
    return sil, clip


def synth_defective_audio(seed: int, window: int = 1024) -> np.ndarray:
    """:func:`synth_audio` with :func:`plant_audio_defects` applied —
    silent windows zeroed, the clipped window forced to signed int16
    full scale (the clean waveform never exceeds ~11,250, so every
    full-scale sample is planted)."""
    pcm = synth_audio(seed)
    sil, clip = plant_audio_defects(seed)
    for wi in sil:
        pcm[wi * window : (wi + 1) * window] = 0
    if clip >= 0:
        span = pcm[clip * window : (clip + 1) * window]
        pcm[clip * window : (clip + 1) * window] = np.where(span >= 0, 32767, -32767).astype(
            np.int16
        )
    return pcm


def synth_audio(seed: int, n_samples: int = 8192, sample_rate: int = 8000) -> np.ndarray:
    """Deterministic int16 mono PCM: a seed-keyed triangle wave plus
    LCG "noise", all integer arithmetic (exactly reproducible)."""
    seed = int(seed) & 0x7FFFFFFF
    period = 64 + seed % 192
    amp = 4000 + (seed % 8) * 1000
    i = np.arange(n_samples, dtype=np.int64)
    phase = i % period
    # triangle in [-amp, +amp]
    tri = np.where(phase * 2 < period, phase * 4 - period, 3 * period - phase * 4)
    tri = tri * amp // period
    noise = (((i * 1103515245 + seed) >> 16) % 501) - 250
    return (tri + noise).astype(np.int16)


# ------------------------------------------------------------ qvd codec

def encode_qvd(frames: np.ndarray, fps: int = 10) -> bytes:
    if frames.dtype != np.uint8 or frames.ndim != 4 or frames.shape[3] != 3:
        raise ValueError(f"expected uint8 NxHxWx3 frames, got {frames.dtype} {frames.shape}")
    n, h, w, _ = frames.shape
    return b"QVD1" + struct.pack("<HHHH", w, h, n, fps) + zlib.compress(frames.tobytes(), 6)


def decode_qvd(data: bytes) -> tuple[np.ndarray, int]:
    """→ (frames (n,h,w,3) uint8, fps)."""
    if data[:4] != b"QVD1":
        raise ValueError("not a QVD1 video")
    w, h, n, fps = struct.unpack("<HHHH", data[4:12])
    frames = np.frombuffer(zlib.decompress(data[12:]), dtype=np.uint8).reshape(n, h, w, 3)
    return frames.copy(), fps


# ------------------------------------------------------------ qau codec

def encode_qau(pcm: np.ndarray, sample_rate: int = 8000) -> bytes:
    if pcm.dtype != np.int16 or pcm.ndim != 1:
        raise ValueError(f"expected int16 mono PCM, got {pcm.dtype} {pcm.shape}")
    return (
        b"QAU1"
        + struct.pack("<IH", pcm.shape[0], sample_rate)
        + zlib.compress(pcm.astype("<i2").tobytes(), 6)
    )


def decode_qau(data: bytes) -> tuple[np.ndarray, int]:
    """→ (int16 mono PCM, sample_rate)."""
    if data[:4] != b"QAU1":
        raise ValueError("not a QAU1 audio clip")
    n, rate = struct.unpack("<IH", data[4:10])
    pcm = np.frombuffer(zlib.decompress(data[10:]), dtype="<i2")[:n]
    return pcm.astype(np.int16), rate


# ------------------------------------------------------------ features

def window_energies(pcm: np.ndarray, window: int) -> list[tuple[int, int, int]]:
    """Exact per-window features: (window_idx, sum_sq:int64,
    rms_milli:int64). rms_milli = isqrt(sum_sq·10⁶ / window) — integer
    floor of 1000·RMS, identical on every platform (math.isqrt, no
    float path). Trailing partial windows are dropped."""
    import math

    n_win = pcm.shape[0] // window
    if n_win == 0:
        return []
    sq = pcm[: n_win * window].astype(np.int64) ** 2
    sums = sq.reshape(n_win, window).sum(axis=1)
    return [
        (i, int(s), math.isqrt(int(s) * 1_000_000 // window)) for i, s in enumerate(sums)
    ]
