"""Codec + image-kernel unit tests (SURVEY.md §7.1 M0)."""

from __future__ import annotations

import numpy as np
import pytest

from crawlerframework_ray.data import codecs
from crawlerframework_ray.data.imageops import average_hash, hamming64, psnr


def _img(seed: int, h: int = 16, w: int = 24) -> np.ndarray:
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("fmt", ["raw", "png"])
def test_lossless_roundtrip(fmt):
    img = _img(1)
    out = codecs.decode(codecs.encode(img, fmt), fmt)
    np.testing.assert_array_equal(img, out)
    assert codecs.is_lossless(fmt)


def test_qds_lossy_psnr_above_40db():
    for seed in range(5):
        img = _img(seed, 32, 32)
        out = codecs.decode(codecs.encode(img, "qds"), "qds")
        assert not np.array_equal(img, out), "qds must be genuinely lossy"
        assert psnr(img, out) >= 40.0
    assert not codecs.is_lossless("qds")


def test_decode_autodetects_format():
    img = _img(2)
    for fmt in codecs.FORMATS:
        dec = codecs.decode(codecs.encode(img, fmt))
        assert psnr(img, dec) >= 40.0 or np.array_equal(img, dec)


def test_png_is_spec_conformant_signature_and_chunks():
    data = codecs.encode(_img(3), "png")
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    assert b"IHDR" in data and b"IDAT" in data and data.endswith(b"\xaeB`\x82")


def test_png_unfilter_sub_and_up():
    # hand-build a PNG with filters 1 (Sub) and 2 (Up) to exercise decode
    import struct
    import zlib

    w, h = 4, 2
    img = _img(4, h, w)
    row0 = img[0].reshape(-1).astype(np.int32)
    sub = row0.copy()
    sub[3:] = (row0[3:] - row0[:-3]) % 256
    row1 = img[1].reshape(-1).astype(np.int32)
    up = (row1 - row0) % 256
    raw = bytes([1]) + bytes(sub.astype(np.uint8)) + bytes([2]) + bytes(up.astype(np.uint8))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + codecs._chunk(b"IHDR", ihdr)
        + codecs._chunk(b"IDAT", zlib.compress(raw))
        + codecs._chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(codecs.decode_png(png), img)


def test_psnr_identical_is_inf():
    img = _img(5)
    assert psnr(img, img) == float("inf")


def test_average_hash_deterministic_and_int64():
    img = _img(6, 32, 32)
    h1, h2 = average_hash(img), average_hash(img)
    assert h1 == h2
    assert -(2**63) <= h1 < 2**63


def test_average_hash_similar_images_close():
    img = _img(7, 32, 32)
    noisy = img.copy()
    noisy[0, 0] = 255 - noisy[0, 0]  # flip one pixel
    assert hamming64(average_hash(img), average_hash(noisy)) <= 4
    other = _img(8, 32, 32)
    assert hamming64(average_hash(img), average_hash(other)) > 10


# ---------------------------------------------------------------- media (qvd/qau)


def test_qvd_roundtrip_lossless():
    from crawlerframework_ray.data import media

    frames = media.synth_video(123, w=16, h=8, n_frames=5)
    blob = media.encode_qvd(frames, fps=24)
    back, fps = media.decode_qvd(blob)
    assert fps == 24
    np.testing.assert_array_equal(back, frames)


def test_qvd_frames_differ_and_deterministic():
    from crawlerframework_ray.data import media

    a = media.synth_video(7, w=32, h=32, n_frames=4)
    b = media.synth_video(7, w=32, h=32, n_frames=4)
    np.testing.assert_array_equal(a, b)
    assert np.any(a[0] != a[1])  # frame sampling is observable
    assert np.any(a != media.synth_video(8, w=32, h=32, n_frames=4))


def test_qau_roundtrip_lossless():
    from crawlerframework_ray.data import media

    pcm = media.synth_audio(55, n_samples=4096, sample_rate=16000)
    blob = media.encode_qau(pcm, sample_rate=16000)
    back, rate = media.decode_qau(blob)
    assert rate == 16000
    assert back.dtype == np.int16
    np.testing.assert_array_equal(back, pcm)


def test_window_energies_exact():
    import math

    from crawlerframework_ray.data import media

    pcm = np.array([3, -4, 0, 0, 1, 1, 1, 1, 9], dtype=np.int16)  # trailing 9 dropped
    feats = media.window_energies(pcm, window=4)
    assert feats == [
        (0, 25, math.isqrt(25 * 1_000_000 // 4)),
        (1, 4, math.isqrt(4 * 1_000_000 // 4)),
    ]


def test_video_stage_external_format_stubbed():
    import pyarrow as pa
    import pytest

    from crawlerframework_ray.stages.multimodal import (
        AudioFeatureStage,
        VideoFrameSampleStage,
    )

    vbatch = pa.table(
        {"video_id": ["x"], "bytes": [b"\x00"], "fmt": ["mp4"]}
    )
    with pytest.raises(NotImplementedError):
        VideoFrameSampleStage(strict=True)(vbatch)
    assert len(VideoFrameSampleStage(strict=False)(vbatch)) == 0

    abatch = pa.table(
        {"audio_id": ["x"], "bytes": [b"\x00"], "fmt": ["mp3"]}
    )
    with pytest.raises(NotImplementedError):
        AudioFeatureStage(strict=True)(abatch)
    assert len(AudioFeatureStage(strict=False)(abatch)) == 0


def test_video_stage_samples_every_n():
    import pyarrow as pa

    from crawlerframework_ray.data import media
    from crawlerframework_ray.stages.multimodal import VideoFrameSampleStage

    frames = media.synth_video(3, w=8, h=8, n_frames=10)
    batch = pa.table(
        {
            "video_id": ["v3"],
            "bytes": [media.encode_qvd(frames, fps=5)],
            "fmt": ["qvd"],
        }
    )
    out = VideoFrameSampleStage(every_n=3)(batch)
    assert out.column("frame_idx").to_pylist() == [0, 3, 6, 9]
    from crawlerframework_ray.data import codecs

    got = codecs.decode_raw(out.column("bytes")[1].as_py())
    np.testing.assert_array_equal(got, frames[3])
