"""Unit tests for the round-4 image/video curation stages (sharpness,
border, scene-cut) — stage-level edges the oracle-gated catalog queries
don't isolate: strict-mode stubs, degenerate inputs, and the plant
helpers' exact arithmetic. Stages are plain callables over pa.Table, so
no Ray session is needed here."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from crawlerframework_ray.data import codecs
from crawlerframework_ray.data.imageops import block_mean_pool
from crawlerframework_ray.data.media import encode_qvd, scene_lengths, synth_scene_video, synth_video
from crawlerframework_ray.stages.multimodal import (
    ImageBorderStage,
    ImageSharpnessStage,
    VideoSceneCutStage,
)


def _img_batch(img: np.ndarray, fmt: str = "raw") -> pa.Table:
    return pa.table(
        {
            "image_id": pa.array(["x"], pa.string()),
            "bytes": pa.array([codecs.encode_raw(img) if fmt == "raw" else b""], pa.binary()),
            "fmt": pa.array([fmt], pa.string()),
        }
    )


def test_block_mean_pool_exact():
    img = np.arange(2 * 4 * 3, dtype=np.uint8).reshape(2, 4, 3)
    out = block_mean_pool(img, 2)
    assert out.shape == img.shape
    # block (0,0): channel 0 values {0, 3, 12, 15} → floor-mean 7
    assert out[0, 0, 0] == 7 and (out[:2, :2, 0] == 7).all()


def test_sharpness_flat_image_is_blurry_zero():
    t = ImageSharpnessStage()(_img_batch(np.full((8, 8, 3), 9, np.uint8)))
    assert t.column("lap_milli").to_pylist() == [0]
    assert t.column("label").to_pylist() == ["blurry"]


def test_sharpness_strict_stub_on_external_format():
    stage = ImageSharpnessStage()
    with pytest.raises(NotImplementedError):
        stage(_img_batch(np.zeros((8, 8, 3), np.uint8), fmt="jpeg"))
    lenient = ImageSharpnessStage(strict=False)
    assert len(lenient(_img_batch(np.zeros((8, 8, 3), np.uint8), fmt="jpeg"))) == 0


def test_border_detects_planted_bars_and_edges():
    rng = np.random.Generator(np.random.PCG64(7))
    content = rng.integers(0, 256, size=(10, 8, 3), dtype=np.uint8)
    bar_top = np.full((3, 8, 3), 200, np.uint8)
    bar_bot = np.full((5, 8, 3), 13, np.uint8)
    img = np.concatenate([bar_top, content, bar_bot], axis=0)
    t = ImageBorderStage()(_img_batch(img))
    assert t.column("top_border").to_pylist() == [3]
    assert t.column("bottom_border").to_pylist() == [5]
    assert t.column("content_rows").to_pylist() == [10]


def test_border_fully_uniform_image_is_all_border():
    t = ImageBorderStage()(_img_batch(np.full((6, 4, 3), 42, np.uint8)))
    assert t.column("top_border").to_pylist() == [6]
    assert t.column("bottom_border").to_pylist() == [0]
    assert t.column("content_rows").to_pylist() == [0]


def _vid_batch(frames: np.ndarray, fmt: str = "qvd") -> pa.Table:
    return pa.table(
        {
            "video_id": pa.array(["v"], pa.string()),
            "bytes": pa.array([encode_qvd(frames) if fmt == "qvd" else b""], pa.binary()),
            "fmt": pa.array([fmt], pa.string()),
        }
    )


def test_scene_cut_single_scene_has_zero_cuts():
    # synth_video: rolling gradient, smooth motion — no cut anywhere
    t = VideoSceneCutStage()(_vid_batch(synth_video(5, w=16, h=16, n_frames=8)))
    assert t.column("n_cuts").to_pylist() == [0]
    assert t.column("n_frames").to_pylist() == [8]


@pytest.mark.parametrize("seed", [0, 1, 2, 17, 123])
def test_scene_cut_matches_plant_arithmetic(seed):
    lens = scene_lengths(seed)
    t = VideoSceneCutStage()(_vid_batch(synth_scene_video(seed, w=16, h=16)))
    assert t.column("n_frames").to_pylist() == [sum(lens)]
    assert t.column("n_cuts").to_pylist() == [len(lens) - 1]


def test_scene_cut_strict_stub_on_external_container():
    with pytest.raises(NotImplementedError):
        VideoSceneCutStage()(_vid_batch(synth_video(1, 16, 16, 4), fmt="mp4"))
    assert len(VideoSceneCutStage(strict=False)(_vid_batch(synth_video(1, 16, 16, 4), fmt="mp4"))) == 0


def _aud_batch(pcm, fmt: str = "qau") -> pa.Table:
    from crawlerframework_ray.data.media import encode_qau

    return pa.table(
        {
            "audio_id": pa.array(["a"], pa.string()),
            "bytes": pa.array([encode_qau(pcm) if fmt == "qau" else b""], pa.binary()),
            "fmt": pa.array([fmt], pa.string()),
        }
    )


@pytest.mark.parametrize("seed", [0, 1, 5, 6, 123])
def test_audio_quality_matches_plant_arithmetic(seed):
    from crawlerframework_ray.data.media import plant_audio_defects, synth_defective_audio
    from crawlerframework_ray.stages.multimodal import AudioQualityStage

    sil, clip = plant_audio_defects(seed)
    t = AudioQualityStage()(_aud_batch(synth_defective_audio(seed)))
    assert t.column("n_windows").to_pylist() == [8]
    assert t.column("n_silent").to_pylist() == [len(sil)]
    assert t.column("n_clipped_samples").to_pylist() == [1024 if clip >= 0 else 0]


def test_audio_quality_clean_track():
    from crawlerframework_ray.data.media import synth_audio
    from crawlerframework_ray.stages.multimodal import AudioQualityStage

    t = AudioQualityStage()(_aud_batch(synth_audio(4)))  # seed 4: no planted defects
    assert t.column("label").to_pylist() == ["clean"]


def test_audio_quality_strict_stub_on_external_container():
    from crawlerframework_ray.data.media import synth_audio
    from crawlerframework_ray.stages.multimodal import AudioQualityStage

    with pytest.raises(NotImplementedError):
        AudioQualityStage()(_aud_batch(synth_audio(1), fmt="mp3"))
    assert len(AudioQualityStage(strict=False)(_aud_batch(synth_audio(1), fmt="mp3"))) == 0
