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


# ---- round-4 session-8 stages: tile-phash / dominant-color / SSIM ----


def test_tile_phash_crop_shares_full_overlap_grid():
    from crawlerframework_ray.stages.multimodal import TilePhashStage

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(64, 96, 3), dtype=np.uint8)
    crop = np.ascontiguousarray(img[16:, 16:])
    t = pa.table(
        {
            "image_id": pa.array(["orig", "crop"], pa.string()),
            "bytes": pa.array([codecs.encode_raw(img), codecs.encode_raw(crop)], pa.binary()),
            "fmt": pa.array(["raw", "raw"], pa.string()),
        }
    )
    out = TilePhashStage()(t).to_pandas()
    orig = set(out[out.image_id == "orig"].tile_hash)
    cr = set(out[out.image_id == "crop"].tile_hash)
    # 64x96 -> 4x6 grid; crop removes one tile band each side -> 3x5 overlap
    assert len(orig) == 24 and len(cr) == 15
    assert len(orig & cr) == 15  # every crop tile is an original tile


def test_tile_phash_unaligned_crop_shares_nothing():
    from crawlerframework_ray.stages.multimodal import TilePhashStage

    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, size=(64, 64, 3), dtype=np.uint8)
    crop = np.ascontiguousarray(img[7:, 5:])  # not tile-aligned
    t = pa.table(
        {
            "image_id": pa.array(["orig", "crop"], pa.string()),
            "bytes": pa.array([codecs.encode_raw(img), codecs.encode_raw(crop)], pa.binary()),
            "fmt": pa.array(["raw", "raw"], pa.string()),
        }
    )
    out = TilePhashStage()(t).to_pandas()
    orig = set(out[out.image_id == "orig"].tile_hash)
    cr = set(out[out.image_id == "crop"].tile_hash)
    assert not (orig & cr)


def test_tile_phash_strict_stub_on_external_format():
    from crawlerframework_ray.stages.multimodal import TilePhashStage

    img = np.zeros((16, 16, 3), dtype=np.uint8)
    with pytest.raises(NotImplementedError):
        TilePhashStage()(_img_batch(img, fmt="jpeg"))
    assert len(TilePhashStage(strict=False)(_img_batch(img, fmt="jpeg"))) == 0


def test_dominant_color_planted_rectangle_and_thresholds():
    from crawlerframework_ray.stages.multimodal import DominantColorStage

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, size=(64, 64, 3), dtype=np.uint8)
    img[:32, :, :] = (200, 100, 50)  # top half solid -> bin (12,6,3)
    out = DominantColorStage()(_img_batch(img)).to_pandas()
    assert out.dom_bin[0] == 12 * 256 + 6 * 16 + 3
    assert out.dom_milli[0] >= 500 and out.label[0] == "flat"

    noise = rng.integers(0, 256, size=(64, 64, 3), dtype=np.uint8)
    out2 = DominantColorStage()(_img_batch(noise)).to_pandas()
    assert out2.label[0] == "textured" and out2.dom_milli[0] < 150


def test_dominant_color_tie_breaks_to_lowest_bin():
    from crawlerframework_ray.stages.multimodal import DominantColorStage

    img = np.zeros((2, 2, 3), dtype=np.uint8)
    img[0, 0] = (16, 0, 0)   # bin 256
    img[0, 1] = (16, 0, 0)   # bin 256
    img[1, 0] = (0, 16, 0)   # bin 16
    img[1, 1] = (0, 16, 0)   # bin 16  -> tie 2-2, argmax picks lowest (16)
    out = DominantColorStage()(_img_batch(img)).to_pandas()
    assert out.dom_bin[0] == 16 and out.dom_milli[0] == 500


def test_ssim_identity_and_blur_monotonicity():
    from crawlerframework_ray.stages.multimodal import SsimRefStage

    rng = np.random.default_rng(10)
    img = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    assert SsimRefStage.ssim_milli(img, img) == 1000
    s2 = SsimRefStage.ssim_milli(img, block_mean_pool(img, 2))
    s4 = SsimRefStage.ssim_milli(img, block_mean_pool(img, 4))
    assert 0 < s4 < s2 < 1000


def test_ssim_flat_shift_penalizes_luminance_only():
    from crawlerframework_ray.stages.multimodal import SsimRefStage

    a = np.full((16, 16, 3), 100, dtype=np.uint8)
    b = np.full((16, 16, 3), 110, dtype=np.uint8)
    # zero variance both sides: structure term = C2/C2 = 1; luminance
    # term = (2*100*110*n^2 + 7n^2)/((100^2+110^2)n^2 + 7n^2)
    n = 256
    expect = (2 * 100 * n * 110 * n + 7 * n * n) * 1000 // ((100 * 100 + 110 * 110 + 7) * n * n)
    assert SsimRefStage.ssim_milli(a, b) == expect


def test_dihedral_canon_invariant_under_all_8_symmetries(ray_session):
    import numpy as np
    import pyarrow as pa

    from crawlerframework_ray.data import codecs
    from crawlerframework_ray.stages.multimodal import DihedralCanonStage

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (24, 16, 3), np.uint8)
    stage = DihedralCanonStage()
    variants = []
    for k in range(4):
        r = np.rot90(img, k)
        variants.append(np.ascontiguousarray(r))
        variants.append(np.ascontiguousarray(r[:, ::-1]))
    batch = pa.table({
        "image_id": pa.array([f"v{i}" for i in range(8)], pa.string()),
        "bytes": pa.array([codecs.encode_raw(v) for v in variants], pa.binary()),
        "fmt": pa.array(["raw"] * 8, pa.string()),
    })
    out = stage(batch)
    canons = set(out.column("canon_hash").to_pylist())
    assert len(canons) == 1  # all 8 symmetries share one canon key


def test_gradient_orientation_census_tiny():
    """Hand-computed census on a 3x3 gray ramp: g = [[0,1,2],[0,1,2],
    [0,1,2]] → every interior pixel has gx=1, gy=0 → all horizontal,
    no flat, edge_energy = 4."""
    import numpy as np
    import pyarrow as pa

    from crawlerframework_ray.data import codecs
    from crawlerframework_ray.stages.multimodal import (
        GradientOrientationStage,
    )

    ramp = np.broadcast_to(
        np.array([[0, 1, 2]] * 3, dtype=np.uint8)[..., None], (3, 3, 3)
    ).copy()
    diag = np.broadcast_to(
        (np.add.outer(np.arange(3), np.arange(3)) * 3).astype(np.uint8)[
            ..., None], (3, 3, 3)).copy()
    flat = np.full((3, 3, 3), 9, dtype=np.uint8)
    batch = pa.table({
        "image_id": pa.array(["ramp", "diag", "flat"], pa.string()),
        "bytes": pa.array([codecs.encode_raw(x) for x in
                           (ramp, diag, flat)], pa.binary()),
        "fmt": pa.array(["raw"] * 3, pa.string()),
    })
    out = GradientOrientationStage()(batch).to_pydict()
    assert out["sum_h"] == [4, 0, 0]
    assert out["sum_v"] == [0, 0, 0]
    # diag ramp: gx = gy = 3 at each of 4 interior pixels, mag 6
    assert out["sum_d"] == [0, 24, 0]
    assert out["sum_a"] == [0, 0, 0]
    assert out["n_flat"] == [0, 0, 4]
    assert out["edge_energy"] == [4, 24, 0]
