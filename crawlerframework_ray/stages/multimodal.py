"""Multimodal stages: opaque binary columns + typed metadata.

Image / audio / video payloads are ``binary`` columns with typed
metadata columns alongside (w, h, fmt, …) — exactly the graft's
input_hint payload. Decode / resize / feature-extract / frame-sample
run as actor-pool ``map_batches`` stages (decoder built once per
actor). The in-repo codecs (images raw/png/qds in data/codecs.py;
video qvd / audio qau in data/media.py) are REAL decoders with
oracle-gated pipelines; external formats (jpeg, webp, mp3, mp4) are
STUBBED behind ``NotImplementedError`` because no media libraries
exist in this environment — the Ray-side plumbing (schemas, batch
sizes, actor signatures, output layout) is shared and tested.

Batch-size note: binary payload rows are wide; callers should pass a
small ``batch_size`` (≤256 for megapixel images) so batch × concurrency
fits worker heaps, and keep ``batch_format="pyarrow"`` end-to-end —
never let a binary column round-trip through pandas object dtype.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..data import codecs
from ..data.imageops import average_hash

EXTERNAL_IMAGE_FMTS = {"jpeg", "jpg", "webp", "gif", "bmp", "tiff"}


class ImageDecodeStage:
    """bytes+fmt → decoded statistics (phash recompute, mean luma).

    Output schema: image_id:string, fmt:string, w:int32, h:int32,
    phash_calc:int64, mean_luma_milli:int64 (integerized for oracle
    comparability).
    """

    def __init__(self, strict: bool = True):
        self.strict = strict
        self.decoders = dict(codecs._DECODERS)  # built once per actor

    def _decode(self, data: bytes, fmt: str) -> np.ndarray | None:
        if fmt in self.decoders:
            return self.decoders[fmt](data)
        if fmt in EXTERNAL_IMAGE_FMTS:
            # STUB: real implementation needs an image library (Pillow /
            # turbojpeg) not present in this environment.
            if self.strict:
                raise NotImplementedError(
                    f"decode for external format {fmt!r} requires an image codec "
                    "library; plug one into ImageDecodeStage.decoders"
                )
            return None
        raise ValueError(f"unknown image format {fmt!r}")

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("image_id").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        datas = batch.column("bytes").to_pylist()
        out = {"image_id": [], "fmt": [], "w": [], "h": [], "phash_calc": [], "mean_luma_milli": []}
        for i, fmt, data in zip(ids, fmts, datas):
            img = self._decode(data, fmt)
            if img is None:
                continue
            out["image_id"].append(i)
            out["fmt"].append(fmt)
            out["h"].append(img.shape[0])
            out["w"].append(img.shape[1])
            out["phash_calc"].append(average_hash(img))
            out["mean_luma_milli"].append(int(round(float(img.mean()) * 1000)))
        return pa.table(
            {
                "image_id": pa.array(out["image_id"], pa.string()),
                "fmt": pa.array(out["fmt"], pa.string()),
                "w": pa.array(out["w"], pa.int32()),
                "h": pa.array(out["h"], pa.int32()),
                "phash_calc": pa.array(out["phash_calc"], pa.int64()),
                "mean_luma_milli": pa.array(out["mean_luma_milli"], pa.int64()),
            }
        )


class ImageResizeStage:
    """Block-mean resize to target×target, re-encoded as ``raw``.
    Real for in-repo formats; target must divide the source dims
    (synthetic sizes are powers of two)."""

    def __init__(self, target: int = 8):
        self.target = target

    def __call__(self, batch: pa.Table) -> pa.Table:
        fmts = batch.column("fmt").to_pylist()
        datas = batch.column("bytes").to_pylist()
        t = self.target
        resized = []
        for fmt, data in zip(fmts, datas):
            img = codecs.decode(data, fmt)
            h, w, _ = img.shape
            bh, bw = max(h // t, 1), max(w // t, 1)
            small = (
                img[: bh * t, : bw * t]
                .reshape(t, bh, t, bw, 3)
                .mean(axis=(1, 3))
                .round()
                .astype(np.uint8)
            )
            resized.append(codecs.encode_raw(small))
        batch = batch.set_column(
            batch.schema.get_field_index("bytes"), "bytes", pa.array(resized, pa.binary())
        )
        batch = batch.set_column(
            batch.schema.get_field_index("w"), "w", pa.array([t] * len(resized), pa.int32())
        )
        batch = batch.set_column(
            batch.schema.get_field_index("h"), "h", pa.array([t] * len(resized), pa.int32())
        )
        return batch


class ImageAugmentStage:
    """Deterministic training-time augmentation fan-out: each input
    image row emits one row per augmentation — ``hflip`` (mirror) and
    ``ccrop`` (center crop to half dims) — with integer stats computed
    on the augmented pixels. Deterministic (no RNG) so the distributed
    result is a pure function of the input and oracle-checkable; a
    seeded-random variant would only change the index arithmetic, not
    the stage shape. Decoders built once per actor; flip/crop are
    numpy views (zero-copy until the stat reduction).

    Output schema: image_id:string, aug:string, w:int32, h:int32,
    sum_luma:int64 (exact whole-array channel sum — hflip provably
    preserves it, ccrop provably shrinks it), phash_calc:int64.
    """

    AUGS = ("hflip", "ccrop")

    def __init__(self, strict: bool = True):
        self.strict = strict
        self.decoders = dict(codecs._DECODERS)

    def _augment(self, img: np.ndarray, aug: str) -> np.ndarray:
        if aug == "hflip":
            return img[:, ::-1]
        h, w = img.shape[0], img.shape[1]
        return img[h // 4 : h // 4 + h // 2, w // 4 : w // 4 + w // 2]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("image_id").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        datas = batch.column("bytes").to_pylist()
        out: dict[str, list] = {k: [] for k in ("image_id", "aug", "w", "h", "sum_luma", "phash_calc")}
        for i, fmt, data in zip(ids, fmts, datas):
            dec = self.decoders.get(fmt)
            if dec is None:
                if self.strict:
                    raise NotImplementedError(
                        f"decode for external format {fmt!r} requires an image codec library"
                    )
                continue
            img = dec(data)
            for aug in self.AUGS:
                a = self._augment(img, aug)
                out["image_id"].append(i)
                out["aug"].append(aug)
                out["h"].append(a.shape[0])
                out["w"].append(a.shape[1])
                out["sum_luma"].append(int(a.sum(dtype=np.int64)))
                out["phash_calc"].append(average_hash(np.ascontiguousarray(a)))
        return pa.table(
            {
                "image_id": pa.array(out["image_id"], pa.string()),
                "aug": pa.array(out["aug"], pa.string()),
                "w": pa.array(out["w"], pa.int32()),
                "h": pa.array(out["h"], pa.int32()),
                "sum_luma": pa.array(out["sum_luma"], pa.int64()),
                "phash_calc": pa.array(out["phash_calc"], pa.int64()),
            }
        )


class ImageQualityStage:
    """Image quality gating — the aesthetic/quality filter step of a
    multimodal training-data pipeline, with labeled drop reasons so
    downstream accounting can audit what was removed (LAION-style
    filter-with-reason, not silent drop). Integer metrics only:
    ``contrast`` = max − min over all channel values, ``n_distinct`` =
    count of distinct channel values; gates are checked in order
    (flat → low_contrast → keep). Decoders built once per actor;
    metrics are single numpy reductions per image.

    Output schema: image_id:string, contrast:int32, n_distinct:int32,
    label:string.
    """

    FLAT_DISTINCT = 100
    MIN_CONTRAST = 253

    def __init__(self, strict: bool = True):
        self.strict = strict
        self.decoders = dict(codecs._DECODERS)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("image_id").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        datas = batch.column("bytes").to_pylist()
        out: dict[str, list] = {k: [] for k in ("image_id", "contrast", "n_distinct", "label")}
        for i, fmt, data in zip(ids, fmts, datas):
            dec = self.decoders.get(fmt)
            if dec is None:
                if self.strict:
                    raise NotImplementedError(
                        f"decode for external format {fmt!r} requires an image codec library"
                    )
                continue
            img = dec(data)
            contrast = int(img.max()) - int(img.min())
            n_distinct = int(np.unique(img).size)
            if n_distinct < self.FLAT_DISTINCT:
                label = "flat"
            elif contrast < self.MIN_CONTRAST:
                label = "low_contrast"
            else:
                label = "keep"
            out["image_id"].append(i)
            out["contrast"].append(contrast)
            out["n_distinct"].append(n_distinct)
            out["label"].append(label)
        return pa.table(
            {
                "image_id": pa.array(out["image_id"], pa.string()),
                "contrast": pa.array(out["contrast"], pa.int32()),
                "n_distinct": pa.array(out["n_distinct"], pa.int32()),
                "label": pa.array(out["label"], pa.string()),
            }
        )


class MirrorCanonStage:
    """Mirror-invariant canonical image hash: canon = min (as uint64
    bit pattern) of average_hash(img) and average_hash(fliplr(img)) —
    so an image and its horizontal mirror land on the SAME key, the
    canonicalize-then-exact-match trick for catching mirrored reposts
    that plain phash grouping misses. Decoders built once per actor.

    Output schema: image_id:string, canon_hash:int64.
    """

    def __init__(self, strict: bool = True):
        self.strict = strict
        self.decoders = dict(codecs._DECODERS)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("image_id").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        datas = batch.column("bytes").to_pylist()
        out_ids: list[str] = []
        out_canon: list[int] = []
        for i, fmt, data in zip(ids, fmts, datas):
            dec = self.decoders.get(fmt)
            if dec is None:
                if self.strict:
                    raise NotImplementedError(
                        f"decode for external format {fmt!r} requires an image codec library"
                    )
                continue
            img = dec(data)
            h1 = average_hash(img) & 0xFFFFFFFFFFFFFFFF
            h2 = average_hash(np.ascontiguousarray(img[:, ::-1])) & 0xFFFFFFFFFFFFFFFF
            canon = int(np.uint64(min(h1, h2)).astype(np.int64))
            out_ids.append(i)
            out_canon.append(canon)
        return pa.table(
            {
                "image_id": pa.array(out_ids, pa.string()),
                "canon_hash": pa.array(out_canon, pa.int64()),
            }
        )


class PatchStatsStage:
    """ViT-style patch extraction: decode → non-overlapping p×p patches
    → integer per-patch luma sums (sum of all channel values), reduced
    to per-image stats. The patch grid is the exact preprocessing shape
    of a vision-transformer embedder; sums are int64 so the output is
    value-hash-comparable to the serial golden. Decoders built once per
    actor; the patch reduction is one vectorized reshape per image
    (synthetic dims are multiples of p=8).

    Output schema: image_id:string, n_patches:int64,
    min_patch_luma:int64, max_patch_luma:int64, sum_luma:int64.
    """

    def __init__(self, patch: int = 8):
        self.patch = patch
        self.decoders = dict(codecs._DECODERS)

    def __call__(self, batch: pa.Table) -> pa.Table:
        p = self.patch
        ids = batch.column("image_id").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        datas = batch.column("bytes").to_pylist()
        n_p, mn, mx, tot = [], [], [], []
        for fmt, data in zip(fmts, datas):
            img = self.decoders[fmt](data).astype(np.int64)
            h, w, _ = img.shape
            sums = img[: h // p * p, : w // p * p].reshape(h // p, p, w // p, p, 3).sum(
                axis=(1, 3, 4)
            )
            n_p.append(sums.size)
            mn.append(int(sums.min()))
            mx.append(int(sums.max()))
            tot.append(int(sums.sum()))
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "n_patches": pa.array(n_p, pa.int64()),
                "min_patch_luma": pa.array(mn, pa.int64()),
                "max_patch_luma": pa.array(mx, pa.int64()),
                "sum_luma": pa.array(tot, pa.int64()),
            }
        )


EXTERNAL_VIDEO_FMTS = {"mp4", "webm", "mkv", "avi", "mov"}
EXTERNAL_AUDIO_FMTS = {"mp3", "ogg", "flac", "wav", "aac"}


class VideoFrameSampleStage:
    """Video frame sampling: every Nth frame → raw-encoded image rows.

    REAL for the in-repo ``qvd`` container (data/media.py — lossless
    raw-frame video, decoder built once per actor); external containers
    (mp4/webm/…) stay stubbed behind ``NotImplementedError`` because no
    video decoder (pyav/ffmpeg) exists in this environment — the stage
    contract (schemas, fan-out layout, actor signature) is identical.

    Input rows: video_id:string, bytes:binary, fmt:string.
    Output rows: video_id:string, frame_idx:int32, bytes:binary
    (raw-encoded frame, feedable to ImageDecodeStage), w:int32, h:int32,
    fps:int32 — a flat_map-shaped fan-out done inside map_batches so
    the binary payload never leaves Arrow.
    """

    def __init__(self, every_n: int = 4, strict: bool = True):
        from ..data import media

        self.every_n = max(int(every_n), 1)
        self.strict = strict
        self._decode = media.decode_qvd  # bound once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"video_id": [], "frame_idx": [], "bytes": [], "w": [], "h": [], "fps": []}
        for vid, fmt, data in zip(
            batch.column("video_id").to_pylist(),
            batch.column("fmt").to_pylist(),
            batch.column("bytes").to_pylist(),
        ):
            if fmt != "qvd":
                if fmt in EXTERNAL_VIDEO_FMTS:
                    if self.strict:
                        raise NotImplementedError(
                            f"decode for external video container {fmt!r} requires "
                            "ffmpeg/pyav; plug a decoder into VideoFrameSampleStage"
                        )
                    continue
                raise ValueError(f"unknown video format {fmt!r}")
            frames, fps = self._decode(bytes(data))
            n, h, w, _ = frames.shape
            for f in range(0, n, self.every_n):
                out["video_id"].append(vid)
                out["frame_idx"].append(f)
                out["bytes"].append(codecs.encode_raw(frames[f]))
                out["w"].append(w)
                out["h"].append(h)
                out["fps"].append(fps)
        return pa.table(
            {
                "video_id": pa.array(out["video_id"], pa.string()),
                "frame_idx": pa.array(out["frame_idx"], pa.int32()),
                "bytes": pa.array(out["bytes"], pa.binary()),
                "w": pa.array(out["w"], pa.int32()),
                "h": pa.array(out["h"], pa.int32()),
                "fps": pa.array(out["fps"], pa.int32()),
            }
        )


class AudioFeatureStage:
    """Audio feature extraction: windowed energy over decoded PCM.

    REAL for the in-repo ``qau`` container (data/media.py — int16 mono
    PCM); external containers (mp3/ogg/…) stay stubbed behind
    ``NotImplementedError`` (no soundfile/librosa here). Features are
    exact integers: sum_sq = Σ s² (int64) and rms_milli =
    isqrt(sum_sq·10⁶/window) — floor of 1000·RMS with no float path,
    so a serial oracle reproduces them bit-exactly.

    Input rows: audio_id:string, bytes:binary, fmt:string.
    Output rows: audio_id:string, window_idx:int32, sum_sq:int64,
    rms_milli:int64, sample_rate:int32.
    """

    def __init__(self, window: int = 1024, strict: bool = True):
        from ..data import media

        self.window = int(window)
        self.strict = strict
        self._decode = media.decode_qau
        self._energies = media.window_energies

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"audio_id": [], "window_idx": [], "sum_sq": [], "rms_milli": [], "sample_rate": []}
        for aid, fmt, data in zip(
            batch.column("audio_id").to_pylist(),
            batch.column("fmt").to_pylist(),
            batch.column("bytes").to_pylist(),
        ):
            if fmt != "qau":
                if fmt in EXTERNAL_AUDIO_FMTS:
                    if self.strict:
                        raise NotImplementedError(
                            f"decode for external audio container {fmt!r} requires "
                            "soundfile/librosa; plug a decoder into AudioFeatureStage"
                        )
                    continue
                raise ValueError(f"unknown audio format {fmt!r}")
            pcm, rate = self._decode(bytes(data))
            for idx, sum_sq, rms in self._energies(pcm, self.window):
                out["audio_id"].append(aid)
                out["window_idx"].append(idx)
                out["sum_sq"].append(sum_sq)
                out["rms_milli"].append(rms)
                out["sample_rate"].append(rate)
        return pa.table(
            {
                "audio_id": pa.array(out["audio_id"], pa.string()),
                "window_idx": pa.array(out["window_idx"], pa.int32()),
                "sum_sq": pa.array(out["sum_sq"], pa.int64()),
                "rms_milli": pa.array(out["rms_milli"], pa.int64()),
                "sample_rate": pa.array(out["sample_rate"], pa.int32()),
            }
        )


def phash_corpus_records(doc_ids: list[int]) -> list[tuple[int, bytes, str]]:
    """(img_id, bytes, fmt) image corpus with planted CROSS-FORMAT
    duplicates: one synthetic image per doc id plus, for ids ≡ 3
    (mod 5), a twin re-encoding the SAME decoded pixels in a different
    lossless container — byte-hash dedup cannot see these (different
    bytes), pixel-level phash dedup must (identical decoded pixels ⇒
    identical average hash). Shared leaf with the phash_sigs golden."""
    from ..data import codecs
    from ..data.synth import SynthWebConfig, make_url, page_record

    cfg = SynthWebConfig(seed=42, n_hosts=8, path_space=1 << 20)
    out: list[tuple[int, bytes, str]] = []
    for d in doc_ids:
        d = int(d)
        rec = page_record(make_url(d % 8, d), cfg)
        out.append((2 * d, rec["bytes"], rec["fmt"]))
        if d % 5 == 3:
            img = codecs.decode(rec["bytes"], rec["fmt"])
            tfmt = "png" if rec["fmt"] != "png" else "raw"
            out.append((2 * d + 1, codecs.encode(img, tfmt), tfmt))
    return out


class PhashBandStage:
    """Image near-dup signature stage: decode (codec loaded per worker)
    → 64-bit average hash → 4×16-bit band rows with the signature
    carried, exactly the SimHashStage layout, so the banded pair
    expansion + vectorized Hamming verify machinery (stages/dedup.py)
    applies to IMAGES unchanged. Hamming ≤ 3 over 4 bands keeps the
    exact-recall banding guarantee."""

    def __init__(self, id_column: str = "doc_id", bytes_column: str = "bytes",
                 fmt_column: str = "fmt"):
        from ..data import codecs
        from ..data.imageops import average_hash

        self.id_column, self.bytes_column, self.fmt_column = (
            id_column, bytes_column, fmt_column)
        self._decode, self._ahash = codecs.decode, average_hash

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        ids = batch.column(self.id_column).to_pylist()
        blobs = batch.column(self.bytes_column).to_pylist()
        fmts = batch.column(self.fmt_column).to_pylist()
        sigs = [self._ahash(self._decode(bytes(b), f)) for b, f in zip(blobs, fmts)]
        out_id, out_band, out_hash, out_sig = [], [], [], []
        for i, s in zip(ids, sigs):
            u = int(np.int64(s).astype(np.uint64))
            for band in range(4):
                out_id.append(i)
                out_band.append(band)
                out_hash.append(f"{(u >> (16 * band)) & 0xFFFF:04x}")
                out_sig.append(s)
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "band": pa.array(out_band, pa.int32()),
                "band_hash": pa.array(out_hash, pa.string()),
                "sig": pa.array(out_sig, pa.int64()),
            }
        )


class AlignmentScoreStage:
    """Image↔caption alignment scoring — the CLIP-style cross-modal
    scorer slot (T6) behind the fake-external-model actor-pool shape
    (same mold as functions/translate.py): the "model" is deterministic
    so the whole op is oracle-checkable, while the Ray-side plumbing
    (actor pool, per-batch batched inference over decoded pixels,
    integer scores) is exactly what a real CLIP scorer needs.

    Score = 64 − hamming(phash(decoded pixels), md5_64(caption)):
    both towers are real computations over their modality (pixel
    decode + average-hash; byte-exact md5), the scalar lives in
    [0, 64], and DuckDB reproduces the caption tower + the combine
    natively (md5, xor, bit_count) — only the pixel phash needs a
    golden.

    Output: image_id:string, phash:int64, align_score:int64.
    """

    def __init__(self, strict: bool = True):
        import hashlib

        self._md5 = hashlib.md5
        self.decoders = dict(codecs._DECODERS)  # built once per actor
        self.strict = strict

    def _decode(self, data: bytes, fmt: str) -> np.ndarray | None:
        # same external-format contract as ImageDecodeStage: strict →
        # NotImplementedError, non-strict → skip the row
        if fmt in self.decoders:
            return self.decoders[fmt](data)
        if fmt in EXTERNAL_IMAGE_FMTS:
            if self.strict:
                raise NotImplementedError(
                    f"decode for external format {fmt!r} requires an image codec "
                    "library; plug one into AlignmentScoreStage.decoders"
                )
            return None
        raise ValueError(f"unknown image format {fmt!r}")

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .dedup import hamming64_np

        ids_out: list[str] = []
        phash_list: list[int] = []
        cap_list: list[int] = []
        for i, fmt, data, cap in zip(
            batch.column("image_id").to_pylist(), batch.column("fmt").to_pylist(),
            batch.column("bytes").to_pylist(), batch.column("caption").to_pylist(),
        ):
            img = self._decode(data, fmt)
            if img is None:
                continue
            ids_out.append(i)
            phash_list.append(average_hash(img))
            cap_list.append(int.from_bytes(self._md5(cap.encode("utf-8")).digest()[:8], "big"))
        phash = np.array(phash_list, dtype=np.int64)
        cap64 = np.array(cap_list, dtype=np.uint64)
        score = 64 - hamming64_np(phash.view(np.uint64), cap64).astype(np.int64)
        return pa.table(
            {
                "image_id": pa.array(ids_out, pa.string()),
                "phash": pa.array(phash, pa.int64()),
                "align_score": pa.array(score, pa.int64()),
            }
        )


def video_dup_corpus_records(doc_ids: list[int]) -> list[tuple[int, bytes, str]]:
    """(vid, bytes, 'qvd') video corpus with planted near-duplicates:
    one 16-frame clip per doc id plus, for ids ≡ 3 (mod 10), a
    CONTAINER twin (identical pixels, different fps header — invisible
    to byte-hash dedup, Jaccard 1.0 over sampled-frame phashes) and,
    for ids ≡ 8 (mod 10), a PARTIAL twin whose first frame is replaced
    by foreign content (3 of 4 sampled frames shared ⇒ Jaccard 0.6).
    Shared leaf with the video_dup_pairs golden."""
    from ..data import media

    out: list[tuple[int, bytes, str]] = []
    for d in doc_ids:
        d = int(d)
        frames = media.synth_video(d, w=32, h=32, n_frames=16)
        out.append((2 * d, media.encode_qvd(frames, fps=10), "qvd"))
        if d % 10 == 3:
            out.append((2 * d + 1, media.encode_qvd(frames, fps=20), "qvd"))
        elif d % 10 == 8:
            twin = frames.copy()
            twin[0] = media.synth_video(d + 100_000, w=32, h=32, n_frames=1)[0]
            out.append((2 * d + 1, media.encode_qvd(twin, fps=10), "qvd"))
    return out


def audio_dup_corpus_records(doc_ids: list[int]) -> list[tuple[int, bytes, str]]:
    """(aid, bytes, 'qau') audio corpus with planted near-duplicates:
    ids ≡ 3 (mod 10) add a container twin (identical PCM, different
    sample-rate header ⇒ identical window fingerprints), ids ≡ 8
    (mod 10) add a one-sample-perturbed twin (7 of 8 windows shared ⇒
    Jaccard 7/9). Shared leaf with the audio_dup_pairs golden."""
    from ..data import media

    out: list[tuple[int, bytes, str]] = []
    for d in doc_ids:
        d = int(d)
        pcm = media.synth_audio(d, n_samples=8192, sample_rate=8000)
        out.append((2 * d, media.encode_qau(pcm, 8000), "qau"))
        if d % 10 == 3:
            out.append((2 * d + 1, media.encode_qau(pcm, 16000), "qau"))
        elif d % 10 == 8:
            twin = pcm.copy()
            twin[0] = np.int16(int(twin[0]) ^ 1)
            out.append((2 * d + 1, media.encode_qau(twin, 8000), "qau"))
    return out


class VideoPhashGramStage:
    """Videos → fingerprint 'gram' rows for exact-Jaccard near-dup
    (stages/dedup.exact_jaccard_pairs): decode → sample every Nth frame
    → per-frame average-hash → one row per (video, frame_idx, phash)
    gram. Fused into ONE stage so a video's gram count ``n`` is exact
    regardless of downstream batching. Output: doc_id:int64,
    gram_h:int64, n:int64 — exactly the ngram_set_rows layout, so the
    text near-dup pair machinery applies to VIDEO unchanged."""

    def __init__(self, every_n: int = 4):
        from ..data import media
        from ..data.imageops import average_hash
        from .dedup import _splitmix64

        self.every_n = max(int(every_n), 1)
        self._decode = media.decode_qvd
        self._ahash = average_hash
        self._mix = _splitmix64

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_out: list[int] = []
        key_out: list[np.ndarray] = []
        n_out: list[int] = []
        for vid, data in zip(
            batch.column("doc_id").to_pylist(), batch.column("bytes").to_pylist()
        ):
            frames, _ = self._decode(bytes(data))
            idxs = np.arange(0, frames.shape[0], self.every_n, dtype=np.uint64)
            sigs = np.array([self._ahash(frames[int(f)]) for f in idxs], dtype=np.int64)
            grams = self._mix(sigs.view(np.uint64) ^ (idxs * np.uint64(0x9E3779B97F4A7C15)))
            ids_out.extend([int(vid)] * len(grams))
            key_out.append(grams.view(np.int64))
            n_out.extend([len(grams)] * len(grams))
        gram_h = np.concatenate(key_out) if key_out else np.array([], dtype=np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids_out, pa.int64()),
                "gram_h": pa.array(gram_h, pa.int64()),
                "n": pa.array(n_out, pa.int64()),
            }
        )


class AudioGramStage:
    """Audio clips → fingerprint gram rows (window_idx, sum_sq) for
    exact-Jaccard near-dup — the audio analogue of VideoPhashGramStage,
    same output layout (doc_id, gram_h, n)."""

    def __init__(self, window: int = 1024):
        from ..data import media
        from .dedup import _splitmix64

        self.window = int(window)
        self._decode = media.decode_qau
        self._energies = media.window_energies
        self._mix = _splitmix64

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_out: list[int] = []
        key_out: list[np.ndarray] = []
        n_out: list[int] = []
        for aid, data in zip(
            batch.column("doc_id").to_pylist(), batch.column("bytes").to_pylist()
        ):
            pcm, _ = self._decode(bytes(data))
            feats = self._energies(pcm, self.window)
            idxs = np.array([f[0] for f in feats], dtype=np.uint64)
            sums = np.array([f[1] for f in feats], dtype=np.uint64)
            grams = self._mix(sums ^ (idxs * np.uint64(0x9E3779B97F4A7C15)))
            ids_out.extend([int(aid)] * len(grams))
            key_out.append(grams.view(np.int64))
            n_out.extend([len(grams)] * len(grams))
        gram_h = np.concatenate(key_out) if key_out else np.array([], dtype=np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids_out, pa.int64()),
                "gram_h": pa.array(gram_h, pa.int64()),
                "n": pa.array(n_out, pa.int64()),
            }
        )


class ChannelMomentsStage:
    """Dataset normalization constants — the mean/std-per-channel
    pre-pass every image training run needs, kept EXACT as integer
    moments: per image and channel, pixel count, Σv and Σv² in int64
    (mean/std derive downstream; the integers sum order-independently
    so the distributed fold is bit-exact). Also emits the encoded
    payload size so the same pass audits codec compression ratios.
    Decoders built once per actor; moments are single vectorized
    reductions per channel.

    Output schema: image_id:string, fmt:string, channel:int32,
    n_pixels:int64, sum_v:int64, sum_sq:int64, encoded_bytes:int64.
    """

    def __init__(self, strict: bool = True):
        self.strict = strict
        self.decoders = dict(codecs._DECODERS)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("image_id").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        datas = batch.column("bytes").to_pylist()
        out: dict[str, list] = {
            k: [] for k in ("image_id", "fmt", "channel", "n_pixels", "sum_v", "sum_sq", "encoded_bytes")
        }
        for i, fmt, data in zip(ids, fmts, datas):
            dec = self.decoders.get(fmt)
            if dec is None:
                if self.strict:
                    raise NotImplementedError(
                        f"decode for external format {fmt!r} requires an image codec library"
                    )
                continue
            img = dec(data).astype(np.int64)
            for c in range(img.shape[2]):
                ch = img[:, :, c]
                out["image_id"].append(i)
                out["fmt"].append(fmt)
                out["channel"].append(c)
                out["n_pixels"].append(int(ch.size))
                out["sum_v"].append(int(ch.sum()))
                out["sum_sq"].append(int((ch * ch).sum()))
                out["encoded_bytes"].append(len(data))
        return pa.table(
            {
                "image_id": pa.array(out["image_id"], pa.string()),
                "fmt": pa.array(out["fmt"], pa.string()),
                "channel": pa.array(out["channel"], pa.int32()),
                "n_pixels": pa.array(out["n_pixels"], pa.int64()),
                "sum_v": pa.array(out["sum_v"], pa.int64()),
                "sum_sq": pa.array(out["sum_sq"], pa.int64()),
                "encoded_bytes": pa.array(out["encoded_bytes"], pa.int64()),
            }
        )


class ImageSharpnessStage:
    """Focus / blur gating — the sharpness filter of an image-curation
    pipeline (the Laplacian-variance focus measure of the classic
    "variation of the Laplacian" literature, kept integer-exact):
    gray = per-pixel channel sum // 3, metric = mean |4c − N − S − E − W|
    over interior pixels in milli-units (``lap_sum * 1000 // n``, no
    floats anywhere), labels gated ``sharp`` / ``soft`` / ``blurry`` by
    two integer thresholds. Calibrated against the synthetic corpus:
    raw noise images read ≥ 98,000 milli, one 2×2 block-mean pass
    32,000–60,000, a 4×4 pass ≤ 14,500 — the 75,000 / 20,000 defaults
    sit in the gaps with ≥1.25× margin. Decoders built once per actor;
    the Laplacian is one vectorized shifted-slice expression per image.

    Output schema: image_id:string, lap_milli:int64, label:string.
    """

    SHARP_MILLI = 75_000
    SOFT_MILLI = 20_000

    def __init__(self, strict: bool = True):
        self.strict = strict
        self.decoders = dict(codecs._DECODERS)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("image_id").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        datas = batch.column("bytes").to_pylist()
        out_ids: list[str] = []
        out_lap: list[int] = []
        out_label: list[str] = []
        for i, fmt, data in zip(ids, fmts, datas):
            dec = self.decoders.get(fmt)
            if dec is None:
                if self.strict:
                    raise NotImplementedError(
                        f"decode for external format {fmt!r} requires an image codec library"
                    )
                continue
            g = dec(data).astype(np.int64).sum(axis=2) // 3
            lap = np.abs(
                4 * g[1:-1, 1:-1] - g[:-2, 1:-1] - g[2:, 1:-1] - g[1:-1, :-2] - g[1:-1, 2:]
            )
            milli = int(lap.sum()) * 1000 // lap.size
            label = (
                "sharp" if milli >= self.SHARP_MILLI
                else "soft" if milli >= self.SOFT_MILLI
                else "blurry"
            )
            out_ids.append(i)
            out_lap.append(milli)
            out_label.append(label)
        return pa.table(
            {
                "image_id": pa.array(out_ids, pa.string()),
                "lap_milli": pa.array(out_lap, pa.int64()),
                "label": pa.array(out_label, pa.string()),
            }
        )


class ImageBorderStage:
    """Letterbox / constant-border detection — the crop-before-train
    step of an image-curation pipeline: per side (top / bottom), the
    length of the maximal run of rows that are each single-valued AND
    share the edge row's value. Pure integer comparisons, vectorized
    per image (one equality reduction per side, no per-row Python).
    Decoders built once per actor.

    Output schema: image_id:string, top_border:int32,
    bottom_border:int32, content_rows:int32 (rows between the bars).
    """

    def __init__(self, strict: bool = True):
        self.strict = strict
        self.decoders = dict(codecs._DECODERS)

    @staticmethod
    def _top_run(img: np.ndarray) -> int:
        # rows that are single-valued and equal to the FIRST row's value
        flat = (img == img[:, :1, :]).all(axis=(1, 2))
        same = (img[:, 0, :] == img[0, 0, :]).all(axis=1)
        run = flat & same
        return int(img.shape[0]) if run.all() else int(np.argmin(run))

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("image_id").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        datas = batch.column("bytes").to_pylist()
        out: dict[str, list] = {k: [] for k in ("image_id", "top_border", "bottom_border", "content_rows")}
        for i, fmt, data in zip(ids, fmts, datas):
            dec = self.decoders.get(fmt)
            if dec is None:
                if self.strict:
                    raise NotImplementedError(
                        f"decode for external format {fmt!r} requires an image codec library"
                    )
                continue
            img = dec(data)
            top = self._top_run(img)
            bottom = 0 if top == img.shape[0] else self._top_run(img[::-1])
            out["image_id"].append(i)
            out["top_border"].append(top)
            out["bottom_border"].append(bottom)
            out["content_rows"].append(int(img.shape[0]) - top - bottom)
        return pa.table(
            {
                "image_id": pa.array(out["image_id"], pa.string()),
                "top_border": pa.array(out["top_border"], pa.int32()),
                "bottom_border": pa.array(out["bottom_border"], pa.int32()),
                "content_rows": pa.array(out["content_rows"], pa.int32()),
            }
        )


class VideoSceneCutStage:
    """Threshold scene-cut detection (the PySceneDetect "content
    detector" shape, integer-exact): per adjacent frame pair, the mean
    absolute pixel difference in milli-units (``|a−b|.sum() * 1000 //
    (h*w*3)``, all int64); a pair is a cut when it reaches
    ``cut_milli``. Real for the in-repo ``qvd`` container; external
    containers stay stubbed like VideoFrameSampleStage. Decoder bound
    once per actor; the whole clip's diffs are one vectorized
    ``np.diff`` reduction.

    Output schema: video_id:string, n_frames:int32, n_cuts:int32.
    """

    def __init__(self, cut_milli: int = 30_000, strict: bool = True):
        from ..data import media

        self.cut_milli = int(cut_milli)
        self.strict = strict
        self._decode = media.decode_qvd

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_ids: list[str] = []
        out_frames: list[int] = []
        out_cuts: list[int] = []
        for vid, fmt, data in zip(
            batch.column("video_id").to_pylist(),
            batch.column("fmt").to_pylist(),
            batch.column("bytes").to_pylist(),
        ):
            if fmt != "qvd":
                if fmt in EXTERNAL_VIDEO_FMTS:
                    if self.strict:
                        raise NotImplementedError(
                            f"decode for external video container {fmt!r} requires "
                            "ffmpeg/pyav; plug a decoder into VideoSceneCutStage"
                        )
                    continue
                raise ValueError(f"unknown video format {fmt!r}")
            frames, _fps = self._decode(bytes(data))
            n, h, w, _ = frames.shape
            d = np.abs(np.diff(frames.astype(np.int64), axis=0)).sum(axis=(1, 2, 3))
            milli = d * 1000 // (h * w * 3)
            out_ids.append(vid)
            out_frames.append(n)
            out_cuts.append(int((milli >= self.cut_milli).sum()))
        return pa.table(
            {
                "video_id": pa.array(out_ids, pa.string()),
                "n_frames": pa.array(out_frames, pa.int32()),
                "n_cuts": pa.array(out_cuts, pa.int32()),
            }
        )


class AudioQualityStage:
    """Audio curation audit — the silence / clipping gate of a speech
    or audio training pipeline, per track: ``n_silent`` = windows whose
    exact integer rms_milli (media.window_energies) falls below the
    silence threshold, ``n_clipped_samples`` = samples at int16
    full-scale (|s| == 32767), and an ordered label
    (``clipped`` → ``has_silence`` → ``clean``). Real for the in-repo
    ``qau`` container; external containers stay stubbed like
    AudioFeatureStage. Decoder bound once per actor; the clip count is
    one vectorized comparison, the energies one reshape-sum.

    Output schema: audio_id:string, n_windows:int32, n_silent:int32,
    n_clipped_samples:int64, label:string.
    """

    SIL_RMS_MILLI = 100_000

    def __init__(self, window: int = 1024, strict: bool = True):
        from ..data import media

        self.window = int(window)
        self.strict = strict
        self._decode = media.decode_qau
        self._energies = media.window_energies

    def __call__(self, batch: pa.Table) -> pa.Table:
        out: dict[str, list] = {
            k: [] for k in ("audio_id", "n_windows", "n_silent", "n_clipped_samples", "label")
        }
        for aid, fmt, data in zip(
            batch.column("audio_id").to_pylist(),
            batch.column("fmt").to_pylist(),
            batch.column("bytes").to_pylist(),
        ):
            if fmt != "qau":
                if fmt in EXTERNAL_AUDIO_FMTS:
                    if self.strict:
                        raise NotImplementedError(
                            f"decode for external audio container {fmt!r} requires "
                            "soundfile/librosa; plug a decoder into AudioQualityStage"
                        )
                    continue
                raise ValueError(f"unknown audio format {fmt!r}")
            pcm, _rate = self._decode(bytes(data))
            feats = self._energies(pcm, self.window)
            n_silent = sum(1 for _, _, rms in feats if rms < self.SIL_RMS_MILLI)
            n_clipped = int((np.abs(pcm.astype(np.int64)) == 32767).sum())
            label = "clipped" if n_clipped else "has_silence" if n_silent else "clean"
            out["audio_id"].append(aid)
            out["n_windows"].append(len(feats))
            out["n_silent"].append(n_silent)
            out["n_clipped_samples"].append(n_clipped)
            out["label"].append(label)
        return pa.table(
            {
                "audio_id": pa.array(out["audio_id"], pa.string()),
                "n_windows": pa.array(out["n_windows"], pa.int32()),
                "n_silent": pa.array(out["n_silent"], pa.int32()),
                "n_clipped_samples": pa.array(out["n_clipped_samples"], pa.int64()),
                "label": pa.array(out["label"], pa.string()),
            }
        )


class TilePhashStage:
    """Crop-robust near-dup signatures — the tiled-perceptual-hash form
    of image dedup that survives margin crops, which whole-image phash
    grouping misses entirely (a crop shifts every 8x8 cell, flipping
    most bits). Fixed-grid TILE x TILE pixel tiles, top-left aligned
    with the remainder cropped, one 64-bit ``average_hash`` per tile;
    hashes are DISTINCT per image (a repeated tile counts once). A crop
    that removes whole tile bands keeps every surviving tile
    bit-identical, so cropped reposts share the full overlap grid of
    tile hashes while unrelated noise images share none (64-bit hashes
    over independent noise: collision odds are birthday-negligible).

    Scale shape: explode rows are (image_id, tile_hash) — at most
    (w/TILE)*(h/TILE) per image — and downstream pairing is two bounded
    bucketed shuffles (on tile_hash, then on the pair key); nothing is
    driver-resident. Decoders built once per actor.

    Output schema (exploded): image_id:string, tile_hash:int64.

    Reference analogue: the phash dedup slot of the connector fetch
    loop (crawler/connectors/baseconnector.py:1140-1251), hardened to
    the crop-repost case.
    """

    TILE = 16

    def __init__(self, strict: bool = True):
        self.strict = strict
        self.decoders = dict(codecs._DECODERS)

    def __call__(self, batch: pa.Table) -> pa.Table:
        T = self.TILE
        out_ids: list[str] = []
        out_hash: list[int] = []
        for iid, fmt, data in zip(
            batch.column("image_id").to_pylist(),
            batch.column("fmt").to_pylist(),
            batch.column("bytes").to_pylist(),
        ):
            dec = self.decoders.get(fmt)
            if dec is None:
                if self.strict:
                    raise NotImplementedError(
                        f"decode for external format {fmt!r} requires an image codec library"
                    )
                continue
            img = dec(data)
            h, w = img.shape[0], img.shape[1]
            hashes: set[int] = set()
            for ty in range(h // T):
                for tx in range(w // T):
                    tile = img[ty * T : (ty + 1) * T, tx * T : (tx + 1) * T]
                    hashes.add(average_hash(tile))
            for hv in sorted(hashes):
                out_ids.append(iid)
                out_hash.append(hv)
        return pa.table(
            {
                "image_id": pa.array(out_ids, pa.string()),
                "tile_hash": pa.array(out_hash, pa.int64()),
            }
        )


class DominantColorStage:
    """Dominant-color extraction — the palette/flat-image audit of an
    image-curation pipeline (flat renders, solid banners and
    screenshots skew a training corpus; share-of-dominant-color is the
    standard cheap gate). Pixels are quantized to 4 bits/channel
    (4096 bins: bin = (r>>4)<<8 | (g>>4)<<4 | (b>>4)); the dominant bin
    is the argmax of one vectorized ``np.bincount`` per image (lowest
    bin wins ties), and its share is integer milli-units
    ``count * 1000 // n_pixels``. Labels: ``flat`` >= 400 milli,
    ``accent`` >= 150, else ``textured``. Decoders built once per
    actor; no floats anywhere.

    Output schema: image_id:string, dom_bin:int32, dom_milli:int64,
    label:string.

    Reference analogue: the image-scorer slot (T6) of the connector
    fetch loop (crawler/connectors/baseconnector.py:1140-1251).
    """

    FLAT_MILLI = 400
    ACCENT_MILLI = 150

    def __init__(self, strict: bool = True):
        self.strict = strict
        self.decoders = dict(codecs._DECODERS)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out: dict[str, list] = {k: [] for k in ("image_id", "dom_bin", "dom_milli", "label")}
        for iid, fmt, data in zip(
            batch.column("image_id").to_pylist(),
            batch.column("fmt").to_pylist(),
            batch.column("bytes").to_pylist(),
        ):
            dec = self.decoders.get(fmt)
            if dec is None:
                if self.strict:
                    raise NotImplementedError(
                        f"decode for external format {fmt!r} requires an image codec library"
                    )
                continue
            img = dec(data)
            q = img.astype(np.int64) >> 4
            bins = (q[:, :, 0] << 8) | (q[:, :, 1] << 4) | q[:, :, 2]
            counts = np.bincount(bins.ravel(), minlength=4096)
            dom = int(np.argmax(counts))
            milli = int(counts[dom]) * 1000 // bins.size
            label = (
                "flat" if milli >= self.FLAT_MILLI
                else "accent" if milli >= self.ACCENT_MILLI
                else "textured"
            )
            out["image_id"].append(iid)
            out["dom_bin"].append(dom)
            out["dom_milli"].append(milli)
            out["label"].append(label)
        return pa.table(
            {
                "image_id": pa.array(out["image_id"], pa.string()),
                "dom_bin": pa.array(out["dom_bin"], pa.int32()),
                "dom_milli": pa.array(out["dom_milli"], pa.int64()),
                "label": pa.array(out["label"], pa.string()),
            }
        )


class SsimRefStage:
    """Full-reference image quality (integer SSIM) — the
    degradation-scoring step of an image-curation pipeline: given
    (reference, candidate) payload pairs, score structural similarity
    so re-encodes/blurs can be ranked against their source. Global
    single-window SSIM kept EXACT in integers: with Python-int sums
    Sx, Sy, Sxx, Syy, Sxy over the gray images (gray = channel sum
    // 3) and n pixels,

        num = (2*Sx*Sy + C1*n^2) * (2*(n*Sxy - Sx*Sy) + C2*n^2)
        den = (Sx^2 + Sy^2 + C1*n^2) * ((n*Sxx - Sx^2) + (n*Syy - Sy^2) + C2*n^2)
        ssim_milli = num * 1000 // den

    C1=7, C2=59 are the classic (0.01*255)^2 / (0.03*255)^2 constants
    rounded to integers (this is a deterministic engine metric, not a
    calibrated IQA score). Arbitrary-precision ints make the result
    platform-exact; the per-image reductions are single vectorized
    ``np.sum`` kernels. Decoders built once per actor.

    Input: image_id, blur_k:int32, bytes_a, bytes_b, fmt (both payloads
    share one fmt). Output: image_id:string, blur_k:int32,
    ssim_milli:int64.
    """

    C1 = 7
    C2 = 59

    def __init__(self, strict: bool = True):
        self.strict = strict
        self.decoders = dict(codecs._DECODERS)

    @classmethod
    def ssim_milli(cls, a: np.ndarray, b: np.ndarray) -> int:
        ga = a.astype(np.int64).sum(axis=2) // 3
        gb = b.astype(np.int64).sum(axis=2) // 3
        n = int(ga.size)
        sx = int(ga.sum()); sy = int(gb.sum())
        sxx = int((ga * ga).sum()); syy = int((gb * gb).sum())
        sxy = int((ga * gb).sum())
        c1n = cls.C1 * n * n
        c2n = cls.C2 * n * n
        num = (2 * sx * sy + c1n) * (2 * (n * sxy - sx * sy) + c2n)
        den = (sx * sx + sy * sy + c1n) * ((n * sxx - sx * sx) + (n * syy - sy * sy) + c2n)
        return num * 1000 // den

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_ids: list[str] = []
        out_k: list[int] = []
        out_s: list[int] = []
        for iid, k, fmt, da, db in zip(
            batch.column("image_id").to_pylist(),
            batch.column("blur_k").to_pylist(),
            batch.column("fmt").to_pylist(),
            batch.column("bytes_a").to_pylist(),
            batch.column("bytes_b").to_pylist(),
        ):
            dec = self.decoders.get(fmt)
            if dec is None:
                if self.strict:
                    raise NotImplementedError(
                        f"decode for external format {fmt!r} requires an image codec library"
                    )
                continue
            out_ids.append(iid)
            out_k.append(int(k))
            out_s.append(self.ssim_milli(dec(da), dec(db)))
        return pa.table(
            {
                "image_id": pa.array(out_ids, pa.string()),
                "blur_k": pa.array(out_k, pa.int32()),
                "ssim_milli": pa.array(out_s, pa.int64()),
            }
        )


def otsu_threshold(g) -> int:
    """Exact-integer Otsu threshold of a gray image (see
    OtsuBinarizeStage docstring): argmax of the between-class variance
    compared as cross-multiplied Python-int fractions, smallest t on
    ties; -1 when no valid split exists (constant image)."""
    import numpy as _np

    hist = _np.bincount(g.ravel(), minlength=256)
    W = int(g.size)
    S = int(g.ravel().sum())
    w0 = s0 = 0
    best_num = best_den = 0
    best_t = -1
    for t in range(256):
        w0 += int(hist[t])
        s0 += t * int(hist[t])
        if w0 == 0 or w0 == W:
            continue
        num = S * w0 - s0 * W
        v_num = num * num
        v_den = w0 * (W - w0)
        if best_t < 0 or v_num * best_den > best_num * v_den:
            best_num, best_den, best_t = v_num, v_den, t
    return best_t


class OtsuBinarizeStage:
    """Global-threshold binarization audit — Otsu's method (Otsu 1979,
    "A Threshold Selection Method from Gray-Level Histograms") kept
    integer-exact: the threshold maximizes the between-class variance
    σ_B²(t) = (S·w0 − s0·W)² / (w0·(W−w0)) over the 256-bin gray
    histogram, compared as exact cross-multiplied integer fractions
    (Python ints — no float variance, no overflow at any image size),
    smallest argmax t on ties. Constant images (no valid split) report
    the constant as the threshold with zero foreground. Foreground =
    pixels with gray > t, reported in milli of the pixel count.

    The binarization audit is a curation primitive for scanned-text /
    chart / line-art detection in an image corpus (documents binarize
    cleanly — bimodal histograms; photos don't), the pixel-domain
    sibling of the text quality gates. Decoders built once per actor;
    gray + histogram are vectorized, the scan is 256 fixed steps.

    Output schema: image_id:string, threshold:int64, fg_milli:int64.
    """

    def __init__(self, strict: bool = True):
        self.strict = strict
        self.decoders = dict(codecs._DECODERS)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("image_id").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        datas = batch.column("bytes").to_pylist()
        out_ids: list[str] = []
        out_thr: list[int] = []
        out_fg: list[int] = []
        for i, fmt, data in zip(ids, fmts, datas):
            dec = self.decoders.get(fmt)
            if dec is None:
                if self.strict:
                    raise NotImplementedError(
                        f"decode for external format {fmt!r} requires an image codec library"
                    )
                continue
            g = dec(data).astype(np.int64).sum(axis=2) // 3
            W = int(g.size)
            best_t = otsu_threshold(g)
            if best_t < 0:  # constant image: no valid split
                thr = int(g.flat[0])
                fg = 0
            else:
                thr = best_t
                fg = int((g > best_t).sum())
            out_ids.append(i)
            out_thr.append(thr)
            out_fg.append(fg * 1000 // W)
        return pa.table(
            {
                "image_id": pa.array(out_ids, pa.string()),
                "threshold": pa.array(out_thr, pa.int64()),
                "fg_milli": pa.array(out_fg, pa.int64()),
            }
        )


class MedianCutPaletteStage:
    """Median-cut palette extraction (Heckbert 1982, "Color Image
    Quantization for Frame Buffer Display") — the k-color palette audit
    of an image-curation pipeline (palette size/spread separates flat
    renders, charts and line art from photographs; the recursive-box
    sibling of DominantColorStage's single-bin gate). Deterministic
    integer spec, exactly restatable by the golden:

    - start with one box holding every pixel (r, g, b triples);
    - until 4 boxes: pick the box with the largest channel RANGE
      (ties: more pixels, then lower box creation index), split along
      its widest channel (ties: r before g before b) by ORDER
      POSITION — pixels sorted by (channel value, packed rgb) and cut
      at (n+1)//2 — which never degenerates, unlike value-median cuts
      on constant runs; boxes of range 0 are unsplittable;
    - palette entry per box = floor mean per channel, packed
      r<<16 | g<<8 | b; boxes reported sorted by packed entry
      (count descending never enters the ordering — fully determined
      by color).

    Output schema: image_id:string, n_boxes:int32, p0..p3:int64 (−1
    when fewer boxes), n0..n3:int64 (0 when fewer).
    """

    K = 4

    def __init__(self, strict: bool = True):
        self.strict = strict
        self.decoders = dict(codecs._DECODERS)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out: dict[str, list] = {"image_id": [], "n_boxes": []}
        for i in range(self.K):
            out[f"p{i}"] = []
            out[f"n{i}"] = []
        for iid, fmt, data in zip(
            batch.column("image_id").to_pylist(),
            batch.column("fmt").to_pylist(),
            batch.column("bytes").to_pylist(),
        ):
            dec = self.decoders.get(fmt)
            if dec is None:
                if self.strict:
                    raise NotImplementedError(
                        f"decode for external format {fmt!r} requires an image codec library"
                    )
                continue
            img = dec(data).astype(np.int64)
            px = img[:, :, :3].reshape(-1, 3)
            packed = (px[:, 0] << 16) | (px[:, 1] << 8) | px[:, 2]
            boxes = [px[np.lexsort((packed,))]]  # stable canonical order
            while len(boxes) < self.K:
                ranges = [int((b.max(axis=0) - b.min(axis=0)).max()) for b in boxes]
                sizes = [len(b) for b in boxes]
                pick = -1
                for j in range(len(boxes)):
                    if ranges[j] == 0:
                        continue
                    if pick < 0 or (ranges[j], sizes[j]) > (ranges[pick], sizes[pick]):
                        pick = j
                if pick < 0:
                    break  # every box constant: unsplittable
                b = boxes[pick]
                spread = b.max(axis=0) - b.min(axis=0)
                ch = int(np.argmax(spread))  # argmax ties → lowest channel
                key = (b[:, 0] << 16) | (b[:, 1] << 8) | b[:, 2]
                order = np.lexsort((key, b[:, ch]))
                cut = (len(b) + 1) // 2
                boxes[pick] = b[order[:cut]]
                boxes.append(b[order[cut:]])
            entries = sorted(
                (
                    int((int(b[:, 0].sum()) // len(b)) << 16
                        | (int(b[:, 1].sum()) // len(b)) << 8
                        | (int(b[:, 2].sum()) // len(b))),
                    len(b),
                )
                for b in boxes
            )
            out["image_id"].append(iid)
            out["n_boxes"].append(len(entries))
            for i in range(self.K):
                out[f"p{i}"].append(entries[i][0] if i < len(entries) else -1)
                out[f"n{i}"].append(entries[i][1] if i < len(entries) else 0)
        return pa.table(
            {
                "image_id": pa.array(out["image_id"], pa.string()),
                "n_boxes": pa.array(out["n_boxes"], pa.int32()),
                **{
                    k: pa.array(out[k], pa.int64())
                    for i in range(self.K)
                    for k in (f"p{i}", f"n{i}")
                },
            }
        )


class RegionCountStage:
    """Connected-component region audit over the Otsu-binarized image
    (4-connectivity, foreground = gray > threshold) — the blob/region
    census of a document-image curation pipeline (text pages and
    charts have many small regions, photos a few large ones; region
    counts are the classic layout-vs-photo discriminator). Labeling is
    the standard two-pass union-find scan (Rosenfeld & Pfaltz 1966);
    the per-pixel pass is inherent to CCL without scipy (absent in
    this env) and runs inside actor tasks across the pool — the golden
    re-derives every count with an independent BFS flood fill, so a
    connectivity or union bug fails the gate. Constant images (no
    valid Otsu split) report zero regions.

    Output schema: image_id:string, threshold:int64, n_regions:int64,
    largest_milli:int64 (largest region's share of ALL pixels).
    """

    def __init__(self, strict: bool = True):
        self.strict = strict
        self.decoders = dict(codecs._DECODERS)

    @staticmethod
    def _regions(mask: np.ndarray) -> tuple:
        h, w = mask.shape
        labels = np.zeros((h, w), np.int64)
        parent: list[int] = [0]

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        nxt = 1
        for y in range(h):
            for x in range(w):
                if not mask[y, x]:
                    continue
                up = labels[y - 1, x] if y and mask[y - 1, x] else 0
                left = labels[y, x - 1] if x and mask[y, x - 1] else 0
                if up and left:
                    ru, rl = find(up), find(left)
                    labels[y, x] = ru
                    if ru != rl:
                        parent[max(ru, rl)] = min(ru, rl)
                elif up or left:
                    labels[y, x] = up or left
                else:
                    labels[y, x] = nxt
                    parent.append(nxt)
                    nxt += 1
        counts: dict[int, int] = {}
        for y in range(h):
            for x in range(w):
                if labels[y, x]:
                    r = find(labels[y, x])
                    counts[r] = counts.get(r, 0) + 1
        n = len(counts)
        largest = max(counts.values()) if counts else 0
        return n, largest

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_ids: list[str] = []
        out_thr: list[int] = []
        out_n: list[int] = []
        out_lg: list[int] = []
        for iid, fmt, data in zip(
            batch.column("image_id").to_pylist(),
            batch.column("fmt").to_pylist(),
            batch.column("bytes").to_pylist(),
        ):
            dec = self.decoders.get(fmt)
            if dec is None:
                if self.strict:
                    raise NotImplementedError(
                        f"decode for external format {fmt!r} requires an image codec library"
                    )
                continue
            g = dec(data).astype(np.int64).sum(axis=2) // 3
            t = otsu_threshold(g)
            if t < 0:
                thr, n, largest = int(g.flat[0]), 0, 0
            else:
                thr = t
                n, largest = self._regions(g > t)
            out_ids.append(iid)
            out_thr.append(thr)
            out_n.append(n)
            out_lg.append(largest * 1000 // int(g.size))
        return pa.table(
            {
                "image_id": pa.array(out_ids, pa.string()),
                "threshold": pa.array(out_thr, pa.int64()),
                "n_regions": pa.array(out_n, pa.int64()),
                "largest_milli": pa.array(out_lg, pa.int64()),
            }
        )


class DihedralCanonStage:
    """Dihedral-8-invariant canonical image hash: canon = min (as
    uint64 bit pattern) of average_hash over all 8 symmetries of the
    image (4 right-angle rotations × optional horizontal flip) — the
    full canonicalize-then-exact-match closure of MirrorCanonStage,
    catching rotated AND rotated-mirrored reposts (phone screenshots,
    EXIF-stripped re-uploads) that both plain phash grouping and
    mirror-only canon miss. Decoders built once per actor; rotations
    are O(1) numpy views materialized only for the hash.

    Output schema: image_id:string, canon_hash:int64.
    """

    def __init__(self, strict: bool = True):
        self.strict = strict
        self.decoders = dict(codecs._DECODERS)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("image_id").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        datas = batch.column("bytes").to_pylist()
        out_ids: list[str] = []
        out_canon: list[int] = []
        for i, fmt, data in zip(ids, fmts, datas):
            dec = self.decoders.get(fmt)
            if dec is None:
                if self.strict:
                    raise NotImplementedError(
                        f"decode for external format {fmt!r} requires an image codec library"
                    )
                continue
            img = dec(data)
            best = 0xFFFFFFFFFFFFFFFF
            for k in range(4):
                r = np.rot90(img, k)
                for v in (r, r[:, ::-1]):
                    h = average_hash(np.ascontiguousarray(v)) & 0xFFFFFFFFFFFFFFFF
                    if h < best:
                        best = h
            out_ids.append(i)
            out_canon.append(int(np.uint64(best).astype(np.int64)))
        return pa.table(
            {
                "image_id": pa.array(out_ids, pa.string()),
                "canon_hash": pa.array(out_canon, pa.int64()),
            }
        )


class GradientOrientationStage:
    """HOG-lite gradient-orientation census (the integer core of
    Dalal & Triggs, CVPR 2005, without the float block
    normalization): per image, forward-difference gradients on the
    common interior (gx = g[y,x+1]−g[y,x], gy = g[y+1,x]−g[y,x] for
    y<H−1, x<W−1, gray = channel-sum // 3), L1 magnitude |gx|+|gy|,
    and an exact 4-way orientation census:

      horizontal  |gx| >  |gy|          → sum_h += mag
      vertical    |gy| >  |gx|          → sum_v += mag
      diagonal    |gx| == |gy| ≠ 0, gx·gy > 0 → sum_d += mag
      antidiag    |gx| == |gy| ≠ 0, gx·gy < 0 → sum_a += mag
      flat        gx == gy == 0         → n_flat += 1

    All integer — no atan2, no float bin edges — so the census is
    bit-identical at any partitioning. The texture-direction signal
    of an image-curation pipeline (scanned text is horizontal-heavy,
    letterboxed frames vertical-heavy at the bars, noise is flat-poor
    and direction-balanced). Decoders built once per actor; the
    census is fully vectorized per image.

    Output schema: image_id:string, sum_h/sum_v/sum_d/sum_a:int64,
    n_flat:int64, edge_energy:int64 (= Σ mag over all interior
    pixels).
    """

    def __init__(self, strict: bool = True):
        self.strict = strict
        self.decoders = dict(codecs._DECODERS)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("image_id").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        datas = batch.column("bytes").to_pylist()
        out: dict[str, list] = {k: [] for k in (
            "image_id", "sum_h", "sum_v", "sum_d", "sum_a", "n_flat",
            "edge_energy")}
        for i, fmt, data in zip(ids, fmts, datas):
            dec = self.decoders.get(fmt)
            if dec is None:
                if self.strict:
                    raise NotImplementedError(
                        f"decode for external format {fmt!r} requires an "
                        "image codec library"
                    )
                continue
            g = dec(data).astype(np.int64).sum(axis=2) // 3
            gx = g[:-1, 1:] - g[:-1, :-1]
            gy = g[1:, :-1] - g[:-1, :-1]
            ax, ay = np.abs(gx), np.abs(gy)
            mag = ax + ay
            h = ax > ay
            v = ay > ax
            eq = (ax == ay) & (mag > 0)
            d = eq & (gx * gy > 0)
            a = eq & (gx * gy < 0)
            out["image_id"].append(i)
            out["sum_h"].append(int(mag[h].sum()))
            out["sum_v"].append(int(mag[v].sum()))
            out["sum_d"].append(int(mag[d].sum()))
            out["sum_a"].append(int(mag[a].sum()))
            out["n_flat"].append(int((mag == 0).sum()))
            out["edge_energy"].append(int(mag.sum()))
        return pa.table({
            "image_id": pa.array(out["image_id"], pa.string()),
            **{k: pa.array(out[k], pa.int64()) for k in (
                "sum_h", "sum_v", "sum_d", "sum_a", "n_flat",
                "edge_energy")},
        })


class HaarSubbandStage:
    """Two-level integer Haar wavelet subband energy census (Haar
    1910; the Mallat 1989 pyramid kept integer — the unnormalized
    4-point butterfly per 2×2 block: LL = a+b+c+d, LH = (a+b)−(c+d),
    HL = (a−b)+(c−d), HH = (a−b)−(c−d), level 2 applied to the raw
    level-1 LL with the same formulas, no divisions anywhere). Per
    image: the squared-coefficient energy of each detail subband and
    the final LL — the frequency-split an image-curation pipeline
    uses to separate smooth gradients (LL-dominant), stripe/text
    textures (LH/HL-heavy) and checkerboard noise (HH-heavy), and
    the integer skeleton of every wavelet compressibility score.
    Requires even dims at both levels (the corpus dims are powers of
    two ≥ 8 per the fixture spec — ValueError otherwise, fail-loud).
    Decoders built once per actor; butterflies fully vectorized.

    Output schema: image_id:string, e_ll2/e_lh1/e_hl1/e_hh1/
    e_lh2/e_hl2/e_hh2:int64.
    """

    def __init__(self, strict: bool = True):
        self.strict = strict
        self.decoders = dict(codecs._DECODERS)

    @staticmethod
    def _level(g: np.ndarray):
        a = g[0::2, 0::2].astype(np.int64)
        b = g[0::2, 1::2].astype(np.int64)
        c = g[1::2, 0::2].astype(np.int64)
        d = g[1::2, 1::2].astype(np.int64)
        return (a + b + c + d, (a + b) - (c + d),
                (a - b) + (c - d), (a - b) - (c - d))

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("image_id").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        datas = batch.column("bytes").to_pylist()
        cols: dict[str, list] = {k: [] for k in (
            "image_id", "e_ll2", "e_lh1", "e_hl1", "e_hh1", "e_lh2",
            "e_hl2", "e_hh2")}
        for i, fmt, data in zip(ids, fmts, datas):
            dec = self.decoders.get(fmt)
            if dec is None:
                if self.strict:
                    raise NotImplementedError(
                        f"decode for external format {fmt!r} requires an "
                        "image codec library"
                    )
                continue
            g = dec(data).astype(np.int64).sum(axis=2) // 3
            if g.shape[0] % 4 or g.shape[1] % 4:
                raise ValueError(
                    f"HaarSubbandStage needs dims divisible by 4, got "
                    f"{g.shape}"
                )
            ll1, lh1, hl1, hh1 = self._level(g)
            ll2, lh2, hl2, hh2 = self._level(ll1)
            cols["image_id"].append(i)
            cols["e_ll2"].append(int((ll2 * ll2).sum()))
            cols["e_lh1"].append(int((lh1 * lh1).sum()))
            cols["e_hl1"].append(int((hl1 * hl1).sum()))
            cols["e_hh1"].append(int((hh1 * hh1).sum()))
            cols["e_lh2"].append(int((lh2 * lh2).sum()))
            cols["e_hl2"].append(int((hl2 * hl2).sum()))
            cols["e_hh2"].append(int((hh2 * hh2).sum()))
        return pa.table({
            "image_id": pa.array(cols["image_id"], pa.string()),
            **{k: pa.array(cols[k], pa.int64()) for k in (
                "e_ll2", "e_lh1", "e_hl1", "e_hh1", "e_lh2", "e_hl2",
                "e_hh2")},
        })
