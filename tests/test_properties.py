"""Property-based gates (hypothesis) for the pure leaf functions the
distributed pipelines are built on. These are the invariants the
oracle-equality gates rely on implicitly; here they are checked over
generated inputs, not just the fixture corpora. All serial — no Ray.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

SET = settings(max_examples=60, deadline=None)


# ------------------------------------------------------------- codecs

dims = st.tuples(st.integers(1, 24), st.integers(1, 24))


@SET
@given(dims, st.integers(0, 2**31 - 1))
def test_raw_png_roundtrip_identity(dim, seed):
    from crawlerframework_ray.data import codecs

    h, w = dim
    img = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
    np.testing.assert_array_equal(codecs.decode_raw(codecs.encode_raw(img)), img)
    np.testing.assert_array_equal(codecs.decode_png(codecs.encode_png(img)), img)


@SET
@given(st.integers(8, 24), st.integers(8, 24), st.integers(0, 2**31 - 1))
def test_qds_lossy_error_bounded(h, w, seed):
    """qds is 6-bit quantization with mid-rise reconstruction: per-pixel
    error must stay in [-2, +1] (so PSNR ≥ 40 dB on any image)."""
    from crawlerframework_ray.data import codecs

    img = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
    back = codecs.decode_qds(codecs.encode_qds(img))
    err = back.astype(np.int16) - img.astype(np.int16)
    assert err.min() >= -2 and err.max() <= 2


@SET
@given(st.integers(1, 6), st.integers(4, 16), st.integers(4, 16),
       st.integers(0, 2**31 - 1), st.integers(1, 240))
def test_qvd_roundtrip_identity(n, h, w, seed, fps):
    from crawlerframework_ray.data import media

    frames = np.random.default_rng(seed).integers(0, 256, (n, h, w, 3), dtype=np.uint8)
    back, fps2 = media.decode_qvd(media.encode_qvd(frames, fps=fps))
    assert fps2 == fps
    np.testing.assert_array_equal(back, frames)


@SET
@given(st.integers(1, 5000), st.integers(0, 2**31 - 1), st.sampled_from([8000, 16000, 44100]))
def test_qau_roundtrip_identity(n, seed, rate):
    from crawlerframework_ray.data import media

    pcm = np.random.default_rng(seed).integers(-32768, 32768, n, dtype=np.int64).astype(np.int16)
    back, rate2 = media.decode_qau(media.encode_qau(pcm, rate))
    assert rate2 == rate
    np.testing.assert_array_equal(back, pcm)


@SET
@given(st.integers(1, 4096), st.integers(0, 2**31 - 1), st.integers(1, 512))
def test_window_energies_match_naive(n, seed, window):
    import math

    from crawlerframework_ray.data.media import window_energies

    pcm = np.random.default_rng(seed).integers(-32768, 32768, n, dtype=np.int64).astype(np.int16)
    got = window_energies(pcm, window)
    assert len(got) == n // window
    for i, sum_sq, rms in got:
        expect = sum(int(x) ** 2 for x in pcm[i * window : (i + 1) * window])
        assert sum_sq == expect
        assert rms == math.isqrt(expect * 1_000_000 // window)


# ------------------------------------------------------------- urlnorm

url_st = st.builds(
    lambda scheme, host, segs, q, frag: (
        f"{scheme}://{host}/" + "/".join(segs) + (f"?{q}" if q else "") + (f"#{frag}" if frag else "")
    ),
    st.sampled_from(["http", "HTTP", "https"]),
    st.from_regex(r"[A-Za-z][A-Za-z0-9.-]{0,20}(:(80|443|8080))?", fullmatch=True),
    st.lists(st.sampled_from(["a", "B", "..", ".", "p%61th", "x y", ""]), max_size=6),
    st.sampled_from(["", "a=1", "b=%20", "a=1&b=2"]),
    st.sampled_from(["", "frag"]),
)


@SET
@given(url_st)
def test_urlnorm_idempotent(url):
    from crawlerframework_ray.functions.urlnorm import normalize

    once = normalize(url)
    assert normalize(once) == once


# ------------------------------------------------------------- cuckoo

@SET
@given(st.lists(st.binary(min_size=16, max_size=16), min_size=1, max_size=300, unique=True),
       st.integers(0, 2**31 - 1))
def test_cuckoo_no_false_negatives(items, seed):
    """Every successfully added item must be reported present — the
    property the URL-seen dedup's correctness rides on (false
    positives merely skip a re-fetch; a false negative would violate
    the seen-set membership gate). Keys are 16-byte digests — the
    filter's contract (state/seen.py feeds md5 digests)."""
    from crawlerframework_ray.state.cuckoo import CuckooFilter

    f = CuckooFilter(capacity=2048)
    added = [x for x in items if f.add(x)]
    assert len(added) == len(items)  # far below capacity: no kicks lost
    for x in added:
        assert f.contains(x)


# ------------------------------------------------------- integer math

@SET
@given(st.integers(0, 10_000), st.integers(0, 10_000))
def test_jaccard_permille_formula_bounds(inter, extra):
    """(2000·inter + union) // (2·union) is round-half-up of
    1000·inter/union, in [0, 1000]. (An earlier iff-1000 claim was
    wrong: hypothesis found inter=1999, union=2000 — 0.9995 correctly
    rounds UP to 1000 without the sets being equal. The exact spec is
    the round-half-up identity below.)"""
    import fractions

    union = max(inter + extra, 1)
    p = (2000 * inter + union) // (2 * union)
    assert 0 <= p <= 1000
    assert inter != union or p == 1000  # equality still implies 1000
    exact = fractions.Fraction(1000 * inter, union)
    # round-half-up identity: p is the unique int with p - 1/2 <= exact < p + 1/2
    assert p - fractions.Fraction(1, 2) <= exact < p + fractions.Fraction(1, 2)


# ------------------------------------------- round-3 third-session leaves

@SET
@given(st.text(max_size=200))
def test_normalize_text_idempotent_and_clean(s):
    """normalize_text is idempotent, produces no doubled spaces, no
    leading/trailing whitespace, and no uppercase letters."""
    from crawlerframework_ray.functions.textstats import normalize_text

    n = normalize_text(s)
    assert normalize_text(n) == n
    assert "  " not in n and n == n.strip()
    assert n == n.casefold()  # casefold fixpoint


@SET
@given(st.lists(st.text(min_size=1, max_size=40), max_size=40),
       st.lists(st.text(min_size=1, max_size=40), max_size=20))
def test_bloom_no_false_negatives(members, probes):
    """Every inserted text probes True, whatever else is in the filter;
    and the OR of per-chunk partials equals the one-shot build."""
    from crawlerframework_ray.stages.sketch import bloom_merge, bloom_partial, bloom_probe

    one_shot = bloom_partial(members)
    chunked = bloom_merge(
        [bloom_partial(members[i::3]) for i in range(3)]
    ) if members else one_shot
    np.testing.assert_array_equal(one_shot, chunked)
    if members:
        assert bloom_probe(one_shot, members).all()
    if probes:
        hits = bloom_probe(one_shot, probes)
        member_set = set(members)
        for p, h in zip(probes, hits):
            if p in member_set:
                assert h  # no false negatives


@SET
@given(st.lists(st.integers(1, 10**9), min_size=1, max_size=64),
       st.integers(1, 10**6))
def test_largest_remainder_quota_property(ranks, total):
    """Hamilton apportionment: slots sum EXACTLY to the budget and each
    allocation is within 1 of its exact proportional quota (floor(q) or
    ceil(q) — the defining staying-in-quota property)."""
    import fractions

    r = np.asarray(ranks, dtype=np.int64)
    R = int(r.sum())
    base = (total * r) // R
    rem = (total * r) % R
    leftover = total - int(base.sum())
    order = np.lexsort((np.arange(len(r)), -rem))
    slots = base.copy()
    slots[order[:leftover]] += 1
    assert int(slots.sum()) == total
    for ri, si in zip(r.tolist(), slots.tolist()):
        q = fractions.Fraction(total * ri, R)
        assert q.__floor__() <= si <= -((-q).__floor__())  # floor(q) <= s <= ceil(q)


# ------------------------------------------- round-4 curation stages


@SET
@given(st.integers(0, 7), st.integers(0, 7), st.integers(0, 255),
       st.integers(0, 2**31 - 1))
def test_border_detection_exact_on_arbitrary_planted_bars(top, bottom, fill, seed):
    """ImageBorderStage must report EXACTLY the planted bar heights for
    any bar sizes/fill value around random noise content (the catalog
    query only exercises symmetric even-height bars)."""
    import pyarrow as pa

    from crawlerframework_ray.data import codecs
    from crawlerframework_ray.stages.multimodal import ImageBorderStage

    rng = np.random.default_rng(seed)
    content = rng.integers(0, 256, (6, 5, 3), dtype=np.uint8)
    # forbid accidental uniform edge rows matching the fill (would
    # legitimately extend the detected run)
    content[0, 0, 0] = (int(fill) + 1) % 256
    content[-1, 0, 0] = (int(fill) + 1) % 256
    content[0, 1, 0] = (content[0, 0, 0] + 1) % 256
    content[-1, 1, 0] = (content[-1, 0, 0] + 1) % 256
    parts = []
    if top:
        parts.append(np.full((top, 5, 3), fill, np.uint8))
    parts.append(content)
    if bottom:
        parts.append(np.full((bottom, 5, 3), fill, np.uint8))
    img = np.concatenate(parts, axis=0)
    batch = pa.table(
        {
            "image_id": pa.array(["x"], pa.string()),
            "bytes": pa.array([codecs.encode_raw(img)], pa.binary()),
            "fmt": pa.array(["raw"], pa.string()),
        }
    )
    t = ImageBorderStage()(batch)
    assert t.column("top_border").to_pylist() == [top]
    assert t.column("bottom_border").to_pylist() == [bottom]
    assert t.column("content_rows").to_pylist() == [6]


@SET
@given(st.integers(0, 2**31 - 1))
def test_scene_cut_count_matches_plant_for_any_seed(seed):
    """VideoSceneCutStage must find exactly scenes−1 cuts on any
    synth_scene_video composite (threshold separation is a property of
    the generator, not of the fixture doc_ids)."""
    import pyarrow as pa

    from crawlerframework_ray.data.media import encode_qvd, scene_lengths, synth_scene_video
    from crawlerframework_ray.stages.multimodal import VideoSceneCutStage

    lens = scene_lengths(seed)
    batch = pa.table(
        {
            "video_id": pa.array(["v"], pa.string()),
            "bytes": pa.array([encode_qvd(synth_scene_video(seed, w=16, h=16))], pa.binary()),
            "fmt": pa.array(["qvd"], pa.string()),
        }
    )
    t = VideoSceneCutStage()(batch)
    assert t.column("n_cuts").to_pylist() == [len(lens) - 1]
    assert t.column("n_frames").to_pylist() == [sum(lens)]


@SET
@given(st.integers(0, 2**31 - 1))
def test_audio_quality_matches_plant_for_any_seed(seed):
    """AudioQualityStage counts must equal the plant arithmetic for any
    seed (silence threshold margin is a property of the waveform
    family: amp ≥ 4000 → rms ≥ ~2.3M milli vs the 100k threshold)."""
    import pyarrow as pa

    from crawlerframework_ray.data.media import (
        encode_qau,
        plant_audio_defects,
        synth_defective_audio,
    )
    from crawlerframework_ray.stages.multimodal import AudioQualityStage

    sil, clip = plant_audio_defects(seed)
    batch = pa.table(
        {
            "audio_id": pa.array(["a"], pa.string()),
            "bytes": pa.array([encode_qau(synth_defective_audio(seed))], pa.binary()),
            "fmt": pa.array(["qau"], pa.string()),
        }
    )
    t = AudioQualityStage()(batch)
    assert t.column("n_silent").to_pylist() == [len(sil)]
    assert t.column("n_clipped_samples").to_pylist() == [1024 if clip >= 0 else 0]


def test_pgm_greedy_segments_admit_eps_feasible_lines():
    # the greedy's invariant: every closed segment admits a linear
    # model with |pred - pos| <= eps — reconstruct one (the midpoint
    # of the final feasible slope interval, exact Fractions) and
    # check every point, over random irregular key sets
    from fractions import Fraction

    import numpy as np

    from crawlerframework_ray.pipelines.queries import _pgm_segments_count

    rng = np.random.default_rng(11)
    for trial in range(20):
        n = int(rng.integers(2, 400))
        keys = np.unique(rng.integers(0, 10**12, n).astype(np.int64))
        for eps in (1, 4, 16):
            # re-run the greedy with Fractions, tracking segment spans
            segs = []
            start, lo, hi = 0, None, None
            for j in range(1, len(keys)):
                dx = int(keys[j] - keys[start])
                nl = Fraction(j - start - eps, dx)
                nh = Fraction(j - start + eps, dx)
                lo = nl if lo is None or nl > lo else lo
                hi = nh if hi is None or nh < hi else hi
                if lo > hi:
                    segs.append((start, j - 1))
                    start, lo, hi = j, None, None
            segs.append((start, len(keys) - 1))
            assert len(segs) == _pgm_segments_count(keys, eps)
            for s, e in segs:
                if e == s:
                    continue
                # final feasible interval for this segment
                flo, fhi = None, None
                for j in range(s + 1, e + 1):
                    dx = int(keys[j] - keys[s])
                    nl = Fraction(j - s - eps, dx)
                    nh = Fraction(j - s + eps, dx)
                    flo = nl if flo is None or nl > flo else flo
                    fhi = nh if fhi is None or nh < fhi else fhi
                assert flo <= fhi
                slope = (flo + fhi) / 2
                for j in range(s, e + 1):
                    pred = slope * int(keys[j] - keys[s])
                    assert abs(pred - (j - s)) <= eps


def test_bottomk_merge_law():
    # bottom-k of a union == bottom-k of per-partition bottom-ks
    import numpy as np

    m = np.uint64(0x9E3779B97F4A7C15)
    rng = np.random.default_rng(5)
    ids = rng.integers(0, 10**9, 3000).astype(np.int64)
    hk = (ids.astype(np.uint64) + np.uint64(1)) * m
    k = 32

    def bottomk(i, h):
        o = np.lexsort((i, h))[:k]
        return i[o], h[o]

    gi, gh = bottomk(ids, hk)
    for split in (1, 700, 2999):
        ai, ah = bottomk(ids[:split], hk[:split])
        bi, bh = bottomk(ids[split:], hk[split:])
        mi, mh = bottomk(np.concatenate([ai, bi]), np.concatenate([ah, bh]))
        assert (mi == gi).all() and (mh == gh).all()
