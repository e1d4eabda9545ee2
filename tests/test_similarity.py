"""ANN: brute-force exactness vs numpy, IVF recall gate."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def _corpus(n=400, dim=16, seed=9):
    rng = np.random.Generator(np.random.PCG64(seed))
    vecs = rng.standard_normal((n, dim))
    return pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64), "embedding": list(vecs)})


def _numpy_topk(df, qids, k=5):
    mat = np.stack(df["embedding"].to_numpy())
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    out = {}
    for q in qids:
        cos = mat @ mat[q]
        order = np.lexsort((df["vec_id"].to_numpy(), -cos))
        out[q] = [int(df["vec_id"].iloc[i]) for i in order if df["vec_id"].iloc[i] != q][:k]
    return out


def test_bruteforce_matches_numpy(ray_session):
    import ray.data

    from crawlerframework_ray.stages.similarity import ann_bruteforce

    df = _corpus()
    qids = [0, 1, 2]
    qvecs = np.stack(df[df.vec_id.isin(qids)].sort_values("vec_id")["embedding"].to_numpy())
    res = ann_bruteforce(ray.data.from_pandas(df), qids, qvecs, k=5).to_pandas()
    expected = _numpy_topk(df, qids)
    for q in qids:
        got = res[res.query_id == q].sort_values("rank")["neighbor_id"].tolist()
        assert got == expected[q], f"query {q}"


def test_bruteforce_partial_topk_invariant_to_batching(ray_session):
    """Per-batch partial top-k must not change the global answer."""
    import ray.data

    from crawlerframework_ray.stages.similarity import ann_bruteforce

    df = _corpus(300)
    qids = [5]
    qvecs = np.stack(df[df.vec_id == 5]["embedding"].to_numpy())
    a = ann_bruteforce(ray.data.from_pandas(df), qids, qvecs, k=5, batch_size=32).to_pandas()
    b = ann_bruteforce(ray.data.from_pandas(df), qids, qvecs, k=5, batch_size=4096).to_pandas()
    pd.testing.assert_frame_equal(
        a.sort_values(["query_id", "rank"]).reset_index(drop=True),
        b.sort_values(["query_id", "rank"]).reset_index(drop=True),
    )


def test_ivf_recall_at_least_half(ray_session):
    import ray.data

    from crawlerframework_ray.stages.similarity import ann_ivf

    df = _corpus(500)
    qids = [0, 1, 2, 3]
    qvecs = np.stack(df[df.vec_id.isin(qids)].sort_values("vec_id")["embedding"].to_numpy())
    res = ann_ivf(ray.data.from_pandas(df), qids, qvecs, n_cells=8, nprobe=3, k=5).to_pandas()
    exact = _numpy_topk(df, qids)
    recalls = []
    for q in qids:
        got = set(res[res.query_id == q]["neighbor_id"].tolist())
        recalls.append(len(got & set(exact[q])) / 5)
    assert sum(recalls) / len(recalls) >= 0.5, recalls


def test_multimodal_stubs_raise_cleanly():
    import pyarrow as pa

    from crawlerframework_ray.stages.multimodal import (
        AudioFeatureStage,
        ImageDecodeStage,
        VideoFrameSampleStage,
    )

    batch = pa.table({"image_id": ["x"], "bytes": [b"\xff\xd8rubbish"], "fmt": ["jpeg"]})
    with pytest.raises(NotImplementedError, match="codec"):
        ImageDecodeStage(strict=True)(batch)
    assert len(ImageDecodeStage(strict=False)(batch)) == 0  # graceful skip
    # video/audio are REAL for the in-repo qvd/qau containers (gated in
    # test_codecs + the catalog queries); external containers still stub
    vbatch = pa.table({"video_id": ["x"], "bytes": [b"\x00"], "fmt": ["mp4"]})
    with pytest.raises(NotImplementedError):
        VideoFrameSampleStage()(vbatch)
    abatch = pa.table({"audio_id": ["x"], "bytes": [b"\x00"], "fmt": ["mp3"]})
    with pytest.raises(NotImplementedError):
        AudioFeatureStage()(abatch)


def test_pq_partition_independent_and_dup_recall(ray_session):
    """ann_pq must be blocking-invariant (partition-invariant hash
    training sample + integer ADC + tie-aware partial top-k) and the
    planted exact duplicates must fill every query's top ranks (their
    reconstruction distance is the minimum any point can achieve)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from crawlerframework_ray.stages.similarity import ann_pq

    SF = "/root/testdata/sf0.001"

    def run(blocks: int):
        t = ray.data.read_parquet(
            f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"],
            override_num_blocks=blocks,
        ).to_pandas()
        qm = np.stack(t[t["vec_id"] < 4].sort_values("vec_id")["embedding"].to_numpy())
        qids = [0, 1, 2, 3]
        dup_ids = [(1 << 41) + q * 64 + i for q in qids for i in range(3)]
        dups = np.repeat(qm, 3, axis=0)
        ids = np.concatenate([t["vec_id"].to_numpy().astype(np.int64), dup_ids])
        vecs = list(t["embedding"].to_numpy()) + [v.astype(np.float32) for v in dups]
        aug = ray.data.from_arrow(
            pa.table({"vec_id": pa.array(ids, pa.int64()),
                      "embedding": pa.array([list(map(float, v)) for v in vecs],
                                            pa.list_(pa.float32()))})
        ).repartition(blocks)
        return ann_pq(aug, qids, qm, m_sub=4, n_codes=16, k=4).to_pandas() \
            .sort_values(["query_id", "rank"]).reset_index(drop=True)

    a = run(1)
    b = run(7)
    assert a.equals(b)
    # top-4 of each query = its own row + its 3 exact duplicates (the
    # minimal-distance tie class, ordered by id)
    for q in [0, 1, 2, 3]:
        top = a[a["query_id"] == q]["neighbor_id"].tolist()
        assert top == [q] + [(1 << 41) + q * 64 + i for i in range(3)], top


def test_ivfpq_dup_recall_through_both_stages(ray_session):
    """IVF-PQ composition: the exact duplicates must survive the
    coarse prune (they share the query's top cell at cos 1.0) and then
    occupy the minimal-ADC ranks — and the result must be
    blocking-invariant."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from crawlerframework_ray.stages.similarity import ann_ivfpq

    SF = "/root/testdata/sf0.001"

    def run(blocks: int):
        t = ray.data.read_parquet(
            f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"],
            override_num_blocks=blocks,
        ).to_pandas()
        qm = np.stack(t[t["vec_id"] < 4].sort_values("vec_id")["embedding"].to_numpy())
        qids = [0, 1, 2, 3]
        dup_ids = [(1 << 42) + q * 64 + i for q in qids for i in range(3)]
        dups = np.repeat(qm, 3, axis=0)
        ids = np.concatenate([t["vec_id"].to_numpy().astype(np.int64), dup_ids])
        vecs = list(t["embedding"].to_numpy()) + [v.astype(np.float32) for v in dups]
        aug = ray.data.from_arrow(
            pa.table({"vec_id": pa.array(ids, pa.int64()),
                      "embedding": pa.array([list(map(float, v)) for v in vecs],
                                            pa.list_(pa.float32()))})
        ).repartition(blocks)
        return ann_ivfpq(aug, qids, qm, n_cells=8, nprobe=2, m_sub=4,
                         n_codes=16, k=4).to_pandas() \
            .sort_values(["query_id", "rank"]).reset_index(drop=True)

    a = run(1)
    b = run(6)
    assert a.equals(b)
    for q in [0, 1, 2, 3]:
        top = a[a["query_id"] == q]["neighbor_id"].tolist()
        assert top == [q] + [(1 << 42) + q * 64 + i for i in range(3)], top
