"""Near-dup operators with planted duplicates (the sf documents table
has no near-dups, so dedup recall is gated here on a planted corpus)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from crawlerframework_ray.data.imageops import hamming64
from crawlerframework_ray.functions.textstats import jaccard, word_shingles
from crawlerframework_ray.stages.dedup import (
    MinHashStage,
    SimHashStage,
    _perm_params,
    bucket_pairs,
    hyperplane_sketch,
    minhash_signature,
    simhash64,
    verify_pairs_jaccard,
)

BASE = (
    "the data pipeline reads parquet blocks and shuffles them across workers "
    "before aggregating results into a compact summary table for analysts"
)
NEAR = BASE.replace("compact summary", "small rollup")  # few-token edit
FAR = "completely different content about gardening tulips and watering cans in spring"


def test_minhash_estimates_jaccard():
    a, b = _perm_params(128, 7)
    s1 = minhash_signature(BASE, 128, a, b)
    s2 = minhash_signature(NEAR, 128, a, b)
    s3 = minhash_signature(FAR, 128, a, b)
    est_near = (s1 == s2).mean()
    true_near = jaccard(word_shingles(BASE), word_shingles(NEAR))
    assert abs(est_near - true_near) < 0.2
    assert (s1 == s3).mean() < 0.15


def test_minhash_stage_pipeline_finds_planted_pair(ray_session):
    import ray.data

    docs = pd.DataFrame({"doc_id": [0, 1, 2, 3], "text": [BASE, NEAR, FAR, "tiny"]})
    ds = ray.data.from_pandas(docs)
    bands = ds.map_batches(
        MinHashStage,
        fn_constructor_kwargs={"id_column": "doc_id", "text_column": "text"},
        batch_format="pyarrow",
        concurrency=1,
        num_cpus=0.5,
    )
    cand = (
        bands.groupby(["band", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()
        .drop_duplicates()
    )
    verified = verify_pairs_jaccard(cand, dict(zip(docs.doc_id, docs.text)), threshold=0.5)
    assert set(zip(verified.id_a, verified.id_b)) == {(0, 1)}
    assert (verified.jaccard_permille >= 500).all()


def test_simhash_near_vs_far():
    assert hamming64(simhash64(BASE), simhash64(NEAR)) <= 10
    assert hamming64(simhash64(BASE), simhash64(FAR)) > 14


def test_simhash_stage_bands_deterministic(ray_session):
    import ray.data

    docs = pd.DataFrame({"doc_id": [0, 1], "text": [BASE, BASE]})
    ds = ray.data.from_pandas(docs)
    out = ds.map_batches(
        SimHashStage,
        fn_constructor_kwargs={"id_column": "doc_id", "text_column": "text"},
        batch_format="pyarrow",
        concurrency=1,
        num_cpus=0.5,
    ).to_pandas()
    # identical docs share all 4 band hashes
    g = out.groupby("band")["band_hash"].nunique()
    assert (g == 1).all()


def test_hyperplane_sketch_similar_vectors_collide():
    rng = np.random.Generator(np.random.PCG64(1))
    v = rng.standard_normal((1, 32))
    near = v + rng.standard_normal((1, 32)) * 0.01
    far = rng.standard_normal((1, 32))
    vs = np.vstack([v, near, far])
    vs /= np.linalg.norm(vs, axis=1, keepdims=True)
    codes = hyperplane_sketch(vs, 12, seed=3)
    assert codes[0] == codes[1]
    assert codes[0] != codes[2]


def test_bucket_pairs_truncates_deterministically():
    g = pd.DataFrame({"doc_id": list(range(100))})
    p = bucket_pairs(g, max_bucket=8)
    assert len(p) == 8 * 7 // 2
    assert p["id_a"].max() < 8


def test_label_propagation_clusters(ray_session):
    from crawlerframework_ray.stages.dedup import label_propagation_clusters

    # two components: {1,2,3,4} (a chain) and {10,11}; singleton 99 absent
    pairs = pd.DataFrame({"id_a": [1, 2, 3, 10], "id_b": [2, 3, 4, 11]})
    out = label_propagation_clusters(pairs).to_pandas().set_index("doc_id")["cluster_id"]
    assert set(out.index) == {1, 2, 3, 4, 10, 11}
    assert len(set(out[[1, 2, 3, 4]])) == 1 and out[1] == 1
    assert len(set(out[[10, 11]])) == 1 and out[10] == 10
    assert out[10] != out[1]


def test_label_propagation_empty(ray_session):
    from crawlerframework_ray.stages.dedup import label_propagation_clusters

    out = label_propagation_clusters(pd.DataFrame({"id_a": [], "id_b": []})).to_pandas()
    assert len(out) == 0


def test_mulmod61_matches_python_int_arithmetic():
    """The universal hash must be the exact (a*h+b) mod 2^61-1 — not the
    2^64-wrapped form (ADVICE r1)."""
    from crawlerframework_ray.stages.dedup import _MERSENNE, _mod61, _mulmod61

    rng = np.random.Generator(np.random.PCG64(5))
    a = rng.integers(1, _MERSENNE, 200, dtype=np.int64).astype(np.uint64)
    h64 = rng.integers(0, np.iinfo(np.int64).max, 200, dtype=np.int64).astype(np.uint64)
    h64[:4] = [0, 1, np.uint64(_MERSENNE), np.uint64(2**63 + 12345)]
    h = _mod61(h64)
    got = _mulmod61(a, h)
    want = np.array(
        [(int(x) * int(y)) % _MERSENNE for x, y in zip(a, h)], dtype=np.uint64
    )
    np.testing.assert_array_equal(got, want)


def test_lsh_candidate_pairs_minhash_distributed(ray_session):
    """The round-2 distributed path: bucketed pair expansion + text
    join + in-pipeline Jaccard verify — same answer as the round-1
    driver-side path on the planted corpus."""
    import ray.data

    from crawlerframework_ray.stages.dedup import (
        MinHashStage,
        join_pair_texts,
        lsh_candidate_pairs,
        verify_jaccard_batch,
    )

    docs = pd.DataFrame({"doc_id": [0, 1, 2, 3], "text": [BASE, NEAR, FAR, "tiny"]})
    ds = ray.data.from_pandas(docs)
    bands = ds.map_batches(
        MinHashStage,
        fn_constructor_kwargs={"id_column": "doc_id", "text_column": "text"},
        batch_format="pyarrow", concurrency=1, num_cpus=0.5,
    )
    pairs = lsh_candidate_pairs(bands)
    joined = join_pair_texts(pairs, ray.data.from_pandas(docs))
    out = joined.map_batches(verify_jaccard_batch(0.5), batch_format="pandas").to_pandas()
    assert set(zip(out.id_a, out.id_b)) == {(0, 1)}
    assert (out.jaccard_permille >= 500).all()


def test_simhash_carried_signature_verify(ray_session):
    """Signatures carried through pair expansion: identical docs give a
    hamming-0 pair; the far doc never pairs."""
    import ray.data

    from crawlerframework_ray.stages.dedup import (
        SimHashStage,
        lsh_candidate_pairs,
        verify_hamming_batch,
    )

    docs = pd.DataFrame({"doc_id": [10, 20, 30], "text": [BASE, BASE, FAR]})
    ds = ray.data.from_pandas(docs)
    bands = ds.map_batches(
        SimHashStage,
        fn_constructor_kwargs={"id_column": "doc_id", "text_column": "text"},
        batch_format="pyarrow", concurrency=1, num_cpus=0.5,
    )
    pairs = lsh_candidate_pairs(bands, carry=["sig"])
    out = pairs.map_batches(verify_hamming_batch(6), batch_format="pandas").to_pandas()
    assert set(zip(out.id_a, out.id_b)) == {(10, 20)}
    assert (out.hamming == 0).all()


def test_embedding_near_dup_planted_fixture(ray_session, tmp_path):
    """Multi-band hyperplane LSH must surface planted near-identical
    embeddings (round-1 returned 0 pairs from a constant band)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from crawlerframework_ray.pipelines.queries import QUERIES

    rng = np.random.Generator(np.random.PCG64(9))
    base = rng.standard_normal((40, 32))
    planted = []
    vecs, ids = [], []
    for i in range(40):
        vecs.append(base[i]); ids.append(i)
    for j, src in enumerate([3, 17, 29]):
        dup_id = 100 + j
        vecs.append(base[src] + rng.standard_normal(32) * 0.01)
        ids.append(dup_id)
        planted.append((src, dup_id))
    tbl = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs], pa.list_(pa.float32())),
    })
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    out = QUERIES["embedding_near_dup_pairs"](str(tmp_path))
    found = set(zip(out.id_a, out.id_b))
    assert set(planted) <= found, f"planted {planted} not all found in {found}"
    assert (out.cos_permille >= 800).all()


# ------------------------------------------------------- exact n-gram Jaccard


def test_exact_jaccard_pairs_tiny_corpus(ray_session):
    """Serial set arithmetic vs the distributed inverted-index pipeline
    on a constructed corpus with one exact dup, one near dup, and one
    unrelated doc."""
    import ray.data

    from crawlerframework_ray.stages.dedup import exact_jaccard_pairs, ngram_set_rows

    texts = {
        1: "a b c d e f",
        2: "a b c d e f",          # exact dup of 1
        3: "a b c d e zz",         # near dup of 1/2
        4: "p q r s t u",          # unrelated
    }
    ds = ray.data.from_items(
        [{"doc_id": k, "text": v} for k, v in texts.items()]
    ).map_batches(lambda t: t, batch_format="pyarrow")
    out = (
        exact_jaccard_pairs(ngram_set_rows(ds), tau_num=1, tau_den=2)
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )

    def grams(s):
        t = s.split(" ")
        return {" ".join(t[i : i + 3]) for i in range(len(t) - 2)}

    expected = []
    ids = sorted(texts)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            ga, gb = grams(texts[a]), grams(texts[b])
            inter, union = len(ga & gb), len(ga | gb)
            if 2 * inter >= union:
                expected.append((a, b, inter, union, (2000 * inter + union) // (2 * union)))
    exp = pd.DataFrame(
        expected, columns=["id_a", "id_b", "inter", "union_sz", "jaccard_permille"]
    ).astype("int64")
    pd.testing.assert_frame_equal(out, exp)
    assert (1, 2) in set(zip(out["id_a"], out["id_b"]))  # the exact dup survived
    assert out.loc[(out["id_a"] == 1) & (out["id_b"] == 2), "jaccard_permille"].iloc[0] == 1000


def test_exact_jaccard_df_cap_is_lossless_on_gate_corpora():
    """The df_cap skew guard in exact_jaccard_pairs drops grams with
    document frequency > cap; assert no gram on either gate corpus
    comes near the cap, so the guard provably never fires there and
    the native-SQL oracle equality is exact by construction."""
    import pyarrow.parquet as pq

    for sf in ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]:
        t = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
        df_counts: dict[str, int] = {}
        for txt in t.column("text").to_pylist():
            toks = txt.split(" ")
            for g in set(" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)):
                df_counts[g] = df_counts.get(g, 0) + 1
        assert max(df_counts.values()) < 256 // 4, sf


def test_exact_jaccard_hot_gram_skew_guard(ray_session):
    """Pathological stop-gram: one trigram shared by HALF the corpus.
    With df_cap below its document frequency the guard drops exactly
    that gram's pair contribution (bounding the expansion task at
    O(cap²) instead of O(corpus²/4)) while every other gram still
    counts — verified against a serial mirror applying the same
    df>cap filter."""
    import ray.data

    from crawlerframework_ray.stages.dedup import exact_jaccard_pairs, ngram_set_rows

    hot = "x y z"
    docs = {}
    for i in range(64):
        base = f"w{i} v{i} u{i} t{i}"
        docs[i] = f"{base} {hot}" if i % 2 == 0 else base
    # two planted near-dup pairs that must survive the guard
    docs[100] = "a b c d e f g"
    docs[101] = "a b c d e f g"
    docs[102] = f"p q r s t {hot}"
    docs[103] = f"p q r s t {hot}"

    ds = ray.data.from_items([{"doc_id": k, "text": v} for k, v in docs.items()])
    out = (
        exact_jaccard_pairs(ngram_set_rows(ds), tau_num=1, tau_den=2, df_cap=8)
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )

    # serial mirror with the identical df>8 stop-gram filter
    def grams(s):
        t = s.split(" ")
        return {" ".join(t[i : i + 3]) for i in range(len(t) - 2)}

    gsets = {k: grams(v) for k, v in docs.items()}
    df_counts: dict[str, int] = {}
    for gs in gsets.values():
        for g in gs:
            df_counts[g] = df_counts.get(g, 0) + 1
    assert df_counts[hot] > 8  # the guard genuinely fires
    expected = []
    ids = sorted(docs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            # intersection counts only grams under the cap; union stays
            # over the FULL sets (n is carried from the gram stage)
            inter = sum(1 for g in gsets[a] & gsets[b] if df_counts[g] <= 8)
            union = len(gsets[a]) + len(gsets[b]) - inter
            if inter and 2 * inter >= union:
                expected.append((a, b, inter, union, (2000 * inter + union) // (2 * union)))
    exp = pd.DataFrame(
        expected, columns=["id_a", "id_b", "inter", "union_sz", "jaccard_permille"]
    ).astype("int64")
    pd.testing.assert_frame_equal(out, exp)
    got_pairs = set(zip(out["id_a"], out["id_b"]))
    assert (100, 101) in got_pairs and (102, 103) in got_pairs


def test_exact_jaccard_partition_independent(ray_session):
    """The inverted-index pair pipeline must produce identical output
    whatever the input block structure (retries / different cluster
    widths repartition freely)."""
    from crawlerframework_ray.stages.dedup import exact_jaccard_pairs, ngram_set_rows

    import ray.data

    sf = "/root/testdata/sf0.001"

    def run(blocks):
        ds = ray.data.read_parquet(
            f"{sf}/documents.parquet", columns=["doc_id", "text"], override_num_blocks=blocks
        )
        return (
            exact_jaccard_pairs(ngram_set_rows(ds), tau_num=1, tau_den=2)
            .to_pandas()
            .sort_values(["id_a", "id_b"])
            .reset_index(drop=True)
        )

    pd.testing.assert_frame_equal(run(2), run(17))


def test_exact_containment_asymmetric_vs_jaccard(ray_session):
    """Containment is the gate Jaccard cannot express: a 3-gram
    fragment wholly inside a 12-gram document scores containment
    1000‰ (kept at τ=9/10) but Jaccard ~250‰ (dropped at τ=1/2).
    Verified against a serial mirror, plus the df_cap guard composes
    with cross_boundary (hot gram shared by all docs is dropped on
    both sides identically)."""
    import ray.data

    from crawlerframework_ray.stages.dedup import (
        exact_containment_pairs,
        exact_jaccard_pairs,
        ngram_set_rows,
    )

    base = "a b c d e f g h i j k l m n"  # 12 distinct trigrams
    frag = "a b c d e"  # 3 trigrams, all prefix grams of base
    other = "z y x w v u t s"
    docs = [
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": other},
        {"doc_id": 1001, "text": frag},  # fragment side of the boundary
        {"doc_id": 1002, "text": "q r s t u v"},
    ]
    ds = ray.data.from_items(docs)
    grams = ngram_set_rows(ds)
    cont = (
        exact_containment_pairs(grams, tau_num=9, tau_den=10, cross_boundary=1000)
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    assert list(zip(cont["id_a"], cont["id_b"])) == [(1, 1001)]
    assert cont["containment_permille"].iloc[0] == 1000
    assert cont["inter"].iloc[0] == 3 and cont["min_sz"].iloc[0] == 3

    jac = exact_jaccard_pairs(grams, tau_num=1, tau_den=2, cross_boundary=1000).to_pandas()
    jac_pairs = set(zip(jac["id_a"], jac["id_b"])) if "id_a" in jac.columns else set()
    assert (1, 1001) not in jac_pairs  # Jaccard 3/12 < 1/2


def test_quote_containment_fragment_df_bounded():
    """quote_containment_pairs doubles each prefix gram's document
    frequency (base + its own fragment); assert the combined corpus
    stays far under the df_cap=256 guard on both gate corpora so the
    native-SQL oracle equality is exact by construction."""
    import pyarrow.parquet as pq

    for sf in ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]:
        t = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
        df_counts: dict[str, int] = {}
        for txt in t.column("text").to_pylist():
            toks = txt.split(" ")
            cut = max((len(toks) + 2) // 3, 3)
            for piece in (toks, toks[:cut]):
                for g in set(
                    " ".join(piece[i : i + 3]) for i in range(len(piece) - 2)
                ):
                    df_counts[g] = df_counts.get(g, 0) + 1
        assert max(df_counts.values()) < 256 // 2, sf
