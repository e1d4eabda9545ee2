"""Regenerate the golden-parquet oracles under /root/repo/goldens/.

Each golden is a serially-computed expected output for a catalog query
whose semantics plain SQL cannot express; the query's ``oracle_sql``
entry is then ``SELECT … FROM read_parquet('<golden>')`` so the driver
gate still compares rows+schema+hash. Independence level per golden
(documented so the gate's strength is not overstated):

- crawl_frontier_counts / parse_entity_counts: derived from the SERIAL
  ORACLE crawl loop (pipelines/oracle.py) — an independent
  implementation of the engine's semantics. Strong oracle.
- simhash_sigs: shares the signature leaf function with the engine,
  but the SQL consumes it with a brute-force ALL-PAIRS Hamming join —
  independently checking the LSH banding's recall guarantee
  (Hamming ≤ 3 over 4×16-bit bands ⇒ ≥1 band collides) and the whole
  distributed pair pipeline. Medium-strong.
- quality_fp / image_stats / search_seeds: serial recomputation of the
  same pure functions straight off the raw parquet — a regression pin
  for the Ray-side plumbing (weakest; labelled as such).

Fully serial — no ray.init anywhere. Usage:

    python tools/make_goldens.py [sf_dir ...]   # default sf0.01+sf0.001
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "goldens")


def _write(name: str, sf_dir: str, df: pd.DataFrame) -> None:
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    tag = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join(GOLDEN_DIR, f"{name}.{tag}.parquet")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), path)
    print(f"wrote {path} ({len(df)} rows)")


def simhash_sigs(sf_dir: str) -> None:
    from crawlerframework_ray.stages.dedup import simhash64

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    sigs = [simhash64(x) for x in t.column("text").to_pylist()]
    _write(
        "simhash_sigs", sf_dir,
        pd.DataFrame({"doc_id": t.column("doc_id").to_pandas().astype("int64"),
                      "sig": pd.Series(sigs, dtype="int64")}),
    )


def quality_fp(sf_dir: str) -> None:
    from crawlerframework_ray.functions.hashing import fingerprint64
    from crawlerframework_ray.functions.textstats import bpe_token_count, quality_score

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    texts = t.column("text").to_pylist()
    _write(
        "quality_fp", sf_dir,
        pd.DataFrame(
            {
                "doc_id": t.column("doc_id").to_pandas().astype("int64"),
                "quality_micro": pd.Series(
                    [int(round(quality_score(x) * 1_000_000)) for x in texts], dtype="int64"
                ),
                "fingerprint": pd.Series([fingerprint64(x) for x in texts], dtype="int64"),
                "n_bpe_tokens": pd.Series([bpe_token_count(x) for x in texts], dtype="int64"),
            }
        ),
    )


def image_stats(sf_dir: str) -> None:
    from crawlerframework_ray.data import codecs
    from crawlerframework_ray.data.synth import SynthWebConfig, make_url, page_record

    cfg = SynthWebConfig(seed=42, n_hosts=8, path_space=1 << 20)
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    ids = t.column("doc_id").to_pylist()[:512]
    rows = []
    for d in ids:
        rec = page_record(make_url(int(d) % 8, int(d)), cfg)
        img = codecs.decode(rec["bytes"], rec["fmt"])
        rows.append((rec["fmt"], img.shape[1] * img.shape[0]))
    df = pd.DataFrame(rows, columns=["fmt", "n_pixels"])
    out = df.groupby("fmt", as_index=False).agg(
        n_images=("n_pixels", "size"), sum_pixels=("n_pixels", "sum")
    )
    out["n_images"] = out["n_images"].astype("int64")
    out["sum_pixels"] = out["sum_pixels"].astype("int64")
    _write("image_stats", sf_dir, out)


def search_seeds(sf_dir: str) -> None:
    from crawlerframework_ray.data.synth import SynthWebConfig
    from crawlerframework_ray.sources.seeder import seeds_from_queryterms

    cfg = SynthWebConfig(seed=42, n_hosts=32, path_space=4096)
    t = seeds_from_queryterms(["amber", "basalt", "cedar"], cfg, n_results=20)
    _write("search_seeds", sf_dir, t.to_pandas())


def crawl_frontier_counts(sf_dir: str) -> None:
    from crawlerframework_ray.config import CrawlConfig
    from crawlerframework_ray.data.synth import SynthWebConfig, host_of, seeds_table
    from crawlerframework_ray.pipelines.oracle import oracle_crawl

    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    cfg = CrawlConfig(
        web=SynthWebConfig(seed=42, n_hosts=16, path_space=512, max_outlinks=5),
        workdir="/tmp/unused-golden",
        max_depth=2, wave_size=256, host_budget=32, n_shards=8,
        shard_capacity=1 << 16, max_epochs=3, fetch_concurrency=2, fetch_batch_size=128,
    )
    seeds = seeds_table(cfg.web, min(96, max(24, n_docs // 16)))
    oracle = oracle_crawl(cfg, seeds.to_pylist())
    df = pd.DataFrame(
        [(r["epoch"], host_of(r["url"])) for r in oracle["results"]], columns=["epoch", "host"]
    )
    out = df.groupby(["epoch", "host"], as_index=False).size().rename(columns={"size": "n_fetched"})
    out["epoch"] = out["epoch"].astype("int32")
    out["n_fetched"] = out["n_fetched"].astype("int64")
    _write("crawl_frontier_counts", sf_dir, out)


def parse_entity_counts(sf_dir: str) -> None:
    from crawlerframework_ray.config import CrawlConfig
    from crawlerframework_ray.data.synth import SynthWebConfig, host_of, seeds_table
    from crawlerframework_ray.pipelines.oracle import oracle_crawl
    from crawlerframework_ray.stages.parse import ParserRegistry

    cfg = CrawlConfig(
        web=SynthWebConfig(seed=42, n_hosts=8, path_space=128, max_outlinks=4),
        workdir="/tmp/unused-golden",
        max_depth=1, wave_size=64, host_budget=16, n_shards=4,
        shard_capacity=1 << 14, max_epochs=2, fetch_batch_size=64,
    )
    oracle = oracle_crawl(cfg, seeds_table(cfg.web, 32).to_pylist())
    tbl = pa.table(
        {
            "host": pa.array([host_of(r["url"]) for r in oracle["results"]], pa.string()),
            "caption": pa.array([r["caption"] for r in oracle["results"]], pa.string()),
        }
    )
    parsed = ParserRegistry()(tbl)
    out = (
        parsed.to_pandas().groupby("entity", as_index=False).size().rename(columns={"size": "n"})
    )
    out["n"] = out["n"].astype("int64")
    _write("parse_entity_counts", sf_dir, out)


def mailbox_counts(sf_dir: str) -> None:
    from crawlerframework_ray.sources.mailbox import pull_messages

    accounts = [f"user{i}@mail.example.test" for i in range(24)]
    rows = [m for a in accounts for m in pull_messages(a, 0, 42)]
    df = pd.DataFrame(rows)
    out = df.groupby(["account", "folder"], as_index=False).agg(
        n_msgs=("uid", "size"), max_uid=("uid", "max")
    )
    out["n_msgs"] = out["n_msgs"].astype("int64")
    out["max_uid"] = out["max_uid"].astype("int64")
    _write("mailbox_counts", sf_dir, out)


def newsgroup_counts(sf_dir: str) -> None:
    from crawlerframework_ray.sources.mailbox import group_range, synth_message

    groups = [f"synth.group.{i}" for i in range(12)]
    rows = []
    for g in groups:
        first, last = group_range(g, 42)
        for art in range(first, last + 1):
            rows.append(synth_message(g, art, 42))
    df = pd.DataFrame(rows)
    out = df.groupby("account", as_index=False).agg(
        n_articles=("uid", "size"), first_article=("uid", "min"), last_article=("uid", "max")
    ).rename(columns={"account": "newsgroup"})
    for c in ["n_articles", "first_article", "last_article"]:
        out[c] = out[c].astype("int64")
    _write("newsgroup_counts", sf_dir, out)


def boilerplate_main(sf_dir: str) -> None:
    """Expected main-content extraction per document, BY CONSTRUCTION
    (known content divs -> shared strip_html leaf; never runs the
    pruning code). Strong oracle for boilerplate_extract_documents."""
    import hashlib

    from crawlerframework_ray.functions.boilerplate import expected_extract

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    ids = [int(x) for x in t.column("doc_id").to_pylist()]
    mains = [expected_extract(x) for x in t.column("text").to_pylist()]
    _write(
        "boilerplate_main", sf_dir,
        pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "main_len": pd.Series([len(m) for m in mains], dtype="int64"),
                "main_md5": [hashlib.md5(m.encode()).hexdigest() for m in mains],
            }
        ).sort_values("doc_id").reset_index(drop=True),
    )



def update_counts(sf_dir: str) -> None:
    """Per-(epoch, status) counts of the update-mode demo crawl,
    computed by the FULLY SERIAL oracle loop + dict store
    (pipelines/updatecrawl.oracle_update_crawl). Strong oracle."""
    from crawlerframework_ray.data.synth import seeds_table
    from crawlerframework_ray.functions.hashing import task_id
    from crawlerframework_ray.pipelines.oracle import oracle_crawl
    from crawlerframework_ray.pipelines.updatecrawl import (
        demo_cfg, demo_n_seeds, oracle_update_crawl, results_hashes)

    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    base = demo_cfg("/unused")
    seeds = seeds_table(base.web, demo_n_seeds(n_docs)).to_pylist()
    prev = oracle_crawl(base, seeds)
    ucfg = demo_cfg("/unused", drift=True)
    upd = oracle_update_crawl(ucfg, seeds, results_hashes(prev["results"]))
    rows: dict[tuple, int] = {}
    for r in upd["written"]:
        key = (int(r["epoch"]), {1: "updated", 2: "new"}[r["update_status"]])
        rows[key] = rows.get(key, 0) + 1
    out = pd.DataFrame(
        [(e, s, n) for (e, s), n in rows.items()], columns=["epoch", "status", "n_urls"]
    )
    skipped = pd.DataFrame(
        [(-1, "skipped", upd["counts"]["skipped_urls"])],
        columns=["epoch", "status", "n_urls"],
    )
    out = pd.concat([out, skipped], ignore_index=True).astype(
        {"epoch": "int64", "n_urls": "int64"}
    ).sort_values(["epoch", "status"]).reset_index(drop=True)
    _write("update_counts", sf_dir, out)


def simhash_clusters(sf_dir: str) -> None:
    """Cluster sizes from BRUTE-FORCE all-pairs Hamming(<=3) + serial
    union-find with min-id labels — independent of both the LSH pair
    pipeline (recall guaranteed by the 4-band pigeonhole) and the
    distributed min-label propagation. Strong oracle."""
    from crawlerframework_ray.stages.dedup import simhash64

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    ids = [int(x) for x in t.column("doc_id").to_pylist()]
    sigs = [simhash64(x) for x in t.column("text").to_pylist()]
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    n = len(ids)
    for i in range(n):
        for j in range(i + 1, n):
            if bin(sigs[i] ^ sigs[j]).count("1") <= 3:
                a, b = ids[i], ids[j]
                parent.setdefault(a, a)
                parent.setdefault(b, b)
                ra, rb = find(a), find(b)
                if ra != rb:
                    # union by MIN id = the propagated min label
                    lo, hi = min(ra, rb), max(ra, rb)
                    parent[hi] = lo
    sizes: dict[int, int] = {}
    for node in parent:
        sizes[find(node)] = sizes.get(find(node), 0) + 1
    out = pd.DataFrame(sorted(sizes.items()), columns=["cluster_id", "size"]).astype(
        {"cluster_id": "int64", "size": "int64"}
    )
    _write("simhash_clusters", sf_dir, out)


def recrawl_counts(sf_dir: str) -> None:
    """Serial model of recrawl_change_detection: oracle crawl ->
    distinct url set -> re-fetch hashes against salt 0 / 0xBEEF webs.
    Strong oracle (independent loop; shares only leaf functions)."""
    from crawlerframework_ray.data.synth import SynthWebConfig, fetch_stitched, seeds_table
    from crawlerframework_ray.functions.hashing import content_hash
    from crawlerframework_ray.pipelines.oracle import oracle_crawl
    from crawlerframework_ray.pipelines.queries import _mini_crawl_cfg

    cfg = _mini_crawl_cfg("/unused")
    res = oracle_crawl(cfg, seeds_table(cfg.web, 32).to_pylist())
    old = {}
    for r in res["results"]:
        old.setdefault(r["url"], r["content_hash"].hex())
    rows = []
    for scenario, salt in (("identical_web", 0), ("drifted_web", 0xBEEF)):
        web = SynthWebConfig(**{**cfg.web.as_dict(), "seed": cfg.web.seed ^ salt})
        changed = 0
        for u, oh in old.items():
            rec, _ = fetch_stitched(u, web)
            if content_hash(rec["image_id"], rec["caption"]).hex() != oh:
                changed += 1
        rows.append((scenario, len(old), changed))
    _write(
        "recrawl_counts", sf_dir,
        pd.DataFrame(rows, columns=["scenario", "n_urls", "n_changed"]).astype(
            {"n_urls": "int64", "n_changed": "int64"}
        ),
    )


def version_latest(sf_dir: str) -> None:
    """Serial model of versioned_mark_latest: oracle crawl -> per
    (url, priority) the max-epoch row is latest -> latest counts per
    epoch. Strong oracle."""
    from crawlerframework_ray.data.synth import seeds_table
    from crawlerframework_ray.pipelines.oracle import oracle_crawl
    from crawlerframework_ray.pipelines.queries import _mini_crawl_cfg

    cfg = _mini_crawl_cfg("/unused")
    res = oracle_crawl(cfg, seeds_table(cfg.web, 32).to_pylist())
    latest_epoch: dict[tuple, int] = {}
    for r in res["results"]:
        k = (r["url"], r["priority"])
        latest_epoch[k] = max(latest_epoch.get(k, -1), r["epoch"])
    counts: dict[int, int] = {}
    for e in latest_epoch.values():
        counts[e] = counts.get(e, 0) + 1
    out = pd.DataFrame(sorted(counts.items()), columns=["epoch", "n_latest"]).astype(
        {"epoch": "int32", "n_latest": "int64"}
    )
    _write("version_latest", sf_dir, out)


def image_resize_stats(sf_dir: str) -> None:
    """Serial recompute of image_resize_pipeline through the SAME stage
    callables minus Ray — a regression pin for the Ray-side plumbing
    (weakest tier, like image_stats; labelled as such)."""
    import pyarrow as pa

    from crawlerframework_ray.data.synth import SynthWebConfig, make_url, page_record
    from crawlerframework_ray.stages.multimodal import ImageDecodeStage, ImageResizeStage

    cfg = SynthWebConfig(seed=42, n_hosts=8, path_space=1 << 20)
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    ids = [int(x) for x in t.column("doc_id").to_pylist()][:256]
    recs = [page_record(make_url(d % 8, d), cfg) for d in ids]
    batch = pa.table(
        {
            "image_id": pa.array([r["image_id"] for r in recs], pa.string()),
            "bytes": pa.array([r["bytes"] for r in recs], pa.binary()),
            "w": pa.array([r["w"] for r in recs], pa.int32()),
            "h": pa.array([r["h"] for r in recs], pa.int32()),
            "fmt": pa.array([r["fmt"] for r in recs], pa.string()),
        }
    )
    out = ImageResizeStage(target=8)(batch)
    out = out.set_column(
        out.schema.get_field_index("fmt"), "fmt", pa.array(["raw"] * len(out), pa.string())
    )
    out = ImageDecodeStage()(out)
    _write("image_resize_stats", sf_dir, out.to_pandas())


def minhash_pairs(sf_dir: str) -> None:
    """BRUTE-FORCE all-pairs n-gram Jaccard (>= 0.5, permille) — the
    serial oracle for minhash_near_dup_pairs. Banding detection at
    J=0.5 is probabilistic in general, but on this corpus every
    qualifying pair sits high enough on the collision curve that LSH
    recall is exactly 100% (verified: found set == brute set at both
    sf) — so the golden demands full pair-set equality, pinning recall
    AND the distributed join-verify path."""
    from crawlerframework_ray.functions.textstats import jaccard, word_shingles

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    ids = [int(x) for x in t.column("doc_id").to_pylist()]
    sh = [word_shingles(x, 3) for x in t.column("text").to_pylist()]
    rows = []
    n = len(ids)
    for i in range(n):
        for j in range(i + 1, n):
            jj = jaccard(sh[i], sh[j])
            if jj >= 0.5:
                a, b = sorted((ids[i], ids[j]))
                rows.append((a, b, int(round(jj * 1000))))
    out = pd.DataFrame(rows, columns=["id_a", "id_b", "jaccard_permille"]).astype("int64")
    _write("minhash_pairs", sf_dir, out.sort_values(["id_a", "id_b"]).reset_index(drop=True))


def embedding_pairs(sf_dir: str) -> None:
    """BRUTE-FORCE all-pairs cosine (>= 0.8, permille) over the
    AUGMENTED embedding corpus (plant_near_dup_vectors — the leaf
    shared with the pipeline's augmentation stage, so both sides see
    bit-identical vectors; the cosine arithmetic mirrors the verify
    stage: float32 vectors -> float64 normalize -> dot). Independent of
    the LSH pipeline: any pair it misses or fabricates fails the gate."""
    import numpy as np

    from crawlerframework_ray.stages.dedup import plant_near_dup_vectors

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t.column("vec_id").cast("int64").to_numpy()
    vecs = np.stack([np.asarray(x, np.float32) for x in t.column("embedding").to_pylist()])
    pids, pvecs = plant_near_dup_vectors(ids, vecs)
    all_ids = np.concatenate([ids, pids])
    allv = np.concatenate([vecs, pvecs.astype(np.float32)]).astype(np.float64)
    allv /= np.linalg.norm(allv, axis=1, keepdims=True)
    cos = allv @ allv.T
    iu = np.triu_indices(len(all_ids), k=1)
    keep = cos[iu] >= 0.8
    a = np.minimum(all_ids[iu[0][keep]], all_ids[iu[1][keep]])
    b = np.maximum(all_ids[iu[0][keep]], all_ids[iu[1][keep]])
    out = pd.DataFrame(
        {
            "id_a": a.astype("int64"),
            "id_b": b.astype("int64"),
            "cos_permille": np.round(cos[iu][keep] * 1000).astype("int64"),
        }
    ).sort_values(["id_a", "id_b"]).reset_index(drop=True)
    _write("embedding_pairs", sf_dir, out)


def ann_ivf_topk(sf_dir: str) -> None:
    """Serial UNRESTRICTED brute-force cosine top-5 over the
    twin-AUGMENTED embedding corpus (plant_query_twins — the leaf
    shared with the ann_topk_ivf query, so both sides see bit-identical
    vectors). Independent of the IVF pipeline: k-means, cell
    assignment and probing play no part here, so a twin dropped by the
    cell pruning or a mis-assembled rank fails the gate. Exactness
    precondition (asserted): every query's twins dominate the natural
    corpus by a cosine margin, so the true top-5 is the twin set and
    IVF (which probes the query's own cell) must reproduce it."""
    import numpy as np

    from crawlerframework_ray.stages.similarity import _normalize, plant_query_twins

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t.column("vec_id").cast("int64").to_numpy()
    vecs = np.stack([np.asarray(x, np.float32) for x in t.column("embedding").to_pylist()])
    qmask = ids < 8
    order = np.argsort(ids[qmask])
    qids = [int(x) for x in ids[qmask][order]]
    qvecs = vecs[qmask][order].astype(np.float64)
    pids, pvecs = plant_query_twins(qids, qvecs, k=5)
    all_ids = np.concatenate([ids, pids])
    allv = _normalize(
        np.concatenate([vecs.astype(np.float64), pvecs.astype(np.float32).astype(np.float64)])
    )
    qn = _normalize(qvecs)
    cos = allv @ qn.T  # (corpus, nq)
    rows = []
    for qi, qid in enumerate(qids):
        col = cos[:, qi]
        # exactness precondition: twins beat every natural neighbor
        twin = np.isin(all_ids, pids[qi * 5:(qi + 1) * 5])
        assert col[twin].min() > col[~twin & (all_ids != qid)].max() + 0.05, qid
        ord_ = np.lexsort((all_ids, -col))
        taken = 0
        for r in ord_:
            if taken >= 5:
                break
            if all_ids[r] == qid:
                continue
            rows.append((qid, int(all_ids[r]), taken + 1))
            taken += 1
    out = pd.DataFrame(rows, columns=["query_id", "neighbor_id", "rank"]).astype("int64")
    _write("ann_ivf_topk", sf_dir, out)


def api_rotation(sf_dir: str) -> None:
    """Serial event-driven simulation of the T4 handler-pool protocol
    (apilib.py:14-96 semantics), written against array state rather
    than the pool/handler objects the query path uses: per source, at
    each tick pick the lowest-index handler whose disable window has
    elapsed; one that already spent its quota is disabled for
    4*quota ticks and the next is tried; no handler => abort (-1)."""
    import zlib

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "source"])
    df = t.to_pandas()
    rows = []
    H = 3
    for src, g in df.groupby("source", sort=False):
        n = len(g)
        quota = 2 + zlib.crc32(src.encode()) % 3
        reset = 4 * quota
        until = np.zeros(H, dtype=np.int64)   # disabled-until tick
        spent = np.zeros(H, dtype=np.int64)   # served since last enable
        served_by = np.full(n, -1, dtype=np.int64)
        for tick in range(n):
            for h in range(H):
                if until[h] > tick:
                    continue  # still disabled
                if until[h]:  # disable window elapsed => counter reset
                    spent[h] = 0
                    until[h] = 0
                if spent[h] >= quota:
                    until[h] = tick + reset  # rate limited on this attempt
                    continue
                spent[h] += 1
                served_by[tick] = h
                break
        vc = pd.Series(served_by).value_counts().sort_index()
        for hid, cnt in vc.items():
            rows.append((src, int(hid), int(cnt)))
    out = pd.DataFrame(rows, columns=["source", "handler_id", "n_served"]).astype(
        {"handler_id": "int64", "n_served": "int64"}
    )
    _write("api_rotation", sf_dir, out)


def phash_sigs(sf_dir: str) -> None:
    """Serial recomputation of the image-corpus phashes (shared gen
    leaf — regression-pin tier like simhash_sigs); the SQL consumes
    them with a brute-force ALL-PAIRS Hamming join, independently
    checking the banding recall guarantee and the whole distributed
    image pair pipeline."""
    from crawlerframework_ray.data import codecs
    from crawlerframework_ray.data.imageops import average_hash
    from crawlerframework_ray.stages.multimodal import phash_corpus_records

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    ids = t.column("doc_id").to_pylist()[:256]  # mirrors the query's limit(256)
    rows = [
        (img_id, average_hash(codecs.decode(blob, fmt)))
        for img_id, blob, fmt in phash_corpus_records(ids)
    ]
    _write(
        "phash_sigs", sf_dir,
        pd.DataFrame(rows, columns=["img_id", "phash"]).astype(
            {"img_id": "int64", "phash": "int64"}
        ),
    )


def hll_counts(sf_dir: str) -> None:
    """HLL distinct sketch golden: ONE serial pass over the whole
    column (no batching) — the Ray side computes per-block partials and
    max-merges them, so equality here independently verifies the
    distributed split/merge plumbing; the register/estimate leaf
    functions are shared (regression-pin tier, like quality_fp). The
    sketch's accuracy itself is gated separately in tests/test_sketch.py
    against exact distinct counts."""
    from crawlerframework_ray.stages.sketch import M, batch_registers, estimate

    t = pq.read_table(f"{sf_dir}/events.parquet", columns=["user_id", "event_type"])
    rows = []
    for c in ("user_id", "event_type"):
        arr = t.column(c).to_numpy(zero_copy_only=False)
        rows.append((c, M, estimate(batch_registers(arr))))
    _write(
        "hll_counts", sf_dir,
        pd.DataFrame(rows, columns=["col", "n_registers", "hll_estimate"]).astype(
            {"n_registers": "int64", "hll_estimate": "int64"}
        ),
    )



def hll_intersection(sf_dir: str) -> None:
    """HLL inclusion-exclusion golden: ONE serial pass per set over the
    whole filtered column (no batching, no distributed fold) — equality
    proves the Ray side's per-batch split + grid pre-fold + union-law
    max merge. Register/estimate leaf functions shared (regression-pin
    tier, same posture as hll_counts); estimate accuracy vs the exact
    intersection is gated separately in tests/test_sketch.py."""
    from crawlerframework_ray.stages.sketch import M, batch_registers, estimate

    t = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "value"]
    )
    et = t.column("event_type").to_pandas().to_numpy(dtype=object)
    val = t.column("value").to_numpy()
    uid = t.column("user_id").to_numpy()
    hot = val >= 80.0
    ra = batch_registers(uid[(et == "view") & hot])
    rb = batch_registers(uid[(et == "purchase") & hot])
    ea, eb = estimate(ra), estimate(rb)
    eu = estimate(np.maximum(ra, rb))
    _write(
        "hll_intersection", sf_dir,
        pd.DataFrame(
            [{"n_registers": M, "est_a": ea, "est_b": eb,
              "est_union": eu, "est_intersection": ea + eb - eu}]
        ).astype("int64"),
    )


def kmeans_clusters(sf_dir: str) -> None:
    """Serial mirror of kmeans_cluster_embeddings: independent plain
    re-implementation of the floored-integer Lloyd spec (quantize
    floor(x*1e4+0.5); init = vectors of the 8 smallest vec_ids; assign
    by full squared distance with ties to the smallest cluster;
    centroid update = elementwise sum // count; 4 iterations). Medium
    independence: shares only the published spec, not the distributed
    code paths (assignment here is the naive (x-c)^2 loop, not the
    expanded matmul form)."""
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_pandas().astype("int64").to_numpy()
    x = np.floor(
        np.stack(t.column("embedding").to_pandas().to_numpy()).astype(np.float64) * 10**4 + 0.5
    ).astype(np.int64)
    order = np.argsort(ids, kind="stable")
    ids, x = ids[order], x[order]
    cents = x[:8].copy()
    for _ in range(4):
        assign = np.empty(len(x), np.int64)
        for i in range(len(x)):
            d = ((x[i][None, :] - cents) ** 2).sum(axis=1)
            assign[i] = int(np.argmin(d))
        for j in range(8):
            m = x[assign == j]
            if len(m):
                cents[j] = m.sum(axis=0) // len(m)
    assign = np.empty(len(x), np.int64)
    for i in range(len(x)):
        d = ((x[i][None, :] - cents) ** 2).sum(axis=1)
        assign[i] = int(np.argmin(d))
    _write(
        "kmeans_clusters", sf_dir,
        pd.DataFrame({"vec_id": ids, "cluster": assign}).astype(
            {"vec_id": "int64", "cluster": "int64"}
        ),
    )


def semdedup_keep(sf_dir: str) -> None:
    """Serial mirror of semdedup_embeddings: naive re-implementation of
    the published spec (augment exact twins for vec_id % 17 == 0 at
    id+1e9; integer Lloyd k-means exactly as kmeans_clusters; within
    each cluster, in ascending vec_id order, keep=0 iff ANY earlier
    member passes dot>0 and dot^2*1e4 >= 9025*|a|^2*|b|^2 over
    floor(x*127+0.5) vectors). Medium independence: per-pair Python
    loops with arbitrary-precision ints, no shared code with
    stages/similarity.semdedup_int."""
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_pandas().astype("int64").to_numpy()
    emb = np.stack(t.column("embedding").to_pandas().to_numpy()).astype(np.float64)
    tw = ids % 17 == 0
    ids = np.concatenate([ids, ids[tw] + 10**9])
    emb = np.concatenate([emb, emb[tw]], axis=0)
    order = np.argsort(ids, kind="stable")
    ids, emb = ids[order], emb[order]
    x = np.floor(emb * 10**4 + 0.5).astype(np.int64)
    cents = x[:8].copy()
    for _ in range(4):
        assign = np.empty(len(x), np.int64)
        for i in range(len(x)):
            d = ((x[i][None, :] - cents) ** 2).sum(axis=1)
            assign[i] = int(np.argmin(d))
        for j in range(8):
            m = x[assign == j]
            if len(m):
                cents[j] = m.sum(axis=0) // len(m)
    assign = np.empty(len(x), np.int64)
    for i in range(len(x)):
        d = ((x[i][None, :] - cents) ** 2).sum(axis=1)
        assign[i] = int(np.argmin(d))
    q = np.floor(emb * 127 + 0.5).astype(np.int64)
    keep = np.ones(len(x), np.int64)
    for j in range(8):
        members = np.where(assign == j)[0]  # ids already ascending
        for bi in range(len(members)):
            b = members[bi]
            nb = int((q[b] * q[b]).sum())
            for ai in range(bi):
                a = members[ai]
                dot = int((q[a] * q[b]).sum())
                na = int((q[a] * q[a]).sum())
                if dot > 0 and dot * dot * 10**4 >= 9025 * na * nb:
                    keep[b] = 0
                    break
    _write(
        "semdedup_keep", sf_dir,
        pd.DataFrame({"vec_id": ids, "cluster": assign, "keep": keep}).astype(
            {"vec_id": "int64", "cluster": "int64", "keep": "int64"}
        ),
    )



def alignment_inputs(sf_dir: str) -> None:
    """Serial recomputation of the caption-alignment corpus (image_id,
    phash, caption) for the 512-doc image set (shared gen leaf —
    regression-pin tier like phash_sigs): phash from an independent
    decode of the stored bytes; the SQL oracle recomputes the caption
    tower (md5-64) and the combine (xor + bit_count) NATIVELY, so the
    scoring op itself is independently verified."""
    from crawlerframework_ray.data import codecs
    from crawlerframework_ray.data.imageops import average_hash
    from crawlerframework_ray.data.synth import SynthWebConfig, make_url, page_record

    cfg = SynthWebConfig(seed=42, n_hosts=8, path_space=1 << 20)
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    ids = t.column("doc_id").to_pylist()[:512]  # mirrors the query's limit(512)
    rows = []
    for d in ids:
        r = page_record(make_url(int(d) % 8, int(d)), cfg)
        rows.append((r["image_id"], average_hash(codecs.decode(r["bytes"], r["fmt"])), r["caption"]))
    _write(
        "alignment_inputs", sf_dir,
        pd.DataFrame(rows, columns=["image_id", "phash", "caption"]).astype(
            {"image_id": "string", "phash": "int64", "caption": "string"}
        ),
    )



def bpe_merges(sf_dir: str) -> None:
    """Serial mirror of bpe_train_merges: naive single-process BPE on
    the word-frequency table (space tokens, '' text = zero tokens; 8
    rounds of: count adjacent symbol pairs weighted by word frequency,
    merge the (count DESC, pair ASC) winner everywhere). Medium
    independence: shares only the published Sennrich BPE spec, none of
    the distributed code paths."""
    from collections import Counter

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])
    wc: Counter = Counter()
    for txt in t.column("text").to_pylist():
        if txt:
            wc.update(txt.split(" "))
    words = {w: list(w) for w in wc}
    rows = []
    for step in range(1, 9):
        pc: Counter = Counter()
        for w, syms in words.items():
            f = wc[w]
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += f
        if not pc:
            break
        (left, right), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merged = left + right
        rows.append((step, left, right, merged, cnt))
        for w, syms in words.items():
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    res.append(merged)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            words[w] = res
    _write(
        "bpe_merges", sf_dir,
        pd.DataFrame(rows, columns=["step", "left", "right", "merged", "pair_count"]).astype(
            {"step": "int64", "pair_count": "int64"}
        ),
    )



def bpe_encoded(sf_dir: str) -> None:
    """Serial mirror of bpe_encode_documents: re-trains the 8 merges
    exactly as bpe_merges, then tokenizes every document naively
    (space words, '' = zero tokens; merges applied in training order,
    each exhaustively left-to-right). Medium independence: no shared
    code with the distributed encoder."""
    from collections import Counter

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    texts = t.column("text").to_pylist()
    wc: Counter = Counter()
    for txt in texts:
        if txt:
            wc.update(txt.split(" "))
    words = {w: list(w) for w in wc}
    merges = []
    for _ in range(8):
        pc: Counter = Counter()
        for w, syms in words.items():
            f = wc[w]
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += f
        if not pc:
            break
        (left, right), _cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((left, right))
        for w, syms in words.items():
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    res.append(left + right)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            words[w] = res
    seg = {}
    def segment(w):
        if w not in seg:
            syms = list(w)
            for left, right in merges:
                res, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                        res.append(left + right)
                        i += 2
                    else:
                        res.append(syms[i])
                        i += 1
                syms = res
            seg[w] = syms
        return seg[w]
    rows_d, rows_p, rows_s = [], [], []
    for doc_id, txt in zip(t.column("doc_id").to_pylist(), texts):
        pos = 0
        for w in (txt.split(" ") if txt else []):
            for p in segment(w):
                rows_d.append(int(doc_id)); rows_p.append(pos); rows_s.append(p)
                pos += 1
    _write(
        "bpe_encoded", sf_dir,
        pd.DataFrame({"doc_id": rows_d, "pos": rows_p, "piece": rows_s}).astype(
            {"doc_id": "int64", "pos": "int64", "piece": "string"}
        ),
    )


def video_frame_stats(sf_dir: str) -> None:
    """Per-sampled-frame stats computed STRAIGHT from the synthesis
    arrays (synth_video), never through the qvd codec or the Ray
    stages — independently checks the encode→decode round trip AND
    the frame-sample → decode-stage composition."""
    from crawlerframework_ray.data.imageops import average_hash
    from crawlerframework_ray.data.media import synth_video

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    ids = [int(d) for d in t.column("doc_id").to_pylist()[:64]]
    rows = []
    for d in ids:
        frames = synth_video(d, w=32, h=32, n_frames=16)
        for f in range(0, 16, 4):
            img = frames[f]
            rows.append(
                (
                    f"v{d}#{f:02d}",
                    32,
                    32,
                    average_hash(img),
                    int(round(float(img.mean()) * 1000)),
                )
            )
    _write(
        "video_frame_stats", sf_dir,
        pd.DataFrame(rows, columns=["image_id", "w", "h", "phash_calc", "mean_luma_milli"])
        .astype({"w": "int32", "h": "int32", "phash_calc": "int64", "mean_luma_milli": "int64"}),
    )


def audio_window_stats(sf_dir: str) -> None:
    """Per-window exact energies computed straight from synth_audio
    (integer PCM), never through the qau codec or the actor stage."""
    import math

    from crawlerframework_ray.data.media import synth_audio

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    ids = [int(d) for d in t.column("doc_id").to_pylist()[:128]]
    rows = []
    for d in ids:
        pcm = synth_audio(d, n_samples=8192, sample_rate=8000).astype(np.int64)
        for i in range(8192 // 1024):
            s = int((pcm[i * 1024 : (i + 1) * 1024] ** 2).sum())
            rows.append((f"a{d}", i, s, math.isqrt(s * 1_000_000 // 1024), 8000))
    _write(
        "audio_window_stats", sf_dir,
        pd.DataFrame(rows, columns=["audio_id", "window_idx", "sum_sq", "rms_milli", "sample_rate"])
        .astype({"window_idx": "int32", "sum_sq": "int64", "rms_milli": "int64",
                 "sample_rate": "int32"}),
    )


def _fingerprint_pairs_golden(records, fingerprints) -> pd.DataFrame:
    """Serial ALL-PAIRS Jaccard (>= 0.5, integer permille) over
    per-item fingerprint sets — the brute-force mirror of the
    distributed gram-stage → exact_jaccard_pairs composition."""
    ids = [r[0] for r in records]
    rows = []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            inter = len(fingerprints[i] & fingerprints[j])
            union = len(fingerprints[i] | fingerprints[j])
            if union and 2 * inter >= union:
                a, b = sorted((ids[i], ids[j]))
                rows.append((a, b, inter, union, (2000 * inter + union) // (2 * union)))
    return pd.DataFrame(
        rows, columns=["id_a", "id_b", "inter", "union_sz", "jaccard_permille"]
    ).astype("int64").sort_values(["id_a", "id_b"]).reset_index(drop=True)


def video_dup_pairs(sf_dir: str) -> None:
    """Serial mirror of video_near_dup_pairs: decode each corpus blob,
    fingerprint = {(frame_idx, phash)} over every 4th frame, all-pairs
    Jaccard. Shared corpus leaf (video_dup_corpus_records); the
    pair-finding path is fully independent of the distributed one."""
    from crawlerframework_ray.data import media
    from crawlerframework_ray.data.imageops import average_hash
    from crawlerframework_ray.stages.multimodal import video_dup_corpus_records

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    recs = video_dup_corpus_records(t.column("doc_id").to_pylist()[:128])
    fps = []
    for _, blob, _fmt in recs:
        frames, _ = media.decode_qvd(blob)
        fps.append({(f, average_hash(frames[f])) for f in range(0, frames.shape[0], 4)})
    _write("video_dup_pairs", sf_dir, _fingerprint_pairs_golden(recs, fps))


def audio_dup_pairs(sf_dir: str) -> None:
    """Serial mirror of audio_near_dup_pairs: fingerprint =
    {(window_idx, sum_sq)} per clip, all-pairs Jaccard."""
    from crawlerframework_ray.data import media
    from crawlerframework_ray.stages.multimodal import audio_dup_corpus_records

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    recs = audio_dup_corpus_records(t.column("doc_id").to_pylist()[:128])
    fps = []
    for _, blob, _fmt in recs:
        pcm, _ = media.decode_qau(blob)
        fps.append({(i, s) for i, s, _r in media.window_energies(pcm, 1024)})
    _write("audio_dup_pairs", sf_dir, _fingerprint_pairs_golden(recs, fps))


def video_prep_stats(sf_dir: str) -> None:
    """Serial mirror of the video_corpus_prep composite: fingerprint →
    all-pairs Jaccard ≥ 0.5 → union-find connected components →
    keep-min per component → kept-count rollup by doc-id residue class
    (the class structure is what the twin planting keys on, so the
    rollup localizes a dedup failure to the twin tier that broke)."""
    from crawlerframework_ray.data import media
    from crawlerframework_ray.data.imageops import average_hash
    from crawlerframework_ray.stages.multimodal import video_dup_corpus_records

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    recs = video_dup_corpus_records(t.column("doc_id").to_pylist()[:128])
    ids = [r[0] for r in recs]
    fps = []
    for _, blob, _fmt in recs:
        frames, _ = media.decode_qvd(blob)
        fps.append({(f, average_hash(frames[f])) for f in range(0, frames.shape[0], 4)})
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            inter = len(fps[i] & fps[j])
            union = len(fps[i] | fps[j])
            if union and 2 * inter >= union:
                ra, rb = find(ids[i]), find(ids[j])
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    kept = [i for i in ids if find(i) == i]
    rows = {}
    for v in kept:
        res = (v // 2) % 10  # residue class of the SOURCE doc id
        rows[res] = rows.get(res, 0) + 1
    _write(
        "video_prep_stats", sf_dir,
        pd.DataFrame(sorted(rows.items()), columns=["residue", "n_kept"]).astype("int64"),
    )


def image_dims(sf_dir: str) -> None:
    """Per-image decoded dimensions for the 500-doc image corpus
    (shared gen leaf — regression-pin tier like phash_sigs): w/h taken
    from the DECODED array shape, not the page record fields, so the
    golden also pins the codec round trip. Feeds the SQL-native
    aspect-bucket assignment oracle (the bucketing logic itself is
    recomputed in SQL, only the dims are pinned)."""
    from crawlerframework_ray.data import codecs
    from crawlerframework_ray.data.synth import SynthWebConfig, make_url, page_record

    cfg = SynthWebConfig(seed=42, n_hosts=8, path_space=1 << 20)
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    rows = []
    for d in t.column("doc_id").to_pylist():
        d = int(d)
        rec = page_record(make_url(d % 8, d), cfg)
        img = codecs.decode(rec["bytes"], rec["fmt"])
        rows.append((rec["image_id"], img.shape[1], img.shape[0]))
    _write(
        "image_dims", sf_dir,
        pd.DataFrame(rows, columns=["image_id", "w", "h"]).astype(
            {"image_id": "string", "w": "int64", "h": "int64"}
        ),
    )


def patch_stats(sf_dir: str) -> None:
    """Serial mirror of the ViT-style 8x8 patch statistics: decode each
    image and walk patches with EXPLICIT nested loops + int() sums —
    independent of the vectorized reshape path the Ray stage uses."""
    from crawlerframework_ray.data import codecs
    from crawlerframework_ray.data.synth import SynthWebConfig, make_url, page_record

    cfg = SynthWebConfig(seed=42, n_hosts=8, path_space=1 << 20)
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    rows = []
    for d in t.column("doc_id").to_pylist():
        d = int(d)
        rec = page_record(make_url(d % 8, d), cfg)
        img = codecs.decode(rec["bytes"], rec["fmt"])
        h, w = img.shape[0], img.shape[1]
        sums = []
        for py in range(0, h, 8):
            for px in range(0, w, 8):
                s = 0
                for yy in range(py, py + 8):
                    for xx in range(px, px + 8):
                        for c in range(3):
                            s += int(img[yy, xx, c])
                sums.append(s)
        rows.append((rec["image_id"], len(sums), min(sums), max(sums), sum(sums)))
    _write(
        "patch_stats", sf_dir,
        pd.DataFrame(
            rows, columns=["image_id", "n_patches", "min_patch_luma", "max_patch_luma", "sum_luma"]
        ).astype(
            {"image_id": "string", "n_patches": "int64", "min_patch_luma": "int64",
             "max_patch_luma": "int64", "sum_luma": "int64"}
        ),
    )


def source_minhash(sf_dir: str) -> None:
    """Serial mirror of the per-source corpus MinHash sketch: for each
    source, the elementwise MIN over its documents' signatures, folded
    one document at a time (independent of the distributed per-batch
    partial-merge path — equality proves the merge associativity), then
    the pairwise match-count / estimated-Jaccard table. Signature leaf
    (minhash_signature) is shared — regression-pin tier like
    simhash_sigs."""
    from crawlerframework_ray.stages.dedup import _perm_params, minhash_signature

    N_PERM = 64
    a, b = _perm_params(N_PERM, seed=7)
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["source", "text"])
    sigs: dict = {}
    for src, txt in zip(t.column("source").to_pylist(), t.column("text").to_pylist()):
        sig = minhash_signature(txt, N_PERM, a, b, k=3)
        if src in sigs:
            sigs[src] = np.minimum(sigs[src], sig)
        else:
            sigs[src] = sig
    srcs = sorted(sigs)
    rows = []
    for i, sa in enumerate(srcs):
        for sb in srcs[i + 1 :]:
            m = int((sigs[sa] == sigs[sb]).sum())
            rows.append((sa, sb, m, (1000 * m) // N_PERM))
    _write(
        "source_minhash", sf_dir,
        pd.DataFrame(rows, columns=["source_a", "source_b", "n_matches", "est_jaccard_permille"])
        .astype({"n_matches": "int64", "est_jaccard_permille": "int64"}),
    )


def bloom_probe_golden(sf_dir: str) -> None:
    """Serial mirror of the bloom membership op: set bits one text at a
    time into one array, probe one text at a time (independent of the
    distributed per-batch partial + OR-merge path — equality proves the
    merge associativity). Planted members (dup-probe-<id>) fire on both
    sides by construction."""
    from crawlerframework_ray.stages.sketch import (
        BLOOM_M, _bloom_positions, bloom_probe,
    )

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    ids = [int(d) for d in t.column("doc_id").to_pylist()]
    texts = t.column("text").to_pylist()
    bits = np.zeros(BLOOM_M, dtype=bool)
    for d, txt in zip(ids, texts):
        if d % 3 != 0:
            bits[_bloom_positions([txt])[0]] = True
        if d % 6 == 0:
            bits[_bloom_positions([f"dup-probe-{d}"])[0]] = True
    packed = np.packbits(bits)
    rows = []
    for d, txt in zip(ids, texts):
        if d % 3 != 0:
            continue
        probe = f"dup-probe-{d}" if d % 6 == 0 else txt
        rows.append((d, int(bloom_probe(packed, [probe])[0]), int(d % 6 == 0)))
    _write(
        "bloom_probe", sf_dir,
        pd.DataFrame(rows, columns=["doc_id", "bloom_hit", "exact_dup"]).astype(
            {"doc_id": "int64", "bloom_hit": "int64", "exact_dup": "int64"}
        ),
    )


def norm_text(sf_dir: str) -> None:
    """Serial mirror of unicode text normalization (shared pure leaf —
    regression-pin tier): NFKC + casefold + whitespace collapse over
    the planted-messy corpus."""
    from crawlerframework_ray.functions.textstats import normalize_text

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    rows = []
    for d, txt in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
        d = int(d)
        if d % 11 == 2:
            txt = txt + "  A\u0301\u00a0\uff28i\t"
        n = normalize_text(txt)
        rows.append((d, n, int(n != txt)))
    _write(
        "norm_text", sf_dir,
        pd.DataFrame(rows, columns=["doc_id", "norm_text", "changed"]).astype(
            {"doc_id": "int64", "norm_text": "string", "changed": "int64"}
        ),
    )


def gram_top_component(sf_dir: str) -> None:
    """Serial mirror of the distributed Gram + fixed-point power
    iteration: accumulate G = sum(qx qx^T) one VECTOR at a time (outer
    products in a Python loop — independent of the batched matmul
    path), then the identical integer power iteration. Equality proves
    the one-pass Gram partials fold correctly."""
    from crawlerframework_ray.stages.similarity import quantize_int8, power_iteration_int

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
    G = np.zeros((64, 64), dtype=np.int64)
    for e in t.column("embedding").to_pylist():
        q = quantize_int8(np.asarray(e, dtype=np.float64)).astype(np.int64)
        G += np.outer(q, q)
    v = power_iteration_int(G)
    _write(
        "gram_top_component", sf_dir,
        pd.DataFrame({"dim": np.arange(64, dtype=np.int64), "component_milli": v}),
    )


def term_canon(sf_dir: str) -> None:
    """Serial mirror of term canonicalization: brute-force all-pairs
    levenshtein(<=1) over the typo-augmented vocabulary + serial
    union-find with min-term labels, then corpus term counts folded
    onto the canonical term. Independent of the FastSS blocking AND of
    the distributed min-label propagation. Strong oracle."""
    from collections import Counter

    def ed1(a: str, b: str) -> bool:
        la, lb = len(a), len(b)
        if abs(la - lb) > 1:
            return False
        if la == lb:
            return sum(x != y for x, y in zip(a, b)) == 1
        if la > lb:
            a, b, la, lb = b, a, lb, la
        i = 0
        while i < la and a[i] == b[i]:
            i += 1
        return a[i:] == b[i + 1 :]

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    counts: Counter = Counter()
    for d, txt in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
        toks = txt.split(" ")
        if int(d) % 13 == 5:  # planted typo occurrences in the CORPUS
            toks = toks + [w + w[-1] for w in toks[:3] if w and len(w) % 3 == 0]
        counts.update(toks)
    vocab = sorted(counts)
    parent = {v: v for v in vocab}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in range(len(vocab)):
        for j in range(i + 1, len(vocab)):
            if ed1(vocab[i], vocab[j]):
                ra, rb = find(vocab[i]), find(vocab[j])
                if ra != rb:
                    lo, hi = min(ra, rb), max(ra, rb)
                    parent[hi] = lo
    canon: Counter = Counter()
    for v, n in counts.items():
        canon[find(v)] += n
    rows = sorted((k, int(v)) for k, v in canon.items())
    _write(
        "term_canon", sf_dir,
        pd.DataFrame(rows, columns=["canon_term", "n_occurrences"]).astype(
            {"canon_term": "string", "n_occurrences": "int64"}
        ),
    )


def image_augment(sf_dir: str) -> None:
    """Independent explicit-loop mirror of image_augment_stats: decode
    via the codec leaf, then numpy fliplr / center-crop slicing written
    out longhand (no ImageAugmentStage code path). average_hash is the
    shared leaf (regression-pin tier, like phash_sigs); sum_luma is an
    independent whole-array sum."""
    from crawlerframework_ray.data import codecs
    from crawlerframework_ray.data.imageops import average_hash
    from crawlerframework_ray.data.synth import SynthWebConfig, make_url, page_record

    cfg = SynthWebConfig(seed=42, n_hosts=8, path_space=1 << 20)
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    ids = [int(x) for x in t.column("doc_id").to_pylist()][:512]
    rows = []
    for d in ids:
        rec = page_record(make_url(d % 8, d), cfg)
        img = codecs.decode(rec["bytes"], rec["fmt"])
        h, w = img.shape[0], img.shape[1]
        flipped = np.fliplr(img)
        cropped = img[h // 4 : h // 4 + h // 2, w // 4 : w // 4 + w // 2]
        for aug, a in (("hflip", flipped), ("ccrop", cropped)):
            rows.append(
                (
                    rec["image_id"],
                    aug,
                    a.shape[1],
                    a.shape[0],
                    int(a.sum(dtype=np.int64)),
                    average_hash(np.ascontiguousarray(a)),
                )
            )
    _write(
        "image_augment", sf_dir,
        pd.DataFrame(
            rows, columns=["image_id", "aug", "w", "h", "sum_luma", "phash_calc"]
        ).astype(
            {
                "image_id": "string",
                "aug": "string",
                "w": "int32",
                "h": "int32",
                "sum_luma": "int64",
                "phash_calc": "int64",
            }
        ),
    )


def image_quality(sf_dir: str) -> None:
    """Independent explicit-loop mirror of image_quality_filter: decode
    via the codec leaf, then the max/min/unique reductions and the
    ordered gate cascade written out longhand (no ImageQualityStage
    code path; thresholds restated literally so a stage-side constant
    drift fails the gate)."""
    from crawlerframework_ray.data import codecs
    from crawlerframework_ray.data.synth import SynthWebConfig, make_url, page_record

    cfg = SynthWebConfig(seed=42, n_hosts=8, path_space=1 << 20)
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    ids = [int(x) for x in t.column("doc_id").to_pylist()][:512]
    rows = []
    for d in ids:
        rec = page_record(make_url(d % 8, d), cfg)
        img = codecs.decode(rec["bytes"], rec["fmt"])
        contrast = int(img.max()) - int(img.min())
        n_distinct = int(np.unique(img).size)
        if n_distinct < 100:
            label = "flat"
        elif contrast < 253:
            label = "low_contrast"
        else:
            label = "keep"
        rows.append((rec["image_id"], contrast, n_distinct, label))
    _write(
        "image_quality", sf_dir,
        pd.DataFrame(rows, columns=["image_id", "contrast", "n_distinct", "label"]).astype(
            {"image_id": "string", "contrast": "int32", "n_distinct": "int32", "label": "string"}
        ),
    )


def image_sharpness(sf_dir: str) -> None:
    """Independent explicit-loop mirror of image_sharpness_gate: the
    PLANT (doc_id % 3 blur level via block_mean_pool) is shared with
    the query by design, but the MEASURE — gray conversion, the
    4c−N−S−E−W Laplacian, the milli normalization and both thresholds
    — is restated longhand here with the constants literal, so a
    stage-side kernel or threshold drift fails the gate."""
    from crawlerframework_ray.data import codecs
    from crawlerframework_ray.data.imageops import block_mean_pool
    from crawlerframework_ray.data.synth import SynthWebConfig, make_url, page_record

    cfg = SynthWebConfig(seed=42, n_hosts=8, path_space=1 << 20)
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    ids = [int(x) for x in t.column("doc_id").to_pylist()][:512]
    rows = []
    for d in ids:
        rec = page_record(make_url(d % 8, d), cfg)
        img = codecs.decode(rec["bytes"], rec["fmt"])
        if d % 3:
            img = block_mean_pool(img, 2 * (d % 3))
        g = img.astype(np.int64).sum(axis=2) // 3
        lap_sum = 0
        n = 0
        for y in range(1, g.shape[0] - 1):
            for x in range(1, g.shape[1] - 1):
                lap_sum += abs(
                    4 * g[y, x] - g[y - 1, x] - g[y + 1, x] - g[y, x - 1] - g[y, x + 1]
                )
                n += 1
        milli = int(lap_sum) * 1000 // n
        label = "sharp" if milli >= 75_000 else "soft" if milli >= 20_000 else "blurry"
        rows.append((rec["image_id"], milli, label))
    _write(
        "image_sharpness", sf_dir,
        pd.DataFrame(rows, columns=["image_id", "lap_milli", "label"]).astype(
            {"image_id": "string", "lap_milli": "int64", "label": "string"}
        ),
    )


def image_borders(sf_dir: str) -> None:
    """Construction-derived golden for image_border_stats: expected
    borders come from the plant arithmetic ((doc_id % 4) × 2) and
    content rows from the page_record dims — the detector is NEVER run
    here, so over/under-running a bar (or a false border inside the
    noise content) fails the gate."""
    from crawlerframework_ray.data.synth import SynthWebConfig, make_url, page_record

    cfg = SynthWebConfig(seed=42, n_hosts=8, path_space=1 << 20)
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    ids = [int(x) for x in t.column("doc_id").to_pylist()][:512]
    rows = []
    for d in ids:
        rec = page_record(make_url(d % 8, d), cfg)
        hb = (d % 4) * 2
        rows.append((rec["image_id"], hb, hb, int(rec["h"])))
    _write(
        "image_borders", sf_dir,
        pd.DataFrame(rows, columns=["image_id", "top_border", "bottom_border", "content_rows"]).astype(
            {"image_id": "string", "top_border": "int32", "bottom_border": "int32", "content_rows": "int32"}
        ),
    )


def video_scene_cuts_golden(sf_dir: str) -> None:
    """Construction-derived golden for video_scene_cuts: expected cuts
    and frame counts come from media.scene_lengths (the plant
    arithmetic the composite generator uses) — the detector is NEVER
    run, so a missed or spurious cut fails the gate."""
    from crawlerframework_ray.data.media import scene_lengths

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    ids = [int(x) for x in t.column("doc_id").to_pylist()][:96]
    rows = []
    for d in ids:
        lens = scene_lengths(d)
        rows.append((f"v{d}", sum(lens), len(lens) - 1))
    _write(
        "video_scene_cuts", sf_dir,
        pd.DataFrame(rows, columns=["video_id", "n_frames", "n_cuts"]).astype(
            {"video_id": "string", "n_frames": "int32", "n_cuts": "int32"}
        ),
    )


def audio_quality(sf_dir: str) -> None:
    """Construction-derived golden for audio_quality_audit: expected
    silent-window and clip counts come from media.plant_audio_defects
    (the arithmetic the defective-audio generator uses) — the detector
    is NEVER run, so a missed/spurious silent window or clip count
    fails the gate. Label cascade restated literally."""
    from crawlerframework_ray.data.media import plant_audio_defects

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    ids = [int(x) for x in t.column("doc_id").to_pylist()][:128]
    rows = []
    for d in ids:
        sil, clip = plant_audio_defects(d)
        n_clipped = 1024 if clip >= 0 else 0
        label = "clipped" if n_clipped else "has_silence" if sil else "clean"
        rows.append((f"a{d}", 8, len(sil), n_clipped, label))
    _write(
        "audio_quality", sf_dir,
        pd.DataFrame(
            rows, columns=["audio_id", "n_windows", "n_silent", "n_clipped_samples", "label"]
        ).astype(
            {"audio_id": "string", "n_windows": "int32", "n_silent": "int32",
             "n_clipped_samples": "int64", "label": "string"}
        ),
    )


def mirror_dup_pairs(sf_dir: str) -> None:
    """Independent explicit-loop mirror of mirror_phash_dup_pairs:
    regenerate the same corpus + planted mirrored twins, compute
    canon = min-as-uint64 of (hash, hash-of-flip) longhand, then
    all-pairs within equal canon by a quadratic loop (no grouping
    machinery). average_hash is the shared leaf (regression-pin
    tier)."""
    from crawlerframework_ray.data import codecs
    from crawlerframework_ray.data.imageops import average_hash
    from crawlerframework_ray.data.synth import SynthWebConfig, make_url, page_record

    cfg = SynthWebConfig(seed=42, n_hosts=8, path_space=1 << 20)
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    ids = [int(x) for x in t.column("doc_id").to_pylist()][:512]
    imgs = []
    for d in ids:
        rec = page_record(make_url(d % 8, d), cfg)
        img = codecs.decode(rec["bytes"], rec["fmt"])
        imgs.append((rec["image_id"], img))
        if d % 16 == 0:
            imgs.append((rec["image_id"] + "~m", np.ascontiguousarray(np.fliplr(img))))
    canon = []
    for iid, img in imgs:
        h1 = average_hash(img) & 0xFFFFFFFFFFFFFFFF
        h2 = average_hash(np.ascontiguousarray(np.fliplr(img))) & 0xFFFFFFFFFFFFFFFF
        canon.append((iid, int(np.uint64(min(h1, h2)).astype(np.int64))))
    rows = []
    for i in range(len(canon)):
        for j in range(i + 1, len(canon)):
            if canon[i][1] == canon[j][1]:
                a, b = sorted((canon[i][0], canon[j][0]))
                rows.append((a, b, canon[i][1]))
    rows.sort()
    _write(
        "mirror_dup_pairs", sf_dir,
        pd.DataFrame(rows, columns=["id_a", "id_b", "canon_hash"]).astype(
            {"id_a": "string", "id_b": "string", "canon_hash": "int64"}
        ),
    )


def channel_moments(sf_dir: str) -> None:
    """Independent explicit-loop mirror of image_channel_moments +
    image_compression_ratio: decode via the codec leaf, then per-channel
    Σv / Σv² written out longhand over python ints (no numpy reduction,
    no ChannelMomentsStage code path)."""
    from crawlerframework_ray.data import codecs
    from crawlerframework_ray.data.synth import SynthWebConfig, make_url, page_record

    cfg = SynthWebConfig(seed=42, n_hosts=8, path_space=1 << 20)
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    ids = [int(x) for x in t.column("doc_id").to_pylist()][:512]
    mom: dict[tuple, list] = {}
    comp: dict[str, list] = {}
    for d in ids:
        rec = page_record(make_url(d % 8, d), cfg)
        img = codecs.decode(rec["bytes"], rec["fmt"])
        h, w = img.shape[0], img.shape[1]
        for c in range(3):
            sv = sum(int(v) for row in img[:, :, c] for v in row)
            sq = sum(int(v) * int(v) for row in img[:, :, c] for v in row)
            k = (rec["fmt"], c)
            acc = mom.setdefault(k, [0, 0, 0, 0])
            acc[0] += 1
            acc[1] += h * w
            acc[2] += sv
            acc[3] += sq
        ca = comp.setdefault(rec["fmt"], [0, 0, 0])
        ca[0] += 1
        ca[1] += len(rec["bytes"])
        ca[2] += h * w * 3
    _write(
        "channel_moments", sf_dir,
        pd.DataFrame(
            [(f, c, *acc) for (f, c), acc in sorted(mom.items())],
            columns=["fmt", "channel", "n_images", "n_pixels", "sum_v", "sum_sq"],
        ).astype(
            {"fmt": "string", "channel": "int32", "n_images": "int64",
             "n_pixels": "int64", "sum_v": "int64", "sum_sq": "int64"}
        ),
    )
    _write(
        "compression_ratio", sf_dir,
        pd.DataFrame(
            [(f, *acc) for f, acc in sorted(comp.items())],
            columns=["fmt", "n_images", "encoded_bytes", "raw_bytes"],
        ).astype(
            {"fmt": "string", "n_images": "int64", "encoded_bytes": "int64", "raw_bytes": "int64"}
        ),
    )


def tile_crop_pairs(sf_dir: str) -> None:
    """Independent explicit-loop mirror of image_tile_crop_dups:
    regenerate the same corpus + planted img[16:,16:] crops, build each
    image's DISTINCT 16x16-tile hash set by a longhand double loop
    (average_hash is the shared regression-pinned leaf), then count
    shared hashes for ALL pairs quadratically — no grouping machinery,
    no shuffle — keeping pairs with >= 1 shared tile."""
    from crawlerframework_ray.data import codecs
    from crawlerframework_ray.data.imageops import average_hash
    from crawlerframework_ray.data.synth import SynthWebConfig, make_url, page_record

    cfg = SynthWebConfig(seed=42, n_hosts=8, path_space=1 << 20, size_shift=2)
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    ids = [int(x) for x in t.column("doc_id").to_pylist()][:384]
    sets = []
    for d in ids:
        rec = page_record(make_url(d % 8, d), cfg)
        img = codecs.decode(rec["bytes"], rec["fmt"])
        variants = [(rec["image_id"], img)]
        if d % 12 == 0:
            variants.append((rec["image_id"] + "~c", img[16:, 16:]))
        for iid, im in variants:
            hs = set()
            for ty in range(im.shape[0] // 16):
                for tx in range(im.shape[1] // 16):
                    hs.add(average_hash(im[ty * 16:(ty + 1) * 16, tx * 16:(tx + 1) * 16]))
            sets.append((iid, hs))
    rows = []
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            shared = len(sets[i][1] & sets[j][1])
            if shared:
                a, b = sorted((sets[i][0], sets[j][0]))
                rows.append((a, b, shared))
    rows.sort()
    _write(
        "tile_crop_pairs", sf_dir,
        pd.DataFrame(rows, columns=["id_a", "id_b", "shared_tiles"]).astype(
            {"id_a": "string", "id_b": "string", "shared_tiles": "int64"}
        ),
    )


def dominant_colors(sf_dir: str) -> None:
    """Explicit-loop mirror of image_dominant_color: the PLANT (solid
    doc_id-keyed rectangle over the top half / quarter) is shared with
    the query by design, but the MEASURE — the 4-bit/channel bin
    arithmetic, the bincount argmax tie rule and both label thresholds
    — is restated longhand with the constants literal."""
    from crawlerframework_ray.data import codecs
    from crawlerframework_ray.data.synth import SynthWebConfig, make_url, page_record

    cfg = SynthWebConfig(seed=42, n_hosts=8, path_space=1 << 20, size_shift=2)
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    ids = [int(x) for x in t.column("doc_id").to_pylist()][:384]
    rows = []
    for d in ids:
        rec = page_record(make_url(d % 8, d), cfg)
        img = codecs.decode(rec["bytes"], rec["fmt"])
        color = np.array([(d * 53) % 256, (d * 97) % 256, (d * 29) % 256], dtype=np.uint8)
        if d % 5 == 0:
            img = img.copy(); img[: img.shape[0] // 2, :, :] = color
        elif d % 5 == 1:
            img = img.copy(); img[: img.shape[0] // 4, :, :] = color
        counts = [0] * 4096
        for y in range(img.shape[0]):
            for x in range(img.shape[1]):
                r, g, b = int(img[y, x, 0]), int(img[y, x, 1]), int(img[y, x, 2])
                counts[(r // 16) * 256 + (g // 16) * 16 + (b // 16)] += 1
        dom = max(range(4096), key=lambda i: (counts[i], -i))
        milli = counts[dom] * 1000 // (img.shape[0] * img.shape[1])
        label = "flat" if milli >= 400 else "accent" if milli >= 150 else "textured"
        rows.append((rec["image_id"], dom, milli, label))
    _write(
        "dominant_colors", sf_dir,
        pd.DataFrame(rows, columns=["image_id", "dom_bin", "dom_milli", "label"]).astype(
            {"image_id": "string", "dom_bin": "int32", "dom_milli": "int64", "label": "string"}
        ),
    )


def ssim_pairs(sf_dir: str) -> None:
    """Explicit mirror of image_ssim_quality_pairs: the PLANT
    (block_mean_pool k=2/k=4 degradations) is shared, the MEASURE — the
    gray conversion, the five sums and the integer SSIM num/den formula
    with C1=7, C2=59 literal — is restated longhand on Python ints."""
    from crawlerframework_ray.data import codecs
    from crawlerframework_ray.data.imageops import block_mean_pool
    from crawlerframework_ray.data.synth import SynthWebConfig, make_url, page_record

    cfg = SynthWebConfig(seed=42, n_hosts=8, path_space=1 << 20, size_shift=2)
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    ids = [int(x) for x in t.column("doc_id").to_pylist()][:256]
    rows = []
    for d in ids:
        rec = page_record(make_url(d % 8, d), cfg)
        img = codecs.decode(rec["bytes"], rec["fmt"])
        for k in (2, 4):
            blur = block_mean_pool(img, k)
            ga = img.astype(np.int64).sum(axis=2) // 3
            gb = blur.astype(np.int64).sum(axis=2) // 3
            n = int(ga.size)
            sx = int(ga.sum()); sy = int(gb.sum())
            sxx = int((ga * ga).sum()); syy = int((gb * gb).sum())
            sxy = int((ga * gb).sum())
            num = (2 * sx * sy + 7 * n * n) * (2 * (n * sxy - sx * sy) + 59 * n * n)
            den = (sx * sx + sy * sy + 7 * n * n) * (
                (n * sxx - sx * sx) + (n * syy - sy * sy) + 59 * n * n
            )
            rows.append((rec["image_id"], k, num * 1000 // den))
    _write(
        "ssim_pairs", sf_dir,
        pd.DataFrame(rows, columns=["image_id", "blur_k", "ssim_milli"]).astype(
            {"image_id": "string", "blur_k": "int32", "ssim_milli": "int64"}
        ),
    )



def image_otsu(sf_dir: str) -> None:
    """Independent longhand mirror of image_otsu_binarize: the PLANT
    (doc_id % 3 bimodal / noise / constant) is shared with the query by
    design, but the MEASURE — gray conversion, the per-bin histogram
    loop, the cross-multiplied between-class-variance argmax with its
    smallest-t tie rule, the constant-image degenerate branch and the
    fg milli — is restated here with explicit loops and literal
    formulas, so a stage-side scan or tie-rule drift fails the gate."""
    from crawlerframework_ray.data import codecs
    from crawlerframework_ray.data.synth import SynthWebConfig, make_url, page_record

    cfg = SynthWebConfig(seed=42, n_hosts=8, path_space=1 << 20)
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    ids = [int(x) for x in t.column("doc_id").to_pylist()][:512]
    rows = []
    for d in ids:
        rec = page_record(make_url(d % 8, d), cfg)
        img = codecs.decode(rec["bytes"], rec["fmt"])
        if d % 3 == 0:
            gray0 = img.astype(np.int64).sum(axis=2) // 3
            lo, hi = 40 + d % 20, 180 + d % 40
            img = np.broadcast_to(
                np.where((gray0 >= 128)[..., None], hi, lo).astype(np.uint8),
                img.shape,
            ).copy()
        elif d % 3 == 2:
            img = np.full_like(img, 7 + d % 90)
        g = img.astype(np.int64).sum(axis=2) // 3
        hist = [0] * 256
        S = 0
        W = 0
        for y in range(g.shape[0]):
            for x in range(g.shape[1]):
                v = int(g[y, x])
                hist[v] += 1
                S += v
                W += 1
        best_t = -1
        best_num = best_den = 0
        w0 = s0 = 0
        for thr in range(256):
            w0 += hist[thr]
            s0 += thr * hist[thr]
            if w0 == 0 or w0 == W:
                continue
            num = S * w0 - s0 * W
            if best_t < 0 or num * num * best_den > best_num * (w0 * (W - w0)):
                best_num, best_den, best_t = num * num, w0 * (W - w0), thr
        if best_t < 0:
            threshold, fg = int(g[0, 0]), 0
        else:
            threshold = best_t
            fg = sum(
                1
                for y in range(g.shape[0])
                for x in range(g.shape[1])
                if int(g[y, x]) > best_t
            )
        rows.append((rec["image_id"], threshold, fg * 1000 // W))
    _write(
        "image_otsu", sf_dir,
        pd.DataFrame(rows, columns=["image_id", "threshold", "fg_milli"]).astype(
            {"image_id": "string", "threshold": "int64", "fg_milli": "int64"}
        ),
    )


def image_palette(sf_dir: str) -> None:
    """Longhand mirror of image_palette_median_cut: the PLANT
    (_plant_palette) is shared by design, but the MEASURE — box pick
    by (range, size, creation order), widest-channel choice, the
    (channel value, packed rgb) order-position cut at (n+1)//2, floor
    means and the packed-entry output sort — is restated with explicit
    loops and tuple sorts (no numpy lexsort), so a spec drift in the
    stage fails the gate."""
    from crawlerframework_ray.data import codecs
    from crawlerframework_ray.data.synth import SynthWebConfig, make_url, page_record
    from crawlerframework_ray.pipelines.queries import _plant_palette

    cfg = SynthWebConfig(seed=42, n_hosts=8, path_space=1 << 20)
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    ids = [int(x) for x in t.column("doc_id").to_pylist()][:512]
    rows = []
    for d in ids:
        rec = page_record(make_url(d % 8, d), cfg)
        img = _plant_palette(d, codecs.decode(rec["bytes"], rec["fmt"]))
        px = [tuple(int(c) for c in p[:3]) for row in img for p in row]
        px.sort(key=lambda p: (p[0] << 16) | (p[1] << 8) | p[2])
        boxes = [px]
        while len(boxes) < 4:
            pick = -1
            pick_key = None
            for j, b in enumerate(boxes):
                rng = max(
                    max(p[ch] for p in b) - min(p[ch] for p in b) for ch in range(3)
                )
                if rng == 0:
                    continue
                key = (rng, len(b))
                if pick < 0 or key > pick_key:
                    pick, pick_key = j, key
            if pick < 0:
                break
            b = boxes[pick]
            spreads = [
                max(p[ch] for p in b) - min(p[ch] for p in b) for ch in range(3)
            ]
            ch = spreads.index(max(spreads))
            b = sorted(b, key=lambda p: (p[ch], (p[0] << 16) | (p[1] << 8) | p[2]))
            cut = (len(b) + 1) // 2
            boxes[pick] = b[:cut]
            boxes.append(b[cut:])
        entries = sorted(
            (
                (sum(p[0] for p in b) // len(b)) << 16
                | (sum(p[1] for p in b) // len(b)) << 8
                | (sum(p[2] for p in b) // len(b)),
                len(b),
            )
            for b in boxes
        )
        row = [rec["image_id"], len(entries)]
        for i in range(4):
            row.append(entries[i][0] if i < len(entries) else -1)
            row.append(entries[i][1] if i < len(entries) else 0)
        rows.append(tuple(row))
    cols = ["image_id", "n_boxes"]
    for i in range(4):
        cols += [f"p{i}", f"n{i}"]
    df = pd.DataFrame(rows, columns=cols).astype(
        {"image_id": "string", "n_boxes": "int32",
         **{c: "int64" for i in range(4) for c in (f"p{i}", f"n{i}")}}
    )
    _write("image_palette", sf_dir, df)


def image_regions(sf_dir: str) -> None:
    """Independent mirror of image_region_count: same plant
    (_plant_palette) and the same exact-integer Otsu threshold
    (stages/multimodal.otsu_threshold — itself golden-gated by
    image_otsu), but the REGION census uses a BFS flood fill with an
    explicit stack instead of the stage's two-pass union-find, so the
    two algorithms certify each other."""
    from crawlerframework_ray.data import codecs
    from crawlerframework_ray.data.synth import SynthWebConfig, make_url, page_record
    from crawlerframework_ray.pipelines.queries import _plant_palette
    from crawlerframework_ray.stages.multimodal import otsu_threshold

    cfg = SynthWebConfig(seed=42, n_hosts=8, path_space=1 << 20)
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    ids = [int(x) for x in t.column("doc_id").to_pylist()][:512]
    rows = []
    for d in ids:
        rec = page_record(make_url(d % 8, d), cfg)
        img = _plant_palette(d, codecs.decode(rec["bytes"], rec["fmt"]))
        g = img.astype(np.int64).sum(axis=2) // 3
        thr = otsu_threshold(g)
        if thr < 0:
            rows.append((rec["image_id"], int(g[0, 0]), 0, 0))
            continue
        mask = g > thr
        h, w = mask.shape
        seen = [[False] * w for _ in range(h)]
        sizes = []
        for y0 in range(h):
            for x0 in range(w):
                if not mask[y0, x0] or seen[y0][x0]:
                    continue
                stack = [(y0, x0)]
                seen[y0][x0] = True
                size = 0
                while stack:
                    y, x = stack.pop()
                    size += 1
                    for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                        ny, nx = y + dy, x + dx
                        if 0 <= ny < h and 0 <= nx < w and mask[ny, nx] and not seen[ny][nx]:
                            seen[ny][nx] = True
                            stack.append((ny, nx))
                sizes.append(size)
        largest = max(sizes) if sizes else 0
        rows.append((rec["image_id"], thr, len(sizes), largest * 1000 // (h * w)))
    df = pd.DataFrame(
        rows, columns=["image_id", "threshold", "n_regions", "largest_milli"]
    ).astype({"image_id": "string", "threshold": "int64",
              "n_regions": "int64", "largest_milli": "int64"})
    _write("image_regions", sf_dir, df)


def ann_pq_topk(sf_dir: str) -> None:
    """Serial longhand mirror of ann_topk_pq: shares the PLANT (exact
    query duplicates), the fixed-point quantizer and the trained
    codebooks (pq_train_books — deterministic seeded Lloyd's over the
    same sample the pipeline draws), but re-derives ENCODE + ADC +
    top-k with explicit per-row loops over the whole augmented corpus
    — an encoding argmin, table-lookup or merge drift in the
    distributed scan fails the gate bit-for-bit (distances are pure
    int64 on both sides)."""
    from crawlerframework_ray.pipelines.queries import _query_vectors
    from crawlerframework_ray.stages.similarity import (
        pq_quantize,
        pq_train_books,
    )

    qids, qvecs = _query_vectors(sf_dir)
    dup_ids = [(1 << 41) + int(q) * 64 + i for q in qids for i in range(5)]
    dup_vecs = np.repeat(qvecs, 5, axis=0)
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = [int(x) for x in t.column("vec_id").to_pylist()] + dup_ids
    vecs = np.concatenate(
        [
            np.stack([np.asarray(v, dtype=np.float32) for v in t.column("embedding").to_pylist()]),
            dup_vecs.astype(np.float32),
        ]
    )
    # the pipeline's partition-invariant Knuth-hash training sample,
    # restated longhand (vec_id order, capped)
    tr = sorted(
        (int(i), vecs[r]) for r, i in enumerate(ids)
        if ((int(i) * 2654435761) % (1 << 32)) % 2 == 0
    )[:2048]
    books = pq_train_books(
        np.stack([np.asarray(v, dtype=np.float64) for _, v in tr]), 4, 16, 5
    )

    qmat = pq_quantize(vecs)
    sub = qmat.shape[1] // 4
    codes = []
    for r in range(len(ids)):
        row = []
        for s in range(4):
            best_c, best_d = -1, None
            for c in range(len(books[s])):
                d = 0
                for j in range(sub):
                    diff = int(qmat[r, s * sub + j]) - int(books[s][c, j])
                    d += diff * diff
                if best_d is None or d < best_d:
                    best_c, best_d = c, d
            row.append(best_c)
        codes.append(row)
    qq = pq_quantize(np.asarray(qvecs, dtype=np.float64))
    rows = []
    for qi, qid in enumerate(qids):
        dists = []
        for r in range(len(ids)):
            d = 0
            for s in range(4):
                c = codes[r][s]
                for j in range(sub):
                    diff = int(qq[qi, s * sub + j]) - int(books[s][c, j])
                    d += diff * diff
            dists.append((d, ids[r]))
        dists.sort()
        for rank, (d, nid) in enumerate(dists[:5], 1):
            rows.append((int(qid), int(nid), rank, int(d)))
    df = pd.DataFrame(rows, columns=["query_id", "neighbor_id", "rank", "pq_dist"]).astype("int64")
    _write("ann_pq_topk", sf_dir, df)


def ann_ivfpq_topk(sf_dir: str) -> None:
    """Serial longhand mirror of ann_topk_ivfpq: shares the plant
    (exact duplicates), the hash training-sample rule and the two
    deterministic quantizer trainers (kmeans_fit / pq_train_books),
    then re-derives coarse assignment, pruning, encoding, ADC and the
    top-k with explicit loops."""
    from crawlerframework_ray.pipelines.queries import _query_vectors
    from crawlerframework_ray.stages.similarity import (
        kmeans_fit,
        pq_quantize,
        pq_train_books,
    )

    qids, qvecs = _query_vectors(sf_dir)
    dup_ids = [(1 << 42) + int(q) * 64 + i for q in qids for i in range(5)]
    dup_vecs = np.repeat(qvecs, 5, axis=0)
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = [int(x) for x in t.column("vec_id").to_pylist()] + dup_ids
    vecs = np.concatenate(
        [
            np.stack([np.asarray(v, dtype=np.float32) for v in t.column("embedding").to_pylist()]),
            dup_vecs.astype(np.float32),
        ]
    ).astype(np.float64)

    def hash_sample(id_list, vec_rows, cap=2048):
        tr = sorted(
            (int(i), r) for r, i in enumerate(id_list)
            if ((int(i) * 2654435761) % (1 << 32)) % 2 == 0
        )[:cap]
        return np.stack([vec_rows[r] for _, r in tr])

    # coarse: cosine cells on the hash sample
    cents = kmeans_fit(hash_sample(ids, vecs), 16, 5)
    norms = np.linalg.norm(vecs, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    cells = np.argmax((vecs / norms) @ cents.T, axis=1)
    qn = np.asarray(qvecs, dtype=np.float64)
    qn = qn / np.linalg.norm(qn, axis=1, keepdims=True)
    probed = sorted({int(c) for row in np.argsort(-(qn @ cents.T), axis=1)[:, :4] for c in row})
    keep = [r for r in range(len(ids)) if int(cells[r]) in probed]
    s_ids = [ids[r] for r in keep]
    s_vecs = vecs[keep]
    # fine: PQ trained on the SURVIVORS' hash sample (mirrors ann_pq
    # over the filtered Dataset)
    books = pq_train_books(hash_sample(s_ids, s_vecs), 4, 16, 5)
    qmat = pq_quantize(s_vecs)
    sub = qmat.shape[1] // 4
    codes = []
    for r in range(len(s_ids)):
        row = []
        for s in range(4):
            best_c, best_d = -1, None
            for c in range(len(books[s])):
                d = 0
                for j in range(sub):
                    diff = int(qmat[r, s * sub + j]) - int(books[s][c, j])
                    d += diff * diff
                if best_d is None or d < best_d:
                    best_c, best_d = c, d
            row.append(best_c)
        codes.append(row)
    qq = pq_quantize(np.asarray(qvecs, dtype=np.float64))
    rows = []
    for qi, qid in enumerate(qids):
        dists = []
        for r in range(len(s_ids)):
            d = 0
            for s in range(4):
                c = codes[r][s]
                for j in range(sub):
                    diff = int(qq[qi, s * sub + j]) - int(books[s][c, j])
                    d += diff * diff
            dists.append((d, s_ids[r]))
        dists.sort()
        for rank, (d, nid) in enumerate(dists[:5], 1):
            rows.append((int(qid), int(nid), rank, int(d)))
    df = pd.DataFrame(rows, columns=["query_id", "neighbor_id", "rank", "pq_dist"]).astype("int64")
    _write("ann_ivfpq_topk", sf_dir, df)



def hyperball_counts(sf_dir: str) -> None:
    """Serial HyperBall mirror (independent adjacency-dict sweep loop;
    shares only the batch_registers/estimate leaf functions with the
    engine, like simhash_sigs — medium-strength)."""
    from crawlerframework_ray.stages.sketch import batch_registers, estimate

    ids = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"]) \
            .column("doc_id").to_numpy().astype(np.int64)
    adj: dict[int, set] = {}
    nodes: set = set()
    for i in ids:
        s = int(i % 64)
        for d in (int((i * 7 + i // 64 + 1) % 64), int((i * 13 + i // 64 + 5) % 64)):
            if s != d:
                adj.setdefault(s, set()).add(d)
                nodes.add(s)
                nodes.add(d)
    nl = sorted(nodes)
    regs = {v: batch_registers(np.array([v], dtype=np.int64)) for v in nl}
    counts = [sum(estimate(regs[v]) for v in nl)]
    for _ in range(6):
        new = {}
        for v in nl:
            r = regs[v].copy()
            for u in adj.get(v, ()):
                np.maximum(r, regs[u], out=r)
            new[v] = r
        regs = new
        counts.append(sum(estimate(regs[v]) for v in nl))
    arr = np.array(counts, dtype=np.int64)
    nf = int(arr[-1])
    first = next(t for t, c in enumerate(arr) if 10 * c >= 9 * nf)
    _write("hyperball_counts", sf_dir, pd.DataFrame({
        "t": np.arange(7, dtype=np.int64),
        "nhat_pairs": arr,
        "is_eff_diameter": np.arange(7) == first,
    }))



def cdc_chunks(sf_dir: str) -> None:
    """Serial CDC mirror: an INDEPENDENT classic rolling-hash
    implementation (add/remove per byte, python ints mod 2^64) of the
    spec in functions/cdc.py (which computes window hashes by direct
    vectorized polynomial sums) — byte-identical cut points required.
    Strong-ish golden: only the written spec is shared."""
    import hashlib

    W, CMIN, CMAX, MASKB, B, M = 16, 24, 96, 31, 1099511628211, 1 << 64
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["source", "text"])
    per: dict = {}
    powW = pow(B, W - 1, M)
    for src_, txt in zip(t.column("source").to_pylist(), t.column("text").to_pylist()):
        data = txt.encode("utf-8")
        n = len(data)
        if n == 0:
            lens = []
        elif n < W:
            lens = [n]
        else:
            h = 0
            cand = []
            for i in range(n):
                if i >= W:
                    h = (h - data[i - W] * powW) % M
                h = (h * B + data[i]) % M
                if i >= W - 1 and (h & MASKB) == MASKB:
                    cand.append(i + 1)
            lens = []
            last, ci = 0, 0
            while last < n:
                limit = min(last + CMAX, n)
                lo = last + CMIN
                while ci < len(cand) and cand[ci] < lo:
                    ci += 1
                if ci < len(cand) and cand[ci] <= limit:
                    cut = cand[ci]
                    ci += 1
                else:
                    cut = limit
                lens.append(cut - last)
                last = cut
        d = per.setdefault(src_, {})
        pos = 0
        for ln in lens:
            k = hashlib.md5(data[pos:pos + ln]).digest()
            pos += ln
            c = d.get(k)
            d[k] = (c[0] + 1, ln) if c else (1, ln)
    rows = []
    for s in sorted(per):
        d = per[s]
        rows.append((s,
                     sum(c for c, _ in d.values()),
                     len(d),
                     sum(c * ln for c, ln in d.values()),
                     sum((c - 1) * ln for c, ln in d.values())))
    _write("cdc_chunks", sf_dir, pd.DataFrame(
        rows, columns=["source", "n_chunks", "n_distinct", "total_bytes",
                       "dedup_bytes"]).astype(
        {c: "int64" for c in ["n_chunks", "n_distinct", "total_bytes", "dedup_bytes"]}))



def dihedral_dup_pairs(sf_dir: str) -> None:
    """Independent explicit-loop mirror of rotation_phash_dup_pairs:
    regenerate the corpus + planted rotated/rot-mirrored twins, canon
    = min-as-uint64 of average_hash over all 8 dihedral symmetries
    longhand, quadratic all-pairs (average_hash is the shared leaf —
    regression-pin tier)."""
    from crawlerframework_ray.data import codecs
    from crawlerframework_ray.data.imageops import average_hash
    from crawlerframework_ray.data.synth import SynthWebConfig, make_url, page_record

    cfg = SynthWebConfig(seed=42, n_hosts=8, path_space=1 << 20)
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    ids = [int(x) for x in t.column("doc_id").to_pylist()][:512]
    imgs = []
    for d in ids:
        rec = page_record(make_url(d % 8, d), cfg)
        img = codecs.decode(rec["bytes"], rec["fmt"])
        imgs.append((rec["image_id"], img))
        if d % 16 == 0:
            imgs.append((rec["image_id"] + "~r90",
                         np.ascontiguousarray(np.rot90(img, 1))))
        if d % 24 == 0:
            imgs.append((rec["image_id"] + "~rf",
                         np.ascontiguousarray(np.fliplr(np.rot90(img, 2)))))
    canon = []
    for iid, img in imgs:
        best = 0xFFFFFFFFFFFFFFFF
        for k in range(4):
            r = np.rot90(img, k)
            for v in (r, np.fliplr(r)):
                h = average_hash(np.ascontiguousarray(v)) & 0xFFFFFFFFFFFFFFFF
                if h < best:
                    best = h
        canon.append((iid, int(np.uint64(best).astype(np.int64))))
    rows = []
    for i2 in range(len(canon)):
        for j in range(i2 + 1, len(canon)):
            if canon[i2][1] == canon[j][1]:
                a, b = sorted((canon[i2][0], canon[j][0]))
                rows.append((a, b, canon[i2][1]))
    rows.sort()
    _write(
        "dihedral_dup_pairs", sf_dir,
        pd.DataFrame(rows, columns=["id_a", "id_b", "canon_hash"]).astype(
            {"id_a": "string", "id_b": "string", "canon_hash": "int64"}
        ),
    )



def lsh_sweep(sf_dir: str) -> None:
    """Serial mirror of lsh_band_sweep: same MinHashStage signature
    leaf, but banding, candidate expansion and Jaccard verification
    re-done with naive dict loops (regression-pin tier)."""
    from crawlerframework_ray.stages.dedup import (
        MinHashStage,
        _shingle_hashes,
    )
    import pyarrow as _pa

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    ids = [int(x) for x in t.column("doc_id").to_pylist()]
    texts = t.column("text").to_pylist()
    sh = {i: set(_shingle_hashes(x).tolist()) for i, x in zip(ids, texts)}
    rows = []
    for nb in (8, 16, 32):
        st = MinHashStage("doc_id", "text", n_perm=64, n_bands=nb)
        buckets: dict = {}
        for lo in range(0, len(ids), 512):
            bt = st(_pa.table({"doc_id": _pa.array(ids[lo:lo + 512]),
                               "text": _pa.array(texts[lo:lo + 512])}))
            for d, b, h in zip(bt.column("doc_id").to_pylist(),
                               bt.column("band").to_pylist(),
                               bt.column("band_hash").to_pylist()):
                buckets.setdefault((b, h), []).append(int(d))
        cand = set()
        for members in buckets.values():
            ms = sorted(set(members))
            for x in range(len(ms)):
                for y in range(x + 1, len(ms)):
                    cand.add((ms[x], ms[y]))
        nver = 0
        for a, b in cand:
            inter = len(sh[a] & sh[b])
            union = len(sh[a] | sh[b])
            if union and 2 * inter >= union:
                nver += 1
        rows.append((nb, 64 // nb, len(cand), nver))
    _write("lsh_sweep", sf_dir, pd.DataFrame(
        rows, columns=["n_bands", "rows_per_band", "n_candidates",
                       "n_verified"]).astype("int64"))



def qdigest_quantiles(sf_dir: str) -> None:
    """Independent serial q-digest mirror: the trie is a plain dict
    keyed by (level, index-in-level) instead of heap ids, compression
    is a recursive walk, the quantile scan sorts by explicit interval
    tuples — only the WRITTEN SPEC (universe 2^12, threshold n//64,
    bottom-up ascending order, (hi, lo) walk) is shared."""
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["n_chars"])
    vals = t.column("n_chars").to_numpy().astype(np.int64)
    BITS, U, SIGMA = 12, 1 << 12, 64
    n = len(vals)
    thr = max(1, n // SIGMA)
    cnt: dict = {}
    for v in vals.tolist():
        cnt[(BITS, v)] = cnt.get((BITS, v), 0) + 1
    for level in range(BITS, 0, -1):
        up = level - 1
        for idx in range(0, 1 << level, 2):
            cl = cnt.get((level, idx), 0)
            cr = cnt.get((level, idx + 1), 0)
            if cl == 0 and cr == 0:
                continue
            p = (up, idx // 2)
            if cl + cr + cnt.get(p, 0) < thr:
                cnt[p] = cnt.get(p, 0) + cl + cr
                cnt.pop((level, idx), None)
                cnt.pop((level, idx + 1), None)
    def interval(key):
        level, idx = key
        span = U >> level
        return idx * span, idx * span + span - 1
    nodes = sorted(cnt.items(), key=lambda kv: (interval(kv[0])[1],
                                                interval(kv[0])[0]))
    import numpy as _np
    uvals, ucnts = _np.unique(vals, return_counts=True)
    cum = ucnts.cumsum()
    bound = BITS * n // SIGMA
    rows = []
    for q_num, q_den, pct in ((1, 4, 25), (1, 2, 50), (9, 10, 90),
                              (99, 100, 99)):
        target = (q_num * n + q_den - 1) // q_den
        c = 0
        est = U - 1
        for key, k in nodes:
            c += k
            if c >= target:
                est = interval(key)[1]
                break
        exact = int(uvals[_np.searchsorted(cum, target)])
        rank_est = int(cum[_np.searchsorted(uvals, est, side="right") - 1]) \
            if est >= int(uvals[0]) else 0
        rows.append((pct, est, exact, bound, abs(rank_est - target) <= bound))
    df = pd.DataFrame(rows, columns=["q_pct", "est_value", "exact_value",
                                     "rank_err_bound", "within_bound"])
    df["digest_nodes"] = len(cnt)
    _write("qdigest_quantiles", sf_dir, df.astype(
        {c: "int64" for c in ["q_pct", "est_value", "exact_value",
                              "rank_err_bound", "digest_nodes"]}))



def merkle_diff(sf_dir: str) -> None:
    """Independent recursive Merkle mirror of merkle_replica_diff:
    dict-of-buckets accumulation, recursive compare (vs the engine's
    vectorized level arrays + explicit stack); only the written spec
    (bucket = (id//8)%64, content key = md5[:8]+id mod 2^64, combine
    l*1000003 + r*999983, planted %97/%101 rules) is shared."""
    import hashlib as _hl

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    acc: dict = {}
    for d, txt in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
        d = int(d)
        sh, bu = d % 8, (d // 8) % 64
        ka = (int.from_bytes(_hl.md5(txt.encode()).digest()[:8], "big") + d) % (1 << 64)
        in_b = d % 101 != 7
        tb = txt + "~tampered" if d % 97 == 5 else txt
        kb = ((int.from_bytes(_hl.md5(tb.encode()).digest()[:8], "big") + d) % (1 << 64)) if in_b else 0
        r = acc.setdefault((sh, bu), [0, 0, 0, 0, 0])
        r[0] = (r[0] + ka) % (1 << 64)
        r[1] = (r[1] + kb) % (1 << 64)
        r[2] += 1
        r[3] += 1 if in_b else 0
        r[4] += 1 if (not in_b or kb != ka) else 0
    rows = []
    for sh in range(8):
        la = [acc.get((sh, b), [0] * 5)[0] for b in range(64)]
        lb = [acc.get((sh, b), [0] * 5)[1] for b in range(64)]

        def levels(ls):
            out = [ls]
            while len(out[-1]) > 1:
                cur = out[-1]
                out.append([(cur[j] * 1000003 + cur[j + 1] * 999983) % (1 << 64)
                            for j in range(0, len(cur), 2)])
            return out[::-1]

        ta, tbl = levels(la), levels(lb)
        comps = [0]
        div = [0]

        def walk(lvl, idx):
            comps[0] += 1
            if ta[lvl][idx] == tbl[lvl][idx]:
                return
            if lvl == len(ta) - 1:
                div[0] += 1
                return
            walk(lvl + 1, 2 * idx)
            walk(lvl + 1, 2 * idx + 1)

        # engine pops a LIFO stack seeded (left, right) -> visits left
        # subtree first; recursion left-then-right matches the COUNT
        walk(0, 0)
        na = sum(acc.get((sh, b), [0] * 5)[2] for b in range(64))
        nb = sum(acc.get((sh, b), [0] * 5)[3] for b in range(64))
        nd = sum(acc.get((sh, b), [0] * 5)[4] for b in range(64))
        rows.append((sh, ta[0][0] == tbl[0][0], na, nb, nd, div[0], comps[0]))
    _write("merkle_diff", sf_dir, pd.DataFrame(rows, columns=[
        "shard", "root_equal", "n_docs_a", "n_docs_b", "n_diverged_docs",
        "n_diverged_buckets", "n_node_comparisons"]).astype(
        {c: "int64" for c in ["shard", "n_docs_a", "n_docs_b",
                              "n_diverged_docs", "n_diverged_buckets",
                              "n_node_comparisons"]}))



def pgm_segments(sf_dir: str) -> None:
    """Independent PGM mirror: fractions.Fraction slope intervals (vs
    the engine's int cross-multiplication), single serial pass per day
    bucket; only the written spec (day buckets, eps set, greedy close
    rule) is shared."""
    from fractions import Fraction

    t = pq.read_table(f"{sf_dir}/events.parquet", columns=["ts"])
    ts = np.unique(t.column("ts").cast("int64").to_numpy())
    days: dict = {}
    for x in ts.tolist():
        days.setdefault(x // 86_400_000_000, []).append(x)
    rows = []
    for eps in (4, 16, 64):
        total_keys = 0
        total_segs = 0
        for day in sorted(days):
            ks = days[day]
            total_keys += len(ks)
            if not ks:
                continue
            segs, start = 1, 0
            lo, hi = None, None  # None = unbounded
            for j in range(1, len(ks)):
                dx = ks[j] - ks[start]
                nl = Fraction(j - start - eps, dx)
                nh = Fraction(j - start + eps, dx)
                lo = nl if lo is None or nl > lo else lo
                hi = nh if hi is None or nh < hi else hi
                if lo > hi:
                    segs += 1
                    start = j
                    lo, hi = None, None
            total_segs += segs
        rows.append((eps, total_keys, total_segs))
    _write("pgm_segments", sf_dir, pd.DataFrame(
        rows, columns=["eps", "n_keys", "n_segments"]).astype("int64"))



def dgim_counts(sf_dir: str) -> None:
    """Independent DGIM mirror: deque-based exponential histogram
    (collections.deque, size-indexed counter dict) vs the engine's
    list insert/merge; only the written spec (≤2 buckets per size,
    merge two oldest stamped with the newer ts, half-the-straddler
    query rule, 3-day window from the 2024-02-01 anchor) is shared."""
    from collections import deque

    t = pq.read_table(f"{sf_dir}/events.parquet",
                      columns=["user_id", "event_id", "ts"])
    df = t.to_pandas().sort_values(["user_id", "ts", "event_id"],
                                   kind="mergesort")
    anchor = int(pd.Timestamp("2024-02-01 00:00:00").value // 1000)
    cutoff = anchor - 3 * 86_400_000_000
    rows = []
    for uid, gg in df.groupby("user_id", sort=True):
        ts = gg["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        buckets = deque()  # oldest first: (ts, size)
        for x in ts.tolist():
            buckets.append((int(x), 1))
            size = 1
            while True:
                idx = [k for k, b in enumerate(buckets) if b[1] == size]
                if len(idx) <= 2:
                    break
                a, b = idx[0], idx[1]  # two OLDEST of this size
                newer = buckets[b][0]
                bl = list(buckets)
                bl[a] = (newer, size * 2)
                del bl[b]
                buckets = deque(bl)
                size *= 2
        exact = int((ts >= cutoff).sum())
        qual = [b for b in buckets if b[0] >= cutoff]
        if not qual:
            est = 0
        elif len(qual) == len(buckets):
            est = sum(s for _, s in qual)
        else:
            est = sum(s for _, s in qual[1:]) + (qual[0][1] + 1) // 2
        ok = 2 * abs(est - exact) <= exact if exact else est == 0
        rows.append((int(uid), len(ts), exact, est, len(buckets), bool(ok)))
    _write("dgim_counts", sf_dir, pd.DataFrame(rows, columns=[
        "user_id", "n_events", "exact_in_window", "dgim_estimate",
        "n_buckets", "within_bound"]).astype(
        {c: "int64" for c in ["user_id", "n_events", "exact_in_window",
                              "dgim_estimate", "n_buckets"]}))


ALL = [dgim_counts, pgm_segments, merkle_diff, qdigest_quantiles, lsh_sweep, dihedral_dup_pairs, cdc_chunks, hyperball_counts, ann_ivf_topk, embedding_pairs, minhash_pairs, simhash_clusters, recrawl_counts, version_latest, image_resize_stats, update_counts, boilerplate_main, simhash_sigs, quality_fp, image_stats, search_seeds, crawl_frontier_counts,
       parse_entity_counts, mailbox_counts, newsgroup_counts, api_rotation, hll_counts, phash_sigs,
       kmeans_clusters, semdedup_keep, alignment_inputs, bpe_merges, bpe_encoded,
       image_sharpness, image_borders, video_scene_cuts_golden, audio_quality,
       video_frame_stats, audio_window_stats, video_dup_pairs, audio_dup_pairs,
       video_prep_stats, image_dims, patch_stats, source_minhash, bloom_probe_golden, norm_text, gram_top_component, term_canon, image_augment, image_quality, mirror_dup_pairs, channel_moments, tile_crop_pairs, dominant_colors, ssim_pairs, image_otsu, image_palette, image_regions, ann_pq_topk, ann_ivfpq_topk, hll_intersection]


def main() -> None:
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.001"]
    for sf in sf_dirs:
        for fn in ALL:
            fn(sf)


if __name__ == "__main__":
    main()



def gradient_census(sf_dir: str) -> None:
    """Longhand mirror of image_gradient_orientation: the PLANT
    (doc_id % 4 stripes/ramp/noise) is shared with the query by
    design, but the MEASURE — gray conversion, forward differences,
    L1 magnitude, and the 4-way orientation rules — is restated with
    explicit per-pixel loops and literal if/elif branches, so a
    stage-side vectorization or rule drift fails the gate."""
    from crawlerframework_ray.data import codecs
    from crawlerframework_ray.data.synth import SynthWebConfig, make_url, page_record
    from crawlerframework_ray.pipelines.queries import _plant_gradient

    cfg = SynthWebConfig(seed=42, n_hosts=8, path_space=1 << 20)
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    ids = [int(x) for x in t.column("doc_id").to_pylist()][:512]
    rows = []
    for d in ids:
        rec = page_record(make_url(d % 8, d), cfg)
        img = _plant_gradient(codecs.decode(rec["bytes"], rec["fmt"]), d)
        hh, ww = img.shape[0], img.shape[1]
        g = [[(int(img[y, x, 0]) + int(img[y, x, 1]) + int(img[y, x, 2])) // 3
              for x in range(ww)] for y in range(hh)]
        sh = sv = sd = sa = nf = tot = 0
        for y in range(hh - 1):
            for x in range(ww - 1):
                gx = g[y][x + 1] - g[y][x]
                gy = g[y + 1][x] - g[y][x]
                mag = abs(gx) + abs(gy)
                tot += mag
                if gx == 0 and gy == 0:
                    nf += 1
                elif abs(gx) > abs(gy):
                    sh += mag
                elif abs(gy) > abs(gx):
                    sv += mag
                elif gx * gy > 0:
                    sd += mag
                else:
                    sa += mag
        rows.append((rec["image_id"], sh, sv, sd, sa, nf, tot))
    _write(
        "gradient_census", sf_dir,
        pd.DataFrame(rows, columns=[
            "image_id", "sum_h", "sum_v", "sum_d", "sum_a", "n_flat",
            "edge_energy"]).astype(
            {c: "int64" for c in ["sum_h", "sum_v", "sum_d", "sum_a",
                                  "n_flat", "edge_energy"]}),
    )


ALL.append(gradient_census)


def haar_energy(sf_dir: str) -> None:
    """Longhand mirror of haar_subband_energy: the PLANT (doc_id % 4
    ramp/checkerboard/stripes/noise) is shared by design; the MEASURE
    — gray conversion, the two 2×2 butterfly levels and the squared
    energies — is restated with explicit per-block loops and literal
    formulas, so a stage-side butterfly or indexing drift fails the
    gate."""
    from crawlerframework_ray.data import codecs
    from crawlerframework_ray.data.synth import SynthWebConfig, make_url, page_record
    from crawlerframework_ray.pipelines.queries import _plant_haar

    cfg = SynthWebConfig(seed=42, n_hosts=8, path_space=1 << 20)
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    ids = [int(x) for x in t.column("doc_id").to_pylist()][:512]

    def level(g):
        hh, ww = len(g), len(g[0])
        ll = [[0] * (ww // 2) for _ in range(hh // 2)]
        lh = [[0] * (ww // 2) for _ in range(hh // 2)]
        hl = [[0] * (ww // 2) for _ in range(hh // 2)]
        hhb = [[0] * (ww // 2) for _ in range(hh // 2)]
        for y in range(0, hh, 2):
            for x in range(0, ww, 2):
                a, b = g[y][x], g[y][x + 1]
                c, d = g[y + 1][x], g[y + 1][x + 1]
                ll[y // 2][x // 2] = a + b + c + d
                lh[y // 2][x // 2] = (a + b) - (c + d)
                hl[y // 2][x // 2] = (a - b) + (c - d)
                hhb[y // 2][x // 2] = (a - b) - (c - d)
        return ll, lh, hl, hhb

    def energy(m):
        return sum(v * v for row in m for v in row)

    rows = []
    for d in ids:
        rec = page_record(make_url(d % 8, d), cfg)
        img = _plant_haar(codecs.decode(rec["bytes"], rec["fmt"]), d)
        hh, ww = img.shape[0], img.shape[1]
        g = [[(int(img[y, x, 0]) + int(img[y, x, 1]) + int(img[y, x, 2])) // 3
              for x in range(ww)] for y in range(hh)]
        ll1, lh1, hl1, hh1 = level(g)
        ll2, lh2, hl2, hh2 = level(ll1)
        rows.append((rec["image_id"], energy(ll2), energy(lh1), energy(hl1),
                     energy(hh1), energy(lh2), energy(hl2), energy(hh2)))
    _write(
        "haar_energy", sf_dir,
        pd.DataFrame(rows, columns=[
            "image_id", "e_ll2", "e_lh1", "e_hl1", "e_hh1", "e_lh2",
            "e_hl2", "e_hh2"]).astype(
            {c: "int64" for c in ["e_ll2", "e_lh1", "e_hl1", "e_hh1",
                                  "e_lh2", "e_hl2", "e_hh2"]}),
    )


ALL.append(haar_energy)


def recompress_drift(sf_dir: str) -> None:
    """Longhand mirror of image_recompress_drift: the PLANT (the
    synthetic page store's images) is shared by design; the MEASURE
    restates the qds 6-bit quantize→reconstruct roundtrip with
    explicit per-pixel integer loops (q = p // 4; r = 4q + 2 —
    independent of codecs.encode_qds/decode_qds's vectorized
    shift path), then hashes with the library average_hash (shared
    measure, same tier as phash_sigs) and counts hamming drift via
    bin() popcount."""
    from crawlerframework_ray.data import codecs
    from crawlerframework_ray.data.imageops import average_hash
    from crawlerframework_ray.data.synth import SynthWebConfig, make_url, page_record

    cfg = SynthWebConfig(seed=42, n_hosts=8, path_space=1 << 20)
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    ids = [int(x) for x in t.column("doc_id").to_pylist()][:512]
    agg: dict = {}
    for d in ids:
        rec = page_record(make_url(d % 8, d), cfg)
        img = codecs.decode(rec["bytes"], rec["fmt"])
        hh, ww = img.shape[0], img.shape[1]
        recon = np.zeros_like(img)
        for y in range(hh):
            for x in range(ww):
                for c in range(3):
                    q = int(img[y, x, c]) // 4
                    recon[y, x, c] = 4 * q + 2
        h0 = average_hash(img)
        h1 = average_hash(recon)
        ham = bin((int(h0) ^ int(h1)) & 0xFFFFFFFFFFFFFFFF).count("1")
        a = agg.setdefault(rec["fmt"], [0, 0, 0, 0, 0])
        a[0] += 1
        if ham == 0:
            a[1] += 1
        elif ham <= 2:
            a[2] += 1
        else:
            a[3] += 1
        a[4] += ham
    rows = [(fmt, *vals) for fmt, vals in sorted(agg.items())]
    _write(
        "recompress_drift", sf_dir,
        pd.DataFrame(rows, columns=[
            "fmt", "n_images", "n_ham0", "n_ham_1_2", "n_ham_gt2",
            "sum_hamming"]).astype(
            {c: "int64" for c in ["n_images", "n_ham0", "n_ham_1_2",
                                  "n_ham_gt2", "sum_hamming"]}),
    )


ALL.append(recompress_drift)
