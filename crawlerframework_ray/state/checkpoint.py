"""Per-epoch checkpoint with lineage metadata.

The reference persisted its queue in BerkeleyDB (priorityqueue.py:23-36)
and its per-URL state in pickled task_logs (baseconnector.py:948-965);
resume meant reloading both. Here a checkpoint is an explicit per-epoch
directory:

    <workdir>/ckpt/epoch=NNNN/
        frontier/            next-epoch frontier (parquet dir, atomic)
        deltas/shard_NN.bin  the epoch's sealed fresh-id DELTAS per shard
        manifest.json        written LAST (tmp+rename): epoch, shard
                             digests, counters, config fingerprint

    <workdir>/results/epoch=NNNN/   fetched rows (atomic, idempotent)

Shard state is checkpointed as DELTAS, not full filter images: cuckoo
state is a pure function of the ordered sequence of per-seal sorted
insert sets (state/cuckoo.py's canonical-insert discipline), so storing
each epoch's fresh ids (~16 B/url) reconstructs the filter exactly —
no 10s-of-MB full-table serialization per epoch on the hot path.
Resume = find the highest epoch whose manifest exists, REPLAY the delta
chain 0..e into fresh filters, read that frontier, continue at epoch+1.
The per-shard sha256 digests recorded in every manifest are computed
against the live filters, so replay correctness is verifiable. At
10^10-URL scale the chain would be bounded by writing a full filter
snapshot every K epochs and replaying only the tail — the delta format
below is forward-compatible with that (a snapshot is just a delta chain
prefix compaction).

Because every stage is deterministic given (frontier, shard state), the
resumed run is bit-identical to an uninterrupted one — SURVEY §7.4.
"""

from __future__ import annotations

import json
import os
import struct
import uuid


def epoch_dir(workdir: str, epoch: int) -> str:
    return os.path.join(workdir, "ckpt", f"epoch={epoch:04d}")


def results_dir(workdir: str, epoch: int) -> str:
    return os.path.join(workdir, "results", f"epoch={epoch:04d}")


def _pack_deltas(log: list[tuple[int, list[bytes]]]) -> bytes:
    out = [struct.pack("<I", len(log))]
    for seal_epoch, ids in log:
        out.append(struct.pack("<iI", seal_epoch, len(ids)))
        out.extend(ids)
    return b"".join(out)


def _unpack_deltas(data: bytes) -> list[tuple[int, list[bytes]]]:
    (n_entries,) = struct.unpack_from("<I", data, 0)
    off = 4
    log = []
    for _ in range(n_entries):
        seal_epoch, n_ids = struct.unpack_from("<iI", data, off)
        off += 8
        ids = [data[off + 16 * i : off + 16 * (i + 1)] for i in range(n_ids)]
        off += 16 * n_ids
        log.append((seal_epoch, ids))
    return log


def write_checkpoint(
    workdir: str,
    epoch: int,
    shard_deltas: list[list[tuple[int, list[bytes]]]],
    digests: list[str],
    counters: dict,
    config_fingerprint: str,
    shard_capacity: int,
) -> None:
    """``shard_deltas``: per shard, the (seal_epoch, sorted fresh ids)
    entries sealed since the previous checkpoint (normally one entry;
    two on the first checkpoint of a fresh run — the seed seal plus
    epoch 0's seal)."""
    d = epoch_dir(workdir, epoch)
    delta_d = os.path.join(d, "deltas")
    os.makedirs(delta_d, exist_ok=True)
    for i, log in enumerate(shard_deltas):
        tmp = os.path.join(delta_d, f".tmp-{uuid.uuid4().hex[:8]}")
        with open(tmp, "wb") as f:
            f.write(_pack_deltas(log))
        os.replace(tmp, os.path.join(delta_d, f"shard_{i:02d}.bin"))
    manifest = {
        "epoch": epoch,
        "n_shards": len(shard_deltas),
        "shard_capacity": shard_capacity,
        "shard_digests": digests,
        "counters": counters,
        "config_fingerprint": config_fingerprint,
        "complete": True,
    }
    tmp = os.path.join(d, f".manifest-{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(d, "manifest.json"))


def load_manifest(workdir: str, epoch: int) -> dict | None:
    path = os.path.join(epoch_dir(workdir, epoch), "manifest.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        m = json.load(f)
    return m if m.get("complete") else None


def latest_epoch(workdir: str) -> int | None:
    """Highest epoch with a complete manifest, or None."""
    ckpt = os.path.join(workdir, "ckpt")
    if not os.path.isdir(ckpt):
        return None
    best = None
    for name in os.listdir(ckpt):
        if name.startswith("epoch="):
            e = int(name.split("=")[1])
            if load_manifest(workdir, e) is not None and (best is None or e > best):
                best = e
    return best


def _base_dir(workdir: str, epoch: int) -> str:
    return os.path.join(epoch_dir(workdir, epoch), "base")


def write_base_snapshot(workdir: str, epoch: int, n_shards: int) -> None:
    """Materialize the full per-shard seen states at ``epoch`` as a
    BASE SNAPSHOT (filter blob + sorted added ids + last seal epoch),
    making the delta chain below ``epoch`` redundant for every load at
    or above it. Built FROM ``load_shards`` — i.e. digest-verified
    against the epoch's manifest before a byte is written. Per-shard
    files land atomically; the ``complete.json`` marker lands LAST, so
    a crashed snapshot is simply ignored by readers."""
    shards = load_shards(workdir, epoch, n_shards)
    d = _base_dir(workdir, epoch)
    os.makedirs(d, exist_ok=True)
    for i, (blob, added, seal) in enumerate(shards):
        payload = (
            int(seal).to_bytes(8, "big", signed=True)
            + len(blob).to_bytes(8, "big")
            + blob
            + b"".join(added)  # fixed 16-byte ids, already sorted
        )
        tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex[:8]}")
        with open(tmp, "wb") as f:
            f.write(payload)
        os.replace(tmp, os.path.join(d, f"shard_{i:02d}.base"))
    tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as f:
        json.dump({"epoch": epoch, "n_shards": n_shards}, f)
    os.replace(tmp, os.path.join(d, "complete.json"))


def _load_base(workdir: str, epoch: int, n_shards: int):
    """(filters, added-sets, last_seal) from a complete base snapshot
    at ``epoch``, or None."""
    from .cuckoo import CuckooFilter

    d = _base_dir(workdir, epoch)
    if not os.path.exists(os.path.join(d, "complete.json")):
        return None
    filters, added, last_seal = [], [], []
    for i in range(n_shards):
        with open(os.path.join(d, f"shard_{i:02d}.base"), "rb") as f:
            data = f.read()
        seal = int.from_bytes(data[:8], "big", signed=True)
        blen = int.from_bytes(data[8:16], "big")
        blob = data[16 : 16 + blen]
        ids_blob = data[16 + blen :]
        filters.append(CuckooFilter.deserialize(blob))
        added.append({ids_blob[j : j + 16] for j in range(0, len(ids_blob), 16)})
        last_seal.append(seal)
    return filters, added, last_seal


def gc_checkpoints(workdir: str, keep_last: int = 1) -> dict:
    """Checkpoint retention: write a base snapshot at the retention
    floor (latest - keep_last + 1), then delete every older epoch's
    checkpoint dir — each holds a FULL frontier copy plus its delta
    files, the structure whose disk footprint grows with epochs ×
    frontier at a 10^10-URL crawl. Results partitions (the crawl
    OUTPUT, under ``results/``) are never touched. Resume and replay
    from any kept epoch are bit-identical: the base is digest-verified
    at write time and every later load still passes the manifest
    digest check (gated in tests/test_checkpoint.py). Idempotent and
    crash-safe at any point (marker-last snapshot; re-running finishes
    the deletions)."""
    import shutil

    latest = latest_epoch(workdir)
    if latest is None:
        return {"floor": None, "removed_epochs": 0}
    floor = latest - keep_last + 1
    if floor <= 0:
        return {"floor": 0, "removed_epochs": 0}
    manifest = load_manifest(workdir, floor)
    if manifest is None:
        raise FileNotFoundError(f"retention floor epoch {floor} has no complete manifest")
    write_base_snapshot(workdir, floor, manifest["n_shards"])
    removed = 0
    for e in range(floor):
        d = epoch_dir(workdir, e)
        if os.path.isdir(d):
            shutil.rmtree(d)
            removed += 1
    return {"floor": floor, "removed_epochs": removed}


def load_shards(workdir: str, epoch: int, n_shards: int) -> list[tuple[bytes, list[bytes], int]]:
    """Reconstruct full shard states at ``epoch`` by replaying the delta
    chain 0..epoch (canonical sorted inserts ⇒ bit-identical filters),
    starting from the newest complete BASE SNAPSHOT at or below
    ``epoch`` when one exists (post-GC layout). Returns (filter_blob,
    sorted added ids, last seal epoch) per shard — the same tuple
    ``SeenShard.restore`` consumes."""
    from .cuckoo import CuckooFilter

    manifest = load_manifest(workdir, epoch)
    if manifest is None:
        raise FileNotFoundError(f"no complete manifest for epoch {epoch}")
    capacity = manifest["shard_capacity"]
    start = 0
    filters = [CuckooFilter(capacity) for _ in range(n_shards)]
    added: list[set[bytes]] = [set() for _ in range(n_shards)]
    last_seal = [-1] * n_shards
    for e in range(epoch, -1, -1):
        base = _load_base(workdir, e, n_shards)
        if base is not None:
            filters, added, last_seal = base
            start = e + 1
            break
    for e in range(start, epoch + 1):
        delta_d = os.path.join(epoch_dir(workdir, e), "deltas")
        for i in range(n_shards):
            with open(os.path.join(delta_d, f"shard_{i:02d}.bin"), "rb") as f:
                for seal_epoch, ids in _unpack_deltas(f.read()):
                    filters[i].add_sorted(ids)
                    added[i].update(ids)
                    last_seal[i] = seal_epoch
    # the manifest's per-shard digests are what makes replay correctness
    # verifiable: a truncated/corrupted delta file must fail here, not
    # resume into divergent dedup state
    expected = manifest.get("shard_digests")
    if expected is not None:
        for i in range(n_shards):
            got = filters[i].digest()
            if got != expected[i]:
                raise ValueError(
                    f"checkpoint replay mismatch: shard {i} digest {got} != "
                    f"manifest {expected[i]} (corrupted delta chain?)"
                )
    return [
        (filters[i].serialize(), sorted(added[i]), last_seal[i]) for i in range(n_shards)
    ]
