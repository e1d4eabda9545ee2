"""Per-epoch checkpoint with lineage metadata.

The reference persisted its queue in BerkeleyDB (priorityqueue.py:23-36)
and its per-URL state in pickled task_logs (baseconnector.py:948-965);
resume meant reloading both. Here a checkpoint is an explicit per-epoch
directory:

    <workdir>/ckpt/epoch=NNNN/
        frontier/            next-epoch frontier (parquet dir, atomic)
        shards/shard_NN.bin  serialized cuckoo shard + exact added ids
        manifest.json        written LAST (tmp+rename): epoch, shard
                             digests, counters, config fingerprint

    <workdir>/results/epoch=NNNN/   fetched rows (atomic, idempotent)

Resume = find the highest epoch whose manifest exists and is complete,
restore shards, read that frontier, continue at epoch+1. Because every
stage is deterministic given (frontier, shard state), the resumed run
is bit-identical to an uninterrupted one — the survey's §7.4 gate.
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


def _pack_shard(blob: bytes, added: list[bytes], epoch: int) -> bytes:
    head = struct.pack("<iII", epoch, len(blob), len(added))
    return head + blob + b"".join(added)


def _unpack_shard(data: bytes) -> tuple[bytes, list[bytes], int]:
    epoch, blen, n_added = struct.unpack_from("<iII", data, 0)
    off = struct.calcsize("<iII")
    blob = data[off : off + blen]
    off += blen
    added = [data[off + 16 * i : off + 16 * (i + 1)] for i in range(n_added)]
    return blob, added, epoch


def write_checkpoint(
    workdir: str,
    epoch: int,
    shard_states: list[tuple[bytes, list[bytes], int]],
    digests: list[str],
    counters: dict,
    config_fingerprint: str,
) -> None:
    d = epoch_dir(workdir, epoch)
    shard_d = os.path.join(d, "shards")
    os.makedirs(shard_d, exist_ok=True)
    for i, (blob, added, shard_epoch) in enumerate(shard_states):
        tmp = os.path.join(shard_d, f".tmp-{uuid.uuid4().hex[:8]}")
        with open(tmp, "wb") as f:
            f.write(_pack_shard(blob, added, shard_epoch))
        os.replace(tmp, os.path.join(shard_d, f"shard_{i:02d}.bin"))
    manifest = {
        "epoch": epoch,
        "n_shards": len(shard_states),
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


def load_shards(workdir: str, epoch: int, n_shards: int) -> list[tuple[bytes, list[bytes], int]]:
    shard_d = os.path.join(epoch_dir(workdir, epoch), "shards")
    out = []
    for i in range(n_shards):
        with open(os.path.join(shard_d, f"shard_{i:02d}.bin"), "rb") as f:
            out.append(_unpack_shard(f.read()))
    return out
