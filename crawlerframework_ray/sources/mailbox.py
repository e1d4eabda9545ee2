"""Mail / news watermark-pull sources (operators S7 POP/IMAP, S8 NNTP).

The reference polled mailboxes and newsgroups incrementally: POP UIDL
lists filtered against the last-seen uid (crawler/connectors/
popconnector.py:19-149), IMAP UID ranges (imapconnector.py:20-143) and
NNTP article number ranges per group (nntpconnector.py:28-171) — all
instances of ONE pattern: a per-source monotone watermark, a bounded
pull of items above it, and a carried high-watermark.

Ray-native shape: the account/group list is a tiny Dataset; each row
expands to its new messages INSIDE ``map_batches`` (one task per
source batch — the protocol session would live per worker process), so
a million mailboxes fan out across the cluster with no driver loop.
The "server" is deterministic synthetic state: message uid/article
counts and bodies are pure functions of (seed, account, uid).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

from ..data.synth import WORDS

MESSAGE_SCHEMA = pa.schema(
    [
        ("account", pa.string()),
        ("folder", pa.string()),
        ("uid", pa.int64()),
        ("ts_us", pa.int64()),
        ("subject", pa.string()),
        ("body", pa.string()),
    ]
)

_BASE_US = 1_577_836_800_000_000  # 2020-01-01
FOLDERS = ("inbox", "lists", "alerts")


def mailbox_size(account: str, seed: int) -> int:
    """Current highest uid on the synthetic server (8-40 messages)."""
    d = hashlib.sha256(f"{seed}|mbox|{account}".encode()).digest()
    return 8 + d[0] % 33


def synth_message(account: str, uid: int, seed: int) -> dict:
    d = hashlib.sha256(f"{seed}|msg|{account}|{uid}".encode()).digest()
    n = 3 + d[0] % 6
    words = [WORDS[int.from_bytes(d[1 + 2 * i : 3 + 2 * i], "little") % len(WORDS)] for i in range(n)]
    return {
        "account": account,
        "folder": FOLDERS[d[15] % len(FOLDERS)],
        "uid": uid,
        "ts_us": _BASE_US + uid * 3_600_000_000 + d[14] * 1000,
        "subject": " ".join(words[:2]),
        "body": " ".join(words),
    }


def pull_messages(account: str, last_uid: int, seed: int, max_items: int = 50) -> list[dict]:
    """The watermark pull: messages with uid > last_uid, bounded batch
    (the reference's num_results=50 analogue). POP/IMAP/NNTP differ
    only in how uid is named (UIDL / UID / article number)."""
    top = mailbox_size(account, seed)
    return [synth_message(account, u, seed) for u in range(last_uid + 1, min(top, last_uid + max_items) + 1)]


def mail_pull_stage(seed: int, max_items: int = 50):
    """map_batches callable over (account, last_uid) rows → new message
    rows. Session state (a real POP/IMAP connection) would live per
    worker process, exactly like the fetcher's page-store handle."""

    def fn(batch: pa.Table) -> pa.Table:
        rows: list[dict] = []
        for account, last_uid in zip(
            batch.column("account").to_pylist(), batch.column("last_uid").to_pylist()
        ):
            rows.extend(pull_messages(account, int(last_uid), seed, max_items))
        cols = {name: [r[name] for r in rows] for name in MESSAGE_SCHEMA.names}
        return pa.table(cols, schema=MESSAGE_SCHEMA)

    return fn


def read_mailboxes(accounts: list[str], seed: int, last_uids: dict[str, int] | None = None):
    """Dataset of all new messages across accounts (one distributed
    pull). Returns (dataset, watermark fn input)."""
    import ray.data

    last_uids = last_uids or {}
    src = pa.table(
        {
            "account": pa.array(accounts, pa.string()),
            "last_uid": pa.array([int(last_uids.get(a, 0)) for a in accounts], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(src)
    if len(accounts) > 8:
        ds = ds.repartition(max(2, len(accounts) // 8))
    return ds.map_batches(mail_pull_stage(seed), batch_format="pyarrow", batch_size=8)


# ---------------------------------------------------------------- NNTP

def group_range(group: str, seed: int) -> tuple[int, int]:
    """(first, last) article numbers for a newsgroup — the reference
    asked the server for the group's range then walked it in chunks."""
    d = hashlib.sha256(f"{seed}|nntp|{group}".encode()).digest()
    first = 1 + d[1] % 5
    return first, first + 6 + d[0] % 28


def read_newsgroups(groups: list[str], seed: int, last_articles: dict[str, int] | None = None):
    """Same watermark-pull shape over article ranges: each group row
    expands to articles in (last_seen, last]."""
    import ray.data

    last_articles = last_articles or {}
    rows = []
    for g in groups:
        first, last = group_range(g, seed)
        rows.append({"account": g, "last_uid": max(first - 1, int(last_articles.get(g, 0)))})
    src = pa.table(
        {
            "account": pa.array([r["account"] for r in rows], pa.string()),
            "last_uid": pa.array([r["last_uid"] for r in rows], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(src)

    def fn(batch: pa.Table) -> pa.Table:
        out: list[dict] = []
        for group, last_seen in zip(
            batch.column("account").to_pylist(), batch.column("last_uid").to_pylist()
        ):
            _, top = group_range(group, seed)
            for art in range(int(last_seen) + 1, top + 1):
                m = synth_message(group, art, seed)
                m["folder"] = "news"
                out.append(m)
        cols = {name: [r[name] for r in out] for name in MESSAGE_SCHEMA.names}
        return pa.table(cols, schema=MESSAGE_SCHEMA)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=8)
