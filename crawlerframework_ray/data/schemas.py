"""Arrow schemas for the engine's tables.

Derived from the reference's data model (SURVEY.md §1.5 mapping table):
the reference ``Task`` (crawler/utils/task.py:13-111) becomes a frontier
row; the ``Page`` dict (crawler/connectors/htmlconnector.py:126-152)
becomes a results row whose payload follows BASELINE.json input_hint
exactly: ``(image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
caption:string, phash:int64)``.
"""

from __future__ import annotations

import pyarrow as pa

# The frontier: one row per pending URL task.
# reference: Task fields crawler/utils/task.py:23-50; priority semantics
# crawler/utils/taskmanager.py:156-163; level cap crawler.cfg:197-198.
FRONTIER_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),          # derived; the partition key
        ("depth", pa.int32()),          # reference `level`
        ("priority", pa.int32()),       # 1 = highest (on-demand), 97 = daily
        ("score", pa.float32()),        # tie-break score, descending
        ("task_id", pa.binary(16)),     # md5(url|priority) — dedup key,
                                        # reference taskmanager.py:363-383
        ("epoch", pa.int32()),          # wave the row was enqueued in
        ("parent_url", pa.string()),    # lineage (reference parent_task_id)
        ("times_reenqueued", pa.int32()),
    ]
)

# Payload columns — exactly input_hint.
PAYLOAD_FIELDS = [
    ("image_id", pa.string()),
    ("bytes", pa.binary()),
    ("w", pa.int32()),
    ("h", pa.int32()),
    ("fmt", pa.string()),
    ("caption", pa.string()),
    ("phash", pa.int64()),
]

# Results: payload + crawl lineage (reference Page core fields §1.2).
RESULTS_SCHEMA = pa.schema(
    PAYLOAD_FIELDS
    + [
        ("url", pa.string()),
        ("host", pa.string()),
        ("depth", pa.int32()),
        ("priority", pa.int32()),
        ("epoch", pa.int32()),
        ("fetch_status", pa.string()),
        ("content_hash", pa.binary(16)),   # D4 change-detection hash
        ("posted_ts", pa.timestamp("us")),
        ("n_outlinks", pa.int32()),
    ]
)

# The synthetic page store (fetch oracle), FIXTURES.md F1.
PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
    ]
    + PAYLOAD_FIELDS
    + [
        ("outlinks", pa.list_(pa.string())),
        ("posted_ts", pa.timestamp("us")),
    ]
)

# Seen-state checkpoint rows (session_info analogue, SURVEY.md §1.3).
SEEN_STATE_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("content_hash", pa.binary(16)),
        ("watermark_ts", pa.timestamp("us")),
        ("epoch_added", pa.int32()),
    ]
)
