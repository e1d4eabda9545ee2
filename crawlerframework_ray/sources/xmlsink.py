"""K2 — job-XML export sink, Ray-Data-first.

The reference saved each finished task as one XML document — root
``<itb version="1.0">`` with task metadata, an ``<extractors>`` block,
and a ``<posts>`` list where every post carries its fixed fields as
child elements plus an ``<entities>`` list for the EAV ``et_/ei_/...``
prefixed columns — pushed to a date-partitioned HDFS path over thrift
(crawler/connectors/baseconnector.py:1014-1102 ``__saveToHDFS`` /
``__getJobXML``). The Ray-Data restatement keeps the DOCUMENT SHAPE
and drops the thrift plumbing: each ``map_batches`` task serializes
its batch to one standalone job XML (stdlib ElementTree — proper
escaping for free), written content-addressed into a partitioned
directory (atomic tmp+rename per part — a failed run re-runs only
missing parts; the same resumable-output contract as the parquet
checkpoints). ``generated_on`` is CALLER-SUPPLIED, not ``now()``:
determinism is what makes the round trip oracle-gated.

Scale shape: serialization is embarrassingly parallel (one XML per
block, no shuffle); payload bytes go straight from the task to its
part file and never transit the object store. Reading back streams
file paths through ``map_batches`` the same way.
"""

from __future__ import annotations

import hashlib
import os
import xml.etree.ElementTree as ET

import pandas as pd
import pyarrow as pa

# EAV entity-column prefixes, reference baseconnector.py prefix table
ENTITY_PREFIXES = {"et_": "text", "ei_": "integer", "edate_": "date", "ef_": "float"}


def job_xml_bytes(rows: pd.DataFrame, field_cols: list[str], *,
                  task_id: str, workspace_id: str, generated_on: str,
                  extractors: dict[str, dict[str, str]] | None = None) -> bytes:
    """One job XML for ``rows``: reference ``__getJobXML`` element
    shape. ``field_cols`` become per-post child elements; every column
    starting with an ENTITY_PREFIXES key becomes an ``<entity
    type=... name=...>`` element. Deterministic given its inputs."""
    root = ET.Element("itb", {"version": "1.0"})
    ET.SubElement(root, "taskID").text = task_id
    ET.SubElement(root, "workspaceID").text = workspace_id
    ET.SubElement(root, "generatedOn").text = generated_on
    ex = ET.SubElement(root, "extractors")
    for name in sorted(extractors or {}):
        e = ET.SubElement(ex, "extractor", {"name": name})
        params = extractors[name]
        for p in sorted(params):
            ET.SubElement(e, p).text = str(params[p])
    entity_cols = [
        (c, ENTITY_PREFIXES[pfx], c[len(pfx):])
        for c in rows.columns
        for pfx in ENTITY_PREFIXES
        if c.startswith(pfx)
    ]
    posts = ET.SubElement(root, "posts")
    for row in rows.itertuples(index=False):
        d = row._asdict()
        ps = ET.SubElement(posts, "post")
        for c in field_cols:
            ET.SubElement(ps, c).text = str(d[c])
        es = ET.SubElement(ps, "entities")
        for c, etype, ename in entity_cols:
            ET.SubElement(es, "entity", {"type": etype, "name": ename}).text = str(d[c])
    return ET.tostring(root, encoding="utf-8", xml_declaration=True)


def write_xml_parts(ds, out_dir: str, field_cols: list[str], *,
                    workspace_id: str = "ws-0", generated_on: str = "1970-01-01T00:00:00",
                    extractors: dict | None = None, batch_size: int = 4096):
    """Export ``ds`` as a directory of job-XML parts (one per batch,
    content-addressed name, atomic rename). Returns the consumed
    per-part manifest frame (part, n_posts) sorted by part name."""
    os.makedirs(out_dir, exist_ok=True)

    def write_part(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        blob = job_xml_bytes(
            df, field_cols,
            task_id=hashlib.md5(df.to_csv(index=False).encode()).hexdigest()[:16],
            workspace_id=workspace_id, generated_on=generated_on,
            extractors=extractors,
        )
        part = f"job-{hashlib.md5(blob).hexdigest()}.xml"
        tmp = os.path.join(out_dir, f".{part}.tmp")
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, os.path.join(out_dir, part))
        return pa.table({"part": pa.array([part], pa.string()),
                         "n_posts": pa.array([len(df)], pa.int64())})

    out = ds.map_batches(write_part, batch_format="pyarrow", batch_size=batch_size)
    return out.to_pandas().sort_values("part").reset_index(drop=True)


def read_xml_parts(out_dir: str, field_cols: list[str]):
    """Parse a job-XML part directory back into a Dataset of post rows
    (field columns as strings + the prefixed entity columns) — the
    import half of the round trip. Paths stream through map_batches;
    each task parses its own files."""
    import ray.data

    paths = sorted(
        os.path.join(out_dir, f) for f in os.listdir(out_dir) if f.endswith(".xml")
    )

    def parse(t: pa.Table) -> pd.DataFrame:
        frames = []
        for p in t.column("path").to_pylist():
            root = ET.parse(p).getroot()
            rows = []
            for ps in root.find("posts"):
                d = {c: ps.find(c).text for c in field_cols}
                for e in ps.find("entities"):
                    pfx = next(k for k, v in ENTITY_PREFIXES.items() if v == e.get("type"))
                    d[pfx + e.get("name")] = e.text
                rows.append(d)
            frames.append(pd.DataFrame(rows))
        return pd.concat(frames, ignore_index=True) if frames else pd.DataFrame()

    return ray.data.from_items([{"path": p} for p in paths]).map_batches(
        parse, batch_format="pyarrow"
    )
