"""Parser plugin registry + connector dispatch (operators M2/M15 and
the §2.10 user-extension surface).

The reference dispatched each URL to one of ~330 site connectors by
longest-suffix domain match (crawler/connectors/connectionfactory.py:
29-112), each a BeautifulSoup grammar populating page dicts with
dynamically-typed ``et_/ei_/ef_/edate_`` entity fields
(baseconnector.py:896-928). Here that surface is:

- ``ParserPlugin``: ``host_suffix`` + ``parse(batch) -> batch`` adding
  ``entity`` and a typed ``entities`` map column. Parsers are
  *vectorized over the batch*, not row callbacks.
- ``ParserRegistry``: longest-suffix host dispatch, generic fallback —
  the M2 semantics. The registry is built once per worker (broadcast
  by closure), and a batch is split by matched parser so each parser
  still runs vectorized.

Three synthetic grammars stand in for the 330 site connectors: the
point is the dispatch + typed-extraction machinery, not scrapers.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import pyarrow as pa


@dataclass(frozen=True)
class ParserPlugin:
    name: str
    host_suffix: str  # "" = generic fallback
    # parse receives the rows matched to it (pyarrow) and returns a
    # same-length table with at least (entity:string, entities:map cols)
    parse: Callable[[pa.Table], pa.Table]


def _entities_column(pairs_per_row: list[list[tuple[str, str]]]) -> pa.Array:
    """Typed-by-prefix entity map (et_*=text, ei_*=int, ef_*=float,
    edate_*=date — the reference's EAV prefix table) as a map column."""
    return pa.array(pairs_per_row, type=pa.map_(pa.string(), pa.string()))


def forum_parse(batch: pa.Table) -> pa.Table:
    """'Forum' grammar: entity=post, extracts word count + first word."""
    caps = batch.column("caption").to_pylist()
    ents = [
        [("ei_word_count", str(len(c.split()))), ("et_first_word", c.split()[0] if c else "")]
        for c in caps
    ]
    batch = batch.append_column("entity", pa.array(["post"] * len(caps), pa.string()))
    return batch.append_column("entities", _entities_column(ents))


def news_parse(batch: pa.Table) -> pa.Table:
    """'News' grammar: entity=article, extracts posted date + caption length score."""
    caps = batch.column("caption").to_pylist()
    ts = batch.column("posted_ts").to_pylist() if "posted_ts" in batch.schema.names else [None] * len(caps)
    ents = [
        [("edate_posted", str(t) if t is not None else ""), ("ef_len_score", str(round(min(len(c) / 64.0, 1.0), 4)))]
        for c, t in zip(caps, ts)
    ]
    batch = batch.append_column("entity", pa.array(["article"] * len(caps), pa.string()))
    return batch.append_column("entities", _entities_column(ents))


def generic_parse(batch: pa.Table) -> pa.Table:
    """GenericConnector fallback (genericconnector.py:39-76): entity=page."""
    n = len(batch)
    batch = batch.append_column("entity", pa.array(["page"] * n, pa.string()))
    return batch.append_column("entities", _entities_column([[] for _ in range(n)]))


DEFAULT_PLUGINS = (
    ParserPlugin("forum", "h0.example.test", forum_parse),
    ParserPlugin("forum", "h1.example.test", forum_parse),
    ParserPlugin("news", "example.test", news_parse),  # broader suffix — lower precedence
    ParserPlugin("generic", "", generic_parse),
)


class ParserRegistry:
    def __init__(self, plugins=DEFAULT_PLUGINS):
        # longest suffix wins (connectionfactory.py fuzzy match order)
        self.plugins = sorted(plugins, key=lambda p: -len(p.host_suffix))

    def match(self, host: str) -> ParserPlugin:
        for p in self.plugins:
            if p.host_suffix == "" or host == p.host_suffix or host.endswith("." + p.host_suffix):
                return p
        return self.plugins[-1]

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Dispatch a batch: split rows by matched parser, run each
        parser vectorized on its slice, re-concatenate. The split is
        keyed by plugin IDENTITY (its position in the registry), not its
        name — two same-named plugins with different host suffixes must
        not collapse into one group."""
        if len(batch) == 0:
            empty = batch.append_column("entity", pa.array([], pa.string()))
            return empty.append_column("entities", _entities_column([]))
        hosts = batch.column("host").to_pylist()
        groups: dict[int, list[int]] = {}
        for i, h in enumerate(hosts):
            p = self.match(h)
            groups.setdefault(self.plugins.index(p), []).append(i)
        parts = []
        for pidx, idx in groups.items():
            sub = batch.take(pa.array(idx, pa.int64()))
            parts.append(self.plugins[pidx].parse(sub))
        return pa.concat_tables(parts)


def parse_results(ds, plugins=DEFAULT_PLUGINS, batch_size: int = 2048):
    """Apply the parser registry over a results Dataset."""
    reg = ParserRegistry(plugins)
    return ds.map_batches(reg, batch_format="pyarrow", batch_size=batch_size)
