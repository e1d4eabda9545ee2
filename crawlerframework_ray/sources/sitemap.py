"""Sitemap-protocol seeder (S-family source, SURVEY.md §2.1).

The reference seeds frontiers from XML feeds: ``RSSConnector.fetch``
parses a feed document and emits its item links as crawl tasks
(crawler/connectors/rssconnector.py:27-94). The sitemaps.org protocol
is the crawler-native generalization of that pattern — every serious
tier crawl reads ``/sitemap.xml`` before walking links, because it
carries the site's own url inventory plus recrawl hints (``lastmod``,
``changefreq``, ``priority``).

Ray-native form: sitemap documents are ROWS (host, xml) in a Dataset —
one document per host, built wherever the host's url inventory is
already co-located (a ``map_groups`` over the host key) — and parsing
is an embarrassingly-parallel ``map_batches`` that explodes each
document into seed rows. No driver-side XML ever exists; a 10^6-host
sitemap sweep is just a Dataset of 10^6 small XML strings flowing
through the same two stages.

Numeric hygiene: ``priority`` is a one-decimal string per the protocol
("0.1".."1.0"); it is parsed into exact integer milli-units by string
splitting (``a*1000 + b*100``), never ``float()``, so the oracle can
reproduce it with integer arithmetic.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

SITEMAP_NS = "http://www.sitemaps.org/schemas/sitemap/0.9"

CHANGEFREQS = ("daily", "weekly", "monthly", "yearly")


def build_sitemap_xml(host: str, entries: list[dict]) -> str:
    """Serialize one host's url inventory as a sitemaps.org urlset.

    ``entries`` rows carry loc / lastmod ("YYYY-MM-DD") / changefreq /
    priority ("0.1".."1.0") strings. Uses an explicit default namespace
    on the root (attributes never inherit a default namespace in
    ElementTree, but sitemap fields are all child ELEMENTS, which do).
    """
    ET.register_namespace("", SITEMAP_NS)
    root = ET.Element(f"{{{SITEMAP_NS}}}urlset")
    for e in entries:
        u = ET.SubElement(root, f"{{{SITEMAP_NS}}}url")
        for field in ("loc", "lastmod", "changefreq", "priority"):
            ET.SubElement(u, f"{{{SITEMAP_NS}}}{field}").text = str(e[field])
    return ET.tostring(root, encoding="unicode")


def parse_sitemap(xml: str) -> list[dict]:
    """One sitemap document → seed rows.

    Returns dicts with loc:str, lastmod:str, changefreq:str,
    priority_milli:int (exact integer parse of the one-decimal
    priority string).
    """
    root = ET.fromstring(xml)
    out: list[dict] = []
    for u in root.findall(f"{{{SITEMAP_NS}}}url"):
        loc = u.findtext(f"{{{SITEMAP_NS}}}loc")
        lastmod = u.findtext(f"{{{SITEMAP_NS}}}lastmod")
        changefreq = u.findtext(f"{{{SITEMAP_NS}}}changefreq")
        prio = u.findtext(f"{{{SITEMAP_NS}}}priority")
        if loc is None or prio is None:
            raise ValueError("sitemap url entry missing loc/priority")
        a, _, b = prio.partition(".")
        if not b or len(b) != 1:
            raise ValueError(f"priority not a one-decimal string: {prio!r}")
        out.append(
            {
                "loc": loc,
                "lastmod": lastmod or "",
                "changefreq": changefreq or "",
                "priority_milli": int(a) * 1000 + int(b) * 100,
            }
        )
    return out


def build_sitemap_index_xml(entries: list[dict]) -> str:
    """Serialize a sitemaps.org ``sitemapindex`` document — the
    protocol's SECOND level (a urlset is capped at 50,000 URLs /
    50 MB, so every large site publishes an index of chunk sitemaps).
    ``entries`` rows carry loc / lastmod strings."""
    ET.register_namespace("", SITEMAP_NS)
    root = ET.Element(f"{{{SITEMAP_NS}}}sitemapindex")
    for e in entries:
        s = ET.SubElement(root, f"{{{SITEMAP_NS}}}sitemap")
        for field in ("loc", "lastmod"):
            ET.SubElement(s, f"{{{SITEMAP_NS}}}{field}").text = str(e[field])
    return ET.tostring(root, encoding="unicode")


def parse_sitemap_index(xml: str) -> list[dict]:
    """One sitemapindex document → chunk-sitemap rows (loc, lastmod).
    Raises on a non-index root or an entry missing its loc, so a
    urlset handed to the index parser fails loudly."""
    root = ET.fromstring(xml)
    if root.tag != f"{{{SITEMAP_NS}}}sitemapindex":
        raise ValueError(f"not a sitemapindex document: root {root.tag!r}")
    out: list[dict] = []
    for s in root.findall(f"{{{SITEMAP_NS}}}sitemap"):
        loc = s.findtext(f"{{{SITEMAP_NS}}}loc")
        if loc is None:
            raise ValueError("sitemapindex entry missing loc")
        out.append({"loc": loc, "lastmod": s.findtext(f"{{{SITEMAP_NS}}}lastmod") or ""})
    return out
