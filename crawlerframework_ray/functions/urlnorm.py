"""URL normalization (operator M1, SURVEY.md §2.2).

Same normalization *semantics* as the reference's
crawler/utils/urlnorm.py:95-146 — which implements the well-known public
RFC 3986/1808 normalization recipe (Mark Nottingham's norm.py lineage):

- lowercase scheme and host; strip a single trailing dot from the host
- strip default ports (http:80, https:443, ftp:21, …)
- iteratively collapse ``/./``, ``//``, ``segment/../`` in the path
- percent-unquote the path (``%7Ebar`` → ``~bar``)
- drop fragments; empty path with authority → ``/``

Verified against the reference's 33-case conformance table
(urlnorm.py:152-186), ported verbatim into tests/test_urlnorm.py.

``normalize_batch`` is the vectorized entry point used inside
``map_batches``; per-url work is a tight pure-python function (string
kernels in pyarrow can't express the iterative path collapse).
"""

from __future__ import annotations

import re
from urllib.parse import quote, unquote, urljoin, urlsplit, urlunsplit

DEFAULT_PORTS = {
    "http": "80",
    "https": "443",
    "ftp": "21",
    "ws": "80",
    "wss": "443",
    "gopher": "70",
    "news": "119",
    "snews": "563",
}

# one collapse step: an innermost "seg/../", a "/./", a "//", or a
# trailing "/." or "/.."
_COLLAPSE = re.compile(r"([^/]+/\.\./?|/\./|//|/\.$|/\.\.$)")


def collapse_path(path: str) -> str:
    """Iteratively collapse dot-segments and empty segments."""
    last = path
    while True:
        new = _COLLAPSE.sub("/", last, 1)
        if new == last:
            return new
        last = new


def normalize(url: str) -> str:
    """Normalize a single absolute-or-relative URL string."""
    scheme, authority, path, query, fragment = urlsplit(url.strip())
    scheme = scheme.lower()
    if authority:
        userinfo, _, hostport = authority.rpartition("@")
        host, colon, port = hostport.partition(":")
        host = host.lower().rstrip(".")
        if colon and (not port or port == DEFAULT_PORTS.get(scheme, None)):
            colon, port = "", ""
        authority = (userinfo + "@" if userinfo else "") + host + (":" + port if port else "")
        if not path:
            path = "/"
    if path:
        path = unquote(collapse_path(path))
    return urlunsplit((scheme, authority, path, query, ""))  # fragment dropped


def resolve(base_url: str, link: str) -> str:
    """Resolve a possibly-relative link against its page url, then
    normalize. ``javascript:``/``mailto:`` links resolve to the site
    root, matching the reference's behavior for non-http schemes."""
    link = link.strip()
    low = link.lower()
    if low.startswith(("javascript:", "mailto:", "data:")):
        s = urlsplit(base_url)
        return normalize(urlunsplit((s.scheme, s.netloc, "/", "", "")))
    return normalize(urljoin(base_url, link))


def normalize_batch(urls: list[str]) -> list[str]:
    return [normalize(u) for u in urls]


def quote_url(url: str) -> str:
    """Re-quote a normalized URL for transport (reserved chars kept)."""
    s = urlsplit(url)
    return urlunsplit((s.scheme, s.netloc, quote(s.path, safe="/~:@!$&'()*+,;="), s.query, ""))
