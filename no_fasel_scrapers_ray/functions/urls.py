"""URL functions: the reference's ``fix_url`` plus the engine's
canonicalizer feeding the URL-seen set (SURVEY.md §2.4 U3)."""

from __future__ import annotations

from urllib.parse import quote, urljoin, urlsplit

from .hashing import stable_hash64


def fix_url(url: str) -> str:
    """Strip the query string, percent-quote, un-quote ':'.

    Reference: Common.py:184-186.
    """
    return quote(url.split("?")[0]).replace("%3A", ":")


def canonicalize_url(url: str, base: str | None = None) -> str:
    """Engine URL canonicalizer (extends the reference's fix_url, U3):

    - resolve relative URLs against ``base``
    - lowercase scheme + host
    - drop the fragment
    - keep the query (the reference's sites key pages on query params,
      e.g. fasel season pages ``/?p={id}`` — FaselSeriesScraper.py:60 —
      and akwam listing pages ``?page=N``)
    - strip a single trailing slash from non-root paths
    """
    if base is not None:
        url = urljoin(base, url)
    parts = urlsplit(url)
    scheme = parts.scheme.lower() or "https"
    host = parts.netloc.lower()
    path = parts.path or "/"
    if len(path) > 1 and path.endswith("/"):
        path = path.rstrip("/")
    canon = f"{scheme}://{host}{path}"
    if parts.query:
        canon += f"?{parts.query}"
    return canon


def url_host(url: str) -> str:
    return urlsplit(url).netloc.lower()


def url_hash64(url: str) -> int:
    """Seen-set key: 64-bit hash of the canonical URL (north_rule)."""
    return stable_hash64(canonicalize_url(url))
