"""URL canonicalization + validity (SURVEY.md §2.2 M4/M11).

The reference canonicalizes in per-site ad-hoc ways: urljoin + drop
query/params/fragment (Nate_Crawler.py:84-86, YNA_Crawler.py:90-92),
``//``-scheme fix, ``./``-relative and hostname-dot normalization for the
aggregator site (Google_Crawler.py:177-191), javascript:/empty href drops
(Daum_crawler.py:88-90, Nate_Crawler.py:79-82). Here it is ONE pure
vectorizable stage producing ``canon_url`` + ``host`` — the engine's dedup
and partition key — applied identically everywhere.
"""

from __future__ import annotations

from urllib.parse import urljoin, urlparse, urlunparse

_VALID_SCHEMES = ("http", "https")


def is_valid_href(href: str | None) -> bool:
    """Drop empty, javascript:, mailto:, fragment-only and other junk hrefs."""
    if not href:
        return False
    h = href.strip()
    if not h or h.startswith("#"):
        return False
    low = h.lower()
    if low.startswith(("javascript:", "mailto:", "data:", "tel:")):
        return False
    return True


def absolutize(href: str, base_url: str) -> str:
    """Relative → absolute; protocol-relative ``//host/p`` → https."""
    h = href.strip()
    if h.startswith("//"):
        h = "https:" + h
    # aggregator quirk: './articles/x' and 'host./path' dot-forms
    if h.startswith("./"):
        h = h[1:]  # '/articles/x' — join against base below
    h = h.replace(".test./", ".test/")
    return urljoin(base_url, h)


import re

_FAST_ABS = re.compile(r"^(https?)://([^/?#]+)((?:/[^?#]*)?)(?:[?#].*)?$")
# root-relative path with no scheme/authority and no dot-segments
_FAST_REL = re.compile(r"^/(?!/)[^?#]*(?:[?#].*)?$")
_DOT_SEG = re.compile(r"/\.\.?(?:/|$)")


def _finish(scheme: str, host: str, path: str) -> tuple[str, str]:
    host = host.lower()
    path = path or "/"
    if len(path) > 1 and path.endswith("/"):
        path = path[:-1]
    return f"{scheme}://{host}{path}", host


def canonicalize(href: str, base_url: str) -> tuple[str, str]:
    """Return ``(canon_url, host)``: absolutized, scheme forced to https,
    query/params/fragment stripped, trailing slash trimmed (except root).

    Hot path: absolute http(s) URLs and clean root-relative paths resolve
    with two compiled regexes (~10× urllib); anything else (dot segments,
    path-relative, exotic schemes) falls back to urljoin/urlparse with
    identical results (property-tested in tests/test_functions.py)."""
    h = href.strip()
    if h.startswith("//"):
        h = "https:" + h
    elif h.startswith("./"):
        h = h[1:]
    h = h.replace(".test./", ".test/")
    m = _FAST_ABS.match(h)
    if m is not None:
        path = m.group(3)
        if not _DOT_SEG.search(path):
            return _finish("https", m.group(2), path)
    elif _FAST_REL.match(h) and not _DOT_SEG.search(h):
        bm = _FAST_ABS.match(base_url)
        if bm is not None:
            path = h.split("?", 1)[0].split("#", 1)[0]
            return _finish("https", bm.group(2), path)
    # slow path: full RFC 3986 resolution
    absu = urljoin(base_url, h)
    p = urlparse(absu)
    scheme = "https" if p.scheme in _VALID_SCHEMES else p.scheme
    path = p.path or "/"
    if len(path) > 1 and path.endswith("/"):
        path = path[:-1]
    host = p.netloc.lower()
    canon = urlunparse((scheme, host, path, "", "", ""))
    return canon, host


def canonicalize_batch(
    hrefs: list[str | None], base_urls: list[str]
) -> tuple[list[bool], list[str], list[str]]:
    """Batch form used inside ``map_batches`` (one Python pass per batch —
    URL parsing is inherently per-string; the stage stays a stateless task)."""
    valid: list[bool] = []
    canon: list[str] = []
    hosts: list[str] = []
    for href, base in zip(hrefs, base_urls):
        if not is_valid_href(href):
            valid.append(False)
            canon.append("")
            hosts.append("")
            continue
        c, h = canonicalize(href, base)
        ok = urlparse(c).scheme in _VALID_SCHEMES and bool(h)
        valid.append(ok)
        canon.append(c if ok else "")
        hosts.append(h if ok else "")
    return valid, canon, hosts
