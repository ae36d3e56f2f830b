"""Fixture-backed web: serve REAL saved HTML through the standard fetch
interface (SURVEY §2.1 S3, §2.9 extension surface).

A fixture directory fully describes one or more real-HTML sites:

    manifest.json   {"sites": [{...SiteConfig fields..., "site_rank": int,
                                "selectors": {...SelectorSet fields...}}],
                     "seeds":  [{"site", "url", "category", "seed_rank"}],
                     "pages":  {"<canon_url>": {"file": "x.html",
                                                "encoding": "utf-8"}}}
    *.html          the saved pages

``FixtureWeb`` exposes the same surface as ``synth.SyntheticWeb`` (``fetch``
/ ``seeds`` / ``includes`` / ``excludes``), so BOTH the Ray pipeline and the
sequential oracle crawl it unchanged — conformance equality holds on real
HTML exactly as on the synthetic corpus. Site configs are registered from
the manifest ON EVERY PROCESS that builds the engine (driver and Ray
workers alike), which is what makes "adding a real site" a data change:
drop a fixture dir with selectors, no code.

Keywords load from ``News_keyword.json`` in the fixture dir (the
reference's own config format — synth.load_keyword_config).
"""

from __future__ import annotations

import json
import os

from .sites import HOST_TO_SITE, SITE_RANK, SiteConfig, SITES


def _register_site(d: dict) -> SiteConfig:
    from .extract import SelectorSet

    d = dict(d)
    rank = d.pop("site_rank")
    sel = d.pop("selectors", None)
    if sel is not None:
        d["selectors"] = SelectorSet(**sel)
    d["categories"] = tuple(d.get("categories", ()))
    d["time_formats"] = tuple(d.get("time_formats", ()))
    d["fixture"] = True  # keep the synthetic corpus invariant to fixtures
    cfg = SiteConfig(**d)
    taken = {r for s, r in SITE_RANK.items() if s != cfg.site}
    if rank in taken:
        raise ValueError(f"fixture site_rank {rank} collides with a registered site")
    SITES[cfg.site] = cfg
    SITE_RANK[cfg.site] = rank
    HOST_TO_SITE[cfg.host] = cfg.site
    return cfg


class FixtureWeb:
    """``fetch(canon_url) -> (status, encoding, payload)`` over saved HTML."""

    def __init__(self, fixture_dir: str, only_sites=None):
        self.dir = fixture_dir
        self.only_sites = tuple(only_sites) if only_sites else None
        with open(os.path.join(fixture_dir, "manifest.json"), encoding="utf-8") as f:
            m = json.load(f)
        for site in m["sites"]:
            _register_site(site)
        self._seeds = m["seeds"]
        self._pages = m["pages"]
        kw = os.path.join(fixture_dir, "News_keyword.json")
        if os.path.exists(kw):
            from .synth import load_keyword_config

            self.includes, self.excludes, self.keyword_rows = load_keyword_config(kw)
        else:
            self.includes, self.excludes, self.keyword_rows = [], [], []

    def seeds(self) -> list[dict]:
        return [
            dict(s)
            for s in self._seeds
            if self.only_sites is None or s["site"] in self.only_sites
        ]

    def fetch(self, canon_url: str) -> tuple[int, str, bytes]:
        entry = self._pages.get(canon_url)
        if entry is None:
            return 404, "utf-8", b""
        enc = entry.get("encoding", "utf-8")
        with open(os.path.join(self.dir, entry["file"]), "rb") as f:
            return 200, enc, f.read()


def build_web(params):
    """Web-backend factory: fixture dir set → real saved HTML; otherwise the
    deterministic synthetic web. Same interface either way."""
    if getattr(params, "fixture_dir", None):
        return FixtureWeb(params.fixture_dir, params.only_sites)
    from .synth import SyntheticWeb

    return SyntheticWeb(params)
