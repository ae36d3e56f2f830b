"""Fetcher actor-pool stage (SURVEY.md §2.1 S3/S4).

A callable class for ``map_batches(Fetcher, concurrency=N)``: per-actor
state (the synthetic-web parameter block — in production an HTTP session
pool, UA rotation, DNS cache) is built ONCE in ``__init__``; ``__call__``
fetches a batch of released frontier rows and appends status/encoding/
payload columns.

Against the real web this stage would sleep each row until its
``released_at_virtual`` wall time and issue the HTTP GET with the
per-site timeout; against the deterministic SyntheticWeb it generates the
page bytes directly (zero I/O — the sandbox stand-in, see synth.py).
Retries are a policy parameter; the reference-equivalent is 0 retries,
drop-and-continue.
"""

from __future__ import annotations

import re

import pyarrow as pa

from .synth import SyntheticWeb, WebParams


class Fetcher:
    def __init__(self, web_params: WebParams):
        self.web = SyntheticWeb(web_params)  # once per actor, not per batch

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["canon_url"].to_pylist()
        status, enc, payload = [], [], []
        for u in urls:
            s, e, p = self.web.fetch(u)
            status.append(s)
            enc.append(e)
            payload.append(p)
        return (
            batch.append_column("status", pa.array(status, pa.int32()))
            .append_column("encoding", pa.array(enc, pa.string()))
            .append_column("payload", pa.array(payload, pa.binary()))
        )


# a small, static UA pool (the sandboxed stand-in for the reference's
# fake-useragent rotation, Google_Crawler.py:57,152 — T5); seeded choice
# keeps fetch behavior reproducible under a fixed seed
USER_AGENTS = (
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/124.0 Safari/537.36",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/123.0 Safari/537.36",
    "Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/122.0 Safari/537.36",
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64; rv:125.0) Gecko/20100101 Firefox/125.0",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10.15; rv:124.0) Gecko/20100101 Firefox/124.0",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.3 Safari/605.1.15",
)

_META_CHARSET_RE = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?\s*([A-Za-z0-9_\-]+)""", re.I
)


class HttpFetcher:
    """Real-HTTP implementation behind the SAME stage interface as the
    synthetic ``Fetcher`` (swap the class passed to ``map_batches`` and the
    pipeline crawls a live web):

    * one ``requests.Session`` per actor (connection pooling — built once
      in ``__init__``, SURVEY §2.1 S3);
    * per-request UA rotation from a seeded pool (T5;
      Google_Crawler.py:57,152);
    * per-site timeout (Naver_Crawler.py:106 — 10 s; Google 20 s) and
      0-retry drop-and-continue error policy (the reference's, §4.1);
    * encoding sniff: forced override (SkyDaily_Crawler.py:70,146 euc-kr) →
      HTTP header charset → ``<meta charset>`` probe → utf-8 — encoding is
      DATA, carried alongside the payload (SURVEY §1.3 `pages`).
    """

    def __init__(
        self,
        timeout: float = 10.0,
        seed: int = 42,
        force_encoding: str | None = None,
        session=None,
    ):
        import random

        import requests

        self.session = session or requests.Session()
        self.timeout = timeout
        self.force_encoding = force_encoding
        self._rng = random.Random(seed)

    def fetch_one(self, url: str) -> tuple[int, str, bytes]:
        import requests

        headers = {"User-Agent": self._rng.choice(USER_AGENTS)}
        try:
            r = self.session.get(url, timeout=self.timeout, headers=headers)
        except requests.RequestException:
            return 0, "utf-8", b""  # dropped-and-continue (0 retries)
        enc = self.force_encoding
        if enc is None:
            ctype = r.headers.get("Content-Type", "")
            if "charset=" in ctype:
                enc = ctype.split("charset=")[-1].split(";")[0].strip()
        if enc is None:
            m = _META_CHARSET_RE.search(r.content[:4096])
            if m:
                enc = m.group(1).decode("ascii", "ignore")
        return r.status_code, enc or "utf-8", r.content

    def __call__(self, batch: pa.Table) -> pa.Table:
        status, enc, payload = [], [], []
        for u in batch["canon_url"].to_pylist():
            s, e, p = self.fetch_one(u)
            status.append(s)
            enc.append(e)
            payload.append(p)
        return (
            batch.append_column("status", pa.array(status, pa.int32()))
            .append_column("encoding", pa.array(enc, pa.string()))
            .append_column("payload", pa.array(payload, pa.binary()))
        )
