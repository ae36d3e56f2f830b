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
