"""The Ray-Data-native crawl pipeline: BFS wave loop over the frontier
(SURVEY.md §3.5, §7).

Each wave is one streaming Dataset pipeline:

    frontier ──groupby(host)→ politeness/budget schedule (actor RPC, 1/host)
             ──repartition→ skew-spread released rows
             ──map_batches(fetch+parse, fused)→ items/docs  [payload never leaves the stage]
             ──map_batches(candidate gate)→ validity/canonicalize/robots + bucket
             ──groupby(bucket)→ within-wave exact dedup (min-seq wins)
             ──map_batches(SeenFilter)→ cuckoo-shard RPC (url keyspace)
             ──[title keyspace for the 3 title-seen sites]
             ──map_batches(relevance + finalize)→ docs + next-frontier rows

Design notes for 10^10-URL scale:

* ``payload: binary`` exists only INSIDE the fused fetch+parse stage — it is
  never a column of any materialized/checkpointed dataset (SURVEY §7.5.8).
* Stateful crawl state lives in two actor pools: the sharded cuckoo-filter
  seen-set (seen.py) and the per-host politeness/budget schedulers
  (frontier.py). The per-batch transform stages are stateless Ray tasks
  whose heavy setup (keyword automata, the synthetic-web generator; in
  production: HTTP session pools) is cached once per worker PROCESS in
  ``_ENGINES`` — amortized like an actor pool, but elastic and with zero
  per-wave pool spin-up.
* Wave barriers are inherent to BFS frontier feedback; what crosses a wave
  boundary is bounded metadata (frontier rows, article spans), not bytes.
* The all-to-all exchanges per wave: groupby(host) for politeness (ONE
  batched RPC per host per wave) and groupby(hash bucket) for exact dedup.
  A hot host's released rows are spread across blocks by an explicit
  repartition before the heavy fetch/parse stages (north_rule skew
  splitting: one token bucket per host, many fetch workers).
* Datasets downstream of seen-filter stages are materialized exactly once
  before branching — re-executing a lazy plan with actor side effects would
  double-insert into the shards.
* Every wave checkpoints under an atomic manifest (checkpoint.py): resume
  re-fetches nothing and drops nothing.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from urllib.parse import urlparse

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from .canonicalize import canonicalize, canonicalize_batch
from .datefns import within_last_days
from .extract import (
    article_spans,
    decode_payload,
    finalize_article,
    make_seq,
    parse_article,
    parse_listing,
)
from .frontier import ScheduleGroup, make_scheduler_pool
from .oracle import effective_page_cap, make_matcher
from .policy import CrawlPolicy
from .seen import SeenFilterStage, make_seen_pool, stable_hash64
from .sites import SITE_RANK, SITES
from .synth import SyntheticWeb, WebParams
from .textfns import KeywordMatcher, fuzzy_is_dup, html_to_text, normalize_for_fuzzy

# unified wave-output schema (the fused fetch+parse stage emits all rowkinds)
WAVE_SCHEMA = pa.schema(
    [
        ("rowkind", pa.string()),  # 'cand' | 'next' | 'doc' | 'frontier'
        ("site", pa.string()),
        ("category", pa.string()),
        ("seed_rank", pa.int32()),
        ("page_no", pa.int32()),
        ("discovered_seq", pa.int64()),
        ("href", pa.string()),
        ("title", pa.string()),
        ("time_raw", pa.string()),
        ("img", pa.string()),
        ("lead", pa.string()),
        ("base_url", pa.string()),
        ("canon_url", pa.string()),
        ("host", pa.string()),
        ("time", pa.timestamp("us")),
        ("summary", pa.string()),
        ("url", pa.string()),
        ("original_url", pa.string()),
        ("date_group", pa.string()),
    ]
)

ARTICLE_COLS = [
    "site",
    "title",
    "time",
    "img",
    "url",
    "original_url",
    "summary",
    "date_group",
    "discovered_seq",
]

FRONTIER_COLS = [
    "site",
    "category",
    "kind",
    "canon_url",
    "host",
    "seed_rank",
    "page_no",
    "discovered_seq",
    "title",
]

FRONTIER_SCHEMA = pa.schema(
    [
        ("site", pa.string()),
        ("category", pa.string()),
        ("kind", pa.string()),
        ("canon_url", pa.string()),
        ("host", pa.string()),
        ("seed_rank", pa.int32()),
        ("page_no", pa.int32()),
        ("discovered_seq", pa.int64()),
        ("title", pa.string()),
    ]
)

FETCH_LOG_SCHEMA = pa.schema(
    [
        ("discovered_seq", pa.int64()),
        ("canon_url", pa.string()),
        ("host", pa.string()),
        ("site", pa.string()),
        ("released_at_virtual", pa.float64()),
    ]
)


# ---------------------------------------------------------------------------
# per-worker-process engine cache (setup once per process, like an actor's
# __init__, but shared by every stateless task stage on that worker)
# ---------------------------------------------------------------------------

_ENGINES: dict = {}


class _Engine:
    def __init__(self, web_params: WebParams, policy: CrawlPolicy):
        self.web = SyntheticWeb(web_params)
        self.policy = policy
        self.matchers: dict[str, KeywordMatcher] = {
            site: make_matcher(self.web, SITES[site]) for site in SITES
        }


def get_engine(web_params: WebParams, policy: CrawlPolicy) -> _Engine:
    key = (web_params, repr(policy))
    eng = _ENGINES.get(key)
    if eng is None:
        eng = _Engine(web_params, policy)
        _ENGINES[key] = eng
    return eng


def _empty_wave_dict() -> dict[str, list]:
    return {name: [] for name in WAVE_SCHEMA.names}


# ---------------------------------------------------------------------------
# stage bodies (stateless tasks; heavy state via get_engine)
# ---------------------------------------------------------------------------


def fetch_parse(batch: pa.Table, web_params: WebParams, policy: CrawlPolicy) -> pa.Table:
    """Fused fetch + parse over released frontier rows. The page payload is
    generated (in production: HTTP-fetched by a session held in worker
    state), parsed, and DROPPED inside this one stage — item/doc metadata is
    all that flows on. Two-hop article pages are finalized here (post-fetch
    relevance on title+summary, time-parse drop, recency window)."""
    eng = get_engine(web_params, policy)
    out = _empty_wave_dict()

    def emit(**kw):
        for name in WAVE_SCHEMA.names:
            out[name].append(kw.get(name))

    for row in batch.to_pylist():
        cfg = SITES[row["site"]]
        status, enc, payload = eng.web.fetch(row["canon_url"])
        if status != 200:
            continue
        html = decode_payload(payload, enc)
        if row["kind"] == "listing":
            items = parse_listing(html)
            cap = effective_page_cap(cfg, row["category"])
            if items and row["page_no"] + 1 <= cap:
                nxt = row["page_no"] + 1
                nxt_url = f"https://{cfg.host}/sec/{row['category']}{row['seed_rank']}/p{nxt}"
                canon, h = canonicalize(nxt_url, nxt_url)
                emit(
                    rowkind="next",
                    site=cfg.site,
                    category=row["category"],
                    seed_rank=row["seed_rank"],
                    page_no=nxt,
                    discovered_seq=make_seq(SITE_RANK[cfg.site], 0, row["seed_rank"], nxt, 0),
                    canon_url=canon,
                    host=h,
                )
            for item in items:
                emit(
                    rowkind="cand",
                    site=cfg.site,
                    category=row["category"],
                    seed_rank=row["seed_rank"],
                    page_no=row["page_no"],
                    discovered_seq=make_seq(
                        SITE_RANK[cfg.site], 1, row["seed_rank"], row["page_no"], item.dom_idx
                    ),
                    href=item.href,
                    title=item.title,
                    time_raw=item.time_raw,
                    img=item.img,
                    lead=item.lead,
                    base_url=row["canon_url"],
                )
        else:  # two-hop article detail page
            detail = parse_article(html)
            title = row["title"] or detail["title"]
            if cfg.match_target == "title+summary":
                target = title
                if detail["summary"]:
                    target = title + " " + html_to_text(detail["summary"])
                if not eng.matchers[cfg.site].relevant(target):
                    continue
            rec = finalize_article(
                cfg,
                row["canon_url"],
                title,
                detail["time_raw"],
                detail["summary"],
                detail["img"],
                row["discovered_seq"],
                policy.now,
            )
            if rec is None:
                continue
            if cfg.recency_days is not None and not within_last_days(
                rec["time"], policy.now, cfg.recency_days
            ):
                continue
            emit(rowkind="doc", **rec)
    return pa.Table.from_pydict(out, schema=WAVE_SCHEMA)


def cand_gate(batch: pa.Table, policy: CrawlPolicy, n_buckets: int) -> pa.Table:
    """Candidate gate: href validity → canonicalize → off-host → robots;
    adds canon_url/host and the dedup hash bucket."""
    if batch.num_rows == 0:
        return batch.append_column("bucket", pa.array([], pa.int64()))
    hrefs = batch["href"].to_pylist()
    bases = batch["base_url"].to_pylist()
    sites = batch["site"].to_pylist()
    valid, canon, hosts = canonicalize_batch(hrefs, bases)
    keep = [
        ok and h == SITES[s].host and policy.allowed(h, urlparse(c).path)
        for ok, c, h, s in zip(valid, canon, hosts, sites)
    ]
    batch = batch.drop_columns(["canon_url", "host"])
    batch = batch.append_column("canon_url", pa.array(canon, pa.string()))
    batch = batch.append_column("host", pa.array(hosts, pa.string()))
    batch = batch.filter(pa.array(keep))
    bucket = [
        stable_hash64(f"{s}\x1f{c}") % n_buckets
        for s, c in zip(batch["site"].to_pylist(), batch["canon_url"].to_pylist())
    ]
    return batch.append_column("bucket", pa.array(bucket, pa.int64()))


def add_bucket(batch: pa.Table, key_cols: list[str], n_buckets: int) -> pa.Table:
    if batch.num_rows == 0:
        return batch.append_column("bucket", pa.array([], pa.int64()))
    cols = [batch[c].to_pylist() for c in key_cols]
    b = [
        stable_hash64("\x1f".join(str(v) for v in vals)) % n_buckets
        for vals in zip(*cols)
    ]
    return batch.append_column("bucket", pa.array(b, pa.int64()))


def dedup_min_seq(g: pd.DataFrame, subset: list[str]) -> pd.DataFrame:
    """Within-wave exact dedup: min-discovered_seq row wins (deterministic
    regardless of block arrival order — SURVEY §7.5.1)."""
    g = g.sort_values("discovered_seq", kind="mergesort")
    return g.drop_duplicates(subset=subset, keep="first")


def relevance_finalize(
    batch: pa.Table, web_params: WebParams, policy: CrawlPolicy
) -> pa.Table:
    """Pre-fetch keyword relevance (title / title+lead targets), then:
    single-hop survivors are finalized into doc rows; two-hop survivors
    become next-wave frontier rows (rowkind='frontier')."""
    eng = get_engine(web_params, policy)
    out = _empty_wave_dict()
    for row in batch.to_pylist():
        cfg = SITES[row["site"]]
        if cfg.match_target in ("title", "title+lead"):
            target = row["title"] or ""
            if cfg.match_target == "title+lead" and row["lead"]:
                target = target + " " + html_to_text(row["lead"])
            if not eng.matchers[cfg.site].relevant(target):
                continue
        if cfg.detail_hop:
            row = dict(row)
            row["rowkind"] = "frontier"
            for name in WAVE_SCHEMA.names:
                out[name].append(row.get(name))
            continue
        rec = finalize_article(
            cfg,
            row["canon_url"],
            row["title"],
            row["time_raw"],
            row["lead"],
            row["img"],
            row["discovered_seq"],
            policy.now,
        )
        if rec is None:
            continue
        if cfg.recency_days is not None and not within_last_days(
            rec["time"], policy.now, cfg.recency_days
        ):
            continue
        out_row = {name: None for name in WAVE_SCHEMA.names}
        out_row.update(rec)
        out_row["rowkind"] = "doc"
        for name in WAVE_SCHEMA.names:
            out[name].append(out_row[name])
    return pa.Table.from_pydict(out, schema=WAVE_SCHEMA)


def keep_rowkind(kind: str):
    def fn(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch["rowkind"], kind))

    fn.__name__ = f"keep_{kind}"
    return fn


# ---------------------------------------------------------------------------
# pipeline driver
# ---------------------------------------------------------------------------


@dataclass
class PipelineConfig:
    web_params: WebParams = field(default_factory=WebParams)
    policy: CrawlPolicy = field(default_factory=CrawlPolicy)
    n_seen_shards: int = 4
    n_sched_shards: int = 2
    batch_size: int = 256  # frontier rows per fetch+parse task
    dedup_buckets: int = 16
    repartition_blocks: int = 16
    checkpoint_dir: str | None = None
    seen_capacity_per_shard: int = 1 << 18


class CrawlPipeline:
    """Driver object owning the actor pools + wave loop. Does NOT call
    ray.init(); the caller owns the session."""

    def __init__(self, cfg: PipelineConfig):
        self.cfg = cfg
        self.web = SyntheticWeb(cfg.web_params)  # driver-side: seeds only
        self.seen_shards = make_seen_pool(cfg.n_seen_shards, cfg.seen_capacity_per_shard)
        self.schedulers = make_scheduler_pool(cfg.n_sched_shards, cfg.policy.host_budget)
        self.wave_metrics: list[dict] = []
        self.fetch_logs: list[pa.Table] = []
        self.doc_tables: list[pa.Table] = []
        self.start_wave = 0
        self._frontier0: pa.Table | None = None

    def dump_seen(self) -> tuple[set, set]:
        """(url_seen, title_seen) as (site, value) tuples — for equality
        checks against the oracle and for external audits."""
        url_seen: set = set()
        title_seen: set = set()
        for keys in ray.get([s.dump.remote() for s in self.seen_shards]):
            for k in keys:
                space, rest = k.split(":", 1)
                site, val = rest.split("\x1f", 1)
                (url_seen if space == "u" else title_seen).add((site, val))
        return url_seen, title_seen

    def seed_frontier(self) -> pa.Table:
        rows = []
        for s in self.web.seeds():
            cfg = SITES[s["site"]]
            canon, host = canonicalize(s["url"], s["url"])
            rows.append(
                {
                    "site": s["site"],
                    "category": s["category"],
                    "kind": "listing",
                    "canon_url": canon,
                    "host": host,
                    "seed_rank": s["seed_rank"],
                    "page_no": 1,
                    "discovered_seq": make_seq(SITE_RANK[s["site"]], 0, s["seed_rank"], 1, 0),
                    "title": None,
                }
            )
        return pa.Table.from_pylist(rows, schema=FRONTIER_SCHEMA)

    # -- one wave -----------------------------------------------------------

    def run_wave(self, wave: int, frontier: pa.Table) -> tuple[pa.Table, pa.Table, pa.Table]:
        """Returns (docs, next_frontier, fetch_log) as Arrow tables — a
        wave's outputs are bounded metadata; payloads never escape the fused
        fetch+parse stage inside."""
        cfg = self.cfg
        wp, policy = cfg.web_params, cfg.policy
        fr = ray.data.from_arrow(frontier)

        sched_fn = ScheduleGroup(self.schedulers)
        scheduled = (
            fr.groupby("host")
            .map_groups(lambda g: sched_fn(g), batch_format="pandas")
            .repartition(cfg.repartition_blocks)  # skew-spread hot hosts
            .materialize()
        )
        fetch_log_tbl = _collect(
            scheduled.select_columns(list(FETCH_LOG_SCHEMA.names)), FETCH_LOG_SCHEMA
        )
        fetch_log_tbl = fetch_log_tbl.append_column(
            "wave", pa.array([wave] * fetch_log_tbl.num_rows, pa.int32())
        )

        parsed = scheduled.map_batches(
            lambda b: fetch_parse(b, wp, policy),
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
        ).materialize()

        # candidate chain: gate → bucket dedup → URL seen-filter
        url_seen_fn = SeenFilterStage(self.seen_shards, "u", "site", "canon_url")
        c3 = (
            parsed.map_batches(keep_rowkind("cand"), batch_format="pyarrow")
            .map_batches(
                lambda b: cand_gate(b, policy, cfg.dedup_buckets),
                batch_format="pyarrow",
            )
            .groupby("bucket")
            .map_groups(
                lambda g: dedup_min_seq(g, ["site", "canon_url"]),
                batch_format="pandas",
            )
            .drop_columns(["bucket"])
            .map_batches(lambda b: url_seen_fn(b), batch_format="pyarrow", batch_size=4096)
            .materialize()  # consume seen-shard side effects exactly once
        )

        # exact-title dedup (title-seen sites): within-wave min-seq, then the
        # shard pool's 't' keyspace. AFTER the URL filter, so a URL-rejected
        # row cannot shadow a later title (oracle semantics).
        tsites = pa.array([s for s, c in SITES.items() if c.title_seen])
        title_seen_fn = SeenFilterStage(self.seen_shards, "t", "site", "title")
        tpart = (
            c3.map_batches(
                lambda b: b.filter(pc.is_in(b["site"], value_set=tsites)),
                batch_format="pyarrow",
            )
            .map_batches(
                lambda b: add_bucket(b, ["site", "title"], cfg.dedup_buckets),
                batch_format="pyarrow",
            )
            .groupby("bucket")
            .map_groups(
                lambda g: dedup_min_seq(g, ["site", "title"]), batch_format="pandas"
            )
            .drop_columns(["bucket"])
            .map_batches(lambda b: title_seen_fn(b), batch_format="pyarrow", batch_size=4096)
        )
        rest = c3.map_batches(
            lambda b: b.filter(pc.invert(pc.is_in(b["site"], value_set=tsites))),
            batch_format="pyarrow",
        )

        # relevance + finalize/forward, then split on the materialized result
        done = (
            tpart.union(rest)
            .map_batches(
                lambda b: relevance_finalize(b, wp, policy),
                batch_format="pyarrow",
                batch_size=cfg.batch_size,
            )
            .materialize()
        )
        docs = parsed.map_batches(keep_rowkind("doc"), batch_format="pyarrow").union(
            done.map_batches(keep_rowkind("doc"), batch_format="pyarrow")
        )
        docs_tbl = _collect(docs, WAVE_SCHEMA)

        nexts = parsed.map_batches(keep_rowkind("next"), batch_format="pyarrow").map_batches(
            lambda b: b.append_column("kind", pa.array(["listing"] * b.num_rows)),
            batch_format="pyarrow",
        )
        twohop = done.map_batches(keep_rowkind("frontier"), batch_format="pyarrow").map_batches(
            lambda b: b.append_column("kind", pa.array(["article"] * b.num_rows)),
            batch_format="pyarrow",
        )
        next_tbl = _collect(nexts.union(twohop), FRONTIER_SCHEMA)
        return docs_tbl, next_tbl, fetch_log_tbl

    # -- full run -------------------------------------------------------------

    def run(self, frontier: pa.Table | None = None) -> dict:
        from . import checkpoint as ckpt

        cfg = self.cfg
        if frontier is None:
            frontier = self._frontier0 if self._frontier0 is not None else self.seed_frontier()
        wave = self.start_wave
        while frontier.num_rows > 0 and wave < cfg.policy.max_waves:
            if cfg.checkpoint_dir:
                ckpt.write_frontier_in(cfg.checkpoint_dir, wave, frontier)
            docs, nxt, flog = self.run_wave(wave, frontier)
            self.doc_tables.append(docs)
            self.fetch_logs.append(flog)
            self.wave_metrics.append(
                {
                    "wave": wave,
                    "frontier": frontier.num_rows,
                    "fetched": flog.num_rows,
                    "docs": docs.num_rows,
                    "next_frontier": nxt.num_rows,
                }
            )
            if cfg.checkpoint_dir:
                ckpt.write_wave(
                    cfg.checkpoint_dir, wave, docs, nxt, flog,
                    self.seen_shards, self.schedulers, self.wave_metrics[-1],
                )
            frontier = nxt
            wave += 1
        return self.finalize()

    # -- post-crawl assembly --------------------------------------------------

    def finalize(self) -> dict:
        docs = (
            pa.concat_tables(self.doc_tables)
            if self.doc_tables
            else pa.Table.from_pydict(_empty_wave_dict(), schema=WAVE_SCHEMA)
        )
        flog = pa.concat_tables(self.fetch_logs) if self.fetch_logs else None
        arts = docs.select(ARTICLE_COLS).sort_by("discovered_seq")
        arts = _fuzzy_pass(arts)
        return {
            "articles": arts,
            "documents": articles_to_documents(arts),
            "fetch_log": flog,
            "wave_metrics": self.wave_metrics,
        }


def _fuzzy_pass(arts: pa.Table) -> pa.Table:
    """Order-dependent fuzzy title dedup for fuzzy-enabled sites; sequential
    by definition (SURVEY §7.5.2) — one pass over the accepted set, per
    site, in discovered_seq order, threshold preserved verbatim."""
    fuzzy_sites = {s for s, c in SITES.items() if c.fuzzy_dedup}
    if not fuzzy_sites:
        return arts
    keep = []
    mem: dict[str, list[str]] = {s: [] for s in fuzzy_sites}
    for s, t in zip(arts["site"].to_pylist(), arts["title"].to_pylist()):
        if s in fuzzy_sites:
            cfg = SITES[s]
            if fuzzy_is_dup(t, mem[s], cfg.fuzzy_threshold):
                keep.append(False)
                continue
            mem[s].append(normalize_for_fuzzy(t))
        keep.append(True)
    return arts.filter(pa.array(keep, pa.bool_()))


def articles_to_documents(arts: pa.Table) -> pa.Table:
    """Span pivot: flat article rows → interleaved documents rows
    (input_hint schema)."""
    from .schema import DOCUMENTS, SPAN_STRUCT

    doc_ids, spans = [], []
    for rec in arts.to_pylist():
        cfg = SITES[rec["site"]]
        doc_ids.append(rec["url"])
        spans.append(article_spans(rec, cfg))
    return pa.Table.from_pydict(
        {
            "doc_id": pa.array(doc_ids, pa.string()),
            "spans": pa.array(spans, pa.list_(SPAN_STRUCT)),
        },
        schema=DOCUMENTS,
    )


def day_grouped(arts: pa.Table) -> list[dict]:
    """The reference's day-grouped sink shape (A1/O1): one entry per
    (site, date_group); articles time-desc within the group for
    sort-in-group sites, else discovery order."""
    df = arts.to_pandas()
    out = []
    for (site, dg), g in sorted(
        df.groupby(["site", "date_group"]), key=lambda kv: (kv[0][0], kv[0][1])
    ):
        cfg = SITES[site]
        if cfg.sort_in_group:
            g = g.sort_values("time", ascending=False, kind="mergesort")
        else:
            g = g.sort_values("discovered_seq", kind="mergesort")
        out.append(
            {
                "site": site,
                "date": dg,
                "articles": g.drop(columns=["date_group"]).to_dict("records"),
            }
        )
    return out


def _collect(ds: ray.data.Dataset, schema: pa.Schema) -> pa.Table:
    refs = ds.to_arrow_refs()
    tables = [t for t in ray.get(refs) if t.num_rows > 0]
    if not tables:
        return pa.Table.from_pydict({n: [] for n in schema.names}, schema=schema)
    out = pa.concat_tables(
        [t.select(schema.names) for t in tables], promote_options="permissive"
    )
    return out.cast(schema)
