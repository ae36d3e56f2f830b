"""Sequential reference-semantics crawler — the conformance oracle.

Implements SURVEY.md §2's operator semantics exactly, single-process and in
deterministic order, against the same SyntheticWeb the Ray pipeline fetches
from. The pipeline must reproduce, bit-for-bit:

* the fetch log (seq-sorted sequence of fetched canonical URLs) — "crawl
  order equality";
* the URL-seen and title-seen sets;
* every accepted article row and its interleaved span sequence
  ``(kind, text, media_ref, order)``.

Semantics specification (shared with `pipeline.py`; deviations from the
reference scripts are deliberate determinism fixes documented in SURVEY §2.9):

1. BFS wave loop over the frontier; within a wave rows are processed in
   ``discovered_seq`` order (site → depth → seed → page → DOM).
2. Listing item checks, in order: href validity → canonicalize → off-host
   drop → robots → URL-seen (insert at check) → exact-title-seen for the
   3 title-seen sites (insert at check) → pre-fetch relevance for sites
   whose match target is available pre-fetch (title / title+lead).
3. Two-hop sites enqueue surviving candidates for the next wave (the detail
   fetch); single-hop sites finalize directly from listing fields.
4. Detail pages: post-fetch relevance on title+summary (voa/skydaily
   variant), then time-parse (drop on failure), recency window (google).
5. Fuzzy near-dup title dedup (google) runs over accepted docs in seq order,
   first-accepted-wins, threshold preserved verbatim.
6. Pagination: next page scheduled while the current page has ≥1 item and
   the per-site cap allows (until-empty category → unbounded).
7. Per-host fetch budget (when set) is consumed in wave order, seq order
   within a wave — identical to the pipeline's scheduler.
"""

from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass, field
from urllib.parse import urlparse

from .canonicalize import canonicalize, is_valid_href
from .datefns import within_last_days
from .extract import (
    decode_payload,
    finalize_article,
    make_seq,
    parse_article_for,
    parse_listing_for,
)
from .policy import CrawlPolicy
from .sites import SITE_RANK, SITES
from .synth import SyntheticWeb
from .textfns import KeywordMatcher, fuzzy_is_dup, html_to_text, normalize_for_fuzzy


def make_matcher(web: SyntheticWeb, cfg) -> KeywordMatcher:
    return KeywordMatcher(
        web.includes,
        web.excludes,
        variant=cfg.relevance,
        check_exclude=cfg.check_exclude,
        min_matches=cfg.min_include_matches,
        floor_on_small=cfg.min_floor_on_small_lists,
    )


def effective_page_cap(cfg, category: str) -> int:
    if cfg.paginate_until_empty and category == "breakingnews":
        return 1 << 30
    return cfg.page_cap


@dataclass
class OracleResult:
    fetch_log: list[dict] = field(default_factory=list)
    articles: list[dict] = field(default_factory=list)  # accepted, seq order
    url_seen: set = field(default_factory=set)  # (site, canon_url)
    title_seen: set = field(default_factory=set)  # (site, title)
    metrics: dict = field(default_factory=dict)  # (site, counter) -> int

    def fetch_order(self) -> list[tuple[int, str]]:
        return sorted((f["seq"], f["canon_url"]) for f in self.fetch_log)


def run_oracle(
    web: SyntheticWeb,
    policy: CrawlPolicy | None = None,
    pre_seen_urls: set | None = None,
) -> OracleResult:
    policy = policy or CrawlPolicy()
    res = OracleResult()
    if pre_seen_urls:
        # S5 existing-output bootstrap: (site, canon_url) tuples loaded from
        # a prior run's JSON exports (the reference's get_existing_links)
        res.url_seen.update(pre_seen_urls)
    metrics: dict = defaultdict(int)
    matchers = {site: make_matcher(web, SITES[site]) for site in SITES}
    budget_used: dict[str, int] = defaultdict(int)

    frontier: list[dict] = []
    for s in web.seeds():
        cfg = SITES[s["site"]]
        canon, host = canonicalize(s["url"], s["url"])
        frontier.append(
            {
                "site": s["site"],
                "kind": "listing",
                "canon_url": canon,
                "host": host,
                "category": s["category"],
                "seed_rank": s["seed_rank"],
                "page_no": 1,
                "seq": make_seq(SITE_RANK[s["site"]], 0, s["seed_rank"], 1, 0),
                "title": None,
            }
        )

    accepted: list[dict] = []
    for wave in range(policy.max_waves):
        if not frontier:
            break
        frontier.sort(key=lambda r: r["seq"])
        next_frontier: list[dict] = []
        for row in frontier:
            cfg = SITES[row["site"]]
            host = row["host"]
            if policy.host_budget is not None and budget_used[host] >= policy.host_budget:
                metrics[(cfg.site, "dropped_budget")] += 1
                continue
            budget_used[host] += 1
            res.fetch_log.append(
                {
                    "seq": row["seq"],
                    "canon_url": row["canon_url"],
                    "host": host,
                    "site": cfg.site,
                    "wave": wave,
                }
            )
            metrics[(cfg.site, "fetched")] += 1
            status, enc, payload = web.fetch(row["canon_url"])
            if status != 200:
                metrics[(cfg.site, "fetch_error")] += 1
                continue
            html = decode_payload(payload, enc)
            if row["kind"] == "listing":
                items = parse_listing_for(cfg, html)
                metrics[(cfg.site, "items")] += len(items)
                cap = effective_page_cap(cfg, row["category"])
                if items and row["page_no"] + 1 <= cap:
                    nxt_page = row["page_no"] + 1
                    nxt_url = f"https://{cfg.host}/sec/{row['category']}{row['seed_rank']}/p{nxt_page}"
                    canon, h = canonicalize(nxt_url, nxt_url)
                    next_frontier.append(
                        {
                            **row,
                            "canon_url": canon,
                            "host": h,
                            "page_no": nxt_page,
                            "seq": make_seq(
                                SITE_RANK[cfg.site], 0, row["seed_rank"], nxt_page, 0
                            ),
                        }
                    )
                for item in items:
                    seq_c = make_seq(
                        SITE_RANK[cfg.site], 1, row["seed_rank"], row["page_no"], item.dom_idx
                    )
                    if not is_valid_href(item.href):
                        metrics[(cfg.site, "dropped_invalid")] += 1
                        continue
                    canon_c, host_c = canonicalize(item.href, row["canon_url"])
                    if host_c != cfg.host:
                        metrics[(cfg.site, "dropped_offhost")] += 1
                        continue
                    if not policy.allowed(host_c, urlparse(canon_c).path):
                        metrics[(cfg.site, "dropped_robots")] += 1
                        continue
                    ukey = (cfg.site, canon_c)
                    if ukey in res.url_seen:
                        metrics[(cfg.site, "dropped_seen_url")] += 1
                        continue
                    res.url_seen.add(ukey)
                    if cfg.title_seen:
                        tkey = (cfg.site, item.title)
                        if tkey in res.title_seen:
                            metrics[(cfg.site, "dropped_seen_title")] += 1
                            continue
                        res.title_seen.add(tkey)
                    if cfg.match_target in ("title", "title+lead"):
                        target = item.title
                        if cfg.match_target == "title+lead" and item.lead:
                            target = item.title + " " + html_to_text(item.lead)
                        if not matchers[cfg.site].relevant(target):
                            metrics[(cfg.site, "dropped_relevance")] += 1
                            continue
                    if cfg.detail_hop:
                        next_frontier.append(
                            {
                                "site": cfg.site,
                                "kind": "article",
                                "canon_url": canon_c,
                                "host": host_c,
                                "category": row["category"],
                                "seed_rank": row["seed_rank"],
                                "page_no": row["page_no"],
                                "seq": seq_c,
                                "title": item.title,
                                "time_raw": item.time_raw,
                            }
                        )
                    else:
                        rec = finalize_article(
                            cfg,
                            canon_c,
                            item.title,
                            item.time_raw,
                            item.lead,
                            item.img,
                            seq_c,
                            policy.now,
                        )
                        if rec is None:
                            metrics[(cfg.site, "dropped_time")] += 1
                            continue
                        if cfg.recency_days is not None and not within_last_days(
                            rec["time"], policy.now, cfg.recency_days
                        ):
                            metrics[(cfg.site, "dropped_recency")] += 1
                            continue
                        accepted.append(rec)
            else:  # article detail page (two-hop sites)
                detail = parse_article_for(cfg, html)
                title = row["title"] or detail["title"]
                if cfg.match_target == "title+summary":
                    target = title
                    if detail["summary"]:
                        target = title + " " + html_to_text(detail["summary"])
                    if not matchers[cfg.site].relevant(target):
                        metrics[(cfg.site, "dropped_relevance")] += 1
                        continue
                traw = detail["time_raw"]
                if traw is None:  # time only on the listing (e.g. Daum)
                    traw = row.get("time_raw")
                rec = finalize_article(
                    cfg,
                    row["canon_url"],
                    title,
                    traw,
                    detail["summary"],
                    detail["img"],
                    row["seq"],
                    policy.now,
                )
                if rec is None:
                    metrics[(cfg.site, "dropped_time")] += 1
                    continue
                if cfg.recency_days is not None and not within_last_days(
                    rec["time"], policy.now, cfg.recency_days
                ):
                    metrics[(cfg.site, "dropped_recency")] += 1
                    continue
                accepted.append(rec)
        frontier = next_frontier

    # fuzzy near-dup title dedup, per fuzzy-enabled site, in seq order
    accepted.sort(key=lambda r: r["discovered_seq"])
    fuzzy_mem: dict[str, list[str]] = defaultdict(list)
    for rec in accepted:
        cfg = SITES[rec["site"]]
        if cfg.fuzzy_dedup:
            if fuzzy_is_dup(rec["title"], fuzzy_mem[cfg.site], cfg.fuzzy_threshold):
                metrics[(cfg.site, "dropped_fuzzy")] += 1
                continue
            fuzzy_mem[cfg.site].append(normalize_for_fuzzy(rec["title"]))
        metrics[(cfg.site, "accepted")] += 1
        res.articles.append(rec)

    res.metrics = dict(metrics)
    return res
