"""Output sinks (SURVEY.md §2.1 K1-K3, §2.6 O1-O3).

The reference rewrites one whole JSON file per site per run (day-grouped,
merged, deduped at save time) and a JS aggregator keeps a newest-50 feed.
Here the same shapes become:

* ``write_documents`` — the interleaved documents table as PARTITIONED
  parquet, one directory per (site, date_group): the resumable layout
  (a rerun skips finished partitions; nothing is one giant file). Lance is
  not installed in this sandbox; the writer targets an identical Arrow
  schema so a Lance backend is a drop-in (SURVEY §7.5.6).
* ``day_grouped_export`` — the reference's per-site day-group JSON shape
  (articles time-desc inside a group for sort-in-group sites, discovery
  order otherwise; day groups sorted by date label).
* ``newest_feed`` — the aggregator's capped rolling feed: global top-K by
  (time desc, url) over the articles table.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from .pipeline import articles_to_documents, day_grouped
from .sites import SITES

try:  # the north_rule names Lance tables; pylance is not installed in this
    # sandbox (and installs are disallowed), so the backend is probed at
    # import and the writer degrades to parquet with the IDENTICAL Arrow
    # schema — a Lance wheel makes it a drop-in with no caller changes.
    import lance  # type: ignore
except ImportError:  # pragma: no cover - sandbox has no lance wheel
    lance = None

DOCUMENTS_BACKEND = "lance" if lance is not None else "parquet"


def _write_part(docs: pa.Table, pdir: str) -> str:
    """One partition of the documents table, atomically, on the active
    backend. Lance writes a versioned dataset directory (its manifest commit
    is the atomicity boundary); parquet writes tmp-then-rename."""
    if lance is not None:
        path = os.path.join(pdir, "part-0.lance")
        lance.write_dataset(docs, path, mode="overwrite")
        return path
    path = os.path.join(pdir, "part-0.parquet")
    tmp = path + ".tmp"
    pq.write_table(docs, tmp)
    os.replace(tmp, path)
    return path


def _day_key(date_group: str) -> str:
    """Partition key from the FULL date of a day-group label
    ('2025년 04월 18일 금요일' → '2025-04-18'): the bare day-of-month token
    would collide articles from the 18th of different months/years."""
    parts = date_group.split(" ")
    try:
        y = parts[0].rstrip("년")
        m = parts[1].rstrip("월")
        d = parts[2].rstrip("일")
        if y.isdigit() and m.isdigit() and d.isdigit():
            return f"{y}-{m.zfill(2)}-{d.zfill(2)}"
    except IndexError:
        pass
    return "unknown"


def _load_manifest(out_dir: str) -> tuple[str | None, frozenset[str]]:
    """(run_id, completed-partition skip-list). The manifest is SCOPED TO ONE
    EXPORT RUN: skipping a partition is only sound when the rows being
    written are the same rows that produced it. Unreadable/corrupt manifest
    → (None, empty): rewrite everything — idempotent, never wrong. A legacy
    bare-list manifest loads as run_id None."""
    path = os.path.join(out_dir, "_manifest.json")
    try:
        with open(path) as f:
            data = json.load(f)
        if isinstance(data, list):  # legacy shape
            return None, frozenset(data)
        if isinstance(data, dict) and isinstance(data.get("parts"), list):
            return data.get("run_id"), frozenset(data["parts"])
        return None, frozenset()
    except (OSError, ValueError):
        return None, frozenset()


def _resume_parts(out_dir: str, run_id: str | None) -> frozenset[str]:
    """Partitions safe to skip for THIS run: the manifest's list when its
    run_id matches, else a loud refusal — silently skipping another run's
    partitions would DROP the new run's rows that fall into them."""
    stored, parts = _load_manifest(out_dir)
    if not parts:
        return frozenset()
    if stored != run_id:
        raise RuntimeError(
            f"{out_dir} holds a completed export of a DIFFERENT run "
            f"(manifest run_id={stored!r}, this run={run_id!r}): writing "
            "into it would either skip or duplicate rows. Use a fresh "
            "output dir, or pass the original run_id to resume that export."
        )
    return parts


def _commit_manifest(out_dir: str, run_id: str | None, parts: set[str]) -> None:
    """Atomically record completed partitions (union with any prior list of
    the SAME run) — written only AFTER the data files are durable, so a
    crash between data write and manifest commit merely re-writes those
    partitions next run."""
    _stored, prior = _load_manifest(out_dir)
    manifest = os.path.join(out_dir, "_manifest.json")
    tmp = manifest + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"run_id": run_id, "parts": sorted(parts | set(prior))}, f)
    os.replace(tmp, manifest)


def _clean_unmanifested(out_dir: str, done: frozenset[str]) -> None:
    """Delete partition dirs present on disk but absent from the manifest:
    they are leftovers of a write that crashed before its manifest commit,
    and re-writing into them without cleanup would DUPLICATE their rows
    (Ray's write_parquet appends uniquely-named files, it does not
    overwrite)."""
    import shutil

    for root, dirs, _files in os.walk(out_dir):
        if not os.path.basename(root).startswith("site="):
            continue
        for d in list(dirs):
            if d.startswith("day="):
                label = f"{os.path.basename(root)}/{d}"
                if label not in done:
                    shutil.rmtree(os.path.join(root, d), ignore_errors=True)


def run_fingerprint(n: int, lo, hi, total) -> str:
    """Deterministic export-run identity from the articles' discovered_seq
    population (count/min/max/sum): identical for a crash-rerun of the same
    crawl, different whenever the article set changed — the property the
    resume skip-list's soundness rests on."""
    import hashlib as _h

    raw = f"{n}:{lo}:{hi}:{total}".encode()
    return _h.blake2b(raw, digest_size=8).hexdigest()


def write_documents(arts: pa.Table, out_dir: str) -> list[str]:
    """Write interleaved documents partitioned by (site, date_group digest).

    RESUMABLE within one export run: partitions listed in the root's
    ``_manifest.json`` (committed atomically after their data files, scoped
    to this run's fingerprint) are SKIPPED on a re-run of the SAME
    articles, so an interrupted export never re-writes finished work; a
    different article set aimed at the same dir REFUSES loudly instead of
    silently skipping its rows. Each partition file is itself written
    atomically (tmp + rename — so re-writing a partition replaces, never
    duplicates)."""
    os.makedirs(out_dir, exist_ok=True)
    seqs = arts["discovered_seq"].to_pylist() if arts.num_rows else []
    run_id = run_fingerprint(
        len(seqs), min(seqs, default=0), max(seqs, default=0), sum(seqs)
    )
    done = _resume_parts(out_dir, run_id)
    written = []
    sites = arts["site"].to_pylist()
    dates = arts["date_group"].to_pylist()
    by_part: dict[tuple[str, str], list[int]] = {}
    for i, (s, d) in enumerate(zip(sites, dates)):
        by_part.setdefault((s, _day_key(d)), []).append(i)
    new_parts: set[str] = set()
    for (site, day), idxs in sorted(by_part.items()):
        label = f"site={site}/day={day}"
        if label in done:
            continue  # finished in a prior (interrupted) run of these rows
        part = arts.take(idxs)
        docs = articles_to_documents(part)
        pdir = os.path.join(out_dir, f"site={site}", f"day={day}")
        os.makedirs(pdir, exist_ok=True)
        written.append(_write_part(docs, pdir))
        new_parts.add(label)
    _commit_manifest(out_dir, run_id, new_parts)
    return written


def write_documents_ds(arts_ds, out_dir: str) -> None:
    """The SCALE write path: articles as a distributed Dataset → interleaved
    documents written straight from the object store with
    ``Dataset.write_parquet(partition_cols=...)`` — one directory per
    (site, day), no driver materialization (the Table-based
    ``write_documents`` above stays for test-sized exports).

    RESUMABLE within one export run: finished partitions from the root's
    ``_manifest.json`` (scoped to this run's fingerprint — a DIFFERENT
    article set aimed at the same dir refuses loudly rather than silently
    skipping its rows) are filtered out INSIDE the partition map (the
    skip-list is a broadcast frozenset — O(partitions), never row data), so
    a re-run after a crash streams only the unfinished rows. Partition dirs
    on disk but NOT in the manifest are leftovers of a crashed write and
    are deleted first (write_parquet appends uniquely-named files — writing
    into them again would duplicate rows). The manifest commits atomically
    only after ``write_parquet`` returns (data durable first, bookkeeping
    second — a crash in between re-writes those partitions, never loses
    them)."""
    from ray.data.aggregate import Count, Max, Min, Sum

    from .pipeline import _spans_batch

    os.makedirs(out_dir, exist_ok=True)
    agg = arts_ds.aggregate(
        Count(alias_name="n"),
        Min("discovered_seq", alias_name="lo"),
        Max("discovered_seq", alias_name="hi"),
        Sum("discovered_seq", alias_name="total"),
    )
    run_id = run_fingerprint(
        int(agg["n"] or 0), agg["lo"] or 0, agg["hi"] or 0, agg["total"] or 0
    )
    done = _resume_parts(out_dir, run_id)
    _clean_unmanifested(out_dir, done)

    def spans_with_partition(b: pa.Table) -> pa.Table:
        docs = _spans_batch(b)
        sites = b["site"].to_pylist()
        day = [_day_key(d) for d in b["date_group"].to_pylist()]
        t = docs.append_column("site", b["site"]).append_column(
            "day", pa.array(day, pa.string())
        )
        if done:
            keep = [f"site={s}/day={d}" not in done for s, d in zip(sites, day)]
            t = t.filter(pa.array(keep, pa.bool_()))
        return t

    ds = arts_ds.map_batches(spans_with_partition, batch_format="pyarrow")
    ds.write_parquet(out_dir, partition_cols=["site", "day"])
    # partitions now present on disk = completed set (the write returned)
    parts = {
        f"{os.path.basename(root)}/{d}"
        for root, dirs, _files in os.walk(out_dir)
        for d in dirs
        if d.startswith("day=") and os.path.basename(root).startswith("site=")
    }
    _commit_manifest(out_dir, run_id, parts)


def read_documents(out_dir: str) -> pa.Table:
    """Read back a partitioned documents export on whichever backend wrote
    it (mixed trees read too — a resume after a backend swap still works)."""
    tables = []
    lance_parts = []
    for root, dirs, files in os.walk(out_dir):
        for d in list(dirs):
            if d.endswith(".lance"):
                lance_parts.append(os.path.join(root, d))
                dirs.remove(d)
    if not lance_parts:
        # pure-parquet tree: plain hive read (keeps site/day partition cols)
        return pq.read_table(out_dir)
    if lance is None:  # pragma: no cover - needs a lance wheel
        raise RuntimeError("lance-written export but no lance backend")
    for p in sorted(lance_parts):
        tables.append(lance.dataset(p).to_table())
    pq_files = [
        os.path.join(root, f)
        for root, _dirs, files in os.walk(out_dir)
        for f in files
        if f.endswith(".parquet")
    ]
    if pq_files:
        tables.append(pads.dataset(sorted(pq_files)).to_table())
    if not tables:
        return pq.read_table(out_dir)  # raises the standard empty-dir error
    return pa.concat_tables(tables, promote_options="default")


def day_grouped_export(arts: pa.Table, out_dir: str) -> dict[str, str]:
    """One JSON file per site, in the reference's day-grouped output shape:
    ``[{date, articles: [{title, time, img, url, original_url[, summary]}]}]``
    (K1; iso times, absent summary omitted — per-site record shapes)."""
    os.makedirs(out_dir, exist_ok=True)
    groups = day_grouped(arts)
    by_site: dict[str, list[dict]] = {}
    for g in groups:
        entry = {"date": g["date"], "articles": []}
        for a in g["articles"]:
            rec = {
                "title": a["title"],
                "time": a["time"].isoformat(),
                "img": a["img"],
                "url": a["url"],
                "original_url": a["original_url"],
            }
            if SITES[g["site"]].has_summary and a.get("summary"):
                rec["summary"] = a["summary"]
            entry["articles"].append(rec)
        by_site.setdefault(g["site"], []).append(entry)
    paths = {}
    for site in SITES:  # K2: every site gets a well-formed file, even empty
        payload = sorted(by_site.get(site, []), key=lambda e: e["date"])
        path = os.path.join(out_dir, f"{site}_News.json")
        tmp = path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(payload, f, ensure_ascii=False, indent=2)
        os.replace(tmp, path)
        paths[site] = path
    return paths


def get_existing_links(path: str) -> set[str]:
    """The reference's existing-output reader (SURVEY S5;
    `Google_Crawler.py:112-145` semantics — the most defensive of the ten):
    parse ONE site's day-grouped JSON output into its seen-URL set.
    Tolerance contract mirrored exactly: missing file → CREATE it with an
    empty list and return empty; non-list payload → reset (empty);
    malformed day entries / article records skipped; JSON decode error or
    any other read failure → empty set (start fresh)."""
    try:
        if not os.path.exists(path):
            with open(path, "w", encoding="utf-8") as f:
                json.dump([], f, ensure_ascii=False, indent=2)
            return set()
        with open(path, "r", encoding="utf-8") as f:
            data = json.load(f)
        if not isinstance(data, list):
            return set()
        links: set[str] = set()
        for day in data:
            if isinstance(day, dict) and isinstance(day.get("articles"), list):
                for a in day["articles"]:
                    if isinstance(a, dict) and "url" in a:
                        links.add(a["url"])
        return links
    except (json.JSONDecodeError, OSError):
        return set()
    except Exception:  # reference: ANY read error starts fresh
        return set()


def load_existing_links(out_dir: str) -> dict[str, set[str]]:
    """Every site's seen-URL set from a day-grouped export directory
    (`{site}_News.json` per site; absent files are created empty — the
    reference's first-run behavior). Feed files are feed-sized by
    construction, so the driver-side parse is the reference's own
    contract, not a corpus materialization."""
    os.makedirs(out_dir, exist_ok=True)
    return {
        site: get_existing_links(os.path.join(out_dir, f"{site}_News.json"))
        for site in SITES
    }


def merge_feed(new_items: list[dict], feed_path: str, cap: int = 50) -> list[dict]:
    """Aggregator load-merge (the missing ``crawler.js``'s behavior, fully
    specified by utils.js): LOAD the existing feed file (tolerant of a
    missing/corrupt file — utils.js:7-15), PREPEND the new items
    (utils.js:18), dedup by link keeping the first occurrence
    (utils.js:26-28 — new items win), cap at the newest ``cap``
    (utils.js:19), and atomically rewrite the file. Returns the merged
    feed list."""
    try:
        with open(feed_path, encoding="utf-8") as f:
            existing = json.load(f)
        if not isinstance(existing, list):
            existing = []
    except (OSError, json.JSONDecodeError):
        existing = []
    merged: list[dict] = []
    seen: set = set()
    for item in list(new_items) + existing:
        link = item.get("link") or item.get("url")
        if link in seen:
            continue
        seen.add(link)
        merged.append(item)
    merged = merged[:cap]
    tmp = feed_path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(merged, f, ensure_ascii=False, indent=2)
    os.replace(tmp, feed_path)
    return merged


def newest_feed(arts: pa.Table, cap: int = 50) -> pa.Table:
    """The aggregator's capped rolling feed (K3/O3): newest ``cap`` items by
    (time desc, url asc), link-deduped."""
    import pyarrow.compute as pc

    order = pc.sort_indices(
        arts, sort_keys=[("time", "descending"), ("url", "ascending")]
    )
    sorted_arts = arts.take(order)
    seen: set[str] = set()
    keep = []
    for u in sorted_arts["url"].to_pylist():
        keep.append(u not in seen)
        seen.add(u)
    deduped = sorted_arts.filter(pa.array(keep, pa.bool_()))
    return deduped.slice(0, cap)
