"""Per-wave checkpoint / resume + lineage & metrics (SURVEY.md §4.1, north_rule).

The reference's only checkpoint is its committed output JSON, re-parsed into
a URL-seen set on the next run — resume re-fetches every page. Here each
wave persists, under an ATOMIC manifest (write-tmp-then-rename):

* ``frontier_in.parquet`` / ``next_frontier.parquet`` — the exact frontier
  fed into / produced by the wave;
* ``fetch_log.parquet`` — lineage of what was fetched this wave (seq, url,
  host, site, virtual release time);
* ``docs.parquet`` — the wave's accepted article rows (a partitioned,
  resumable output layout: one directory per wave);
* ``seen/shard_*.json`` — exact dumps of every seen-set shard;
* ``sched.json`` — per-host politeness clocks + budget counters;
* ``metrics.json`` — per-wave row counts.

Resume restores shard/scheduler state and continues at wave k+1: no URL is
re-fetched (fetch-log equality with an uninterrupted run) and none dropped.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data


def _wave_dir(root: str, wave: int) -> str:
    return os.path.join(root, f"wave_{wave:03d}")


def _atomic_json(path: str, obj) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f)
    os.replace(tmp, path)


def write_frontier_in(root: str, wave: int, frontier: pa.Table) -> None:
    d = _wave_dir(root, wave)
    os.makedirs(d, exist_ok=True)
    pq.write_table(frontier, os.path.join(d, "frontier_in.parquet"))


def write_wave(
    root: str,
    wave: int,
    docs,  # pa.Table or ray.data.Dataset (docs stay distributed per wave)
    next_frontier: pa.Table,
    fetch_log: pa.Table,
    seen_shards: list,
    schedulers: list,
    metrics: dict,
) -> None:
    d = _wave_dir(root, wave)
    os.makedirs(os.path.join(d, "seen"), exist_ok=True)
    def _write(obj, name: str) -> None:
        if isinstance(obj, pa.Table):
            pq.write_table(obj, os.path.join(d, f"{name}.parquet"))
        else:  # parallel partitioned write straight from the object store
            obj.write_parquet(os.path.join(d, name))

    _write(docs, "docs")
    pq.write_table(next_frontier, os.path.join(d, "next_frontier.parquet"))
    _write(fetch_log, "fetch_log")
    dumps = ray.get([s.dump.remote() for s in seen_shards])
    for i, keys in enumerate(dumps):
        _atomic_json(os.path.join(d, "seen", f"shard_{i}.json"), keys)
    sched = ray.get([s.dump.remote() for s in schedulers])
    _atomic_json(os.path.join(d, "sched.json"), sched)
    _atomic_json(os.path.join(d, "metrics.json"), metrics)
    # manifest last — a wave is complete only once the manifest says so
    manifest_path = os.path.join(root, "manifest.json")
    manifest = {"completed_waves": []}
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            manifest = json.load(f)
    if wave not in manifest["completed_waves"]:
        manifest["completed_waves"].append(wave)
    _atomic_json(manifest_path, manifest)


def restore(pipeline, root: str) -> bool:
    """Rehydrate a CrawlPipeline from the last completed wave. Returns True
    if there was state to restore."""
    manifest_path = os.path.join(root, "manifest.json")
    if not os.path.exists(manifest_path):
        return False
    with open(manifest_path) as f:
        manifest = json.load(f)
    waves = sorted(manifest.get("completed_waves", []))
    if not waves:
        return False
    last = waves[-1]
    # accumulated docs + fetch logs from all completed waves (lineage replay)
    for w in waves:
        d = _wave_dir(root, w)
        def _read(name: str) -> pa.Table:
            f = os.path.join(d, f"{name}.parquet")
            return pq.read_table(f if os.path.exists(f) else os.path.join(d, name))

        pipeline.doc_tables.append(_read("docs"))
        pipeline.fetch_logs.append(_read("fetch_log"))
        with open(os.path.join(d, "metrics.json")) as f:
            pipeline.wave_metrics.append(json.load(f))
    d = _wave_dir(root, last)
    for i, shard in enumerate(pipeline.seen_shards):
        p = os.path.join(d, "seen", f"shard_{i}.json")
        with open(p) as f:
            keys = json.load(f)
        ray.get(shard.restore.remote(keys))
    with open(os.path.join(d, "sched.json")) as f:
        sched = json.load(f)
    ray.get(
        [s.restore.remote(state) for s, state in zip(pipeline.schedulers, sched)]
    )
    nxt = pq.read_table(os.path.join(d, "next_frontier.parquet"))
    pipeline.start_wave = last + 1
    pipeline._frontier0 = nxt
    return True
