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
* ``seen/shard_*.json`` — INCREMENTAL dumps of every seen-set shard: only
  the keys inserted since the previous completed wave (the manifest tracks
  per-shard log offsets), so checkpoint bytes per wave ∝ new URLs, not
  total URLs. Restore replays the deltas of every completed wave in order;
* ``sched.json`` — per-host politeness clocks + budget counters (O(hosts));
* ``metrics.json`` — per-wave row counts.

Crash safety: a wave directory is cleared before being re-written if the
manifest does not list the wave as completed (a crash mid-write must not
leave partial parquet files that a rerun would append to), and the manifest
records the shard counts + key-routing version so a resume with a different
topology fails loudly instead of silently dropping shard state.
"""

from __future__ import annotations

import json
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

ROUTING_VERSION = "blake2b64-mod"  # shard_of(key) routing; must match on resume


def _wave_dir(root: str, wave: int) -> str:
    return os.path.join(root, f"wave_{wave:03d}")


def _atomic_json(path: str, obj) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f)
    os.replace(tmp, path)


def _load_manifest(root: str) -> dict:
    manifest_path = os.path.join(root, "manifest.json")
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            return json.load(f)
    return {"completed_waves": []}


def _write_obj(d: str, obj, name: str) -> None:
    if isinstance(obj, pa.Table):
        pq.write_table(obj, os.path.join(d, f"{name}.parquet"))
    else:  # parallel partitioned write straight from the object store
        obj.write_parquet(os.path.join(d, name))


def _obj_path(d: str, name: str) -> str | None:
    """Concrete on-disk location of a checkpointed object (single parquet
    file for Table writes, a non-empty directory for Dataset writes), or
    None when nothing readable was written (an empty wave)."""
    f = os.path.join(d, f"{name}.parquet")
    if os.path.exists(f):
        return f
    p = os.path.join(d, name)
    if os.path.isdir(p) and any(
        fn.endswith(".parquet") for fn in os.listdir(p)
    ):
        return p
    return None


def _read_obj(d: str, name: str, schema: pa.Schema | None = None) -> pa.Table:
    f = os.path.join(d, f"{name}.parquet")
    path = f if os.path.exists(f) else os.path.join(d, name)
    try:
        t = pq.read_table(path)
    except (OSError, pa.ArrowInvalid):
        if schema is None:
            raise
        return pa.Table.from_pydict({n: [] for n in schema.names}, schema=schema)
    return t.cast(schema) if schema is not None and t.num_rows == 0 else t


def write_frontier_in(root: str, wave: int, frontier) -> None:
    d = _wave_dir(root, wave)
    # a wave dir that exists but is NOT in the manifest is a crashed attempt:
    # clear it so the rerun cannot read duplicated partial files
    if os.path.isdir(d) and wave not in _load_manifest(root).get("completed_waves", []):
        shutil.rmtree(d)
    os.makedirs(d, exist_ok=True)
    _write_obj(d, frontier, "frontier_in")


def write_wave(
    root: str,
    wave: int,
    docs,  # pa.Table or ray.data.Dataset (docs stay distributed per wave)
    next_frontier: pa.Table,
    fetch_log,  # pa.Table or ray.data.Dataset
    seen_shards: list,
    schedulers: list,
    metrics: dict,
) -> None:
    manifest = _load_manifest(root)
    # a wave the manifest already records complete must NEVER be re-written:
    # re-dumping deltas against already-advanced offsets would replace the
    # wave's seen/shard files with empty deltas while completed_waves still
    # claims the wave intact — a silently corrupted delta chain (ADVICE r2)
    if wave in manifest.get("completed_waves", []):
        raise ValueError(
            f"wave {wave} is already completed in the checkpoint at {root}; "
            "resume via checkpoint.restore (CrawlPipeline does this "
            "automatically when checkpoint_dir is set) instead of re-running"
        )
    d = _wave_dir(root, wave)
    os.makedirs(os.path.join(d, "seen"), exist_ok=True)
    _write_obj(d, docs, "docs")
    _write_obj(d, next_frontier, "next_frontier")
    _write_obj(d, fetch_log, "fetch_log")

    prev_offsets = manifest.get("seen_log_offsets", [0] * len(seen_shards))
    if len(prev_offsets) != len(seen_shards):
        raise ValueError(
            f"checkpoint at {root} tracks {len(prev_offsets)} seen shards; "
            f"pipeline has {len(seen_shards)}"
        )
    # a recorded offset AHEAD of the live shard log means this pipeline was
    # never restored from the checkpoint it is writing into — dump_since
    # would silently produce truncated/empty deltas (ADVICE r2)
    log_lens = ray.get([s.log_len.remote() for s in seen_shards])
    ahead = [i for i in range(len(seen_shards)) if prev_offsets[i] > log_lens[i]]
    if ahead:
        raise ValueError(
            f"checkpoint at {root} records seen-log offsets ahead of the live "
            f"shard logs (shards {ahead}): the pipeline was not restored from "
            "this checkpoint — call checkpoint.restore first or use a fresh dir"
        )
    deltas = ray.get(
        [s.dump_since.remote(prev_offsets[i]) for i, s in enumerate(seen_shards)]
    )
    for i, keys in enumerate(deltas):
        _atomic_json(os.path.join(d, "seen", f"shard_{i}.json"), keys)
    sched = ray.get([s.dump.remote() for s in schedulers])
    _atomic_json(os.path.join(d, "sched.json"), sched)
    _atomic_json(os.path.join(d, "metrics.json"), metrics)
    # manifest last — a wave is complete only once the manifest says so
    manifest["n_seen_shards"] = len(seen_shards)
    manifest["n_sched_shards"] = len(schedulers)
    manifest["routing"] = ROUTING_VERSION
    manifest["seen_log_offsets"] = [
        prev_offsets[i] + len(deltas[i]) for i in range(len(seen_shards))
    ]
    if wave not in manifest["completed_waves"]:
        manifest["completed_waves"].append(wave)
    _atomic_json(os.path.join(root, "manifest.json"), manifest)


def repair_wave_metrics(root: str, wave_metrics: list[dict]) -> None:
    """Overwrite each checkpointed wave's ``metrics.json`` with its
    post-barrier repaired values: per-wave checkpoints are written with
    possibly-lagged fire-and-forget counters mid-run, and without this a
    resumed run would permanently keep under-reported fetched/candidates/
    docs diagnostics for pre-crash waves. Metadata-only (never touches the
    seen-delta chain or data files); missing wave dirs are skipped (waves
    restored from an older checkpoint were not re-run here)."""
    for m in wave_metrics:
        d = _wave_dir(root, m["wave"])
        if os.path.isdir(d):
            _atomic_json(os.path.join(d, "metrics.json"), m)


def restore(pipeline, root: str) -> bool:
    """Rehydrate a CrawlPipeline from the last completed wave. Returns True
    if there was state to restore. Refuses a topology mismatch (shard counts
    / key routing) — positional restore into a different shard layout would
    silently route keys to shards the lookup never consults."""
    manifest_path = os.path.join(root, "manifest.json")
    if not os.path.exists(manifest_path):
        return False
    with open(manifest_path) as f:
        manifest = json.load(f)
    waves = sorted(manifest.get("completed_waves", []))
    if not waves:
        return False
    n_seen = manifest.get("n_seen_shards", len(pipeline.seen_shards))
    n_sched = manifest.get("n_sched_shards", len(pipeline.schedulers))
    routing = manifest.get("routing", ROUTING_VERSION)
    if n_seen != len(pipeline.seen_shards) or n_sched != len(pipeline.schedulers):
        raise ValueError(
            f"checkpoint topology mismatch: manifest has {n_seen} seen / "
            f"{n_sched} sched shards, pipeline has {len(pipeline.seen_shards)} / "
            f"{len(pipeline.schedulers)} — resume with the same shard counts"
        )
    if routing != ROUTING_VERSION:
        raise ValueError(
            f"checkpoint key-routing version {routing!r} != {ROUTING_VERSION!r}"
        )
    last = waves[-1]
    # accumulated docs + fetch logs from all completed waves (lineage
    # replay) as DATASETS over the checkpoint parquet — a resumed run must
    # not load the whole accumulated corpus onto the driver (VERDICT r2 #4);
    # per-wave seen-set DELTAS replay in wave order
    from .pipeline import WAVE_SCHEMA

    for w in waves:
        d = _wave_dir(root, w)
        docs_path = _obj_path(d, "docs")
        if docs_path is None:
            pipeline.doc_tables.append(
                pa.Table.from_pydict(
                    {n: [] for n in WAVE_SCHEMA.names}, schema=WAVE_SCHEMA
                )
            )
        else:
            pipeline.doc_tables.append(ray.data.read_parquet(docs_path))
            # finalize_streaming re-pushes these waves' fuzzy projections
            # with a distributed pruned read over the same files
            pipeline._restored_doc_paths.append(docs_path)
        flog_path = _obj_path(d, "fetch_log")
        if flog_path is None:
            pipeline.fetch_logs.append(
                pa.Table.from_pydict(
                    {n: [] for n in pipeline.FLOG_W_SCHEMA.names},
                    schema=pipeline.FLOG_W_SCHEMA,
                )
            )
        else:
            pipeline.fetch_logs.append(ray.data.read_parquet(flog_path))
        with open(os.path.join(d, "metrics.json")) as f:
            pipeline.wave_metrics.append(json.load(f))
        futs = []
        for i, shard in enumerate(pipeline.seen_shards):
            p = os.path.join(d, "seen", f"shard_{i}.json")
            with open(p) as f:
                keys = json.load(f)
            if keys:
                futs.append(shard.restore.remote(keys))
        ray.get(futs)
    d = _wave_dir(root, last)
    with open(os.path.join(d, "sched.json")) as f:
        sched = json.load(f)
    ray.get(
        [s.restore.remote(state) for s, state in zip(pipeline.schedulers, sched)]
    )
    from .pipeline import FRONTIER_SCHEMA

    nxt = _read_obj(d, "next_frontier", schema=FRONTIER_SCHEMA)
    pipeline.start_wave = last + 1
    pipeline._frontier0 = nxt
    pipeline._restored = True  # CrawlPipeline.run skips its auto-restore
    return True
