"""Unit tests for the wave-protocol building blocks added in round 2:
greedy title claim with retraction, replay-safe resolve, incremental dump
log, and the cost-striping permutation. All run on the undecorated actor
class — no Ray session needed."""

from __future__ import annotations

import pyarrow as pa

from newsray.seen import SeenShard


def _shard(capacity: int = 1 << 12):
    cls = SeenShard.__ray_actor_class__ if hasattr(SeenShard, "__ray_actor_class__") else SeenShard
    sh = cls.__new__(cls)
    cls.__init__(sh, 0, capacity)
    return sh


def test_claim_greedy_min_seq_with_retraction():
    sh = _shard()
    sh.begin_wave()
    # arrival order: seq 20 first (provisional win), then 10 (overtakes),
    # then 30 (loses), on the same title key
    assert sh.claim_insert(["t:k"], [20]) == [True]
    assert sh.claim_insert(["t:k"], [10]) == [True]
    assert sh.claim_insert(["t:k"], [30]) == [False]
    assert sh.wave_retractions() == [20]
    # replay of the winner stays True; replay of the retracted seq is False
    assert sh.claim_insert(["t:k"], [10]) == [True]
    assert sh.claim_insert(["t:k"], [20]) == [False]
    # next wave: the key is cross-wave seen regardless of retraction
    sh.begin_wave()
    assert sh.claim_insert(["t:k"], [5]) == [False]
    assert sh.wave_retractions() == []


def test_resolve_insert_replay_safe():
    sh = _shard()
    sh.begin_wave()
    sh.register_wave_min(["u:a", "u:b"], [7, 9])
    assert sh.resolve_insert(["u:a", "u:b"], [7, 9]) == [True, True]
    # a retried task re-presents the same accepted rows → same verdicts
    assert sh.resolve_insert(["u:a", "u:b"], [7, 9]) == [True, True]
    # a non-minimum seq never wins, replayed or not
    assert sh.resolve_insert(["u:a"], [8]) == [False]
    # next wave: cross-wave seen, and the replay window is closed
    sh.begin_wave()
    sh.register_wave_min(["u:a"], [7])
    assert sh.resolve_insert(["u:a"], [7]) == [False]


def test_dump_since_is_insertion_ordered_delta():
    sh = _shard()
    sh.begin_wave()
    sh.register_wave_min(["u:a", "u:b"], [1, 2])
    sh.resolve_insert(["u:a", "u:b"], [1, 2])
    off = sh.log_len()
    assert sorted(sh.dump_since(0)) == ["u:a", "u:b"]
    sh.begin_wave()
    sh.register_wave_min(["u:c"], [3])
    sh.resolve_insert(["u:c"], [3])
    assert sh.dump_since(off) == ["u:c"]  # delta ∝ new keys only
    # restore replay reproduces the exact set
    sh2 = _shard()
    sh2.restore(sh.dump_since(0))
    assert sh2.exact == sh.exact


def test_stripe_spreads_cost_classes():
    """Contiguous slices of a striped block each carry every k-th row — the
    expensive head-of-block rows (listings) land in distinct slices."""
    from newsray.pipeline import make_stripe

    k = 4
    n = 32
    b = pa.table({"i": list(range(n))})
    out = make_stripe(k)(b)
    vals = out["i"].to_pylist()
    assert sorted(vals) == list(range(n))  # a permutation, nothing dropped
    slice_len = n // k
    for j in range(k):
        sl = vals[j * slice_len : (j + 1) * slice_len]
        # each slice holds one residue class → consecutive originals split
        assert {v % k for v in sl} == {j}
        assert sl == sorted(sl)  # relative order preserved (stable)


def test_fuzzy_scan_tables_replay_and_retraction_safe():
    """The finalize scan dedupes replayed pushes (same seq twice — task
    retries / repeated finalize) and excludes retracted seqs, preserving
    the sequential first-accepted-wins semantics."""
    from newsray.pipeline import _fuzzy_scan_tables
    from newsray.sites import SITES

    site = next(s for s, c in SITES.items() if c.fuzzy_dedup)
    t = pa.table(
        {
            "site": [site] * 3,
            "discovered_seq": [10, 20, 30],
            "title": ["알파 경제 뉴스 속보", "알파 경제 뉴스 속보", "완전히 다른 제목 하나"],
        }
    )
    base = _fuzzy_scan_tables([t], frozenset())
    # seq 20 is an exact repeat of 10's title -> dropped; 10 and 30 accepted
    assert list(base) == [10, 30]
    # replayed push of the same projection: identical result
    assert list(_fuzzy_scan_tables([t, t], frozenset())) == [10, 30]
    # retraction of the first winner promotes nothing retroactively wrong:
    # 10 is excluded up front, so 20 becomes the first holder of that title
    assert list(_fuzzy_scan_tables([t, t], frozenset({10}))) == [20, 30]


def test_deferred_title_resolution_honors_url_retractions():
    """Fused-protocol cascade: the minimum title claimant can lose its URL
    claim to a lower-seq duplicate AFTER claiming the title; the title must
    then fall to the next VALID claimant, and a title whose every claimant
    was URL-retracted must stay unseen for later waves."""
    sh = _shard()
    sh.begin_wave()
    # three same-wave claimants of title T: seqs 100 (will be URL-retracted),
    # 120, 130; plus title X claimed only by 100
    assert sh.record_title_claim(["t:T", "t:T", "t:T", "t:X"], [100, 120, 130, 100]) == [
        True, True, True, True,
    ]
    drops = sh.resolve_titles([100])  # URL retraction kills seq 100
    # T falls to 120; 130 loses; 100's claims die with it
    assert 130 in drops and 120 not in drops
    assert sh.contains(["t:T"]) == [True]
    assert sh.contains(["t:X"]) == [False]  # no valid holder -> stays unseen
    # next wave: T is held, X is free
    sh.begin_wave()
    assert sh.record_title_claim(["t:T", "t:X"], [200, 201]) == [False, True]
    assert sh.resolve_titles([]) == []
    assert sh.contains(["t:X"]) == [True]


def test_fuzzy_buffer_spills_and_scans_exactly(ray_session):
    """VERDICT r2 #2: the per-site fuzzy buffer must spill to sorted parquet
    runs past spill_rows (actor RSS never holds the whole projection) and
    its streaming merge scan must equal the in-memory reference scan."""
    import numpy as np
    import ray as _ray

    from newsray.pipeline import FuzzyTitleBuffer, _fuzzy_scan_tables
    from newsray.sites import SITES

    site = next(s for s, c in SITES.items() if c.fuzzy_dedup)
    rng = np.random.default_rng(7)
    n = 5000
    seqs = rng.permutation(n * 3)[:n].astype("int64")  # unsorted arrival
    # a mix of unique titles and exact repeats (repeats dedup in the scan)
    titles = [
        f"고유한 제목 {int(s)} 뉴스" if s % 3 else "반복되는 동일 제목 뉴스" for s in seqs
    ]
    t = pa.table({"site": [site] * n, "discovered_seq": seqs, "title": titles})

    buf = FuzzyTitleBuffer.remote(site, spill_rows=512)
    for i in range(0, n, 250):  # pushed in arrival chunks
        _ray.get(buf.add.remote(t.slice(i, 250)))
    stats = _ray.get(buf.stats.remote())
    assert stats["n_spills"] >= 5, stats  # it really spilled
    assert stats["buffered_rows"] < 512, stats  # RSS bounded by spill_rows
    got = list(_ray.get(buf.scan.remote([])))
    want = list(_fuzzy_scan_tables([t], frozenset()))
    assert got == want
    # retraction drop applies identically through the merge path
    drop = [int(s) for s in sorted(seqs)[:50]]
    assert list(_ray.get(buf.scan.remote(drop))) == list(
        _fuzzy_scan_tables([t], frozenset(drop))
    )


def test_crawl_exact_with_tiny_fuzzy_spill(ray_session):
    """End-to-end: the real pipeline with a tiny spill threshold (every wave
    spills) still matches the sequential oracle exactly."""
    from newsray.oracle import run_oracle
    from newsray.pipeline import CrawlPipeline, PipelineConfig
    from newsray.policy import CrawlPolicy
    from newsray.synth import SyntheticWeb, WebParams

    params, policy = WebParams(only_sites=("google", "nate")), CrawlPolicy()
    res = CrawlPipeline(
        PipelineConfig(web_params=params, policy=policy, fuzzy_spill_rows=32)
    ).run(streaming_finalize=True)  # the buffer-scan path is the one spilling
    got = sorted(
        u for b in res["articles_ds"].iter_batches(batch_format="pyarrow")
        for u in b["url"].to_pylist()
    )
    ora = run_oracle(SyntheticWeb(params), policy)
    assert got == sorted(r["url"] for r in ora.articles)


def test_task_retry_side_effects_replay_safe(ray_session):
    """Chaos test: a fetch task dies AFTER its side effects (URL claims,
    fuzzy pushes) committed; Ray retries the task and the wave protocol must
    absorb the replay — same-seq claims re-present as wins, fuzzy pushes
    dedup by seq — so the final output still equals the sequential oracle."""
    import ray as _ray

    from newsray.oracle import run_oracle
    from newsray.pipeline import CrawlPipeline, PipelineConfig
    from newsray.policy import CrawlPolicy
    from newsray.synth import SyntheticWeb, WebParams

    @_ray.remote
    class FailOnce:
        def __init__(self):
            self.fired = 0

        def take(self) -> bool:
            self.fired += 1
            return self.fired <= 2  # kill the first two attempts' batches

        def count(self) -> int:
            return self.fired

    name = "nr_fault_once"
    inj = FailOnce.options(name=name).remote()
    params = WebParams(only_sites=("google", "nate", "naver"))
    policy = CrawlPolicy()
    res = CrawlPipeline(
        PipelineConfig(web_params=params, policy=policy, fault_inject_actor=name)
    ).run()
    assert _ray.get(inj.count.remote()) >= 3  # injections actually fired
    ora = run_oracle(SyntheticWeb(params), policy)
    got = sorted(zip(res["fetch_log"]["discovered_seq"].to_pylist(),
                     res["fetch_log"]["canon_url"].to_pylist()))
    # fetch-log rows from killed attempts are re-emitted by the retry; the
    # LOG may carry replays (lineage is at-least-once) but the accepted
    # ARTICLE set must be exactly the oracle's
    assert sorted(set(got)) == ora.fetch_order()
    assert sorted(res["articles"]["url"].to_pylist()) == sorted(
        r["url"] for r in ora.articles
    )
    _ray.kill(inj)


def test_runresult_dict_idioms(ray_session):
    """The streaming RunResult's lazy legacy keys must be visible to every
    dict idiom — .get / in / iteration / len / keys — not just [], so code
    written against the old finalize() dict keeps working unchanged."""
    import pyarrow as pa

    from newsray.pipeline import RunResult

    r = RunResult({"articles_ds": None, "fetch_logs": []})
    assert "articles" in r and "documents" in r and "fetch_log" in r
    assert "nope" not in r
    assert set(r.keys()) >= {"articles_ds", "articles", "documents", "fetch_log"}
    assert len(r) == len(list(r)) == 5
    assert r.get("nope") is None and r.get("nope", 7) == 7
    # fetch_log materializes through .get exactly like [] (empty logs → None)
    assert r.get("fetch_log", "sentinel") is None
    assert dict.__contains__(r, "fetch_log")  # cached after access
