"""chunk→embed→index composition: probe pruning, idempotence, exactness."""

import json
import os

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _idx_dir(sf_dir):
    import hashlib

    from newsray.ragprep import CHUNK_INDEX_ROOT

    return os.path.join(
        CHUNK_INDEX_ROOT, hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    )


def test_probe_reads_only_probed_partitions(ray_session):
    """The query must read STRICTLY fewer partition dirs than the index
    holds (partition pruning — the 10^10-scale access path), and every dir
    it reads must belong to a probed prefix."""
    from newsray.ragprep import (
        N_PLANES,
        PREFIX_BITS,
        _query_embedding,
        build_chunk_index,
        probe_dirs,
        probe_set,
        signatures,
        stub_planes,
    )

    idx = build_chunk_index(SF, _idx_dir(SF))
    all_parts = {
        int(d.split("=", 1)[1]) for d in os.listdir(idx) if d.startswith("part=")
    }
    q = _query_embedding(SF)
    qsig = int(signatures(q[None, :], stub_planes())[0])
    probe = probe_set(qsig)
    dirs, parts = probe_dirs(idx, probe)
    probed_prefixes = {s >> (N_PLANES - PREFIX_BITS) for s in probe}
    assert set(parts) == probed_prefixes
    read_parts = {
        int(p.split("part=")[1].split(os.sep)[0]) for p in dirs
    }
    assert read_parts <= probed_prefixes
    assert read_parts <= all_parts
    # Hamming-≤2 multiprobe flips at most 2 of the top PREFIX_BITS bits →
    # ≤ 1 + 6 + 15 = 22 of the 64 prefixes; the corpus populates more
    assert len(read_parts) < len(all_parts)


def test_index_build_idempotent_and_fingerprinted(ray_session):
    from newsray.ragprep import build_chunk_index

    idx = build_chunk_index(SF, _idx_dir(SF))
    marker = os.path.join(idx, "_built.json")
    before = os.stat(marker).st_mtime_ns
    assert build_chunk_index(SF, _idx_dir(SF)) == idx  # marker match → no-op
    assert os.stat(marker).st_mtime_ns == before
    with open(marker) as f:
        m = json.load(f)
    os.replace(marker, marker + ".bak")  # stale/corrupt marker → rebuild
    with open(marker, "w") as f:
        json.dump({**m, "src_mtime_ns": m["src_mtime_ns"] - 1}, f)
    assert build_chunk_index(SF, _idx_dir(SF)) == idx
    with open(marker) as f:
        assert json.load(f) == m  # rebuilt with the true fingerprint


def test_chunk_embed_index_matches_sequential_golden(ray_session):
    from newsray.golden import golden_chunk_embed_index
    from newsray.ragprep import chunk_embed_index

    got = chunk_embed_index(SF).to_pandas()
    want = golden_chunk_embed_index(SF).to_pandas()
    assert len(got) == len(want) == 10
    for c in ("doc_id", "chunk_id", "cos_sim"):
        assert np.array_equal(got[c].to_numpy(), want[c].to_numpy()), c


def test_stub_embedder_batch_equals_sequential(ray_session):
    """The vectorized np.add.at scatter must be bit-equal to the sequential
    token-order sum (int64 ⇒ exact, but the row/index plumbing could still
    be wrong)."""
    import pyarrow as pa

    from newsray.ragprep import EMB_DIM, StubEmbedder, embed_tokens

    texts = ["a b c", "b b  c", "", "x " * 40]
    b = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "chunk_id": pa.array([0] * len(texts), pa.int64()),
            "chunk_text": pa.array(texts, pa.string()),
        }
    )
    out = StubEmbedder()(b)
    embs = np.asarray(out["emb"].to_pylist(), dtype=np.int64)
    for i, t in enumerate(texts):
        assert np.array_equal(embs[i], embed_tokens(t.split(" "))), i
        assert out["n2"][i].as_py() == int(embs[i] @ embs[i])
