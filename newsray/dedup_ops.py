"""Deduplication operators over `documents` / `embeddings` — exact,
MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup
(training-data pipeline extensions; the exact/near family generalizes the
reference's D1-D6 dedup semantics, SURVEY §2.7).

Scale shapes:
* exact     — content-hash + hash-partitioned first-writer-wins groupby;
* MinHash   — shingle→minhash per batch (vectorized), explode to
              (band, band_hash) rows, ONE groupby builds candidate buckets,
              pairs verified with exact Jaccard inside the group;
* SimHash   — 64-bit signature per batch, 4×16-bit band blocking groupby,
              Hamming-verified pairs;
* embedding — blocked matmul of each batch against the broadcast matrix
              (brute-force exact; the ANN module holds the LSH scale path).

All signatures/hashes are blake2b-derived — deterministic across processes.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from .registry import register
from .tabular import read

# ---------------------------------------------------------------------------
# exact dedup (D1: first-writer-wins on content identity)
# ---------------------------------------------------------------------------


@register(
    "dedup_exact_first",
    sql="""
    SELECT md5(text) AS content_hash, MIN(doc_id) AS first_doc_id,
           COUNT(*) AS n_copies
    FROM documents GROUP BY md5(text)
    """,
)
def dedup_exact_first(sf_dir: str):
    """Exact dedup: hash the content per batch, hash-partitioned groupby,
    min-doc_id wins (the deterministic analogue of the reference's
    first-seen-URL-wins, SURVEY D1/J1)."""
    from ray.data.aggregate import Count, Min

    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def h(b: pa.Table) -> pa.Table:
        hx = [hashlib.md5(t.encode()).hexdigest() for t in b["text"].to_pylist()]
        return pa.Table.from_pydict(
            {"doc_id": b["doc_id"], "content_hash": pa.array(hx, pa.string())}
        )

    return (
        ds.map_batches(h, batch_format="pyarrow")
        .groupby("content_hash")
        .aggregate(Min("doc_id", alias_name="first_doc_id"), Count(alias_name="n_copies"))
    )


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup (shingle → minhash → band → bucket groupby)
# ---------------------------------------------------------------------------

N_PERM = 64
N_BANDS = 16  # 16 bands × 4 rows
ROWS_PER_BAND = N_PERM // N_BANDS
JACCARD_T = 0.5
_MERSENNE = (1 << 31) - 1  # 31-bit universe keeps a*x+b inside int64


def _perm_params(seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=N_PERM, dtype=np.int64)
    b = rng.integers(0, _MERSENNE, size=N_PERM, dtype=np.int64)
    return a, b


def _shingles(text: str, k: int = 3) -> set[int]:
    toks = text.split(" ")
    if len(toks) < k:
        grams = [" ".join(toks)]
    else:
        grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    return {
        int.from_bytes(hashlib.blake2b(g.encode(), digest_size=8).digest(), "little") >> 33
        for g in grams
    }


def _minhash(sh: set[int], a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = np.fromiter(sh, dtype=np.int64, count=len(sh))
    # (a*x + b) mod p, row-wise min over shingles; 31-bit values → no overflow
    vals = (a[:, None] * x[None, :] + b[:, None]) % _MERSENNE
    return np.min(vals, axis=1).astype(np.int64)


@register("dedup_minhash_lsh")  # set-similarity join — not SQL-expressible
def dedup_minhash_lsh(sf_dir: str):
    """MinHash+LSH near-dup pairs: per-batch shingle/minhash, explode to one
    row per (band, band_hash, doc), ONE groupby co-locates candidate
    buckets, exact Jaccard verifies pairs inside the group. Returns verified
    pairs (doc_a < doc_b, jaccard ≥ 0.5). Driver check is rows-only."""
    a, b = _perm_params()
    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def bands(batch: pa.Table) -> pa.Table:
        out = {"band": [], "band_hash": [], "doc_id": [], "text": []}
        for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            mh = _minhash(_shingles(text), a, b)
            for band in range(N_BANDS):
                chunk = mh[band * ROWS_PER_BAND : (band + 1) * ROWS_PER_BAND]
                bh = hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
                out["band"].append(band)
                out["band_hash"].append(bh)
                out["doc_id"].append(doc_id)
                out["text"].append(text)  # carried for in-group verification
        return pa.Table.from_pydict(out)

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        rows = g.drop_duplicates("doc_id").sort_values("doc_id")
        if len(rows) < 2:
            return pd.DataFrame(
                {"doc_a": pd.Series([], dtype="int64"),
                 "doc_b": pd.Series([], dtype="int64"),
                 "jaccard": pd.Series([], dtype="float64")}
            )
        ids = rows["doc_id"].to_numpy()
        shs = [_shingles(t) for t in rows["text"]]
        out_a, out_b, out_j = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                inter = len(shs[i] & shs[j])
                if inter == 0:
                    continue
                jac = inter / len(shs[i] | shs[j])
                if jac >= JACCARD_T:
                    out_a.append(int(ids[i]))
                    out_b.append(int(ids[j]))
                    out_j.append(round(jac, 4))
        return pd.DataFrame({"doc_a": out_a, "doc_b": out_b, "jaccard": out_j})

    pairs = (
        ds.map_batches(bands, batch_format="pyarrow")
        .groupby(["band", "band_hash"])
        .map_groups(verify, batch_format="pandas")
    )
    # a pair can surface from several bands → exact-dedup the pair list
    return (
        pairs.groupby(["doc_a", "doc_b"])
        .map_groups(lambda g: g.head(1), batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# SimHash near-dup (64-bit signatures, banded Hamming blocking)
# ---------------------------------------------------------------------------

HAMMING_T = 8


def _simhash64(text: str) -> int:
    acc = np.zeros(64, dtype=np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    for tok in set(text.split(" ")):
        h = np.uint64(
            int.from_bytes(hashlib.blake2b(tok.encode(), digest_size=8).digest(), "little")
        )
        bits = (h >> shifts) & np.uint64(1)
        acc += np.where(bits == 1, 1, -1)
    sig = 0
    for i in range(64):
        if acc[i] > 0:
            sig |= 1 << i
    return sig


@register("dedup_simhash")  # signature similarity join — not SQL-expressible
def dedup_simhash(sf_dir: str):
    """SimHash near-dup pairs: 64-bit signature per doc, blocked by each of
    four 16-bit bands (a pair within Hamming ≤ 8 usually agrees on ≥1 band
    at this corpus's signature distribution), Hamming-verified in-group.
    Returns (doc_a < doc_b, hamming ≤ 8). Rows-only driver check."""
    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def sigs(batch: pa.Table) -> pa.Table:
        out = {"band": [], "band_val": [], "doc_id": [], "sig": []}
        for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            s = _simhash64(text)
            for band in range(4):
                out["band"].append(band)
                out["band_val"].append((s >> (16 * band)) & 0xFFFF)
                out["doc_id"].append(doc_id)
                out["sig"].append(s)
        return pa.Table.from_pydict(
            out,
            schema=pa.schema(
                [
                    ("band", pa.int64()),
                    ("band_val", pa.int64()),
                    ("doc_id", pa.int64()),
                    ("sig", pa.uint64()),  # top bit may be set
                ]
            ),
        )

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        rows = g.drop_duplicates("doc_id").sort_values("doc_id")
        ids = rows["doc_id"].to_numpy()
        sg = rows["sig"].to_numpy()
        out_a, out_b, out_h = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                ham = int(bin(int(sg[i]) ^ int(sg[j])).count("1"))
                if ham <= HAMMING_T:
                    out_a.append(int(ids[i]))
                    out_b.append(int(ids[j]))
                    out_h.append(ham)
        return pd.DataFrame(
            {"doc_a": pd.Series(out_a, dtype="int64"),
             "doc_b": pd.Series(out_b, dtype="int64"),
             "hamming": pd.Series(out_h, dtype="int64")}
        )

    pairs = (
        ds.map_batches(sigs, batch_format="pyarrow")
        .groupby(["band", "band_val"])
        .map_groups(verify, batch_format="pandas")
    )
    return pairs.groupby(["doc_a", "doc_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard similarity (exact, within same-source blocks)
# ---------------------------------------------------------------------------


@register(
    "ngram_jaccard_by_source",
    sql=None,
)
def ngram_jaccard_by_source(sf_dir: str):
    """Exact 3-gram Jaccard pairs within each `source` block (blocking key
    stands in for the reference's per-site scoping of fuzzy dedup, SURVEY
    D3): one groupby co-locates a source's docs, pairwise Jaccard ≥ 0.35
    in-group. Rows-only driver check."""
    ds = read(sf_dir, "documents", ["doc_id", "text", "source"])

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        shs = [_shingles(t) for t in g["text"]]
        out_a, out_b, out_j = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                u = len(shs[i] | shs[j])
                if u == 0:
                    continue
                jac = len(shs[i] & shs[j]) / u
                if jac >= 0.35:
                    out_a.append(int(ids[i]))
                    out_b.append(int(ids[j]))
                    out_j.append(round(jac, 4))
        return pd.DataFrame(
            {"doc_a": pd.Series(out_a, dtype="int64"),
             "doc_b": pd.Series(out_b, dtype="int64"),
             "jaccard": pd.Series(out_j, dtype="float64")}
        )

    return ds.groupby("source").map_groups(pairs, batch_format="pandas")


# ---------------------------------------------------------------------------
# embedding-cosine near-dup (brute-force exact; ANN module has the LSH path)
# ---------------------------------------------------------------------------

COS_T = 0.45  # calibrated to this corpus (max off-diag cos ≈ 0.51)


@register("dedup_embedding_cosine")
def dedup_embedding_cosine(sf_dir: str):
    """Embedding near-dup pairs: every batch is matmul'd against the full
    (broadcast) L2-normalized matrix — one ray.put, zero shuffle. Returns
    (vec_a < vec_b, cos ≥ COS_T). Rows-only driver check (float-boundary
    pairs make a SQL oracle flaky). At 10^10 scale the broadcast matrix is
    replaced by the LSH-bucketed path in ann.py."""
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(tbl["vec_id"].to_pylist(), dtype=np.int64)
    mat = np.asarray(tbl["embedding"].to_pylist(), dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    ref = ray.put((ids, mat))

    ds = read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def block(b: pa.Table) -> pa.Table:
        all_ids, all_mat = ray.get(ref)
        q_ids = np.asarray(b["vec_id"].to_pylist(), dtype=np.int64)
        q = np.asarray(b["embedding"].to_pylist(), dtype=np.float64)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        cos = q @ all_mat.T  # (batch, N)
        out_a, out_b, out_c = [], [], []
        for r in range(len(q_ids)):
            hits = np.nonzero((cos[r] >= COS_T) & (all_ids > q_ids[r]))[0]
            for h in hits:
                out_a.append(int(q_ids[r]))
                out_b.append(int(all_ids[h]))
                out_c.append(round(float(cos[r, h]), 4))
        return pa.Table.from_pydict(
            {
                "vec_a": pa.array(out_a, pa.int64()),
                "vec_b": pa.array(out_b, pa.int64()),
                "cos_sim": pa.array(out_c, pa.float64()),
            }
        )

    return ds.map_batches(block, batch_format="pyarrow", batch_size=1024)
