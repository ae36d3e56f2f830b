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
import pyarrow.compute as pc

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


def grid_buckets(n_rows: int, target_side: int, floor: int) -> int:
    """Pair-grid bucket count for blocked all-pairs ops: smallest power of
    two B ≥ floor with no grid cell side exceeding ~target_side rows.
    Per-cell work is (n/B)² and replication is ×B, so B must grow with the
    DATA (≈ n/target_side), not sit at a constant — a fixed B makes every
    cell quadratic in corpus size on a fixed cluster. The sequential golden
    derives B identically from the same row count so BLAS block shapes (and
    hence float bits) match the distributed plan."""
    b = floor
    while n_rows / b > target_side:
        b <<= 1
    return b


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


def _jaccard_pairs_df(ids: np.ndarray, shs: list[set[int]], thresh: float) -> pd.DataFrame:
    """Vectorized all-pairs Jaccard within a candidate bucket: doc×shingle
    incidence matmul for intersections (no Python pair loop — buckets can be
    large on homogeneous corpora)."""
    empty = pd.DataFrame(
        {"doc_a": pd.Series([], dtype="int64"),
         "doc_b": pd.Series([], dtype="int64"),
         "jaccard": pd.Series([], dtype="float64")}
    )
    if len(ids) < 2:
        return empty
    vocab: dict[int, int] = {}
    for s in shs:
        for x in s:
            vocab.setdefault(x, len(vocab))
    m = np.zeros((len(ids), len(vocab)), dtype=np.int32)
    for r, s in enumerate(shs):
        m[r, [vocab[x] for x in s]] = 1
    inter = m @ m.T
    sizes = m.sum(axis=1)
    union = sizes[:, None] + sizes[None, :] - inter
    jac = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
    iu, ju = np.triu_indices(len(ids), k=1)
    mask = jac[iu, ju] >= thresh
    if not mask.any():
        return empty
    return pd.DataFrame(
        {"doc_a": pd.Series(ids[iu[mask]], dtype="int64"),
         "doc_b": pd.Series(ids[ju[mask]], dtype="int64"),
         "jaccard": pd.Series(np.round(jac[iu, ju][mask], 4), dtype="float64")}
    )


def _jaccard_pairs_cross_df(
    ids_a: np.ndarray,
    shs_a: list[set[int]],
    ids_b: np.ndarray,
    shs_b: list[set[int]],
    thresh: float,
) -> pd.DataFrame:
    """Cross-bucket variant of `_jaccard_pairs_df`: every (a-side, b-side)
    pair ≥ thresh, emitted as (min id, max id) — one grid cell owns each
    unordered pair exactly once."""
    empty = pd.DataFrame(
        {"doc_a": pd.Series([], dtype="int64"),
         "doc_b": pd.Series([], dtype="int64"),
         "jaccard": pd.Series([], dtype="float64")}
    )
    if len(ids_a) == 0 or len(ids_b) == 0:
        return empty
    vocab: dict[int, int] = {}
    for s in list(shs_a) + list(shs_b):
        for x in s:
            vocab.setdefault(x, len(vocab))
    ma = np.zeros((len(ids_a), len(vocab)), dtype=np.int32)
    for r, s in enumerate(shs_a):
        ma[r, [vocab[x] for x in s]] = 1
    mb = np.zeros((len(ids_b), len(vocab)), dtype=np.int32)
    for r, s in enumerate(shs_b):
        mb[r, [vocab[x] for x in s]] = 1
    inter = ma @ mb.T
    union = ma.sum(axis=1)[:, None] + mb.sum(axis=1)[None, :] - inter
    jac = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
    ii, jj = np.nonzero(jac >= thresh)
    if len(ii) == 0:
        return empty
    xa, xb = ids_a[ii], ids_b[jj]
    return pd.DataFrame(
        {"doc_a": pd.Series(np.minimum(xa, xb), dtype="int64"),
         "doc_b": pd.Series(np.maximum(xa, xb), dtype="int64"),
         "jaccard": pd.Series(np.round(jac[ii, jj], 4), dtype="float64")}
    )


from .golden import golden_sql


def minhash_pairs_ds(ds, size_bytes: int | None = None):
    """MinHash+LSH near-dup pairs over ANY (doc_id, text) Dataset, fully
    shuffled-not-broadcast (no O(corpus) object is ever ray.put):

    1. per-batch shingle/minhash, explode to (band, band_hash, doc) rows —
       signatures only, text never rides this shuffle;
    2. ONE groupby co-locates candidate buckets → raw candidate PAIRS;
    3. the pair members RE-JOIN the input by doc_id (bucketed hash join)
       to pick up their texts;
    4. pairs co-locate by pair key; exact Jaccard verifies each pair
       (shingles computed once per distinct doc inside the bucket).

    Returns verified pairs (doc_a < doc_b, jaccard ≥ 0.5). Shared by
    `dedup_minhash_lsh` (whole corpus) and `cleanse.corpus_clean` (the
    post-filter survivor set)."""
    from .tabular import n_buckets

    a, b = _perm_params()
    B = n_buckets(size_bytes=size_bytes)

    # coarse partitions (each holds many LSH buckets); the band-row exchange
    # is signatures-only so partitions scale off the same corpus-size hint
    N_PARTS = n_buckets(min_b=64, size_bytes=size_bytes)

    def bands(batch: pa.Table) -> pa.Table:
        out = {"part": [], "band_hash": [], "doc_id": []}
        for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            mh = _minhash(_shingles(text), a, b)
            for band in range(N_BANDS):
                chunk = mh[band * ROWS_PER_BAND : (band + 1) * ROWS_PER_BAND]
                bh = f"{band}:" + hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
                out["part"].append(
                    int.from_bytes(hashlib.blake2b(bh.encode(), digest_size=4).digest(), "little")
                    % N_PARTS
                )
                out["band_hash"].append(bh)
                out["doc_id"].append(doc_id)
        return pa.Table.from_pydict(out)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        """One coarse partition = many LSH buckets: sub-group in pandas and
        emit each bucket's candidate pairs — map_groups over millions of
        1-row buckets is the Ray anti-pattern this avoids. Pairs only; the
        text joins back downstream. Almost every bucket holds ONE doc, so
        the vectorized size prefilter drops them before the Python pair
        loop ever runs — iterating the singleton groups in pandas was
        ~125 ms per partition (7.9 s of remote wall at sf0.1), the loop
        over actual collision buckets is microseconds."""
        d = g.drop_duplicates(["band_hash", "doc_id"])
        cnt = d.groupby("band_hash", sort=False)["doc_id"].transform("size")
        d = d[cnt >= 2]
        out_a, out_b = [], []
        for _, sub in d.groupby("band_hash", sort=True):
            ids = np.sort(sub["doc_id"].to_numpy())
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    out_a.append(int(ids[i]))
                    out_b.append(int(ids[j]))
        from .tabular import from_pandas_clean

        return from_pandas_clean(pd.DataFrame(
            {"doc_a": pd.Series(out_a, dtype="int64"),
             "doc_b": pd.Series(out_b, dtype="int64")}
        ))

    cand_pairs = (
        ds.map_batches(bands, batch_format="pyarrow")
        .groupby("part")
        .map_groups(bucket_pairs, batch_format="pandas")
    )

    # -- re-join members with their texts (bucketed hash join by doc_id) ----
    def members(b: pa.Table) -> pa.Table:
        n = b.num_rows
        member = pa.concat_arrays(
            [b["doc_a"].combine_chunks(), b["doc_b"].combine_chunks()]
        )
        rep = lambda col: pa.concat_arrays([col.combine_chunks()] * 2)  # noqa: E731
        return pa.Table.from_pydict(
            {
                "jb": pc.cast(pc.bit_wise_and(member, pa.scalar(B - 1)), pa.int64()),
                "member": member,
                "doc_a": rep(b["doc_a"]),
                "doc_b": rep(b["doc_b"]),
                "text": pa.nulls(2 * n, pa.string()),
            }
        )

    def corpus_side(b: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "jb": pc.cast(pc.bit_wise_and(b["doc_id"], pa.scalar(B - 1)), pa.int64()),
                "member": b["doc_id"],
                "doc_a": pa.nulls(b.num_rows, pa.int64()),
                "doc_b": pa.nulls(b.num_rows, pa.int64()),
                "text": b["text"],
            }
        )

    def attach_text(g: pd.DataFrame) -> pd.DataFrame:
        mem = g[g["doc_a"].notna()].drop_duplicates(["doc_a", "doc_b", "member"])
        if len(mem) == 0:
            # typed empty ARROW block: an empty pandas object column trips
            # Ray's block size estimator (np.vectorize on size-0) and logs
            # "Error calculating size for column 'text'" once per empty group
            return pa.Table.from_pydict(
                {
                    "doc_a": pa.array([], pa.int64()),
                    "doc_b": pa.array([], pa.int64()),
                    "member": pa.array([], pa.int64()),
                    "text": pa.array([], pa.string()),
                    "pb": pa.array([], pa.int64()),
                }
            )
        txt = dict(zip(g.loc[g["doc_a"].isna(), "member"], g.loc[g["doc_a"].isna(), "text"]))
        from .tabular import from_pandas_clean

        out = mem[["doc_a", "doc_b", "member"]].copy()
        out["doc_a"] = out["doc_a"].astype("int64")
        out["doc_b"] = out["doc_b"].astype("int64")
        out["text"] = out["member"].map(txt)
        out["pb"] = (out["doc_a"] * 1_000_003 + out["doc_b"]) & (B - 1)
        return from_pandas_clean(out)

    joined = (
        cand_pairs.map_batches(members, batch_format="pyarrow")
        .union(ds.map_batches(corpus_side, batch_format="pyarrow"))
        .groupby("jb")
        .map_groups(attach_text, batch_format="pandas")
    )

    # -- co-locate by pair, verify with exact Jaccard -----------------------
    def verify_pairs(g: pd.DataFrame) -> pd.DataFrame:
        cache: dict[int, set[int]] = {}

        def sh(doc: int, text: str) -> set[int]:
            s = cache.get(doc)
            if s is None:
                s = _shingles(text)
                cache[doc] = s
            return s

        rows_a, rows_b, rows_j = [], [], []
        for (da, db), sub in g.groupby(["doc_a", "doc_b"], sort=True):
            sub = sub.drop_duplicates("member")
            if len(sub) != 2:
                continue  # partial pair (member text missing) — impossible here
            texts = dict(zip(sub["member"], sub["text"]))
            sa, sb = sh(int(da), texts[da]), sh(int(db), texts[db])
            union = len(sa | sb)
            jac = len(sa & sb) / union if union else 0.0
            if jac >= JACCARD_T:
                rows_a.append(int(da))
                rows_b.append(int(db))
                rows_j.append(float(np.round(jac, 4)))
        return pd.DataFrame(
            {"doc_a": pd.Series(rows_a, dtype="int64"),
             "doc_b": pd.Series(rows_b, dtype="int64"),
             "jaccard": pd.Series(rows_j, dtype="float64")}
        )

    return joined.groupby("pb").map_groups(verify_pairs, batch_format="pandas")


@register("dedup_minhash_lsh", sql=golden_sql("dedup_minhash_lsh"))
def dedup_minhash_lsh(sf_dir: str):
    """Verified MinHash/LSH near-dup pairs over the whole documents table;
    hash-diffed against a sequential brute-force golden oracle (golden.py).
    See `minhash_pairs_ds` for the distributed plan."""
    ds = read(sf_dir, "documents", ["doc_id", "text"])
    return minhash_pairs_ds(ds, size_bytes=ds.size_bytes())


# ---------------------------------------------------------------------------
# SimHash near-dup (64-bit signatures, banded Hamming blocking)
# ---------------------------------------------------------------------------

HAMMING_T = 4

_POPCNT8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def _hamming_pairs(sg: np.ndarray, thresh: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """All (i<j) index pairs with popcount(sg[i]^sg[j]) ≤ thresh, fully
    vectorized (outer XOR + byte-LUT popcount) — in-bucket verification must
    not be a Python pair loop on skewed buckets."""
    n = len(sg)
    x = np.bitwise_xor.outer(sg, sg)  # (n, n) uint64
    ham = _POPCNT8[x.view(np.uint8).reshape(n, n, 8)].sum(axis=2).astype(np.int64)
    iu, ju = np.triu_indices(n, k=1)
    mask = ham[iu, ju] <= thresh
    return iu[mask], ju[mask], ham[iu, ju][mask]


def _simhash64(text: str) -> int:
    """Count-weighted 64-bit SimHash (Charikar): token features weighted by
    frequency — unweighted signatures collapse on homogeneous vocabularies."""
    from collections import Counter

    acc = np.zeros(64, dtype=np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    for tok, cnt in Counter(text.split(" ")).items():
        h = np.uint64(
            int.from_bytes(hashlib.blake2b(tok.encode(), digest_size=8).digest(), "little")
        )
        bits = ((h >> shifts) & np.uint64(1)).astype(np.int64)
        acc += cnt * (2 * bits - 1)
    sig = 0
    for i in range(64):
        if acc[i] > 0:
            sig |= 1 << i
    return sig


@register("dedup_simhash", sql=golden_sql("dedup_simhash"))
def dedup_simhash(sf_dir: str):
    """SimHash near-dup pairs: 64-bit signature per doc, blocked by each of
    four 16-bit bands (a pair within Hamming ≤ 8 usually agrees on ≥1 band
    at this corpus's signature distribution), Hamming-verified in-group.
    Returns (doc_a < doc_b, hamming ≤ HAMMING_T); hash-diffed against a
    sequential golden oracle (golden.py)."""
    ds = read(sf_dir, "documents", ["doc_id", "text"])

    from .tabular import n_buckets

    N_PARTS = n_buckets(min_b=64, size_bytes=ds.size_bytes())

    def sigs(batch: pa.Table) -> pa.Table:
        out = {"part": [], "band": [], "band_val": [], "doc_id": [], "sig": []}
        for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            s = _simhash64(text)
            for band in range(4):
                bv = (s >> (16 * band)) & 0xFFFF
                # coarse partition: one group = MANY (band, band_val)
                # buckets — map_groups over ~65k mostly-singleton 16-bit
                # buckets paid ~1-15 ms of pandas slice/convert per group
                # (18.9 s of remote wall at sf0.1)
                out["part"].append((band * 0x10001 + bv * 2_654_435_761) % N_PARTS)
                out["band"].append(band)
                out["band_val"].append(bv)
                out["doc_id"].append(doc_id)
                out["sig"].append(s)
        return pa.Table.from_pydict(
            out,
            schema=pa.schema(
                [
                    ("part", pa.int64()),
                    ("band", pa.int64()),
                    ("band_val", pa.int64()),
                    ("doc_id", pa.int64()),
                    ("sig", pa.uint64()),  # top bit may be set
                ]
            ),
        )

    def verify(g: pd.DataFrame) -> pa.Table:
        # one coarse partition: vectorized size prefilter drops singleton
        # (band, band_val) buckets, the hamming check runs only on actual
        # collisions (same shape as minhash bucket_pairs)
        from .tabular import from_pandas_clean

        d = g.drop_duplicates(["band", "band_val", "doc_id"])
        cnt = d.groupby(["band", "band_val"], sort=False)["doc_id"].transform("size")
        d = d[cnt >= 2]
        out_a, out_b, out_h = [], [], []
        for _, sub in d.groupby(["band", "band_val"], sort=True):
            rows = sub.sort_values("doc_id")
            ids = rows["doc_id"].to_numpy()
            sg = rows["sig"].to_numpy().astype(np.uint64)
            ii, jj, ham = _hamming_pairs(sg, HAMMING_T)
            out_a.extend(ids[ii])
            out_b.extend(ids[jj])
            out_h.extend(ham)
        return from_pandas_clean(pd.DataFrame(
            {"doc_a": pd.Series(out_a, dtype="int64"),
             "doc_b": pd.Series(out_b, dtype="int64"),
             "hamming": pd.Series(out_h, dtype="int64")}
        ))

    pairs = (
        ds.map_batches(sigs, batch_format="pyarrow")
        .groupby("part")
        .map_groups(verify, batch_format="pandas")
    )
    from ray.data.aggregate import Min

    return pairs.groupby(["doc_a", "doc_b"]).aggregate(
        Min("hamming", alias_name="hamming")
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard similarity (exact, within same-source blocks)
# ---------------------------------------------------------------------------


@register("ngram_jaccard_by_source", sql=golden_sql("ngram_jaccard_by_source"))
def ngram_jaccard_by_source(sf_dir: str):
    """Exact 3-gram Jaccard pairs within each `source` block (blocking key
    stands in for the reference's per-site scoping of fuzzy dedup, SURVEY
    D3), semantics: every same-source pair with Jaccard ≥ 0.35.

    Scale shape: a naive ``groupby(source)`` would land an ENTIRE source in
    one pandas group — all-pairs in one task, fatal when one source is a
    100-TB slice. Instead each doc hash-buckets by id and replicates to the
    G grid cells that pair its bucket with every other; one groupby on
    (source, cell_a, cell_b) co-locates two buckets at a time, so per-task
    work is (n/G)² with G² × sources cells of parallelism (the same
    pair-grid as `dedup_embedding_cosine`; replication factor = G). G is
    derived from the corpus size (`grid_buckets`), and what rides the
    shuffle is each doc's SHINGLE-HASH SET (list<int64>), computed once in
    the explode — not the G×-replicated raw text. Identical pair set to the
    per-source all-pairs — golden-oracle value-checked. (The sf0.01 corpus
    genuinely contains exactly ONE same-source pair at threshold 0.35 —
    confirmed independently by the sequential brute-force golden.)"""
    ds = read(sf_dir, "documents", ["doc_id", "text", "source"])
    G = grid_buckets(ds.count(), target_side=20_000, floor=4)

    def explode(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_pylist()
        texts = b["text"].to_pylist()
        srcs = b["source"].to_pylist()
        out = {"source": [], "ca": [], "cb": [], "doc_id": [], "sh": []}
        for d, t, s in zip(ids, texts, srcs):
            sh = sorted(_shingles(t))  # hashed once; text never ships
            g = d & (G - 1)
            for other in range(G):  # G distinct cells per doc, (g, g) once
                ca, cb = (g, other) if g <= other else (other, g)
                out["source"].append(s)
                out["ca"].append(ca)
                out["cb"].append(cb)
                out["doc_id"].append(d)
                out["sh"].append(sh)
        return pa.Table.from_pydict(
            {
                "source": pa.array(out["source"], pa.string()),
                "ca": pa.array(out["ca"], pa.int64()),
                "cb": pa.array(out["cb"], pa.int64()),
                "doc_id": pa.array(out["doc_id"], pa.int64()),
                "sh": pa.array(out["sh"], pa.list_(pa.int64())),
            }
        )

    def cell_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("doc_id").sort_values("doc_id")
        ca, cb = int(g["ca"].iloc[0]), int(g["cb"].iloc[0])
        ids = g["doc_id"].to_numpy()
        bucket = ids & (G - 1)
        shs = [set(x) for x in g["sh"]]
        if ca == cb:
            sel = np.nonzero(bucket == ca)[0]
            return _jaccard_pairs_df(ids[sel], [shs[i] for i in sel], 0.35)
        sa, sb = np.nonzero(bucket == ca)[0], np.nonzero(bucket == cb)[0]
        return _jaccard_pairs_cross_df(
            ids[sa], [shs[i] for i in sa],
            ids[sb], [shs[i] for i in sb],
            0.35,
        )

    return (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby(["source", "ca", "cb"])
        .map_groups(cell_pairs, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# embedding-cosine near-dup (brute-force exact; ANN module has the LSH path)
# ---------------------------------------------------------------------------

COS_T = 0.45  # calibrated to this corpus (max off-diag cos ≈ 0.51)


def emb_grid_buckets(n_vectors: int) -> int:
    """Pair-block grid for embedding all-pairs: B grows with the corpus so
    no cell side exceeds ~8k vectors (cell work is a (n/B)² matmul,
    replication ×B). Shared by the pipeline and the sequential golden —
    both derive B from the same row count, keeping BLAS shapes identical."""
    return grid_buckets(n_vectors, target_side=8192, floor=8)


def _emb_pair_block(ids: np.ndarray, mat: np.ndarray, ga: int, gb: int, B: int):
    """Exact cosine pairs ≥ COS_T between bucket ga and bucket gb of an
    id-bucketed corpus slice (ids sorted ascending, rows L2-normalized).
    One (ga, gb) grid cell owns each pair exactly once: within-bucket cells
    emit upper-triangle pairs; cross cells emit every (a-side, b-side) hit
    ordered (min, max). Shared by the distributed path and the sequential
    golden so the BLAS shapes — hence the float64 bits — are identical."""
    bucket = ids & (B - 1)
    if ga == gb:
        sel = np.nonzero(bucket == ga)[0]
        sids, sm = ids[sel], mat[sel]
        cos = sm @ sm.T
        iu, ju = np.triu_indices(len(sids), k=1)
        mask = cos[iu, ju] >= COS_T
        return sids[iu[mask]], sids[ju[mask]], cos[iu, ju][mask]
    sa = np.nonzero(bucket == ga)[0]
    sb = np.nonzero(bucket == gb)[0]
    aids, bids = ids[sa], ids[sb]
    cos = mat[sa] @ mat[sb].T
    ii, jj = np.nonzero(cos >= COS_T)
    x, y = aids[ii], bids[jj]
    return np.minimum(x, y), np.maximum(x, y), cos[ii, jj]


@register("dedup_embedding_cosine", sql=golden_sql("dedup_embedding_cosine"))
def dedup_embedding_cosine(sf_dir: str):
    """Embedding near-dup pairs, exact, with NO O(corpus) broadcast and no
    driver-side read: bucketed block all-pairs. Each vector hashes to one of
    B id-buckets and is replicated to the B grid cells (min(i,j), max(i,j))
    its bucket participates in; ONE groupby co-locates each cell, which
    matmuls its two (sorted, normalized) sides and keeps cos ≥ COS_T. Every
    pair lands in exactly one cell, so no post-distinct is needed. Total
    compute stays the exact n²/2; replication is ×B and per-cell work is
    (n/B)², with B derived from the corpus row count (`emb_grid_buckets` —
    the all-pairs exchange analogue of the bucketed hash join).
    Value-checked against a sequential golden that walks the same grid with
    the same BLAS shapes (golden.py); the sub-quadratic approximate path
    for high-similarity regimes is the LSH module in ann.py."""
    ds = read(sf_dir, "embeddings", ["vec_id", "embedding"])
    B = emb_grid_buckets(ds.count())

    def explode(b: pa.Table) -> pa.Table:
        ids = b["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        bucket = ids & (B - 1)
        n = len(ids)
        # one emission per (vector, other-bucket): cell = sorted pair
        other = np.tile(np.arange(B, dtype=np.int64), n)
        own = np.repeat(bucket, B)
        idx = np.repeat(np.arange(n), B)
        ga, gb = np.minimum(own, other), np.maximum(own, other)
        emb = b["embedding"].combine_chunks().take(pa.array(idx, pa.int64()))
        return pa.Table.from_pydict(
            {
                "cell": pa.array(ga * B + gb, pa.int64()),
                "vec_id": pa.array(ids[idx], pa.int64()),
                "embedding": emb,
            }
        )

    def verify_cell(g: pd.DataFrame) -> pd.DataFrame:
        cell = int(g["cell"].iloc[0])
        ga, gb = cell // B, cell % B
        g = g.drop_duplicates("vec_id").sort_values("vec_id")
        ids = g["vec_id"].to_numpy().astype(np.int64)
        mat = np.asarray(list(g["embedding"]), dtype=np.float64)
        mat /= np.linalg.norm(mat, axis=1, keepdims=True)
        a, b_, c = _emb_pair_block(ids, mat, ga, gb, B)
        return pd.DataFrame(
            {
                "vec_a": pd.Series(a, dtype="int64"),
                "vec_b": pd.Series(b_, dtype="int64"),
                "cos_sim": pd.Series(np.round(c, 4), dtype="float64"),
            }
        )

    return (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("cell")
        .map_groups(verify_cell, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# near-dup clusters: pairs → connected components (what a training-data
# pipeline actually consumes: one keeper per duplicate group)
# ---------------------------------------------------------------------------


def pairs_to_clusters(pairs):
    """Connected components over a near-dup pair Dataset via iterative
    min-label propagation, with the label table kept DISTRIBUTED
    end-to-end (no per-round driver dict — a pair graph at 100 TB does not
    fit one node):

    * round 0 is fused into initialization: label(node) = min(node, min nbr)
      straight off ONE groupby(node);
    * each later round joins neighbour labels onto the edge list with a
      bucketed hash join (by nbr), takes the per-node minimum, and joins the
      result back against the current labels (by node) — three shuffles over
      edge-sized data, zero broadcasts;
    * labels only ever DECREASE, so convergence is detected by comparing
      the scalar sum(label) between rounds (the only value the driver sees);
      the loop runs UNTIL stable (diameter ≤ node count guarantees
      termination) and raises loudly if the node-count bound is ever
      exceeded — a silent round cap would hand back unconverged labels on
      long near-dup chains.

    Converges in O(component diameter) rounds — duplicate clusters are
    near-cliques. Returns (doc_id, cluster_id = component min, is_keeper);
    golden-checked against a sequential union-find (golden.py)."""
    from ray.data.aggregate import Min

    from .tabular import n_buckets

    pairs = pairs.materialize()
    if pairs.count() == 0:
        import ray.data

        return ray.data.from_pandas(
            pd.DataFrame(
                {"doc_id": pd.Series([], dtype="int64"),
                 "cluster_id": pd.Series([], dtype="int64"),
                 "is_keeper": pd.Series([], dtype="bool")}
            )
        )
    B = n_buckets(size_bytes=pairs.size_bytes() * 2)

    def to_edges(b: pa.Table) -> pa.Table:
        node = pa.concat_arrays([b["doc_a"].combine_chunks(), b["doc_b"].combine_chunks()])
        nbr = pa.concat_arrays([b["doc_b"].combine_chunks(), b["doc_a"].combine_chunks()])
        return pa.Table.from_pydict({"node": node, "nbr": nbr})

    # block-count hygiene: the pair graph is tiny relative to the corpus
    # (only near-dup members), but each propagation round unions + sorts
    # it — with one block per upstream task the rounds accumulate hundreds
    # of ~1-row blocks and the sorts pay ~40 ms of fixed cost PER BLOCK.
    # Size the block count to the edge data (~50k edges/block) so the loop
    # is O(P) blocks regardless of how fragmented the pair plan was.
    P = max(2, min(B, int(pairs.count() // 50_000) + 2))
    edges = (
        pairs.map_batches(to_edges, batch_format="pyarrow")
        .repartition(P)
        .materialize()
    )

    labels = (
        edges.groupby("node")
        .aggregate(Min("nbr", alias_name="m"))
        .map_batches(
            lambda b: pa.Table.from_pydict(
                {"node": b["node"], "label": pc.min_element_wise(b["node"], b["m"])}
            ),
            batch_format="pyarrow",
        )
        .repartition(P)
        .materialize()
    )
    prev_sum = labels.sum("label")

    def edge_side(b: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "k": b["nbr"],
                "node": b["node"],
                "label": pa.nulls(b.num_rows, pa.int64()),
                "bucket": pc.cast(pc.bit_wise_and(b["nbr"], pa.scalar(B - 1)), pa.int64()),
            }
        )

    def label_side(b: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "k": b["node"],
                "node": pa.nulls(b.num_rows, pa.int64()),
                "label": b["label"],
                "bucket": pc.cast(
                    pc.bit_wise_and(b["node"], pa.scalar(B - 1)), pa.int64()
                ),
            }
        )

    def attach_label(g: pd.DataFrame) -> pa.Table:
        # one nbr-hash bucket: edges pick up their neighbour's current
        # label, then fold to ONE partial min per node — emitted directly
        # in the union row shape (k, node=None, label, bucket-by-node), so
        # the only thing the next exchange sees is O(nodes) partials, and
        # no native per-key Min aggregate exists in the round
        lmap = dict(zip(g.loc[g["node"].isna(), "k"], g.loc[g["node"].isna(), "label"]))
        e = g[g["node"].notna()]
        part = (
            pd.DataFrame(
                {
                    "node": e["node"].astype("int64"),
                    "cand": e["k"].map(lmap).astype("int64"),
                }
            )
            .groupby("node", as_index=False)["cand"]
            .min()
        )
        nodes = part["node"].to_numpy(np.int64)
        return pa.Table.from_pydict(
            {
                "k": pa.array(nodes, pa.int64()),
                "node": pa.nulls(len(part), pa.int64()),
                "label": pa.array(part["cand"].to_numpy(np.int64), pa.int64()),
                "bucket": pa.array(nodes & (B - 1), pa.int64()),
            }
        )

    def merge_min(g: pd.DataFrame) -> pd.DataFrame:
        # both sides carry a candidate label for key k (own + neighbour-min)
        from .tabular import from_pandas_clean

        lab = g.groupby("k", as_index=False)["label"].min()
        return from_pandas_clean(pd.DataFrame(
            {"node": lab["k"].astype("int64"), "label": lab["label"].astype("int64")}
        ))

    # diameter ≤ node count bounds the rounds; hitting it means a bug, so
    # fail loudly rather than return silently-unconverged cluster labels
    max_rounds = int(labels.count()) + 2
    for rnd in range(max_rounds + 1):
        if rnd == max_rounds:
            raise RuntimeError(
                f"pairs_to_clusters: min-label propagation did not converge "
                f"within the node-count bound ({max_rounds} rounds)"
            )
        nbr_min = (
            edges.map_batches(edge_side, batch_format="pyarrow")
            .union(labels.map_batches(label_side, batch_format="pyarrow"))
            .groupby("bucket")
            .map_groups(attach_label, batch_format="pandas")
        )
        labels = (
            nbr_min.union(labels.map_batches(label_side, batch_format="pyarrow"))
            .groupby("bucket")
            .map_groups(merge_min, batch_format="pandas")
            .repartition(P)  # keep round block count flat (see above)
            .materialize()
        )
        s = labels.sum("label")
        if s == prev_sum:
            break
        prev_sum = s

    def final(b: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "doc_id": b["node"],
                "cluster_id": b["label"],
                "is_keeper": pc.equal(b["node"], b["label"]),
            }
        )

    return labels.map_batches(final, batch_format="pyarrow")


@register("dedup_minhash_clusters", sql=golden_sql("dedup_minhash_clusters"))
def dedup_minhash_clusters(sf_dir: str):
    """Near-dup duplicate groups (one keeper per cluster) over the whole
    documents table; golden-checked against a sequential union-find
    (golden.py). See `pairs_to_clusters` for the distributed plan."""
    return pairs_to_clusters(dedup_minhash_lsh(sf_dir))


# ---------------------------------------------------------------------------
# exact-substring duplication (the ExactSubstr detection pass)
# ---------------------------------------------------------------------------

SUBSTR_W = 16  # duplicated-window width, tokens


@register(
    "exact_substring_dups",
    sql=f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    w AS (SELECT doc_id,
                 unnest(range(1, len(t) - {SUBSTR_W} + 2)) AS pos,
                 unnest(list_transform(range(1, len(t) - {SUBSTR_W} + 2),
                          i -> md5(array_to_string(t[i:i+{SUBSTR_W - 1}], ' '))))
                   AS g
          FROM toks WHERE len(t) >= {SUBSTR_W}),
    dg AS (SELECT g FROM w GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2)
    SELECT doc_id, COUNT(*) AS n_dup_windows
    FROM w JOIN dg USING (g)
    GROUP BY doc_id
    """,
)
def exact_substring_dups(sf_dir: str):
    """Exact-substring duplication detection — the detection half of the
    suffix-array dedup family (ExactSubstr, "Deduplicating Training Data
    Makes Language Models Better"): per document, how many of its stride-1
    SUBSTR_W(=16)-token windows also occur verbatim in ANOTHER document.
    Differs from `split_contamination` (distinct grams, one split's view)
    in counting every duplicated POSITION — the quantity a removal pass
    would cut — and from MinHash in being exact, not probabilistic.

    Distributed shape (split_contamination's two-exchange plan): explode
    to (gram-md5, doc_id, pos-count) rows per batch; a COARSE data-aware
    gram partition co-locates each gram's occurrences (per-gram logic
    inside a partition is one vectorized transform — no per-gram groups);
    grams held by ≥2 DISTINCT docs emit per-doc window counts, and a tiny
    keyed sum totals them. A removal pass would be one more map joining
    the flagged (doc, pos) spans back against the text — detection is the
    all-to-all part. The md5 hex key mirrors the oracle byte-for-byte; at
    10^10 scale it becomes a 64-bit gram hash with the same plan.
    """
    from ray.data.aggregate import Sum

    from .tabular import from_pandas_clean
    from .textan import contamination_buckets

    ds = read(sf_dir, "documents", ["doc_id", "text"])
    nb = contamination_buckets(ds.size_bytes())

    def explode(b: pa.Table) -> pa.Table:
        out_g, out_d, out_n = [], [], []
        for d, t in zip(b["doc_id"].to_pylist(), b["text"].to_pylist()):
            toks = t.split(" ")
            if len(toks) < SUBSTR_W:
                continue
            # per-doc map-side combine: count positions per DISTINCT gram
            counts: dict[str, int] = {}
            for i in range(len(toks) - SUBSTR_W + 1):
                hx = hashlib.md5(
                    " ".join(toks[i : i + SUBSTR_W]).encode("utf-8")
                ).hexdigest()
                counts[hx] = counts.get(hx, 0) + 1
            out_g.extend(counts.keys())
            out_d.extend([d] * len(counts))
            out_n.extend(counts.values())
        part = [int(x[:8], 16) % nb for x in out_g]
        return pa.Table.from_pydict(
            {
                "part": pa.array(part, pa.int64()),
                "g": pa.array(out_g, pa.string()),
                "doc_id": pa.array(out_d, pa.int64()),
                "npos": pa.array(out_n, pa.int64()),
            }
        )

    def part_group(g: pd.DataFrame) -> pa.Table:
        # one coarse partition = many grams; rows are DISTINCT (gram, doc)
        # with per-doc position counts, so "≥2 docs hold this gram" is a
        # vectorized per-gram row count
        if len(g) == 0:
            return pa.Table.from_pydict(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "pn": pa.array([], pa.int64()),
                }
            )
        ndocs = g.groupby("g")["doc_id"].transform("size")
        hit = g[ndocs >= 2]
        agg = hit.groupby("doc_id", sort=False)["npos"].sum().reset_index(name="pn")
        return from_pandas_clean(agg.astype({"doc_id": "int64", "pn": "int64"}))

    return (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("part")
        .map_groups(part_group, batch_format="pandas")
        .groupby("doc_id")
        .aggregate(Sum("pn", alias_name="n_dup_windows"))
    )


# ---------------------------------------------------------------------------
# keep-best near-dup resolution (the production dedup policy: keep the
# highest-quality member, not the lowest id)
# ---------------------------------------------------------------------------


@register("dedup_keep_best", sql=golden_sql("dedup_keep_best"))
def dedup_keep_best(sf_dir: str):
    """Near-dup clusters resolved by QUALITY instead of id: each MinHash
    cluster keeps its longest member (token count; ties → min doc_id) —
    the keep-best policy production cleaning runs use, where near-dup
    groups should surrender their truncated/boilerplate variants, not
    whatever happened to get the lowest id. One row per cluster member:
    (doc_id, cluster_id, best_doc_id, kept).

    Distributed shape on top of the existing pieces:
      pairs (signatures-only LSH) → components (distributed label
      propagation) → token counts attached by a BUCKETED hash join
      (cluster membership is pair-graph-sized but corpus-scale at real
      duplicate rates — never a broadcast) → per-cluster argmax inside
      COARSE cluster_id buckets (vectorized transform, no per-tiny-cluster
      pandas group task — the dedup_simhash 77c744a lesson).

    Golden: sequential union-find + the same longest/min-id rule
    (golden.py), hash-diffed by the driver gate."""
    import pyarrow.compute as pc

    from .tabular import from_pandas_clean, n_buckets, read

    # dedup_minhash_lsh sizes the band exchange and text re-join off the
    # corpus size_bytes hint (a hint-less minhash_pairs_ds would fall back
    # to the CPU-floor bucket count — corpus_size/32 of text in one group)
    clusters = pairs_to_clusters(dedup_minhash_lsh(sf_dir))
    docs = read(sf_dir, "documents", ["doc_id", "text"])
    B = n_buckets(size_bytes=docs.size_bytes())

    def member_side(b) -> pa.Table:
        if isinstance(b, pd.DataFrame):
            b = pa.Table.from_pandas(b, preserve_index=False)
        return pa.Table.from_pydict(
            {
                "jb": pc.cast(pc.bit_wise_and(b["doc_id"], pa.scalar(B - 1)), pa.int64()),
                "doc_id": pc.cast(b["doc_id"], pa.int64()),
                "cluster_id": pc.cast(b["cluster_id"], pa.int64()),
                "n_tokens": pa.nulls(b.num_rows, pa.int64()),
            }
        )

    def count_side(b: pa.Table) -> pa.Table:
        n = pc.add(pc.count_substring(b["text"], pattern=" "), 1)
        return pa.Table.from_pydict(
            {
                "jb": pc.cast(pc.bit_wise_and(b["doc_id"], pa.scalar(B - 1)), pa.int64()),
                "doc_id": pc.cast(b["doc_id"], pa.int64()),
                "cluster_id": pa.nulls(b.num_rows, pa.int64()),
                "n_tokens": pc.cast(n, pa.int64()),
            }
        )

    def attach_counts(g: pd.DataFrame) -> pa.Table:
        mem = g[g["cluster_id"].notna()]
        if len(mem) == 0:
            return pa.Table.from_pydict(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "cluster_id": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "cb": pa.array([], pa.int64()),
                }
            )
        cnt = dict(
            zip(g.loc[g["cluster_id"].isna(), "doc_id"],
                g.loc[g["cluster_id"].isna(), "n_tokens"])
        )
        out = mem[["doc_id", "cluster_id"]].copy()
        out["n_tokens"] = out["doc_id"].map(cnt).astype("int64")
        out["cluster_id"] = out["cluster_id"].astype("int64")
        out["cb"] = out["cluster_id"].to_numpy().astype("int64") & (B - 1)
        return from_pandas_clean(out)

    def resolve(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return pa.Table.from_pydict(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "cluster_id": pa.array([], pa.int64()),
                    "best_doc_id": pa.array([], pa.int64()),
                    "kept": pa.array([], pa.bool_()),
                }
            )
        # longest wins, ties → min doc_id: sort once, first row per cluster
        d = g.sort_values(
            ["cluster_id", "n_tokens", "doc_id"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        best = d.groupby("cluster_id", sort=False)["doc_id"].transform("first")
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(d["doc_id"].to_numpy(), pa.int64()),
                "cluster_id": pa.array(d["cluster_id"].to_numpy(), pa.int64()),
                "best_doc_id": pa.array(best.to_numpy(), pa.int64()),
                "kept": pa.array(d["doc_id"].to_numpy() == best.to_numpy(), pa.bool_()),
            }
        )

    joined = (
        clusters.map_batches(member_side, batch_format="pyarrow")
        .union(docs.map_batches(count_side, batch_format="pyarrow"))
        .groupby("jb")
        .map_groups(attach_counts, batch_format="pandas")
    )
    return joined.groupby("cb").map_groups(resolve, batch_format="pandas")
