"""Text analysis operators over `documents` — language-ID, quality scoring,
token counting, fingerprinting (training-data pipeline extensions; the
scalar semantics mirror the reference's keyword/string layer, SURVEY §2.8).

Every hot path is a vectorized or single-pass per-batch transform; nothing
materializes the corpus.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from .registry import register
from .tabular import read


@register(
    "doc_token_counts",
    sql="""
    SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
    FROM documents
    """,
)
def doc_token_counts(sf_dir: str):
    """Token counting (whitespace tokenizer; the BPE-ish regex variant is
    `doc_quality`'s avg_token_len)."""
    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def count(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["n_tokens"] = b["text"].str.split(" ").str.len().astype("int64")
        return b[["doc_id", "n_tokens"]]

    return ds.map_batches(count, batch_format="pandas")


@register(
    "doc_fingerprints",
    sql="SELECT doc_id, md5(text) AS fingerprint FROM documents",
)
def doc_fingerprints(sf_dir: str):
    """Content fingerprinting: md5 over the raw text (the exact-dedup
    identity; a rolling-hash variant backs `dedup_simhash`)."""
    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def fp(b: pa.Table) -> pa.Table:
        digests = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in b["text"].to_pylist()]
        return pa.Table.from_pydict(
            {"doc_id": b["doc_id"], "fingerprint": pa.array(digests, pa.string())}
        )

    return ds.map_batches(fp, batch_format="pyarrow")


@register(
    "doc_lang_id",
    sql="""
    SELECT doc_id,
           CASE WHEN len(list_filter(string_split(text, ' '),
                                     x -> x = 'the' OR x = 'a')) >= 2
                THEN 'en' ELSE 'other' END AS pred_lang
    FROM documents
    """,
)
def doc_lang_id(sf_dir: str):
    """Language-ID heuristic: English function-word density (≥2 of
    {'the','a'} → 'en'). A real deployment swaps in an n-gram profile model
    loaded once per actor; the decision surface here is deliberately
    SQL-expressible so the oracle can gate it."""
    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def lang(b: pd.DataFrame) -> pd.DataFrame:
        def score(t: str) -> str:
            n = sum(1 for w in t.split(" ") if w in ("the", "a"))
            return "en" if n >= 2 else "other"

        b = b.copy()
        b["pred_lang"] = b["text"].map(score)
        return b[["doc_id", "pred_lang"]]

    return ds.map_batches(lang, batch_format="pandas")


@register(
    "doc_quality",
    sql="""
    SELECT doc_id,
           n_chars,
           len(string_split(text, ' ')) AS n_tokens,
           ROUND(CAST(len(list_filter(string_split(text, ' '),
                                      x -> x IN ('a', 'the', 'big', 'small')))
                      AS DOUBLE) / len(string_split(text, ' ')), 4) AS stop_ratio,
           ROUND(CAST(length(text) - (len(string_split(text, ' ')) - 1)
                      AS DOUBLE) / len(string_split(text, ' ')), 4) AS avg_token_len
    FROM documents
    """,
)
def doc_quality(sf_dir: str):
    """Quality scoring: stopword ratio + average token length (length/punct
    ratios degenerate on this corpus). Single tokenize pass per row."""
    ds = read(sf_dir, "documents", ["doc_id", "text", "n_chars"])
    stops = {"a", "the", "big", "small"}

    def qual(b: pd.DataFrame) -> pd.DataFrame:
        toks = b["text"].str.split(" ")
        n_tok = toks.str.len().astype("int64")
        stop_n = toks.map(lambda ws: sum(1 for w in ws if w in stops))
        chars = b["text"].str.len()
        out = pd.DataFrame(
            {
                "doc_id": b["doc_id"],
                "n_chars": b["n_chars"],
                "n_tokens": n_tok,
                "stop_ratio": _round4(stop_n.to_numpy() / n_tok.to_numpy()),
                "avg_token_len": _round4(
                    (chars.to_numpy() - (n_tok.to_numpy() - 1)) / n_tok.to_numpy()
                ),
            }
        )
        return out

    return ds.map_batches(qual, batch_format="pandas")


def _round4(x: np.ndarray) -> np.ndarray:
    """Half-away-from-zero to 4 digits (matches SQL ROUND)."""
    return np.floor(np.abs(x) * 1e4 + 0.5) / 1e4 * np.sign(x)


@register(
    "relevant_docs",
    sql="""
    SELECT doc_id, n_chars
    FROM documents
    WHERE (CASE WHEN list_contains(string_split(text, ' '), 'spark') THEN 1 ELSE 0 END
         + CASE WHEN list_contains(string_split(text, ' '), 'stream') THEN 1 ELSE 0 END
         + CASE WHEN list_contains(string_split(text, ' '), 'vector') THEN 1 ELSE 0 END
         + CASE WHEN list_contains(string_split(text, ' '), 'merge') THEN 1 ELSE 0 END) >= 2
      AND NOT list_contains(string_split(text, ' '), 'slow')
    """,
)
def relevant_docs(sf_dir: str):
    """The reference's keyword-relevance predicate (SURVEY M7 variant (a):
    ≥2 distinct include matches, no exclude, word-boundary semantics) over
    the documents table. Keyword lists are broadcast-small; the same
    KeywordMatcher drives the crawl pipeline."""
    from .textfns import KeywordMatcher

    matcher = KeywordMatcher(
        ["spark", "stream", "vector", "merge"], ["slow"], "wordset", check_exclude=True
    )
    ds = read(sf_dir, "documents", ["doc_id", "text", "n_chars"])

    def filt(b: pd.DataFrame) -> pd.DataFrame:
        keep = b["text"].map(matcher.relevant)
        return b.loc[keep, ["doc_id", "n_chars"]]

    return ds.map_batches(filt, batch_format="pandas")


@register(
    "doc_split_assign",
    sql="""
    SELECT doc_id,
           CASE WHEN md5(CAST(doc_id AS VARCHAR)) < 'cc' THEN 'train'
                WHEN md5(CAST(doc_id AS VARCHAR)) < 'e6' THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def doc_split_assign(sf_dir: str):
    """Deterministic train/val/test assignment — the split every training
    corpus needs, reproducible across runs and engines: lexicographic
    compare of the doc_id's md5 hex against fixed thresholds ('cc' ≈ 79.7 %
    train, 'e6' ≈ +10.2 % val, rest test). Pure per-batch map — no shuffle,
    no state; the same row always lands in the same split at any scale."""
    ds = read(sf_dir, "documents", ["doc_id"])

    def assign(b: pa.Table) -> pa.Table:
        hx = [
            hashlib.md5(str(d).encode("utf-8")).hexdigest()
            for d in b["doc_id"].to_pylist()
        ]
        split = ["train" if h < "cc" else ("val" if h < "e6" else "test") for h in hx]
        return pa.Table.from_pydict(
            {"doc_id": b["doc_id"], "split": pa.array(split, pa.string())}
        )

    return ds.map_batches(assign, batch_format="pyarrow")


@register(
    "stratified_sample_by_source",
    sql="""
    SELECT doc_id, source
    FROM (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS rn
      FROM documents
    )
    WHERE rn <= 50
    """,
)
def stratified_sample_by_source(sf_dir: str):
    """Stratified sampling: exactly min(50, |group|) docs per source, chosen
    by deterministic hash order (a seeded-uniform stand-in that any engine
    reproduces). One groupby co-locates each stratum; the per-group work is
    a vectorized argsort over the hash — the pattern for per-domain or
    per-language quota sampling when balancing a training mix."""
    ds = read(sf_dir, "documents", ["doc_id", "source"])

    def pick(g: pd.DataFrame) -> pa.Table:
        hx = [hashlib.md5(str(d).encode("utf-8")).hexdigest() for d in g["doc_id"]]
        order = np.lexsort((g["doc_id"].to_numpy(), np.array(hx)))
        take = g.iloc[order[:50]]
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(take["doc_id"].to_numpy(), pa.int64()),
                "source": pa.array(take["source"].to_numpy(), pa.string()),
            }
        )

    return ds.groupby("source").map_groups(pick, batch_format="pandas")


@register(
    "top50_tokens",
    sql="""
    SELECT tok, COUNT(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
    GROUP BY tok
    ORDER BY n DESC, tok ASC
    LIMIT 50
    """,
)
def top50_tokens(sf_dir: str):
    """Corpus-level top-k token frequencies — the canonical HIGH-CARDINALITY
    aggregation: the token key space is corpus-sized, so each batch folds to
    (tok, partial_n) via a local Counter (map-side combine — the shuffle
    carries one row per DISTINCT token per batch, not one per occurrence),
    one groupby sums the partials, and the distributed sort-limit takes the
    top 50 (ties broken by token so the cut is oracle-stable)."""
    from collections import Counter

    from ray.data.aggregate import Sum

    ds = read(sf_dir, "documents", ["text"])

    def partial(b: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in b["text"].to_pylist():
            c.update(t.split(" "))
        return pa.Table.from_pydict(
            {
                "tok": pa.array(list(c.keys()), pa.string()),
                "partial_n": pa.array(list(c.values()), pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=64 * 1024)
        .groupby("tok")
        .aggregate(Sum("partial_n", alias_name="n"))
        .sort(["n", "tok"], descending=[True, False])
        .limit(50)
    )


NGRAM_N = 8  # decontamination n-gram width


@register(
    "split_contamination",
    sql=f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    grams AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, len(t) - {NGRAM_N} + 2),
                                   i -> md5(array_to_string(t[i:i+{NGRAM_N - 1}], ' ')))) AS g
      FROM toks WHERE len(t) >= {NGRAM_N}
    ),
    splits AS (
      SELECT doc_id,
             CASE WHEN md5(CAST(doc_id AS VARCHAR)) < 'cc' THEN 'train'
                  WHEN md5(CAST(doc_id AS VARCHAR)) < 'e6' THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    ),
    j AS (SELECT grams.g, grams.doc_id, splits.split
          FROM grams JOIN splits USING (doc_id)),
    train_g AS (SELECT DISTINCT g FROM j WHERE split = 'train')
    SELECT j.doc_id, j.split, COUNT(*) AS n_shared_grams
    FROM j JOIN train_g USING (g)
    WHERE j.split <> 'train'
    GROUP BY j.doc_id, j.split
    """,
)
def split_contamination(sf_dir: str):
    """Train/eval DECONTAMINATION — the check every training corpus needs
    before an eval split is trusted: every val/test document sharing at
    least one 8-token n-gram with ANY train document, with the count of
    distinct shared grams. Distributed shape: per batch, assign the split
    (the `doc_split_assign` rule — pure hash, no join) and explode to
    DISTINCT (gram-key, split, doc_id) rows; ONE groupby co-locates each
    gram's members, groups holding a train member emit their non-train
    members once each; a tiny keyed sum yields per-doc shared-gram counts.
    The gram exchange groups by a COARSE partition of the gram key
    (millions of one-row gram groups through map_groups is the known Ray
    anti-pattern); per-gram logic inside a partition is one vectorized isin.
    The shuffle key here is the md5 hex of the gram so the DuckDB oracle
    can reproduce it byte-for-byte; at 10^10 scale the key becomes a 64-bit
    gram hash and the same two-exchange plan holds."""
    from ray.data.aggregate import Sum

    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def explode(b: pa.Table) -> pa.Table:
        out_g, out_d, out_s = [], [], []
        for d, t in zip(b["doc_id"].to_pylist(), b["text"].to_pylist()):
            toks = t.split(" ")
            if len(toks) < NGRAM_N:
                continue
            hx = hashlib.md5(str(d).encode("utf-8")).hexdigest()
            split = "train" if hx < "cc" else ("val" if hx < "e6" else "test")
            grams = {
                hashlib.md5(
                    " ".join(toks[i : i + NGRAM_N]).encode("utf-8")
                ).hexdigest()
                for i in range(len(toks) - NGRAM_N + 1)
            }
            out_g.extend(grams)
            out_d.extend([d] * len(grams))
            out_s.extend([split] * len(grams))
        part = [int(x[:8], 16) & 255 for x in out_g]  # coarse gram partition
        return pa.Table.from_pydict(
            {
                "part": pa.array(part, pa.int64()),
                "g": pa.array(out_g, pa.string()),
                "doc_id": pa.array(out_d, pa.int64()),
                "split": pa.array(out_s, pa.string()),
            }
        )

    def part_group(g: pd.DataFrame) -> pd.DataFrame:
        # one coarse partition = many grams: vectorized membership, no
        # per-gram Python. Members are DISTINCT (doc, gram) by construction.
        train_g = g.loc[g["split"] == "train", "g"]
        hit = g[(g["split"] != "train") & g["g"].isin(set(train_g))]
        return pd.DataFrame(
            {"doc_id": hit["doc_id"].astype("int64"),
             "split": hit["split"],
             "one": np.ones(len(hit), dtype="int64")}
        )

    return (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("part")
        .map_groups(part_group, batch_format="pandas")
        .groupby(["doc_id", "split"])
        .aggregate(Sum("one", alias_name="n_shared_grams"))
    )
