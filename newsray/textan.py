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
