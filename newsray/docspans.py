"""Interleaved-document span pivot over the generic documents table
(BASELINE.json input_hint shape: doc_id:string +
spans:list<struct<kind,text,media_ref,offset>>).

The crawl pipeline produces this table natively (pipeline.articles_to_documents);
this module produces the same shape from the driver's flat `documents`
parquet, so the two sources union into one corpus (see __ray_entry__.entry).
"""

from __future__ import annotations

import pyarrow as pa

from .registry import register
from .schema import DOCUMENTS, SPAN_STRUCT
from .tabular import read


def spanify_batch(b: pa.Table) -> pa.Table:
    doc_ids, spans = [], []
    for doc_id, text, source in zip(
        b["doc_id"].to_pylist(), b["text"].to_pylist(), b["source"].to_pylist()
    ):
        title = " ".join(text.split(" ")[:6])
        doc_ids.append(f"synth://{source}/{doc_id}")
        spans.append(
            [
                {"kind": "title", "text": title, "media_ref": "", "offset": 0},
                {"kind": "summary", "text": text, "media_ref": "", "offset": 1},
                {"kind": "link", "text": "", "media_ref": f"synth://{source}/{doc_id}", "offset": 2},
            ]
        )
    return pa.Table.from_pydict(
        {"doc_id": pa.array(doc_ids, pa.string()), "spans": pa.array(spans, pa.list_(SPAN_STRUCT))},
        schema=DOCUMENTS,
    )


@register("documents_interleaved")  # nested list<struct> — rows-only check
def documents_interleaved(sf_dir: str):
    """Flat documents → interleaved span rows (input_hint schema)."""
    ds = read(sf_dir, "documents", ["doc_id", "text", "source"])
    return ds.map_batches(spanify_batch, batch_format="pyarrow")


@register("crawl_documents")  # full crawl pipeline — rows-only check
def crawl_documents(sf_dir: str):
    """The flagship crawl pipeline end-to-end on a mini deterministic
    synthetic web (sf_dir-independent — the crawl's input is the synthetic
    frontier, per BASELINE.json north_star), returning the interleaved
    documents table. Conformance vs the sequential oracle is enforced in
    tests/test_conformance.py; the driver records a rows-only check here."""
    from .pipeline import CrawlPipeline, PipelineConfig
    from .policy import CrawlPolicy
    from .synth import WebParams

    cfg = PipelineConfig(
        web_params=WebParams(only_sites=("nate", "naver", "google", "skydaily")),
        policy=CrawlPolicy(),
    )
    return CrawlPipeline(cfg).run()["documents"]
