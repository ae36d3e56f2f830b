"""newsray — a Ray-Data-native crawl/curation engine.

A from-scratch rebuild of the capabilities of WashingManager/News-Crawler
(reference at /root/reference, studied for WHAT it computes, not HOW):
a distributed URL-frontier + fetch scheduler expressed as ray.data.Dataset
pipelines of ``map_batches`` over zero-copy Arrow batches, with stateful
stages (sharded cuckoo-filter URL-seen set, per-host politeness/priority
scheduling) in actor pools, writing interleaved text+media documents
(``doc_id: string``, ``spans: list<struct<kind,text,media_ref,offset>>``).

Nothing in this package calls ``ray.init()`` — the caller owns the session.
"""

__version__ = "0.1.0"
