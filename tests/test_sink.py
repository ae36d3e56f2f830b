"""Sink tests: partitioned documents layout, day-grouped JSON export (K1/K2),
capped newest feed (K3/O3)."""

import json
import os
import tempfile

import pytest

from newsray.pipeline import CrawlPipeline, PipelineConfig
from newsray.policy import CrawlPolicy
from newsray.sink import day_grouped_export, newest_feed, read_documents, write_documents
from newsray.sites import SITES
from newsray.synth import WebParams


@pytest.fixture(scope="module")
def arts(ray_session):
    pipe = CrawlPipeline(
        PipelineConfig(
            web_params=WebParams(only_sites=("nate", "naver", "google", "voa")),
            policy=CrawlPolicy(),
        )
    )
    return pipe.run()["articles"]


def test_partitioned_documents_roundtrip(arts):
    with tempfile.TemporaryDirectory() as d:
        out = os.path.join(d, "docs")
        written = write_documents(arts, out)
        assert written and all(p.endswith(".parquet") for p in written)
        # hive-partitioned by site/day + completion manifest
        assert any("site=nate" in p for p in written)
        manifest = json.load(open(os.path.join(out, "_manifest.json")))
        assert len(manifest) == len(written)
        back = read_documents(out)
        assert back.num_rows == arts.num_rows
        assert set(back.column_names) >= {"doc_id", "spans"}


def test_day_grouped_export_shape(arts):
    with tempfile.TemporaryDirectory() as d:
        paths = day_grouped_export(arts, d)
        assert set(paths) == set(SITES)  # K2: every site file exists
        nate = json.load(open(paths["nate"], encoding="utf-8"))
        assert isinstance(nate, list) and nate
        day = nate[0]
        assert set(day) == {"date", "articles"}
        assert "일" in day["date"]
        a = day["articles"][0]
        assert {"title", "time", "img", "url", "original_url"} <= set(a)
        assert "summary" not in a  # nate has no summary field
        naver = json.load(open(paths["naver"], encoding="utf-8"))
        assert any("summary" in a for d_ in naver for a in d_["articles"])
        # empty site (not crawled) → well-formed []
        assert json.load(open(paths["fnnews"])) == []


def test_newest_feed_cap_order_dedup(arts):
    feed = newest_feed(arts, cap=50)
    assert feed.num_rows == min(50, arts.num_rows)
    times = feed["time"].to_pylist()
    assert times == sorted(times, reverse=True)
    urls = feed["url"].to_pylist()
    assert len(urls) == len(set(urls))
