"""Per-dialect post-extraction parity (SURVEY.md M8-M13, M17).

Four sites, one per engine-family post markup (phpBB, XenForo, SMF,
ProBoards), each with a different date style (ISO <time>, free-text
month-name, epoch millis) — all normalized to the same timestamp
column and crawled to golden parity in one run.
"""

import os
import sys

import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from forum_dl_ray.crawl import CrawlConfig, Crawler
from forum_dl_ray.crawl.crawler import ordered_items
from forum_dl_ray.fixtures import dialects_spec, generate_fixture
from forum_dl_ray.fixtures.golden import simulate_fixture_dir


@pytest.fixture(scope="module")
def fixture_dir():
    return generate_fixture(dialects_spec())


@pytest.fixture(scope="module")
def golden(fixture_dir):
    return simulate_fixture_dir(fixture_dir)


@pytest.fixture(scope="module")
def crawl_out(ray_session, fixture_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("out") / "crawl")
    Crawler(fixture_dir, out, CrawlConfig(num_shards=2, target_tasks=2)).run()
    return out


def test_dialect_parity(crawl_out, golden):
    df = ordered_items(crawl_out).to_pandas()
    assert df["order_key"].tolist() == [e["order_key"] for e in golden.entries]
    seen = pq.read_table(os.path.join(crawl_out, "seen.parquet")).to_pylist()
    assert {r["url"]: r["failed"] for r in seen} == golden.seen


def test_dialect_fields_extracted(crawl_out):
    import pandas as pd

    df = ordered_items(crawl_out).to_pandas()
    posts = df[df["type"] == "post"]
    hosts = posts["origin"].str.extract(r"http://([^.]+)\.")[0]
    assert set(hosts) == {"phpbb", "xenforo", "smf", "proboards", "vbulletin",
                          "invision", "smf-freeform"}
    # every dialect produced authors and normalized timestamps
    for h, g in posts.groupby(hosts):
        assert g["author"].str.len().gt(0).all(), h
        assert g["creation_time"].notna().all(), h
        assert g["content"].str.contains("<p>").all(), h
    # SMF's minute-precision free-text dates round-trip to :00 seconds
    smf = posts[hosts == "smf"]
    assert all(pd.Timestamp(t).second == 0 for t in smf["creation_time"])
    # the freeform-date smf site (M17 kernel) recovers the same
    # minute-granular timestamps as the strict site style does
    ff = posts[hosts == "smf-freeform"]
    assert len(ff) > 0
    assert ff["creation_time"].notna().all()
    assert all(pd.Timestamp(t).second == 0 for t in ff["creation_time"])
    assert ff["creation_time"].nunique() == len(ff)  # counter-minute times
    # vBulletin b-comment rows are interleaved in every thread page of
    # the fixture; the kernel must skip them (reference vbulletin.py:352)
    vb = posts[hosts == "vbulletin"]
    assert len(vb) > 0
    assert not vb["content"].str.contains("comment noise").any()
    assert not vb["author"].str.startswith("commenter@").any()
