"""Multi-engine crawl parity: html + json-stream + json-registry +
mail-archive.

Exercises the cursor-style diversity of SURVEY.md ST4 end-to-end:
html pagination chains, Discourse-style multi-chunk post-id streams
(posts_per_thread > CHUNK), HN-style story/kids trees, and the
pipermail month-URL stack — all in ONE crawl, validated against the
golden sequential walkers.
"""

import os
import sys

import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from forum_dl_ray.crawl import CrawlConfig, Crawler
from forum_dl_ray.crawl.crawler import ordered_items
from forum_dl_ray.fixtures import generate_fixture
from forum_dl_ray.fixtures.golden import simulate_fixture_dir
from forum_dl_ray.fixtures.synth import mixed_spec

ITEM_COLS = ["type", "path", "subpath", "url", "origin", "title", "author",
             "creation_time", "content", "content_type", "order_key"]


@pytest.fixture(scope="module")
def fixture_dir():
    return generate_fixture(mixed_spec())


@pytest.fixture(scope="module")
def golden(fixture_dir):
    return simulate_fixture_dir(fixture_dir)


@pytest.fixture(scope="module")
def crawl_out(ray_session, fixture_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("out") / "crawl")
    Crawler(fixture_dir, out, CrawlConfig(num_shards=2, target_tasks=4)).run()
    return out


def test_mixed_seen_set(crawl_out, golden):
    seen = pq.read_table(os.path.join(crawl_out, "seen.parquet")).to_pylist()
    got = {r["url"]: r["failed"] for r in seen}
    assert got == golden.seen


def test_mixed_ordered_items(crawl_out, golden):
    df = ordered_items(crawl_out).to_pandas()
    assert len(df) == len(golden.entries)
    for col in ITEM_COLS:
        want = [e[col] for e in golden.entries]
        have = df[col].tolist()
        if col == "creation_time":
            import pandas as pd

            have = [None if pd.isna(v) else v.to_pydatetime() for v in df[col]]
        assert have == want, f"column {col} diverges"


def test_mixed_per_engine_coverage(crawl_out, golden):
    df = ordered_items(crawl_out).to_pandas()
    by_host = df.groupby(df["origin"].str.extract(r"http://([^/]+)/")[0])
    hosts = set(by_host.groups.keys())
    assert hosts == {"alpha.test", "stream.test", "news.test", "lists.test"}
    # mail-archive: posts live on per-post pages, one fetch each
    mail_posts = df[(df["type"] == "post") & df["origin"].str.contains("lists.test")]
    assert len(mail_posts) == golden.hashes["lists.test"]["post_count"] > 0
    assert mail_posts["url"].is_unique
    # multi-chunk stream thread: 25 posts > CHUNK=20 all present
    stream_posts = df[(df["type"] == "post") & df["origin"].str.contains("stream.test")]
    assert len(stream_posts) == golden.hashes["stream.test"]["post_count"]
    # registry: every story has its comment tree (reply subpaths nest)
    news_posts = df[(df["type"] == "post") & df["origin"].str.contains("news.test")]
    assert len(news_posts) == golden.hashes["news.test"]["post_count"]
    assert any(len(eval(s)) > 2 for s in news_posts["subpath"])


def test_mixed_resume_mid_crawl(ray_session, fixture_dir, golden, tmp_path):
    """Resume with JSON-engine cursors in flight: the checkpointed
    frontier carries id-stream chunk cursors (json-stream) and reply
    subpath cursors (json-registry) in entry JSON; restoring them must
    reproduce the uninterrupted outputs exactly."""
    out = str(tmp_path / "resumed")
    stop = CrawlConfig(num_shards=2, target_tasks=4, checkpoint_every=2, max_waves=4)
    Crawler(fixture_dir, out, stop).run()
    go = CrawlConfig(num_shards=2, target_tasks=4, checkpoint_every=2)
    Crawler(fixture_dir, out, go).run(resume=True)

    seen = pq.read_table(os.path.join(out, "seen.parquet")).to_pylist()
    assert {r["url"]: r["failed"] for r in seen} == golden.seen
    df = ordered_items(out).to_pandas()
    assert df["order_key"].tolist() == [e["order_key"] for e in golden.entries]
    assert df["content"].tolist() == [e["content"] for e in golden.entries]
