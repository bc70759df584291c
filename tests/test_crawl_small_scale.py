"""Golden parity at the ~5-6k-URL scale (small_spec, hot-host skew).

micro_spec parity (test_crawl_e2e) is hand-checkable; this run
exercises the same gates where wave overlap, host salting and the
politeness-free hot host actually interleave: 4 hosts, one owning
>= 50% of URLs, failure injection on deep thread pages.
"""

import os
import sys

import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from forum_dl_ray.crawl import CrawlConfig, Crawler
from forum_dl_ray.crawl.crawler import ordered_items
from forum_dl_ray.fixtures import generate_fixture, small_spec
from forum_dl_ray.fixtures.golden import simulate_fixture_dir


@pytest.fixture(scope="module")
def fixture_dir():
    return generate_fixture(small_spec())


@pytest.fixture(scope="module")
def golden(fixture_dir):
    return simulate_fixture_dir(fixture_dir)


@pytest.fixture(scope="module")
def crawl_out(ray_session, fixture_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("out") / "crawl")
    Crawler(
        fixture_dir, out,
        CrawlConfig(num_shards=4, target_tasks=4, max_inflight_waves=3),
    ).run()
    return out


def test_small_seen_set(crawl_out, golden):
    seen = pq.read_table(os.path.join(crawl_out, "seen.parquet")).to_pylist()
    got = {r["url"]: r["failed"] for r in seen}
    assert got == golden.seen


def test_small_order_and_hashes(crawl_out, golden):
    import hashlib

    df = ordered_items(crawl_out).to_pandas()
    assert df["order_key"].tolist() == [e["order_key"] for e in golden.entries]
    # per-seed hash oracle at this scale
    host = df["origin"].str.extract(r"http://([^/]+)/")[0]
    for h, g in df.groupby(host):
        titles = [t for t, ty in zip(g["title"], g["type"]) if ty in ("board", "thread")]
        sha = hashlib.sha1("\0".join(titles).encode()).hexdigest()
        assert sha == golden.hashes[h]["titles_sha1"], h
