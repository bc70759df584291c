"""Crawl under a politeness budget: parity + rate enforcement (ST7).

The north rule requires the crawl ordering and URL-seen set to match
the reference under the same seed list AND politeness budget. The
reference has no rate limiting (it is sequential), so the contract
is: throttling must change WHEN pages are fetched, never WHICH pages
or their emitted order — the budget-limited crawl must produce the
identical seen set and ordered item stream, just slower.
"""

import os
import sys
import time

import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from forum_dl_ray.crawl import CrawlConfig, Crawler
from forum_dl_ray.crawl.crawler import ordered_items
from forum_dl_ray.fixtures import generate_fixture, micro_spec
from forum_dl_ray.fixtures.golden import simulate_fixture_dir


@pytest.fixture(scope="module")
def fixture_dir():
    return generate_fixture(micro_spec())


@pytest.fixture(scope="module")
def golden(fixture_dir):
    return simulate_fixture_dir(fixture_dir)


def test_budgeted_crawl_same_outputs_slower(ray_session, fixture_dir, golden, tmp_path):
    # beta.test capped hard; alpha unlimited
    beta_urls = sum(1 for u in golden.seen if "beta.test" in u)
    rate = 8.0  # tokens/sec
    out = str(tmp_path / "crawl")
    cfg = CrawlConfig(
        num_shards=2, target_tasks=2,
        host_rates={"beta.test": rate},
    )
    t0 = time.perf_counter()
    Crawler(fixture_dir, out, cfg).run()
    elapsed = time.perf_counter() - t0

    seen = {r["url"]: r["failed"] for r in pq.read_table(os.path.join(out, "seen.parquet")).to_pylist()}
    assert seen == golden.seen
    df = ordered_items(out).to_pandas()
    assert df["order_key"].tolist() == [e["order_key"] for e in golden.entries]

    # rate actually bit: beta's URLs at 8/s (burst=rate) need at least
    # (n - burst)/rate seconds of wall time
    min_expected = max(0.0, (beta_urls - rate) / rate)
    assert elapsed >= min_expected * 0.8, (elapsed, beta_urls, min_expected)


def test_budgeted_pump_crawl_same_outputs_slower(ray_session, fixture_dir, golden,
                                                 tmp_path):
    """Same ST7 contract on the distributed pump path: each shard is
    polled by exactly one pump, so token buckets see one monotonic
    clock and the budget binds identically — outputs equal, slower."""
    from forum_dl_ray.crawl.pump import MultiPumpCrawler

    beta_urls = sum(1 for u in golden.seen if "beta.test" in u)
    rate = 8.0
    out = str(tmp_path / "pump_crawl")
    cfg = CrawlConfig(
        num_shards=4, min_rows_per_task=64,
        host_rates={"beta.test": rate},
    )
    t0 = time.perf_counter()
    MultiPumpCrawler(fixture_dir, out, cfg, n_pumps=2).run()
    elapsed = time.perf_counter() - t0

    seen = {r["url"]: r["failed"] for r in pq.read_table(
        os.path.join(out, "seen.parquet")).to_pylist()}
    assert seen == golden.seen
    df = ordered_items(out).to_pandas()
    assert df["order_key"].tolist() == [e["order_key"] for e in golden.entries]
    min_expected = max(0.0, (beta_urls - rate) / rate)
    assert elapsed >= min_expected * 0.8, (elapsed, beta_urls, min_expected)
