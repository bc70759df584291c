"""End-to-end crawl parity vs the golden sequential simulator.

This is the BASELINE.md correctness gate: the wave-parallel Ray
crawler must reproduce the reference's crawl ordering (after order-key
sort), final URL-seen set (incl. failed flags), per-seed SHA-1
title/content hashes, and the image payload oracle — on the same
fixture the golden simulator replays sequentially.
"""

import json
import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from forum_dl_ray.crawl import CrawlConfig, Crawler
from forum_dl_ray.crawl.crawler import images_dataset, ordered_items
from forum_dl_ray.fixtures import generate_fixture, micro_spec
from forum_dl_ray.fixtures.golden import simulate_fixture_dir
from forum_dl_ray.images import decode_image, psnr, synth_pixels

ITEM_COLS = ["type", "path", "subpath", "url", "origin", "title", "author",
             "creation_time", "content", "content_type", "order_key"]


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    return generate_fixture(micro_spec(), str(tmp_path_factory.mktemp("fx") / "micro"))


@pytest.fixture(scope="module")
def golden(fixture_dir):
    return simulate_fixture_dir(fixture_dir)


@pytest.fixture(scope="module")
def crawl_out(ray_session, fixture_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("out") / "crawl")
    stats = Crawler(fixture_dir, out, CrawlConfig(num_shards=2, target_tasks=2)).run()
    return out, stats


def _crawled_items(out):
    t = ordered_items(out).to_pandas()
    return t


def test_seen_set_equals_golden(crawl_out, golden):
    out, _ = crawl_out
    seen = pq.read_table(os.path.join(out, "seen.parquet")).to_pylist()
    got = {r["url"]: r["failed"] for r in seen}
    assert got == golden.seen


def test_ordered_items_equal_golden(crawl_out, golden):
    out, _ = crawl_out
    df = _crawled_items(out)
    assert len(df) == len(golden.entries)
    for col in ITEM_COLS:
        ours = df[col].tolist()
        theirs = [g[col] for g in golden.entries]
        if col == "creation_time":
            ours = [None if v is None or v != v else v.to_pydatetime() for v in ours]
        assert ours == theirs, f"column {col} diverges"


def test_hashes_match_golden(crawl_out, golden, fixture_dir):
    import hashlib

    out, _ = crawl_out
    df = _crawled_items(out)
    seeds = json.load(open(os.path.join(fixture_dir, "seeds.json")))
    for s_idx, seed in enumerate(seeds):
        prefix = format(s_idx, "08x")
        mine = df[df["order_key"].str.startswith(prefix)]
        titles = mine[mine["type"].isin(["board", "thread"])]["title"].tolist()
        contents = mine[mine["type"] == "post"]["content"].tolist()
        g = golden.hashes[seed["host"]]
        assert hashlib.sha1("\0".join(titles).encode()).hexdigest() == g["titles_sha1"]
        assert hashlib.sha1("\0".join(contents).encode()).hexdigest() == g["contents_sha1"]
        assert len(mine) == g["item_count"]


def test_images_payload_oracle(crawl_out, golden, fixture_dir):
    out, _ = crawl_out
    imgs = images_dataset(out).to_pandas()
    fixture_images = {
        r["image_id"]: r
        for r in pq.read_table(os.path.join(fixture_dir, "images.parquet")).to_pylist()
    }
    golden_ids = {i["image_id"] for i in golden.images}
    assert set(imgs["image_id"]) == golden_ids
    for _, row in imgs.iterrows():
        ref = fixture_images[row["image_id"]]
        assert row["caption"] == ref["caption"]
        assert (row["w"], row["h"]) == (ref["w"], ref["h"])
        got = decode_image(row["bytes"], row["fmt"])
        orig = synth_pixels(row["image_id"], ref["w"], ref["h"])
        if row["fmt"] == "png":
            assert np.array_equal(got, orig)
            assert row["phash"] == ref["phash"]
        else:
            assert psnr(got, orig) >= 40.0


def test_lineage_rows_cover_crawl_order(crawl_out, golden):
    out, _ = crawl_out
    import ray.data as rd

    lineage = rd.read_parquet(os.path.join(out, "entries")).filter(
        expr="type == 'lineage'"
    ).to_pandas()
    # one lineage row per non-asset fetch
    asset_urls = {u for u in golden.seen if "/img/" in u}
    assert set(lineage["url"]) == set(golden.seen) - asset_urls
    failed = {u for u, f in golden.seen.items() if f}
    bad = lineage[lineage["url"].isin(failed)]
    assert all(json.loads(d)["status"] != 200 for d in bad["data"])


def test_resume_equals_uninterrupted(ray_session, fixture_dir, tmp_path, golden):
    """Kill after wave k (via max_waves), resume from checkpoint, final
    outputs identical to the uninterrupted run (BASELINE.md resume gate)."""
    out = str(tmp_path / "resumed")
    cfg_stop = CrawlConfig(num_shards=2, target_tasks=2, checkpoint_every=2, max_waves=3)
    Crawler(fixture_dir, out, cfg_stop).run()
    assert os.path.exists(os.path.join(out, "checkpoints", "LATEST"))
    cfg_go = CrawlConfig(num_shards=2, target_tasks=2, checkpoint_every=2)
    Crawler(fixture_dir, out, cfg_go).run(resume=True)

    seen = pq.read_table(os.path.join(out, "seen.parquet")).to_pylist()
    assert {r["url"]: r["failed"] for r in seen} == golden.seen
    df = _crawled_items(out)
    assert [r["order_key"] for r in golden.entries] == df["order_key"].tolist()
    assert [g["content"] for g in golden.entries] == df["content"].tolist()


def test_fetch_batch_retries_transient(ray_session, fixture_dir):
    """S2: the in-stage bounded retry loop (reference session.py:117-141).
    Flaky URLs fail with 503 on their first 1..retries attempts and must
    recover in-stage when the budget covers them; with retries=0 the
    budget is exhausted immediately and the URL surfaces as 503."""
    import pyarrow as pa

    from forum_dl_ray.crawl.fetch import _transient_attempts, fetch_batch

    pages = pq.read_table(os.path.join(fixture_dir, "pages.parquet"))
    ok_urls = [u for u, s in zip(pages["url"].to_pylist(), pages["status"].to_pylist())
               if s == 200][:40]
    batch = pa.table({"url": pa.array(ok_urls)})
    flaky_rate = 0.3
    flaky = [u for u in ok_urls if _transient_attempts(u, flaky_rate, 3) > 0]
    assert flaky, "fixture too small to seed any flaky URL at rate 0.3"

    out = fetch_batch(batch, pages_path=os.path.join(fixture_dir, "pages.parquet"),
                      flaky_rate=flaky_rate, retries=3)
    att = dict(zip(out["url"].to_pylist(), out["n_attempts"].to_pylist()))
    stat = dict(zip(out["url"].to_pylist(), out["status"].to_pylist()))
    assert all(stat[u] == 200 for u in ok_urls)          # all recovered
    assert all(att[u] > 1 for u in flaky)                # retries happened
    assert all(att[u] == 1 for u in ok_urls if u not in flaky)

    out0 = fetch_batch(batch, pages_path=os.path.join(fixture_dir, "pages.parquet"),
                       flaky_rate=flaky_rate, retries=0)
    stat0 = dict(zip(out0["url"].to_pylist(), out0["status"].to_pylist()))
    assert all(stat0[u] == 503 for u in flaky)           # budget exhausted
    assert all(stat0[u] == 200 for u in ok_urls if u not in flaky)


def test_flaky_crawl_matches_golden(ray_session, fixture_dir, golden, tmp_path):
    """E2E: a crawl with transient failures + in-stage retry produces the
    exact same seen set, failed flags, and ordered output as flaky_rate=0."""
    out = str(tmp_path / "flaky")
    Crawler(fixture_dir, out,
            CrawlConfig(num_shards=2, target_tasks=2, flaky_rate=0.2, retries=3)).run()
    seen = pq.read_table(os.path.join(out, "seen.parquet")).to_pylist()
    assert {r["url"]: r["failed"] for r in seen} == golden.seen
    df = _crawled_items(out)
    assert df["order_key"].tolist() == [g["order_key"] for g in golden.entries]
    assert df["content"].tolist() == [g["content"] for g in golden.entries]
