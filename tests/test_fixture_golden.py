"""Fixture generator + golden simulator invariants (no Ray needed)."""

import json
import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from forum_dl_ray.fixtures import generate_fixture, micro_spec, small_spec
from forum_dl_ray.fixtures.golden import simulate_fixture_dir
from forum_dl_ray.images import decode_image, psnr, synth_pixels


@pytest.fixture(scope="module")
def micro_dir(tmp_path_factory):
    return generate_fixture(micro_spec(), str(tmp_path_factory.mktemp("fx") / "micro"))


@pytest.fixture(scope="module")
def micro_golden(micro_dir):
    return simulate_fixture_dir(micro_dir)


def test_fixture_deterministic(tmp_path):
    d1 = generate_fixture(micro_spec(), str(tmp_path / "a"), force=True)
    d2 = generate_fixture(micro_spec(), str(tmp_path / "b"), force=True)
    for name in ("pages.parquet", "images.parquet"):
        b1 = open(os.path.join(d1, name), "rb").read()
        b2 = open(os.path.join(d2, name), "rb").read()
        assert b1 == b2, name


def test_micro_structure(micro_dir):
    pages = pq.read_table(os.path.join(micro_dir, "pages.parquet"))
    kinds = pages["kind"].to_pylist()
    assert kinds.count("board_index") == 2
    # site alpha: 2 top + 2 sub = 4 boards; beta: 1 board
    urls = pages["url"].to_pylist()
    assert len(urls) == len(set(urls)), "page URLs must be unique"
    seeds = json.load(open(os.path.join(micro_dir, "seeds.json")))
    assert [s["engine"] for s in seeds] == ["html-generic", "html-generic"]


def test_golden_emission_order_equals_order_key_sort(micro_golden):
    """The DFS emission order IS the lexicographic order-key order —
    the invariant that lets the parallel crawler reconstruct reference
    order by sorting (SURVEY.md §4 ordering row)."""
    keys = [e["order_key"] for e in micro_golden.entries]
    assert keys == sorted(keys)
    assert len(keys) == len(set(keys)), "order keys must be unique"


def test_golden_crawl_order_dedup(micro_golden):
    assert len(micro_golden.crawl_order) == len(set(micro_golden.crawl_order))
    assert set(micro_golden.crawl_order) == set(micro_golden.seen.keys())


def test_golden_counts_and_types(micro_golden):
    types = [e["type"] for e in micro_golden.entries]
    # alpha: root + 2 top + 2 sub = 5 boards; beta: root + 1 = 2 boards
    assert types.count("board") == 7
    # alpha: 4 boards x 2 threads = 8; beta: 1 board x 3 threads = 3
    assert types.count("thread") == 11
    assert types.count("post") > 0
    assert types.count("file") == len(micro_golden.images)


def test_golden_failed_pages_recorded_and_chain_stops(micro_golden):
    failed = [u for u, f in micro_golden.seen.items() if f]
    # beta.test has fail_rate=0.2 on thread pages >= 2
    assert any("beta.test" in u for u in failed)
    # a failed page's successor page is never crawled
    for u in failed:
        if "?page=" in u:
            base, page = u.split("?page=")
            nxt = f"{base}?page={int(page) + 1}"
            assert nxt not in micro_golden.seen


def test_golden_posts_have_subpaths_and_times(micro_golden):
    posts = [e for e in micro_golden.entries if e["type"] == "post"]
    for p in posts:
        sub = json.loads(p["subpath"])
        assert len(sub) >= 1
        assert p["creation_time"] is not None
        assert p["content"].startswith("<p>")


def test_golden_images_match_payload_oracle(micro_dir, micro_golden):
    """Per-row invariant from BASELINE.json input_hint: decoded-pixel
    PSNR >= 40 dB (lossy) / exact (png) + caption equality."""
    fixture_images = {
        r["image_id"]: r for r in pq.read_table(os.path.join(micro_dir, "images.parquet")).to_pylist()
    }
    assert len(micro_golden.images) > 0
    for img in micro_golden.images:
        ref = fixture_images[img["image_id"]]
        assert img["caption"] == ref["caption"], img["image_id"]
        got = decode_image(img["bytes"], img["fmt"])
        orig = synth_pixels(img["image_id"], ref["w"], ref["h"])
        if img["fmt"] == "png":
            assert np.array_equal(got, orig)
        else:
            assert psnr(got, orig) >= 40.0


def test_golden_hashes_stable(micro_dir):
    g1 = simulate_fixture_dir(micro_dir)
    g2 = simulate_fixture_dir(micro_dir)
    assert g1.hashes == g2.hashes
    assert g1.crawl_order == g2.crawl_order
    for h in g1.hashes.values():
        assert len(h["titles_sha1"]) == 40


def test_small_spec_hot_host_share():
    d = generate_fixture(small_spec())
    pages = pq.read_table(os.path.join(d, "pages.parquet"))
    hosts = pages["host"].to_pylist()
    share = hosts.count("hot.delta.test") / len(hosts)
    assert share >= 0.5, f"hot host share {share:.2f} < 0.5 (FIXTURES.md F1)"
    assert len(hosts) > 3000
