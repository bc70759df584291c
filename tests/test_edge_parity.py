"""Edge-class golden/crawler parity locks (round-1 ADVICE):

1. a board whose FIRST page fails must produce NO board entry and no
   subtree on either side (board entries are emitted only after a
   successful page-1 parse);
2. a cross-linked thread (a deeper board referencing a thread already
   discovered earlier in DFS order) must emit a duplicate thread ENTRY
   from the second discovery but walk its posts exactly once, under the
   first discovery's order key (AlreadyVisitedError parity).
"""

import json
import os

import pyarrow.parquet as pq
import pytest

from forum_dl_ray.crawl import CrawlConfig, Crawler
from forum_dl_ray.crawl.crawler import ordered_items
from forum_dl_ray.fixtures import edge_spec, generate_fixture
from forum_dl_ray.fixtures.golden import simulate_fixture_dir


@pytest.fixture(scope="module")
def fixture_dir():
    return generate_fixture(edge_spec())


@pytest.fixture(scope="module")
def golden(fixture_dir):
    return simulate_fixture_dir(fixture_dir)


@pytest.fixture(scope="module")
def crawl_out(ray_session, fixture_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("out") / "crawl")
    Crawler(fixture_dir, out, CrawlConfig(num_shards=2, target_tasks=2)).run()
    return out


def test_edge_parity(crawl_out, golden):
    df = ordered_items(crawl_out).to_pandas()
    assert df["order_key"].tolist() == [e["order_key"] for e in golden.entries]
    assert df["content"].tolist() == [e["content"] for e in golden.entries]
    assert df["url"].tolist() == [e["url"] for e in golden.entries]
    seen = pq.read_table(os.path.join(crawl_out, "seen.parquet")).to_pylist()
    assert {r["url"]: r["failed"] for r in seen} == golden.seen


def test_failing_board_page1_yields_no_board_entry(crawl_out, golden):
    df = ordered_items(crawl_out).to_pandas()
    boards = df[df["type"] == "board"]
    assert not boards["url"].str.contains("/board/b4").any()
    # but the failed URL is recorded in the seen/failed set
    assert golden.seen["http://edge.test/board/b4/"] is True
    # and b4's threads were never discovered
    assert not df["url"].str.contains("t1[012]").any()


def test_cross_linked_thread_single_walk(crawl_out, golden):
    df = ordered_items(crawl_out).to_pandas()
    t1_threads = df[(df["type"] == "thread") & (df["url"] == "http://edge.test/thread/t1/")]
    assert len(t1_threads) == 2  # both discoveries emit the entry
    assert "Crosslinked t1" in sorted(t1_threads["title"])
    # posts of t1 appear exactly once, under the FIRST (b1) discovery key
    first_path = df.loc[t1_threads["order_key"].idxmin(), "path"]
    t1_posts = df[(df["type"] == "post") & (df["path"] == first_path)]
    g_posts = [e for e in golden.entries if e["type"] == "post" and e["path"] == first_path]
    assert len(t1_posts) == len(g_posts) == 4
    # thread entry key = t_key + one "0" segment; posts extend t_key
    first_key = min(t1_threads["order_key"])
    assert all(k.startswith(first_key[:-8]) for k in t1_posts["order_key"])


def test_data_url_inline_files(crawl_out, golden):
    """M22: data: image embeds become File rows with decoded payload
    bytes and the data-URL content type — no fetch, no seen-set record,
    byte-identical between crawler and golden."""
    from base64 import b64decode

    import ray.data as rd

    ents = rd.read_parquet(os.path.join(crawl_out, "entries")).filter(
        expr="type == 'file'"
    ).to_pandas()
    inline = ents[ents["url"].str.startswith("data:")]
    g_inline = [e for e in golden.entries
                if e["type"] == "file" and e["url"].startswith("data:")]
    assert len(inline) == len(g_inline) > 0
    assert (inline["content_type"] == "image/png").all()
    by_key = dict(zip(inline["order_key"], inline["content_bytes"]))
    for e in g_inline:
        got = by_key[e["order_key"]]
        assert bytes(got) == e["content_bytes"]
        # payload round-trips through the data URL itself
        assert b64decode(e["url"].split(",", 1)[1]) == e["content_bytes"]
    # data: URLs never enter the seen set (no fetch happened)
    assert not any(u.startswith("data:") for u in golden.seen)
    seen = pq.read_table(os.path.join(crawl_out, "seen.parquet")).to_pylist()
    assert not any(r["url"].startswith("data:") for r in seen)


def test_page_level_embeds_outside_files(crawl_out, golden):
    """M7/J1: page-level embeds (css link, inline svg, audio source)
    become outside-file rows (path=[]); post-content imgs are
    anti-joined out of the page-level set; inline svg carries content
    bytes; none of them is fetched."""
    import ray.data as rd

    ents = rd.read_parquet(os.path.join(crawl_out, "entries")).filter(
        expr="type == 'file'"
    ).to_pandas()
    outside = ents[ents["path"] == "[]"]
    g_outside = [e for e in golden.entries
                 if e["type"] == "file" and e["path"] == "[]"]
    assert len(outside) == len(g_outside) > 0
    got = sorted(zip(outside["order_key"], outside["url"]))
    want = sorted((e["order_key"], e["url"]) for e in g_outside)
    assert got == want
    # kinds present: stylesheet + svg (board pages), audio (thread pages)
    urls = set(outside["url"])
    assert any(u.endswith(".css/") or ".css" in u for u in urls)
    assert any(".ogg" in u for u in urls)
    svg = outside[outside["content_type"] == "image/svg+xml"]
    assert len(svg) > 0 and all(b"circle" in bytes(b) for b in svg["content_bytes"])
    # J1: no post-content image URL leaked into the outside set
    content_files = ents[ents["path"] != "[]"]
    assert not (set(outside["url"]) & set(content_files["url"]))
    # outside files are never fetched
    seen = pq.read_table(os.path.join(crawl_out, "seen.parquet")).to_pylist()
    seen_urls = {r["url"] for r in seen}
    assert not any(".css" in u or ".ogg" in u for u in seen_urls)
