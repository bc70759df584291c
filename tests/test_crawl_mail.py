"""Mail-archive engine parity (M16) + the ST4 relative_urls stack
cursor, including a mid-crawl resume with the month stack in flight.
"""

import json
import os
import sys

import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from forum_dl_ray.crawl import CrawlConfig, Crawler
from forum_dl_ray.crawl.crawler import ordered_items
from forum_dl_ray.fixtures import generate_fixture, mail_spec
from forum_dl_ray.fixtures.golden import simulate_fixture_dir

ITEM_COLS = ["type", "path", "subpath", "url", "origin", "title", "author",
             "creation_time", "content", "content_type", "order_key"]


@pytest.fixture(scope="module")
def fixture_dir():
    return generate_fixture(mail_spec())


@pytest.fixture(scope="module")
def golden(fixture_dir):
    return simulate_fixture_dir(fixture_dir)


@pytest.fixture(scope="module")
def crawl_out(ray_session, fixture_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("out") / "crawl")
    Crawler(fixture_dir, out, CrawlConfig(num_shards=2, target_tasks=2)).run()
    return out


def test_mail_ordered_items_equal_golden(crawl_out, golden):
    df = ordered_items(crawl_out).to_pandas()
    assert len(df) == len(golden.entries)
    for col in ITEM_COLS:
        want = [e[col] for e in golden.entries]
        have = df[col].tolist()
        if col == "creation_time":
            import pandas as pd

            have = [None if pd.isna(v) else v.to_pydatetime() for v in df[col]]
        assert have == want, f"column {col} diverges"


def test_mail_seen_set(crawl_out, golden):
    seen = pq.read_table(os.path.join(crawl_out, "seen.parquet")).to_pylist()
    assert {r["url"]: r["failed"] for r in seen} == golden.seen


def test_mail_structure(crawl_out, golden):
    """Shape checks per archive style: boards = root + one per list;
    every post page fetched exactly once; style-specific field
    extraction (quote stripping, meta dates, email-body divs)."""
    df = ordered_items(crawl_out).to_pandas()
    boards = df[df["type"] == "board"]
    assert len(boards) == 7  # 3 listinfo roots + 2 + 1 + 1 lists
    posts = df[df["type"] == "post"]
    host = posts["origin"].str.extract(r"http://([^/]+)/")[0]
    pm = posts[host == "pipermail.test"]
    hm = posts[host == "hypermail.test"]
    hk = posts[host == "hyperkitty.test"]
    assert len(pm) == 2 * 6 * 5 and len(hm) == 4 * 4 and len(hk) == 4 * 4
    assert posts["url"].is_unique  # one page per post
    assert posts["creation_time"].notna().all()
    # pipermail: <pre> content with quote wrappers stripped
    assert pm["content"].str.contains(">quoted line").all()
    assert not pm["content"].str.contains("<i>").any()
    # hypermail: content = siblings after <address>; Date meta parsed
    assert hm["content"].str.startswith("<p>").all()
    assert hm["content"].str.contains("more text").all()
    assert not hm["content"].str.contains("<address>").any()
    # hyperkitty: content = email-body inner html
    assert hk["content"].str.startswith("<p>").all()
    assert not hk["content"].str.contains("email-body").any()
    # reply-tree subpaths: roots have depth-1 subpath, replies deeper
    roots = posts[posts["subpath"].map(lambda s: len(json.loads(s))) == 1]
    assert len(roots) == 12 + 4 + 4
    assert (posts["subpath"].map(lambda s: len(json.loads(s))) <= 4).all()


def test_mail_resume_with_stack_in_flight(ray_session, fixture_dir, tmp_path, golden):
    """Stop mid-chain (month stack still in the frontier), checkpoint,
    resume — final output identical to the uninterrupted run. This is
    the ST4 stack-cursor crash-consistency gate."""
    out = str(tmp_path / "resumed")
    cfg_stop = CrawlConfig(num_shards=2, target_tasks=2, checkpoint_every=2,
                           max_waves=4)
    Crawler(fixture_dir, out, cfg_stop).run()
    assert os.path.exists(os.path.join(out, "checkpoints", "LATEST"))
    # the checkpointed frontier must still hold a mail_month entry whose
    # cursor carries a non-empty month stack (the in-flight chain)
    import glob

    ckpt = sorted(glob.glob(
        os.path.join(out, "checkpoints", "*", "shard=*", "pending.parquet")))
    ents = []
    for p in ckpt:
        ents += pq.read_table(p).to_pylist()
    stacks = [json.loads(e["cursor"]).get("stack", [])
              for e in ents if e.get("kind") == "mail_month"]
    assert any(stacks), "expected an in-flight month chain in the checkpoint"

    cfg_go = CrawlConfig(num_shards=2, target_tasks=2, checkpoint_every=2)
    Crawler(fixture_dir, out, cfg_go).run(resume=True)
    seen = pq.read_table(os.path.join(out, "seen.parquet")).to_pylist()
    assert {r["url"]: r["failed"] for r in seen} == golden.seen
    df = ordered_items(out).to_pandas()
    assert df["order_key"].tolist() == [e["order_key"] for e in golden.entries]
    assert df["content"].tolist() == [e["content"] for e in golden.entries]
