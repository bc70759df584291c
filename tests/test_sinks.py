"""JSONL + mail sinks over the micro-fixture crawl output.

Mirrors the reference's writer semantics (writers/common.py Entry
envelope, jsonl.py line format, MailWriter message headers) against
our Ray Datasink / groupby implementations.
"""

import glob
import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from forum_dl_ray.crawl import CrawlConfig, Crawler
from forum_dl_ray.crawl.crawler import entries_dataset
from forum_dl_ray.fixtures import generate_fixture, micro_spec
from forum_dl_ray.sinks import MailOptions, write_entries_jsonl, write_mbox_folders

OUT = "/tmp/fdr_test_sink_crawl"


@pytest.fixture(scope="module")
def crawl_out(ray_session):
    if not os.path.exists(os.path.join(OUT, "stats.json")):
        fx = generate_fixture(micro_spec())
        Crawler(fx, OUT, CrawlConfig(num_shards=2, target_tasks=4)).run()
    return OUT


def _items(crawl_out):
    return entries_dataset(crawl_out).filter(expr="type != 'lineage'")


def test_jsonl_sink_roundtrip(crawl_out):
    d = "/tmp/fdr_test_jsonl"
    write_entries_jsonl(
        _items(crawl_out), d, extractor="html-generic",
        download_time="2026-01-01T00:00:00+00:00",
    )
    assert os.path.exists(os.path.join(d, "_DONE"))
    lines = []
    for p in sorted(glob.glob(os.path.join(d, "part-*.jsonl"))):
        lines += open(p).read().splitlines()
    n_items = _items(crawl_out).count()
    assert len(lines) == n_items
    entries = [json.loads(ln) for ln in lines]
    # envelope fields in reference order (writers/common.py:261-281)
    assert list(entries[0].keys()) == [
        "generator", "version", "extractor", "download_time", "type", "item",
    ]
    assert {e["type"] for e in entries} <= {"board", "thread", "post", "file"}
    posts = [e for e in entries if e["type"] == "post"]
    assert posts and all("content" in p["item"] and "author" in p["item"] for p in posts)


def test_jsonl_sink_ordered_and_deterministic(crawl_out):
    d1, d2 = "/tmp/fdr_test_jsonl_a", "/tmp/fdr_test_jsonl_b"
    for d in (d1, d2):
        write_entries_jsonl(
            _items(crawl_out), d, extractor="html-generic",
            download_time="2026-01-01T00:00:00+00:00",
        )

    def concat(d):
        out = []
        for p in sorted(glob.glob(os.path.join(d, "part-*.jsonl"))):
            out += open(p).read().splitlines()
        return out

    assert concat(d1) == concat(d2)


def test_mbox_folders(crawl_out):
    d = "/tmp/fdr_test_mbox"
    stats = write_mbox_folders(
        entries_dataset(crawl_out), d, MailOptions(author_as_addr_spec=True)
    )
    # one folder per board that has posts; both sites present
    hosts = {f.split("/")[0] for f in stats["folder"]}
    assert hosts == {"alpha.test", "beta.test"}
    total = stats["n_messages"].sum()
    posts = entries_dataset(crawl_out).filter(expr="type == 'post'").count()
    assert total == posts
    txt = open(os.path.join(d, sorted(stats["folder"])[0] + ".mbox")).read()
    # reference header semantics: Message-ID from path join, In-Reply-To
    # parent, addr-spec From (writers/common.py:355-396)
    assert "Message-ID: <" in txt
    assert "In-Reply-To: <" in txt
    assert "@" in txt.split("From: ", 1)[1].splitlines()[0]


def test_mail_textify_and_content_title(crawl_out):
    from forum_dl_ray.sinks import build_mail_messages

    msgs = build_mail_messages(
        entries_dataset(crawl_out),
        MailOptions(textify=True, content_as_title=True),
    ).to_pandas()
    body = msgs["message"].iloc[0]
    assert "text/plain" in body
    assert "<p>" not in body.split("\n\n", 1)[1]  # tags stripped from bodies


def test_all_mail_formats(crawl_out, tmp_path):
    from forum_dl_ray.sinks import write_mail

    ds = entries_dataset(crawl_out)
    for fmt in ["maildir", "mh", "mmdf", "babyl"]:
        d = str(tmp_path / fmt)
        stats = write_mail(ds, d, fmt=fmt)
        assert stats["n_messages"].sum() > 0, fmt
    # maildir: one file per message under cur/
    import glob

    files = glob.glob(str(tmp_path / "maildir" / "**" / "cur" / "*"), recursive=True)
    assert len(files) == stats["n_messages"].sum()
    # mmdf separators present
    mmdf = glob.glob(str(tmp_path / "mmdf" / "**" / "*.mmdf"), recursive=True)
    assert mmdf and "\x01\x01\x01\x01" in open(mmdf[0]).read()
