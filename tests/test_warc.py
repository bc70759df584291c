"""ISO-28500 WARC export round-trip (SURVEY S5, r4 verdict Next #5).

The reference captures true request/response records via
``warcio.capture_http`` (session.py:37-48); this suite proves the
from-scratch writer round-trips: every fetch lineage row becomes a
request+response pair (parse-error rows a metadata record), response
bodies are byte-equal to what the crawl fetched (sha1 gate), the
files are byte-deterministic, and resume skips finished shards.
"""

import glob
import hashlib
import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from forum_dl_ray import api
from forum_dl_ray.fixtures import generate_fixture, micro_spec
from forum_dl_ray.sinks.warc import (
    iter_warc_records,
    split_http_block,
    warc_export,
)


@pytest.fixture(scope="module")
def fixture_dir(ray_session):
    return generate_fixture(micro_spec())


@pytest.fixture(scope="module")
def crawl_out(fixture_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("warc") / "dl")
    warc = str(tmp_path_factory.mktemp("warc") / "capture")
    stats = api.download(
        ["http://alpha.test/"], fixture_dir, out, "jsonl",
        options=api.DownloadOptions(warc_output=warc, user_agent="fdr/1.0"),
    )
    return fixture_dir, out, warc, stats


def _all_records(records_dir):
    recs = []
    for p in sorted(glob.glob(os.path.join(records_dir, "*.warc.gz"))):
        recs.extend(iter_warc_records(p))
    return recs


def test_roundtrip_counts_and_bodies(crawl_out):
    import pyarrow.parquet as pq

    fixture_dir, out, warc, stats = crawl_out
    lineage = pq.read_table(stats["warc"]["lineage"], columns=["url", "data"])
    metas = [json.loads(d) for d in lineage["data"].to_pylist()]
    n_fetch = sum(1 for m in metas if "status" in m)
    n_err = len(metas) - n_fetch

    recs = _all_records(stats["warc"]["records"])
    by_type = {}
    for r in recs:
        by_type.setdefault(r["headers"]["WARC-Type"], []).append(r)
    # record count == lineage rows (fetches -> request+response pair,
    # parse errors -> metadata record)
    assert len(by_type.get("response", [])) == n_fetch == stats["warc"]["n_responses"]
    assert len(by_type.get("request", [])) == n_fetch
    assert len(by_type.get("metadata", [])) == n_err

    # bodies byte-equal: the sha1 the fetch stage recorded at crawl
    # time matches the archived block for every 200 response
    want = {}
    for u, m in zip(lineage["url"].to_pylist(), metas):
        if m.get("status") == 200:
            want[u] = m["sha1"]
    checked = 0
    for r in by_type["response"]:
        status_line, hdrs, body = split_http_block(r["block"])
        url = r["headers"]["WARC-Target-URI"]
        assert int(hdrs["content-length"]) == len(body)
        if status_line.startswith("HTTP/1.1 200"):
            assert hashlib.sha1(body).hexdigest() == want[url]
            checked += 1
    assert checked == len(want) > 0
    # WARC framing basics
    for r in recs:
        assert r["headers"]["WARC-Record-ID"].startswith("<urn:uuid:")
        assert r["headers"]["WARC-Date"].endswith("Z")


def test_request_records_pair_with_responses(crawl_out):
    _, _, _, stats = crawl_out
    recs = _all_records(stats["warc"]["records"])
    resp_ids = {r["headers"]["WARC-Record-ID"] for r in recs
                if r["headers"]["WARC-Type"] == "response"}
    for r in recs:
        if r["headers"]["WARC-Type"] == "request":
            assert r["headers"]["WARC-Concurrent-To"] in resp_ids
            first = r["block"].split(b"\r\n", 1)[0]
            assert first.startswith(b"GET ") and first.endswith(b" HTTP/1.1")
            assert b"User-Agent: fdr/1.0" in r["block"]


def test_deterministic_and_resumable(crawl_out, tmp_path):
    fixture_dir, out, _, _ = crawl_out
    pages = os.path.join(fixture_dir, "pages.parquet")
    crawl_dir = os.path.join(out, "crawl")
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    ma = warc_export(crawl_dir, pages, a, n_shards=3)
    mb = warc_export(crawl_dir, pages, b, n_shards=3)
    assert ma.to_dict() == mb.to_dict()
    for name in sorted(os.listdir(a)):
        if name.endswith(".warc.gz"):
            assert open(os.path.join(a, name), "rb").read() == \
                open(os.path.join(b, name), "rb").read()

    # resume: nuke one shard; only it is rebuilt, byte-identical
    victim = os.path.join(a, "shard-00001.warc.gz")
    ref_bytes = open(victim, "rb").read()
    mtimes = {n: os.path.getmtime(os.path.join(a, n))
              for n in os.listdir(a) if n.endswith(".warc.gz")}
    os.remove(victim)
    m2 = warc_export(crawl_dir, pages, a, n_shards=3, resume=True)
    assert m2.to_dict() == ma.to_dict()
    assert open(victim, "rb").read() == ref_bytes
    for n, t in mtimes.items():
        if n != "shard-00001.warc.gz":
            assert os.path.getmtime(os.path.join(a, n)) == t  # untouched

    # width-change resume refuses (md5 placement is a fn of n_shards)
    with pytest.raises(ValueError, match="n_shards"):
        warc_export(crawl_dir, pages, a, n_shards=5, resume=True)


def test_body_drift_fails_loudly(crawl_out, tmp_path):
    """A page source that changed since the crawl must not be archived
    silently — the sha1 gate raises."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    fixture_dir, out, _, _ = crawl_out
    crawl_dir = os.path.join(out, "crawl")
    t = pq.read_table(os.path.join(fixture_dir, "pages.parquet"))
    bodies = [(b or b"") + b"<!-- drift -->" for b in t["body"].to_pylist()]
    t = t.set_column(t.schema.get_field_index("body"), "body",
                     pa.array(bodies, pa.large_binary()))
    drifted = str(tmp_path / "pages.parquet")
    pq.write_table(t, drifted)
    with pytest.raises(Exception, match="sha1|drift"):
        warc_export(crawl_dir, drifted, str(tmp_path / "w"), n_shards=2)


def test_empty_shards_marked_and_resume_early_exits(crawl_out, tmp_path):
    """r5 review: shard ids md5 placement leaves EMPTY never produced
    a group, so no marker was written — len(done) never reached
    n_shards and every resumed call re-ran the whole read+shuffle.
    Empty shards must get a (zero-record) file + marker, appear in the
    manifest, and make resume a pure marker read."""
    fixture_dir, out, _, _ = crawl_out
    pages = os.path.join(fixture_dir, "pages.parquet")
    crawl_dir = os.path.join(out, "crawl")
    d = str(tmp_path / "wide")
    # micro fixture has ~dozens of lineage rows; 48 shards guarantees
    # at least one empty shard
    m1 = warc_export(crawl_dir, pages, d, n_shards=48)
    assert sorted(m1["shard"]) == list(range(48))
    empties = m1[m1["n_responses"] + m1["n_metadata"] == 0]
    assert len(empties) > 0
    for s in empties["shard"]:
        f = os.path.join(d, f"shard-{int(s):05d}.warc.gz")
        assert os.path.exists(f)
        assert list(iter_warc_records(f)) == []  # zero-member gzip
    mtimes = {n: os.path.getmtime(os.path.join(d, n))
              for n in os.listdir(d)}
    m2 = warc_export(crawl_dir, pages, d, n_shards=48, resume=True)
    assert m2.to_dict() == m1.to_dict()
    for n, t in mtimes.items():  # early exit: NOTHING rewritten
        assert os.path.getmtime(os.path.join(d, n)) == t
