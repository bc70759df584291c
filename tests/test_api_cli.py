"""Programmatic API + CLI facade (reference forumdl.py:15-54 parity).

Single-seed download restricts the crawl to that site's tree;
detection runs the engine registry; --get-urls is the simulated
(dry-run) writer.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from forum_dl_ray import api
from forum_dl_ray.fixtures import generate_fixture, micro_spec


@pytest.fixture(scope="module")
def fixture_dir(ray_session):
    return generate_fixture(micro_spec())


def test_registry_listing():
    assert "html-generic" in api.list_extractors()
    assert set(api.list_output_formats()) == {
        "jsonl", "mbox", "maildir", "mh", "mmdf", "babyl", "parquet", "urls",
    }


def test_detect(fixture_dir):
    assert api.detect("http://alpha.test/", fixture_dir) == "html-generic"
    assert api.detect("http://nosuch.test/", fixture_dir) is None


def test_download_single_seed_scopes_to_site(fixture_dir, tmp_path):
    out = str(tmp_path / "dl")
    stats = api.download(["http://alpha.test/"], fixture_dir, out, "jsonl")
    assert stats["sink"]["format"] == "jsonl"
    import glob

    lines = []
    for p in sorted(glob.glob(os.path.join(stats["sink"]["path"], "part-*.jsonl"))):
        lines += open(p).read().splitlines()
    assert lines and all("alpha.test" in ln for ln in lines)


def test_download_get_urls_dry_run(fixture_dir, tmp_path):
    out = str(tmp_path / "dry")
    stats = api.download(["http://beta.test/"], fixture_dir, out, "urls")
    urls = open(stats["sink"]["path"]).read().splitlines()
    assert urls and all(u.startswith("http://beta.test/") for u in urls)
    # dry run still DISCOVERS asset urls (they are in the seen set)
    # but downloads no payloads
    assert any("/img/" in u for u in urls)
    assert not os.path.isdir(os.path.join(out, "crawl", "images")) or not os.listdir(
        os.path.join(out, "crawl", "images")
    )


def test_unknown_format_raises(fixture_dir, tmp_path):
    with pytest.raises(ValueError):
        api.download(["http://alpha.test/"], fixture_dir, str(tmp_path), "warc9")


def test_thread_url_seed_parity(fixture_dir, tmp_path):
    """J5: a thread URL as the seed crawls exactly that thread, with
    the board path recovered from breadcrumbs (J2) — crawler output
    equals the golden walker given the same thread seed."""
    import json as _json
    import os as _os

    import pyarrow.parquet as pq

    from forum_dl_ray.crawl.crawler import ordered_items
    from forum_dl_ray.fixtures.golden import simulate

    thread_url = "http://alpha.test/thread/t1/"
    out = str(tmp_path / "t1")
    stats = api.download([thread_url], fixture_dir, out, "parquet")
    assert stats["urls_fetched"] >= 1

    pages = pq.read_table(_os.path.join(fixture_dir, "pages.parquet")).to_pylist()
    golden = simulate(
        pages,
        [{"seed_url": thread_url, "engine": "html-generic",
          "host": "alpha.test", "base_url": thread_url, "politeness_budget": 0.0}],
    )
    df = ordered_items(_os.path.join(out, "crawl")).to_pandas()
    assert df["order_key"].tolist() == [e["order_key"] for e in golden.entries]
    assert df["url"].tolist() == [e["url"] for e in golden.entries]
    # the thread's path includes its breadcrumb board chain
    t_paths = set(df.loc[df["type"] == "thread", "path"])
    assert t_paths == {_json.dumps(p) for p in [["b1", "t1"]]} or all(
        _json.loads(next(iter(t_paths)))[-1] == "t1" for _ in [0]
    )
    seen = pq.read_table(_os.path.join(out, "crawl", "seen.parquet")).to_pylist()
    assert {r["url"]: r["failed"] for r in seen} == golden.seen


def test_mid_chain_board_page_seed(fixture_dir, tmp_path):
    """initial_page parity (reference tests inject a mid-crawl cursor,
    test_extractors.py:79-87): seeding a board's ?page=2 URL starts
    the walk at that cursor — crawler equals the golden walker."""
    import os as _os

    import pyarrow.parquet as pq

    from forum_dl_ray.crawl.crawler import ordered_items
    from forum_dl_ray.fixtures.golden import simulate

    # alpha.test board b1 has 2 threads/page; micro has 2 threads per
    # board -> page=2 exists only if threads > per_page; use beta which
    # has 3 threads at 2/page
    seed_url = "http://beta.test/board/b1?page=2"
    out = str(tmp_path / "mid")
    stats = api.download([seed_url], fixture_dir, out, "parquet")
    assert stats["urls_fetched"] >= 1

    pages = pq.read_table(_os.path.join(fixture_dir, "pages.parquet")).to_pylist()
    golden = simulate(
        pages,
        [{"seed_url": seed_url, "engine": "html-generic",
          "host": "beta.test", "base_url": seed_url, "politeness_budget": 0.0}],
    )
    df = ordered_items(_os.path.join(out, "crawl")).to_pandas()
    assert len(df) == len(golden.entries) > 0
    assert df["order_key"].tolist() == [e["order_key"] for e in golden.entries]
    assert df["url"].tolist() == [e["url"] for e in golden.entries]
    # only the tail of the board's threads was crawled
    assert all("beta.test" in u for u in df["url"])


def test_item_kind_routing_flags(fixture_dir, tmp_path):
    """M23: --boards/--threads/--posts/--files routing (reference
    options.py:135-167 + writers/common.py:101-105,135-145)."""
    import json as _json

    import glob

    def jsonl_types(out_dir):
        lines = []
        for p in sorted(glob.glob(os.path.join(out_dir, "part-*.jsonl"))):
            lines += open(p).read().splitlines()
        return [_json.loads(ln)["type"] for ln in lines]

    base = api.download(["http://alpha.test/"], fixture_dir,
                        str(tmp_path / "all"), "jsonl")
    all_types = jsonl_types(base["sink"]["path"])
    assert {"board", "thread", "post"} <= set(all_types)

    no_posts = api.download(
        ["http://alpha.test/"], fixture_dir, str(tmp_path / "np"), "jsonl",
        options=api.DownloadOptions(write_posts=False, write_files=False),
    )
    kinds = jsonl_types(no_posts["sink"]["path"])
    assert "post" not in kinds and "file" not in kinds
    assert {"board", "thread"} <= set(kinds)
    # boards/threads counts unchanged by dropping posts/files
    assert kinds.count("board") == all_types.count("board")
    assert kinds.count("thread") == all_types.count("thread")

    only_posts = api.download(
        ["http://alpha.test/"], fixture_dir, str(tmp_path / "op"), "jsonl",
        options=api.DownloadOptions(
            write_boards=False, write_threads=False, write_files=False),
    )
    kinds = jsonl_types(only_posts["sink"]["path"])
    assert set(kinds) == {"post"}
    assert kinds.count("post") == all_types.count("post")


def test_item_kind_flags_cli(fixture_dir, tmp_path):
    from forum_dl_ray.__main__ import main

    out = str(tmp_path / "cli_np")
    rc = main(["http://alpha.test/", "--pages-source", fixture_dir,
               "--out", out, "-o", "jsonl", "--no-posts", "--no-files"])
    assert rc == 0
    import glob
    import json as _json

    lines = []
    for p in sorted(glob.glob(os.path.join(out, "entries_jsonl", "part-*.jsonl"))):
        lines += open(p).read().splitlines()
    types = {_json.loads(ln)["type"] for ln in lines}
    assert "post" not in types and "file" not in types and "board" in types


def test_cli_version_and_session_flags(fixture_dir, tmp_path, capsys):
    from forum_dl_ray import __main__ as cli
    from forum_dl_ray import __version__

    with pytest.raises(SystemExit) as e:
        cli.main(["--version"])
    assert e.value.code == 0
    assert __version__ in capsys.readouterr().out


def test_warc_and_files_output_sinks(fixture_dir, tmp_path):
    import pyarrow.parquet as pq

    out = str(tmp_path / "dl2")
    warc = str(tmp_path / "lineage_out")
    files = str(tmp_path / "files_out")
    stats = api.download(
        ["http://alpha.test/"], fixture_dir, out, "jsonl",
        options=api.DownloadOptions(
            warc_output=warc, files_output=files,
            retries=2, retry_sleep=0.0, retry_sleep_multiplier=3.0,
            timeout=1.5, user_agent="fdr-test/1.0",
        ),
    )
    assert stats["warc"]["path"] == warc
    lineage = pq.read_table(stats["warc"]["lineage"])
    assert lineage.num_rows > 0
    assert set(lineage["type"].to_pylist()) == {"lineage"}
    # real .warc.gz records exist alongside the queryable parquet
    assert stats["warc"]["n_responses"] > 0
    assert any(n.endswith(".warc.gz") for n in os.listdir(stats["warc"]["records"]))
    payload = pq.read_table(files)
    assert payload.num_rows > 0
    assert "image_id" in payload.schema.names


def test_quiet_cli_suppresses_stats(fixture_dir, tmp_path, capsys):
    from forum_dl_ray import __main__ as cli

    rc = cli.main([
        "http://alpha.test/", "--pages-source", fixture_dir,
        "--out", str(tmp_path / "qout"), "-o", "urls", "--quiet",
        "--retries", "2", "--timeout", "2.0", "--user-agent", "x/1",
    ])
    assert rc == 0
    assert capsys.readouterr().out.strip() == ""
