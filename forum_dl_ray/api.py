"""Programmatic API — the reference's ``ForumDl`` facade re-expressed.

Reference surface (/root/reference/forum_dl/forumdl.py:15-54):
``download(urls, output_format, ...)``, ``list_extractors()``,
``list_output_formats()``; per URL it runs extractor detection in
registry order (extractors/__init__.py:27-37, first non-None detect
wins) then streams the crawl into the chosen writer.

Here the "network" is a page-store parquet (the fixture contract —
an HTTP fetcher drops in behind the same fetch seam,
crawl/fetch.py), detection runs driver-side against the store
(S11/J5 are a handful of seed probes), and the crawl itself is the
wave scheduler over the frontier actor pool. Sinks: jsonl, mbox
(foldered mail), parquet (raw entry table), urls (--get-urls dry
run, S9).
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field

from .crawl import CrawlConfig, Crawler
from .crawl.crawler import entries_dataset, ordered_items
from .engines import DETECTION_ORDER, detect_engine
from .urlnorm import host_of, normalize_url

OUTPUT_FORMATS = ["jsonl", "mbox", "maildir", "mh", "mmdf", "babyl", "parquet", "urls"]


@dataclass
class DownloadOptions:
    textify: bool = False
    content_as_title: bool = False
    author_as_addr_spec: bool = False
    get_urls: bool = False
    host_rates: dict = field(default_factory=dict)
    robots: dict = field(default_factory=dict)
    obey_robots_txt: bool = True  # discover /robots.txt per seed host
    num_shards: int = 4
    download_time: str = "2026-01-01T00:00:00+00:00"
    # M23 item-kind routing (reference writers/common.py:101-105,135-145
    # + options.py:135-167): --boards/--threads/--posts/--files default
    # True, --outside-files (files with an empty board path) default False
    write_boards: bool = True
    write_threads: bool = True
    write_posts: bool = True
    write_files: bool = True
    write_outside_files: bool = False
    # session options — defaults MATCH the reference options.py:41-77
    # (retries=4, retry_sleep=1; backoff only sleeps when a transient
    # failure actually occurs). timeout/UA flow into the fetch stage
    # and are honored by HttpPageStore when http_gateway is set.
    retries: int = 4
    retry_sleep: float = 1.0
    retry_sleep_multiplier: float = 2.0
    timeout: float = 5.0
    user_agent: str = ""
    http_gateway: str | None = None
    # extra sinks (reference --warc-output / --files-output): lineage
    # capture (the reference's WARC writer is itself a no-op shell —
    # lineage rows are this engine's S5 equivalent) and a separate
    # payload-table destination
    warc_output: str = ""
    files_output: str = ""


def filter_entry_kinds(ds, opts: "DownloadOptions"):
    """Sink-side item-kind routing: drop entry types the options
    exclude; `file` rows with an empty board path ("outside" files,
    writers/common.py:144-145) additionally require
    ``write_outside_files``. Lineage rows always pass (they are crawl
    metadata, filtered separately by sinks that don't want them)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from . import STAGE_RUNTIME_ENV as _renv

    allowed = [k for k, on in (
        ("board", opts.write_boards), ("thread", opts.write_threads),
        ("post", opts.write_posts), ("file", opts.write_files),
    ) if on] + ["lineage"]

    def f(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch["type"], value_set=pa.array(allowed))
        if opts.write_files and not opts.write_outside_files:
            outside = pc.and_(
                pc.equal(batch["type"], "file"), pc.equal(batch["path"], "[]")
            )
            mask = pc.and_(mask, pc.invert(outside))
        return batch.filter(mask)

    return ds.map_batches(f, batch_format="pyarrow", runtime_env=_renv)


def list_extractors() -> list[str]:
    """Engine registry in detection order (reference list_extractors)."""
    return list(DETECTION_ORDER)


def list_output_formats() -> list[str]:
    return list(OUTPUT_FORMATS)


_DETECT_CACHE = None


def detect(url: str, pages_source: str) -> str | None:
    """Classify a seed URL by probing the page store with the engine
    registry (driver-side: detection is a handful of fetches). Probe
    responses go through the bounded ResponseCache (S3/ST2 — the
    reference fetches detection pages with should_cache=True,
    session.py:105-111), so repeated detect/download calls on the same
    seed don't re-read the store."""
    from .crawl.fetch import ResponseCache, get_store

    global _DETECT_CACHE
    if _DETECT_CACHE is None:
        _DETECT_CACHE = ResponseCache(capacity=256)
    url = normalize_url(url, keep_queries=("page",))
    cached = _DETECT_CACHE.get(url, should_cache=True)
    if cached is not None:
        return detect_engine(url, cached["body"]) if cached["found"] else None
    store = get_store(os.path.join(pages_source, "pages.parquet"))
    rows = store.lookup([url])
    if rows[0] < 0:
        _DETECT_CACHE.put(url, {"found": False, "body": b""})
        return None
    body = store.table["body"][rows[0]].as_py()
    _DETECT_CACHE.put(url, {"found": True, "body": body})
    return detect_engine(url, body)


def download(
    urls: list[str],
    pages_source: str,
    out_dir: str,
    output_format: str = "jsonl",
    options: DownloadOptions | None = None,
) -> dict:
    """Crawl the given seed URLs and write the chosen output format.
    Returns the crawl stats dict (+ ``sink`` summary)."""
    opts = options or DownloadOptions()
    if output_format not in OUTPUT_FORMATS:
        raise ValueError(f"unknown output format {output_format!r}; see list_output_formats()")
    if opts.warc_output and not opts.write_outside_files:
        # reference parity (options.py / round-2 advice): --warc-output
        # implies capturing outside-content files too
        opts = dataclasses.replace(opts, write_outside_files=True)

    seeds = []
    for i, url in enumerate(urls):
        engine = detect(url, pages_source)
        if engine is None:
            raise ValueError(f"no engine detects {url!r}")
        seeds.append(
            {"seed_url": normalize_url(url, keep_queries=("page",)), "engine": engine,
             "base_url": url, "host": host_of(url), "politeness_budget": 0.0}
        )

    cfg = CrawlConfig(
        num_shards=opts.num_shards,
        host_rates=dict(opts.host_rates),
        robots=dict(opts.robots),
        obey_robots_txt=opts.obey_robots_txt,
        fetch_assets=not (opts.get_urls or output_format == "urls"),
        retries=opts.retries,
        backoff_base=opts.retry_sleep,
        backoff_multiplier=opts.retry_sleep_multiplier,
        timeout_s=opts.timeout,
        user_agent=opts.user_agent,
        http_gateway=opts.http_gateway,
    )
    crawl_dir = os.path.join(out_dir, "crawl")
    crawler = Crawler(pages_source, crawl_dir, cfg, seeds=seeds)
    stats = crawler.run()

    if opts.warc_output:
        # S5 capture to a caller-chosen path: real ISO-28500 .warc.gz
        # shards (request+response records with bodies — r4 verdict
        # Next #5; the reference captures these via warcio,
        # session.py:37-48) PLUS the queryable lineage parquet.
        from .sinks.warc import warc_export

        lineage = entries_dataset(crawl_dir).filter(expr="type == 'lineage'")
        lineage.write_parquet(os.path.join(opts.warc_output, "lineage"))
        # reuse the crawl's broadcast store ref — re-reading the pages
        # parquet and ray.put-ting a SECOND full copy doubled the
        # object-store footprint for nothing (r5 review)
        pages = getattr(crawler, "store_ref", None)
        if pages is None:  # pragma: no cover — run() always sets it
            if opts.http_gateway is not None:
                pages = ("http", opts.http_gateway, opts.timeout, opts.user_agent)
            else:
                from .crawl.fetch import put_store

                pages = put_store(os.path.join(pages_source, "pages.parquet"))
        records_dir = os.path.join(opts.warc_output, "records")
        manifest = warc_export(
            crawl_dir, pages, records_dir,
            n_shards=opts.num_shards, download_time=opts.download_time,
            user_agent=opts.user_agent,
        )
        stats["warc"] = {
            "path": opts.warc_output,
            "records": records_dir,
            "lineage": os.path.join(opts.warc_output, "lineage"),
            "n_responses": int(manifest["n_responses"].sum()),
            "n_metadata": int(manifest["n_metadata"].sum()),
        }
    if opts.files_output and cfg.fetch_assets:
        from .crawl.crawler import images_dataset

        images_dataset(crawl_dir).write_parquet(opts.files_output)
        stats["files_output"] = {"path": opts.files_output}

    if output_format == "urls" or opts.get_urls:
        import pyarrow.parquet as pq

        seen = pq.read_table(os.path.join(crawl_dir, "seen.parquet"))
        path = os.path.join(out_dir, "urls.txt")
        with open(path, "w") as f:
            for u in sorted(seen["url"].to_pylist()):
                f.write(u + "\n")
        stats["sink"] = {"format": "urls", "path": path, "n": seen.num_rows}
    elif output_format == "parquet":
        stats["sink"] = {"format": "parquet", "path": os.path.join(crawl_dir, "entries")}
    elif output_format == "jsonl":
        from .sinks import write_entries_jsonl

        d = os.path.join(out_dir, "entries_jsonl")
        write_entries_jsonl(
            filter_entry_kinds(
                entries_dataset(crawl_dir).filter(expr="type != 'lineage'"), opts
            ),
            d, extractor="+".join(sorted({s["engine"] for s in seeds})),
            download_time=opts.download_time,
        )
        stats["sink"] = {"format": "jsonl", "path": d}
    elif output_format in ("mbox", "maildir", "mh", "mmdf", "babyl"):
        from .sinks import MailOptions, write_mail

        d = os.path.join(out_dir, output_format)
        folders = write_mail(
            filter_entry_kinds(entries_dataset(crawl_dir), opts),
            d,
            fmt=output_format,
            opts=MailOptions(
                textify=opts.textify,
                content_as_title=opts.content_as_title,
                author_as_addr_spec=opts.author_as_addr_spec,
            ),
        )
        stats["sink"] = {"format": output_format, "path": d, "n_folders": len(folders)}
    return stats


def ordered_entry_stream(out_dir: str):
    """Ordered item stream of a finished download (A2 oracle surface)."""
    return ordered_items(os.path.join(out_dir, "crawl"))
