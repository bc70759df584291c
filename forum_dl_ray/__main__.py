"""CLI — the reference's ``forum-dl URL`` surface over a page store.

Mirrors /root/reference/forum_dl/options.py:11-196 where the option
is meaningful here: seed URLs, -o/--output-format, --textify,
--content-as-title, --author-as-addr-spec, --get-urls, plus
--pages-source (the parquet page store standing in for HTTP — no
network in this sandbox) and politeness knobs. Owns its Ray session
(guarded init).

    python -m forum_dl_ray http://alpha.test/ \
        --pages-source /tmp/fdr_fixtures/micro-... -o mbox --out /tmp/out
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="forum-dl-ray")
    p.add_argument("urls", nargs="+", help="seed URLs (boards or sites)")
    p.add_argument("--pages-source", required=True,
                   help="fixture dir with pages.parquet (the simulated network)")
    p.add_argument("--out", required=True, help="output directory")
    p.add_argument("-o", "--output-format", default="jsonl",
                   choices=["jsonl", "mbox", "maildir", "mh", "mmdf", "babyl", "parquet", "urls"])
    p.add_argument("--textify", action="store_true")
    p.add_argument("--content-as-title", action="store_true")
    p.add_argument("--author-as-addr-spec", action="store_true")
    p.add_argument("--get-urls", action="store_true",
                   help="print URLs instead of downloading payloads")
    # M23 item-kind routing (reference options.py:135-167)
    p.add_argument("--boards", action=argparse.BooleanOptionalAction, default=True,
                   help="write board objects (--no-boards to negate)")
    p.add_argument("--threads", action=argparse.BooleanOptionalAction, default=True,
                   help="write thread objects (--no-threads to negate)")
    p.add_argument("--posts", action=argparse.BooleanOptionalAction, default=True,
                   help="write post objects (--no-posts to negate)")
    p.add_argument("--files", action=argparse.BooleanOptionalAction, default=True,
                   help="write embedded files (--no-files to negate)")
    p.add_argument("--outside-files", action=argparse.BooleanOptionalAction,
                   default=False,
                   help="write files outside post content (default: False)")
    p.add_argument("--host-rate", action="append", default=[],
                   metavar="HOST=RATE", help="politeness tokens/sec per host")
    p.add_argument("--ignore-robots-txt", action="store_true",
                   help="skip per-host /robots.txt discovery (beyond-reference\n"
                        "politeness layer; rules otherwise apply at enqueue)")
    p.add_argument("--list-extractors", action="store_true")
    p.add_argument("--list-output-formats", action="store_true")
    p.add_argument("--num-shards", type=int, default=4)
    # session options — defaults MATCH the reference options.py:41-77
    # (round-2 advice: retries=4, retry-sleep=1, UA "Forum-dl {ver}")
    from . import __version__ as _ver

    p.add_argument("--timeout", type=float, default=5.0,
                   help="HTTP timeout seconds (honored by HttpPageStore "
                        "when --http-gateway routes fetches over sockets)")
    p.add_argument("--retries", type=int, default=4,
                   help="in-stage transient-retry budget")
    p.add_argument("--retry-sleep", type=float, default=1.0,
                   help="base backoff seconds between retries (only "
                        "slept when a transient failure actually occurs)")
    p.add_argument("--retry-sleep-multiplier", type=float, default=2.0,
                   help="backoff growth factor")
    p.add_argument("--user-agent", default=f"Forum-dl-ray {_ver}",
                   help="user-agent string sent by the HTTP seam")
    p.add_argument("--http-gateway", default=None,
                   help="fetch over real sockets via this gateway "
                        "(GET gateway/quote(url)) instead of the parquet "
                        "page store")
    # extra sinks (reference options.py:104-127)
    p.add_argument("--warc-output", default="",
                   help="also write per-fetch lineage rows (S5) to this dir")
    p.add_argument("--files-output", default="",
                   help="also write the image payload table to this dir")
    p.add_argument("-q", "--quiet", action="store_true",
                   help="suppress the stats JSON on stdout")
    p.add_argument("-v", "--verbose", action="store_true",
                   help="keep Ray INFO logging instead of ERROR-only")
    from . import __version__

    p.add_argument("--version", action="version",
                   version=f"forum-dl-ray {__version__}")
    args = p.parse_args(argv)

    from . import api

    if args.list_extractors:
        print("\n".join(api.list_extractors()))
        return 0
    if args.list_output_formats:
        print("\n".join(api.list_output_formats()))
        return 0

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(address="local", include_dashboard=False,
                 logging_level="INFO" if args.verbose else "ERROR")
    try:
        host_rates = {}
        for spec in args.host_rate:
            host, rate = spec.split("=", 1)
            host_rates[host] = float(rate)
        stats = api.download(
            args.urls,
            args.pages_source,
            args.out,
            output_format=args.output_format,
            options=api.DownloadOptions(
                textify=args.textify,
                content_as_title=args.content_as_title,
                author_as_addr_spec=args.author_as_addr_spec,
                get_urls=args.get_urls,
                host_rates=host_rates,
                obey_robots_txt=not args.ignore_robots_txt,
                num_shards=args.num_shards,
                write_boards=args.boards,
                write_threads=args.threads,
                write_posts=args.posts,
                write_files=args.files,
                write_outside_files=args.outside_files,
                retries=args.retries,
                retry_sleep=args.retry_sleep,
                retry_sleep_multiplier=args.retry_sleep_multiplier,
                timeout=args.timeout,
                user_agent=args.user_agent,
                http_gateway=args.http_gateway,
                warc_output=args.warc_output,
                files_output=args.files_output,
            ),
        )
        if not args.quiet:
            print(json.dumps(stats, indent=1))
        return 0
    finally:
        if owns_session:  # never tear down a caller-owned session
            ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
