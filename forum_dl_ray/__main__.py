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
    p.add_argument("--host-rate", action="append", default=[],
                   metavar="HOST=RATE", help="politeness tokens/sec per host")
    p.add_argument("--list-extractors", action="store_true")
    p.add_argument("--list-output-formats", action="store_true")
    p.add_argument("--num-shards", type=int, default=4)
    args = p.parse_args(argv)

    from . import api

    if args.list_extractors:
        print("\n".join(api.list_extractors()))
        return 0
    if args.list_output_formats:
        print("\n".join(api.list_output_formats()))
        return 0

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
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
                num_shards=args.num_shards,
            ),
        )
        print(json.dumps(stats, indent=1))
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
