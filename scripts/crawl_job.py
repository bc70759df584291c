"""Cluster job entrypoint — the `ray job submit` run path.

North-rule shape: the whole crawl runs as a submitted job on a
fixed-size Ray cluster. On a real cluster::

    ray job submit --working-dir . -- \
        python scripts/crawl_job.py --fixture <dir> --out <dir> [--resume]

In this sandbox the same entrypoint runs against the local cluster
(`ray.init(address="local")` fallback when no cluster address is
set). The job is idempotent-resumable: `--resume` restores the latest
frontier checkpoint and skips finished `_DONE` wave partitions.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--fixture", required=True, help="page-store dir (pages.parquet + seeds.json)")
    p.add_argument("--out", required=True)
    p.add_argument("--num-shards", type=int, default=8)
    p.add_argument("--wave-size", type=int, default=16384)
    p.add_argument("--checkpoint-every", type=int, default=4)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--num-cpus", type=int, default=None,
                   help="local-mode cpu cap (ignored on a real cluster)")
    args = p.parse_args()

    import ray

    if not ray.is_initialized():
        addr = os.environ.get("RAY_ADDRESS", "local")
        kwargs = {"include_dashboard": False, "logging_level": "ERROR"}
        if addr in ("", "local") and args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(address=addr or "local", **kwargs)
    try:
        from forum_dl_ray.crawl import CrawlConfig, Crawler

        cfg = CrawlConfig(
            num_shards=args.num_shards,
            wave_size=args.wave_size,
            checkpoint_every=args.checkpoint_every,
        )
        stats = Crawler(args.fixture, args.out, cfg).run(resume=args.resume)
        print(json.dumps(stats))
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
