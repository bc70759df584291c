"""Wave-based crawl scheduler: frontier → fetch → parse → offer loop.

Replaces the reference's single-threaded generator stack (forumdl.py:
23-48 sequential per-URL loop) with the wave design of SURVEY.md §7.2
step 4: the driver drains frontier polls into a small Dataset per
wave; fetch and parse run as streaming ``map_batches`` stages over
Arrow batches; newly discovered URLs are offered back to the frontier
from inside the parse workers; the loop ends when the frontier drains.

Pagination chains are inherently sequential (cursor k+1 is only known
after parsing page k, common.py:334-346) — each chain advances one
page per wave, and throughput comes from breadth across
boards/threads/hosts (SURVEY.md §2.6.2), so a wave's Dataset is wide
at 100 TB scale even though it is small in the test fixture.

Scale notes:
- wave tables are sliced into ~`target_tasks` blocks after a
  deterministic hash permutation — this is the hot-host SALTING for
  the fetch stage (spreads one host's URLs across workers) while the
  politeness budget stays single-source in the host-owning frontier
  shard (SURVEY.md §7.4).
- outputs are partitioned per wave (``entries/wave=N/``,
  ``images/wave=N/``) with ``_DONE`` markers → a failed run deletes
  unfinished partitions and resumes from the last frontier checkpoint.
- entry rows never visit the driver: parse writes straight to
  parquet via the Dataset sink; only poll tables (URLs + cursors) do.
"""

from __future__ import annotations

import functools
import json
import os
import shutil
import time
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from ..frontier import Frontier, FrontierConfig
from ..schemas import order_key
from ..urlnorm import host_of, normalize_url, url_hash64
from .assets import asset_batch
from .fetch import fetch_batch
from .parse import parse_batch

# Workers must import this package regardless of the driver's cwd
# (Ray local mode resolves module paths via driver cwd; see
# .claude/skills/verify/SKILL.md gotcha). One dedicated worker pool
# keyed by this env hash is reused across all waves.
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_STAGE_RUNTIME_ENV = {"env_vars": {"PYTHONPATH": _REPO_ROOT}}


@dataclass
class CrawlConfig:
    num_shards: int = 4
    wave_size: int = 8192
    target_tasks: int = 8          # max fetch/parse blocks per wave
    min_rows_per_task: int = 512   # don't slice below this (task overhead)
    inline_below: int = 96         # waves smaller than this run on the driver
    fetch_batch_size: int = 512
    parse_batch_size: int = 512
    asset_batch_size: int = 256    # wide binary rows -> smaller batches
    max_inflight_waves: int = 4    # concurrent wave pipelines (driver threads)
    default_rate: float = float("inf")
    host_rates: dict = field(default_factory=dict)
    robots: dict = field(default_factory=dict)  # host -> [rules]: disallow
                                   # patterns ('*'/'$' wildcards) and
                                   # '!'-prefixed allows (crawl/robots.py)
    obey_robots_txt: bool = True   # discover /robots.txt per seed host
                                   # (config `robots` overrides per host)
    checkpoint_every: int = 0      # waves; 0 = disabled
    flaky_rate: float = 0.0
    retries: int = 3               # in-stage transient-retry budget
    backoff_base: float = 0.0      # secs; base*mult^attempt between retries
    backoff_multiplier: float = 2.0  # reference --retry-sleep-multiplier
    timeout_s: float = 5.0         # per-request timeout for the HTTP seam
                                   # (reference --timeout; the parquet page
                                   # store answers instantly, a real fetcher
                                   # behind get_store honors it)
    user_agent: str = ""           # reference --user-agent; sent by the
                                   # HTTP seam (HttpPageStore) when set
    http_gateway: str | None = None  # non-None switches the fetch stage to
                                     # REAL sockets via HttpPageStore:
                                     # GET {gateway}/{quote(url)} with
                                     # timeout_s + user_agent honored
                                     # (tests run a localhost gateway)
    max_waves: int = 100_000
    capacity_per_shard: int = 1_000_000
    fetch_assets: bool = True      # False = --get-urls style dry run:
                                   # discover + record asset URLs, skip download
    restrict_to_seeds: bool = True  # M2 same-site scope: drop offers whose
                                    # URL is not under a seed site


class Crawler:
    def __init__(
        self,
        fixture_dir: str,
        out_dir: str,
        config: CrawlConfig | None = None,
        seeds: list[dict] | None = None,
    ):
        self.fixture_dir = fixture_dir
        self.pages_path = os.path.join(fixture_dir, "pages.parquet")
        self.seeds = (
            seeds
            if seeds is not None
            else json.load(open(os.path.join(fixture_dir, "seeds.json")))
        )
        self.out_dir = out_dir
        self.config = config or CrawlConfig()
        self.entries_dir = os.path.join(out_dir, "entries")
        self.images_dir = os.path.join(out_dir, "images")
        self.ckpt_dir = os.path.join(out_dir, "checkpoints")

    # ---------------------------------------------------------------- seeds
    def seed_entries(self) -> list[dict]:
        rows = []
        for s_idx, seed in enumerate(self.seeds):
            url = normalize_url(seed["seed_url"], keep_queries=("page",))
            rows.append(
                {
                    "url": url,
                    "url_hash": url_hash64(url),
                    "host": host_of(url),
                    "engine": seed["engine"],
                    "kind": "seed",
                    "depth": 0,
                    "seq": s_idx,
                    "order_key": order_key(s_idx),
                    "path": "[]",
                    "title": "",
                    "cursor": "{}",
                }
            )
        return rows

    # ------------------------------------------------------------- run loop
    def run(self, resume: bool = False) -> dict:
        cfg = self.config
        frontier = Frontier.create(
            FrontierConfig(
                num_shards=cfg.num_shards,
                capacity_per_shard=cfg.capacity_per_shard,
                default_rate=cfg.default_rate,
            )
        )
        for host, rate in cfg.host_rates.items():
            frontier.set_host_policy(host, rate)
        for host, dis in self._robots_rules().items():
            frontier.set_robots(host, dis)
        if cfg.restrict_to_seeds:
            # M2 same-site scope: every offer must live under a seed site
            bases = sorted({
                f"http://{host_of(normalize_url(s['seed_url']))}/"
                for s in self.seeds
            })
            frontier.set_allowed_bases(bases)

        wave = 0
        if resume:
            wave = self._resume(frontier)
            # restore() rebuilt buckets + robots wholesale from the
            # snapshot; re-apply the CURRENT config so operator changes
            # made between runs (a new host rate, a new disallow) win
            # over checkpointed policy, matching the config-beats-
            # discovered rule everywhere else (r5 review)
            for host, rate in cfg.host_rates.items():
                frontier.set_host_policy(host, rate)
            for host, dis in self._robots_rules().items():
                frontier.set_robots(host, dis)
        else:
            for d in (self.entries_dir, self.images_dir, self.ckpt_dir):
                shutil.rmtree(d, ignore_errors=True)
            frontier.offer(self.seed_entries())

        # broadcast the page store once (ray.put) — every fetch task
        # resolves it zero-copy from the object store; with an HTTP
        # gateway configured the fetch stage opens real sockets instead
        from .fetch import put_store

        if cfg.http_gateway is not None:
            store_ref = ("http", cfg.http_gateway, cfg.timeout_s, cfg.user_agent)
        else:
            store_ref = put_store(self.pages_path)
        # exposed so post-crawl consumers (api.py's WARC export) reuse
        # the SAME broadcast table instead of re-reading + re-putting a
        # second full copy of the page store (CLAUDE.md: broadcast,
        # don't rebuild)
        self.store_ref = store_ref
        fetch = functools.partial(
            fetch_batch, pages_path=store_ref, frontier=frontier,
            flaky_rate=cfg.flaky_rate, retries=cfg.retries,
            backoff_base=cfg.backoff_base,
            backoff_multiplier=cfg.backoff_multiplier,
        )

        def run_pages(pages_t, w: int) -> None:
            ds = rd.from_arrow(_slices(pages_t, cfg.target_tasks, cfg.min_rows_per_task))
            out = ds.map_batches(
                fetch, batch_format="pyarrow", batch_size=cfg.fetch_batch_size,
                runtime_env=_STAGE_RUNTIME_ENV,
            ).map_batches(
                functools.partial(parse_batch, frontier=frontier, wave=w),
                batch_format="pyarrow", batch_size=cfg.parse_batch_size,
                runtime_env=_STAGE_RUNTIME_ENV,
            )
            self._write_wave(out, self.entries_dir, w)

        def run_assets(assets_t, w: int) -> None:
            ds = rd.from_arrow(_slices(assets_t, cfg.target_tasks, cfg.min_rows_per_task))
            out = ds.map_batches(
                fetch, batch_format="pyarrow", batch_size=cfg.asset_batch_size,
                runtime_env=_STAGE_RUNTIME_ENV,
            ).map_batches(
                asset_batch, batch_format="pyarrow", batch_size=cfg.asset_batch_size,
                runtime_env=_STAGE_RUNTIME_ENV,
            )
            self._write_wave(out, self.images_dir, w)

        def run_inline(t, w: int) -> None:
            """Tiny waves (crawl ramp-up/tail) skip Ray Data: the same
            fetch/parse/asset kernels run on the driver, saving ~1 s of
            pipeline latency per wave — the ramp is a sequential chain
            (seed → index → first boards), so this latency is on the
            critical path and cores can't help."""
            import pyarrow.parquet as _pq

            for kind_mask, kernel, root in (
                (pc.invert(pc.equal(t["kind"], "asset")),
                 lambda b: parse_batch(fetch(b), frontier=frontier, wave=w),
                 self.entries_dir),
                (pc.equal(t["kind"], "asset"),
                 lambda b: asset_batch(fetch(b)), self.images_dir),
            ):
                part = t.filter(kind_mask)
                if not part.num_rows:
                    continue
                out_t = kernel(part)
                d = os.path.join(root, f"wave={w}")
                shutil.rmtree(d, ignore_errors=True)
                os.makedirs(d, exist_ok=True)
                _pq.write_table(out_t, os.path.join(d, "part-0.parquet"))
                with open(os.path.join(d, "_DONE"), "w") as f:
                    f.write("ok")

        # Wave pipelines OVERLAP: the poll loop keeps feeding new wave
        # Datasets while earlier ones are still streaming (pagination
        # chain k+1 only needs chain k's PARSE to have offered back, not
        # its sink to have flushed). Per-pipeline fixed cost and the
        # politeness-bounded tail thus hide behind useful work — this is
        # what makes throughput scale with cores instead of being
        # chain-depth × pipeline-overhead bound.
        from concurrent.futures import ThreadPoolExecutor

        pool = ThreadPoolExecutor(max_workers=2 * cfg.max_inflight_waves)
        inflight: list = []

        # Prewarm while the ramp waves run inline: spin up the
        # runtime_env worker pool and load the page store once per
        # worker so the first wide wave doesn't pay cold start.
        def _prewarm() -> None:
            try:
                warm = rd.from_arrow(
                    [pa.table({"warm": pa.array([i], pa.int64())})
                     for i in range(cfg.target_tasks)]
                )
                warm.map_batches(
                    functools.partial(_prewarm_batch, pages_path=store_ref),
                    batch_format="pyarrow", batch_size=1,
                    runtime_env=_STAGE_RUNTIME_ENV,
                ).materialize()
            except Exception:
                pass  # warmup is best-effort

        pool.submit(_prewarm)
        t_start = time.perf_counter()
        n_fetched = 0
        while wave < cfg.max_waves:
            for f in inflight:
                if f.done():
                    f.result()  # propagate wave-pipeline failures loudly
            inflight = [f for f in inflight if not f.done()]
            if len(inflight) >= 2 * cfg.max_inflight_waves:
                time.sleep(0.005)
                continue
            t = frontier.poll(now=time.monotonic(), max_total=cfg.wave_size)
            if t.num_rows == 0:
                if inflight:
                    time.sleep(0.01)  # parses in flight may offer more
                    continue
                if frontier.pending_count() == 0:
                    break
                time.sleep(0.02)  # politeness tokens refilling
                continue
            n_fetched += t.num_rows
            # hash permutation = hot-host salting across fetch tasks
            # (zero-copy numpy view; to_pylist here cost ~10% of the pump)
            perm = np.argsort(
                t["url_hash"].to_numpy(zero_copy_only=False), kind="stable"
            )
            t = t.take(perm)
            is_asset = pc.equal(t["kind"], "asset")
            pages_t = t.filter(pc.invert(is_asset))
            assets_t = t.filter(is_asset)

            if not cfg.fetch_assets:
                assets_t = assets_t.slice(0, 0)  # discovered+seen, not downloaded
            if t.num_rows < cfg.inline_below:
                run_inline(t if cfg.fetch_assets else pages_t, wave)
            else:
                if pages_t.num_rows:
                    inflight.append(pool.submit(run_pages, pages_t, wave))
                if assets_t.num_rows:
                    inflight.append(pool.submit(run_assets, assets_t, wave))

            if cfg.checkpoint_every and (wave + 1) % cfg.checkpoint_every == 0:
                # checkpoint at a quiescent point: drain in-flight waves
                # so the snapshot covers exactly waves <= current
                for f in inflight:
                    f.result()
                inflight = []
                self._checkpoint(frontier, wave)
            wave += 1
        for f in inflight:
            f.result()
        pool.shutdown()

        elapsed = time.perf_counter() - t_start
        # final seen set -> the golden-oracle comparison surface
        import pyarrow.parquet as pq

        os.makedirs(self.out_dir, exist_ok=True)
        pq.write_table(frontier.seen_table(), os.path.join(self.out_dir, "seen.parquet"))
        counters = frontier.counters()
        stats = {
            "waves": wave,
            "elapsed_sec": elapsed,
            "urls_fetched": n_fetched,
            "urls_per_sec": n_fetched / elapsed if elapsed > 0 else 0.0,
            **counters,
        }
        with open(os.path.join(self.out_dir, "stats.json"), "w") as f:
            json.dump(stats, f, indent=1)
        return stats

    # ------------------------------------------------------------- helpers
    def _robots_rules(self) -> dict[str, list[str]]:
        """Config robots + per-seed-host /robots.txt discovery from the
        page store (point lookups, O(hosts)); config wins per host."""
        cfg = self.config
        if not cfg.obey_robots_txt or not os.path.exists(self.pages_path):
            # http-gateway mode has no parquet store; robots over the
            # real-socket seam stays config-driven for now
            return dict(cfg.robots)
        from ..urlnorm import host_of, normalize_url
        from .robots import merged_robots

        hosts = sorted({host_of(normalize_url(s["seed_url"])) for s in self.seeds})
        return merged_robots(self.pages_path, hosts, cfg.robots,
                             user_agent=cfg.user_agent or "forum-dl-ray")

    def _write_wave(self, ds: rd.Dataset, root: str, wave: int) -> None:
        d = os.path.join(root, f"wave={wave}")
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d, exist_ok=True)
        # explicit local filesystem: concurrent wave threads otherwise
        # race fsspec's lazy imports inside path resolution
        # (ImportError: cannot import name 'HTTPFileSystem')
        import pyarrow.fs as pafs

        ds.write_parquet(d, filesystem=pafs.LocalFileSystem())
        with open(os.path.join(d, "_DONE"), "w") as f:
            f.write("ok")

    def _checkpoint(self, frontier: Frontier, wave: int) -> None:
        d = os.path.join(self.ckpt_dir, f"wave={wave}")
        shutil.rmtree(d, ignore_errors=True)
        frontier.snapshot(d)
        with open(os.path.join(d, "_DONE"), "w") as f:
            f.write("ok")
        with open(os.path.join(self.ckpt_dir, "LATEST"), "w") as f:
            f.write(str(wave))

    def _resume(self, frontier: Frontier) -> int:
        latest_path = os.path.join(self.ckpt_dir, "LATEST")
        if not os.path.exists(latest_path):
            raise FileNotFoundError(f"no checkpoint under {self.ckpt_dir}")
        ckpt_wave = int(open(latest_path).read().strip())
        frontier.restore(os.path.join(self.ckpt_dir, f"wave={ckpt_wave}"))
        # drop output partitions newer than (or concurrent with) the
        # checkpoint, plus any wave dir without a _DONE marker
        for root in (self.entries_dir, self.images_dir):
            if not os.path.isdir(root):
                continue
            for name in os.listdir(root):
                if not name.startswith("wave="):
                    continue
                w = int(name.split("=")[1])
                if w > ckpt_wave or not os.path.exists(os.path.join(root, name, "_DONE")):
                    shutil.rmtree(os.path.join(root, name), ignore_errors=True)
        return ckpt_wave + 1


def _prewarm_batch(batch: "pa.Table", *, pages_path: str) -> "pa.Table":
    """Worker warmup kernel: force package import + page-store load."""
    from .fetch import get_store

    get_store(pages_path)
    return batch


def _slices(t, n_slices: int, min_rows: int = 1):
    """Split an arrow table into ~n equal slices (one Dataset block
    each), but never below ``min_rows`` per slice — tiny blocks cost
    more in task overhead than they buy in parallelism."""
    n = t.num_rows
    n_slices = max(1, min(n_slices, n // min_rows if min_rows > 1 else n, n))
    chunk = -(-n // n_slices)
    return [t.slice(i, chunk) for i in range(0, n, chunk)]


def crawl_fixture(fixture_dir: str, out_dir: str, config: CrawlConfig | None = None,
                  resume: bool = False) -> dict:
    return Crawler(fixture_dir, out_dir, config).run(resume=resume)


# ------------------------------------------------------- result accessors
def entries_dataset(out_dir: str) -> rd.Dataset:
    return rd.read_parquet(os.path.join(out_dir, "entries"))


def ordered_items(out_dir: str):
    """Item entries sorted by emission order key — the reference-order
    reconstruction (A2 oracle surface). Returns a sorted Dataset."""
    ds = entries_dataset(out_dir)
    ds = ds.filter(expr="type != 'lineage'")
    return ds.sort("order_key")


def images_dataset(out_dir: str) -> rd.Dataset:
    return rd.read_parquet(os.path.join(out_dir, "images"))
