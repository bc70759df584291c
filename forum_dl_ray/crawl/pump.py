"""Distributed wave pumps — the multi-node scale path for the crawl loop.

The wave Crawler (crawler.py) drives ALL polling/slicing/dispatch from
one driver loop. On one node that pump is far from the bottleneck
(fetch+parse saturates 32 cores at ~40-100k urls/s while the pump
sustains ~200k polls/s), but on a 256-node cluster a single Python
process cannot feed ~10M urls/s. This module shards the PUMP itself:

- P `PumpActor`s each own a disjoint subset of frontier shards. A pump
  polls ONLY its shards and dispatches fetch→parse / fetch→asset Ray
  tasks directly — ready rows never transit the driver.
- Offers still go to the HOST-owNING shard wherever they were parsed
  (the shared frontier facade travels pickled into every task), so the
  seen set, politeness and ordering semantics are exactly the wave
  crawler's: order keys are enqueue-derived, so the order-key sort
  reproduces the golden sequence regardless of which pump fetched what.
- Politeness clocks stay consistent because each shard is polled by
  exactly ONE pump: a token bucket only ever sees one process's
  monotonic clock (the same invariant the single driver gave it).
- The driver degrades to a COORDINATOR: one small RPC per pump per
  tick BURST (a pump runs up to 64 reap→poll→dispatch ticks
  autonomously per `drain` call, event-driven on task completion) and
  the global termination test (all pumps idle ∧ no tasks in flight ∧
  frontier drained) — O(P) per burst instead of O(urls), and the
  dispatch rate no longer depends on the coordinator's tick cadence.

Checkpoint/resume works here too, via tick quiesce: every
``checkpoint_every`` coordinator ticks the pumps drain their in-flight
tasks to a consistent point, the frontier is snapshotted, and each
pump's part-file watermark goes into the manifest; resume restores the
frontier and prunes part files at-or-above the watermark. Same snapshot
format and test harness as the wave crawler (tests/test_pump.py).
"""

from __future__ import annotations

import json
import os
import shutil
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray

from ..frontier import Frontier, FrontierConfig
from .assets import asset_batch
from .crawler import CrawlConfig, Crawler, _STAGE_RUNTIME_ENV
from .fetch import fetch_batch, put_store
from .parse import parse_batch


@ray.remote(num_cpus=1)
def _page_task(t: pa.Table, store_box, frontier, out_path: str,
               flaky_rate: float, retries: int,
               backoff_base: float = 0.0, backoff_multiplier: float = 2.0) -> int:
    # store_box = [ObjectRef]: boxed so Ray does NOT auto-deref the
    # broadcast page store into every task's argument payload
    fetched = fetch_batch(t, pages_path=store_box[0], frontier=frontier,
                          flaky_rate=flaky_rate, retries=retries,
                          backoff_base=backoff_base,
                          backoff_multiplier=backoff_multiplier)
    ents = parse_batch(fetched, frontier=frontier, wave=-1)
    pq.write_table(ents, out_path)
    return ents.num_rows


@ray.remote(num_cpus=1)
def _asset_task(t: pa.Table, store_box, frontier, out_path: str,
                flaky_rate: float, retries: int,
                backoff_base: float = 0.0, backoff_multiplier: float = 2.0) -> int:
    fetched = fetch_batch(t, pages_path=store_box[0], frontier=frontier,
                          flaky_rate=flaky_rate, retries=retries,
                          backoff_base=backoff_base,
                          backoff_multiplier=backoff_multiplier)
    rows = asset_batch(fetched)
    pq.write_table(rows, out_path)
    return rows.num_rows


@ray.remote(num_cpus=0.25)
class PumpActor:
    """One autonomous pump: polls its shard subset, slices, dispatches."""

    def __init__(self, pump_id: int, frontier: Frontier, my_shard_ids: list[int],
                 store_box, entries_dir: str, images_dir: str,
                 rows_per_task: int = 512, max_inflight: int = 8,
                 fetch_assets: bool = True, flaky_rate: float = 0.0,
                 retries: int = 3, start_part: int = 0,
                 backoff_base: float = 0.0, backoff_multiplier: float = 2.0,
                 asset_rows_per_task: int | None = None):
        self.pump_id = pump_id
        self.frontier = frontier
        self.my_shards = [frontier.shards[i] for i in my_shard_ids]
        self.store_box = store_box  # [ObjectRef], see _page_task
        self.entries_dir = os.path.join(entries_dir, f"pump={pump_id}")
        self.images_dir = os.path.join(images_dir, f"pump={pump_id}")
        os.makedirs(self.entries_dir, exist_ok=True)
        os.makedirs(self.images_dir, exist_ok=True)
        self.rows_per_task = rows_per_task
        # asset tasks run the real JPEG/PNG decode (~ms/row) — 4-8x the
        # per-row cost of a page task — so they slice finer to spread a
        # poll's decode over the cluster instead of straggling
        self.asset_rows_per_task = asset_rows_per_task or max(64, rows_per_task // 4)
        self.max_inflight = max_inflight
        self.fetch_assets = fetch_assets
        self.flaky_rate = flaky_rate
        self.retries = retries
        self.backoff_base = backoff_base
        self.backoff_multiplier = backoff_multiplier
        self.inflight: list = []
        self.part = start_part  # resumed runs continue the numbering
        self.n_dispatched = 0

    def quiesce(self) -> dict:
        """Drain in-flight tasks to a consistent point: every part file
        below ``self.part`` is fully written and every frontier offer
        from those tasks has been applied — exactly the state a
        frontier snapshot must cover. Returns the part watermark for
        the checkpoint manifest."""
        if self.inflight:
            ray.get(self.inflight)
            self.inflight = []
        return {"part": self.part, "total": self.n_dispatched}

    def pump_once(self, block: bool = False) -> dict:
        """One pump tick: reap finished tasks, poll own shards,
        dispatch new tasks. Returns (dispatched, inflight) so the
        caller (coordinator or the local drain loop) can decide
        quiescence. With ``block=True`` a tick whose window is full
        and has nothing reaped waits (briefly) for ONE task to finish
        instead of returning empty-handed — dispatch becomes
        event-driven rather than bounded by the tick cadence."""
        if self.inflight:
            done, rest = ray.wait(self.inflight, num_returns=len(self.inflight),
                                  timeout=0)
            if not done and block and len(rest) >= self.max_inflight:
                done, rest = ray.wait(rest, num_returns=1, timeout=0.02)
            ray.get(done)  # propagate task failures loudly
            self.inflight = rest
        dispatched = 0
        if len(self.inflight) < self.max_inflight:
            # poll enough rows to REFILL the whole inflight window in
            # one tick: with one task per rows_per_task chunk, polling
            # a single chunk per tick caps throughput at
            # tick_rate × pumps tasks/s — the coordinator tick cadence
            # (an O(pumps) RPC round) then bounds the cluster. Scaling
            # the poll volume by the free slot count makes a tick's
            # dispatch proportional to completed work instead.
            free = self.max_inflight - len(self.inflight)
            per_shard = max(64, self.rows_per_task) * max(
                1, free // max(1, len(self.my_shards)))
            now = time.monotonic()
            tables = [t for t in ray.get(
                [sh.poll.remote(now, per_shard) for sh in self.my_shards]
            ) if t.num_rows]
            if tables:
                t = pa.concat_tables(tables)
                # hot-host salting (same permutation the wave crawler uses)
                perm = np.argsort(
                    t["url_hash"].to_numpy(zero_copy_only=False), kind="stable"
                )
                t = t.take(perm)
                is_asset = pc.equal(t["kind"], "asset")
                pages_t = t.filter(pc.invert(is_asset))
                assets_t = t.filter(is_asset)
                if not self.fetch_assets:
                    assets_t = assets_t.slice(0, 0)
                for src, task, root, rpt in (
                    (pages_t, _page_task, self.entries_dir,
                     self.rows_per_task),
                    (assets_t, _asset_task, self.images_dir,
                     self.asset_rows_per_task),
                ):
                    for off in range(0, src.num_rows, rpt):
                        chunk = src.slice(off, rpt)
                        out_path = os.path.join(root, f"part-{self.part:06d}.parquet")
                        self.part += 1
                        self.inflight.append(
                            task.options(runtime_env=_STAGE_RUNTIME_ENV).remote(
                                chunk, self.store_box, self.frontier, out_path,
                                self.flaky_rate, self.retries,
                                self.backoff_base, self.backoff_multiplier,
                            )
                        )
                        dispatched += chunk.num_rows
        self.n_dispatched += dispatched
        return {"dispatched": dispatched, "inflight": len(self.inflight),
                "total": self.n_dispatched}

    def drain(self, max_ticks: int = 64, idle_stop: int = 5) -> dict:
        """Run up to ``max_ticks`` pump ticks locally — one coordinator
        RPC buys a whole burst. At 4N cpus the per-tick coordinator
        round trip (O(pumps) ray.get per tick) otherwise bounds the
        dispatch rate: more cores finish more tasks per second, so the
        refill cadence must rise with the cluster, and a driver-paced
        tick loop cannot. Returns early after ``idle_stop`` consecutive
        locally-idle ticks (nothing dispatched, nothing in flight) so
        the coordinator can test global termination — offers from
        OTHER pumps' in-flight tasks can still land in this pump's
        shards, so idleness is only decidable globally."""
        ticks = 0
        idle = 0
        while ticks < max_ticks:
            s = self.pump_once(block=True)
            ticks += 1
            if s["dispatched"] or s["inflight"]:
                idle = 0
                if not s["dispatched"] and self.inflight:
                    # frontier starved but work in flight (pagination
                    # chains do this constantly): wait event-driven for
                    # ONE completion — its parse offers are what will
                    # refill the frontier — instead of hammering the
                    # shard poll RPCs in a tight loop. (pump_once only
                    # blocks when the window is FULL; this covers the
                    # partially-full starved case.)
                    ray.wait(self.inflight, num_returns=1, timeout=0.02)
            else:
                idle += 1
                if idle >= idle_stop or ticks >= max_ticks:
                    break
                time.sleep(0.002)  # politeness tokens may refill
        return {"ticks": ticks, "total": self.n_dispatched,
                "busy": idle == 0}


def pump_drain_bench(fixture_dir: str, out_root: str, num_cpus: int,
                     n_pumps: int | None = None,
                     rows_per_task: int = 1024) -> dict:
    """Scaling subject on the DISTRIBUTED pump path (round-2 verdict
    Next #5): pre-seed the frontier with every fixture URL (untimed —
    at the north rule's 10^10-URL scale the frontier is already full
    of discovered work), then time the pumps draining it through the
    real fetch→parse/asset tasks. Unlike the steady-state Dataset job
    this includes the full frontier pressure: sharded polls, duplicate
    re-offers from parse discovery (every discovered URL is already
    seen → the bloom/cuckoo reject path), politeness clocks, and the
    O(pumps) coordinator tick. Shards and pumps scale with num_cpus,
    so the measurement answers 'does the pump architecture keep up
    when the cluster quadruples'."""
    from .steady import _make_entries

    # one pump per ~8 cpus (on a real cluster: one per NODE). With
    # max_inflight cluster-sized, a single pump already saturates this
    # box; extra pumps only add coordinator RPCs and polling overhead
    # (measured back-to-back at 16 cpus: 1 pump 53.8k, 2 pumps
    # 50.8-52.3k, 4 pumps 39.6k urls/s)
    n_pumps = n_pumps or max(1, num_cpus // 8)
    num_shards = max(2, num_cpus // 4)
    pages_path = os.path.join(fixture_dir, "pages.parquet")
    shutil.rmtree(out_root, ignore_errors=True)
    entries_dir = os.path.join(out_root, "entries")
    images_dir = os.path.join(out_root, "images")
    os.makedirs(entries_dir, exist_ok=True)
    os.makedirs(images_dir, exist_ok=True)

    store_box = [put_store(pages_path)]
    meta = pq.read_table(pages_path, columns=["url", "content_type"],
                         memory_map=True)
    frontier = Frontier.create(
        FrontierConfig(num_shards=num_shards,
                       capacity_per_shard=max(1_000_000,
                                              2 * meta.num_rows // num_shards))
    )
    # untimed seeding: the drain is the subject, not the driver's
    # offer loop (discovery-time offers happen inside parse tasks and
    # ARE in the timed region, as duplicate re-offers)
    for off in range(0, meta.num_rows, 65536):
        chunk = meta.slice(off, 65536)
        frontier.offer(_make_entries(chunk).to_pylist())

    pumps = [
        PumpActor.options(runtime_env=_STAGE_RUNTIME_ENV).remote(
            p, frontier, list(range(num_shards))[p::n_pumps], store_box,
            entries_dir, images_dir, rows_per_task=rows_per_task,
            # sized so ONE pump can saturate the whole cluster, not
            # 1/n_pumps of it: host-affine shard placement means a hot
            # host's entire stream drains through a single pump (4-host
            # fixture: hot.delta alone is ~40% of URLs), and dividing
            # inflight by n_pumps idled half the cluster during that
            # drain (measured at 16 cpus: 46.7k -> 52.3k urls/s)
            max_inflight=max(4, 2 * num_cpus),
        )
        for p in range(n_pumps)
    ]
    t0 = time.perf_counter()
    n_total = 0
    while True:
        stats = ray.get([p.drain.remote(max_ticks=64) for p in pumps])
        n_total = sum(s["total"] for s in stats)
        busy = any(s["busy"] for s in stats)
        if not busy and frontier.pending_count() == 0:
            break
        if not busy:
            time.sleep(0.01)
    elapsed = time.perf_counter() - t0
    return {
        "pump_urls": n_total,
        "pump_pumps": n_pumps,
        "pump_shards": num_shards,
        "pump_elapsed_sec": round(elapsed, 3),
        "pump_urls_per_sec": round(n_total / elapsed, 1) if elapsed > 0 else 0.0,
    }


class MultiPumpCrawler:
    """Crawler variant driven by P distributed pumps (see module doc).

    Reuses the wave Crawler's seed construction, output layout and
    frontier wiring; only the pump loop differs. Output readers
    (`ordered_items`, `images_dataset`, seen.parquet) are unchanged.
    """

    def __init__(self, fixture_dir: str, out_dir: str,
                 config: CrawlConfig | None = None, n_pumps: int = 2,
                 seeds: list[dict] | None = None):
        self.inner = Crawler(fixture_dir, out_dir, config, seeds=seeds)
        self.n_pumps = max(1, min(n_pumps, (config or CrawlConfig()).num_shards))

    def run(self, resume: bool = False) -> dict:
        """``checkpoint_every`` (CrawlConfig) counts coordinator TICKS
        here (the pump path has no waves; a tick is the analogous
        quiescable boundary) and ``max_waves`` bounds ticks — giving
        checkpoint/resume the same semantics and test harness as the
        wave crawler: quiesce pumps → snapshot frontier → record
        per-pump part watermarks; resume restores the frontier and
        deletes part files at-or-above the watermark (work the
        restored frontier will re-dispatch)."""
        cfg = self.inner.config
        c = self.inner
        start_parts = {p: 0 for p in range(self.n_pumps)}
        ckpt_tick = 0
        if resume:
            ckpt_tick, start_parts = self._resume_prune()
        else:
            # clear ckpt_dir too (matching Crawler.run): a fresh run
            # killed before its first checkpoint must not leave a
            # PREVIOUS run's LATEST_PUMP/tick=* snapshots for a later
            # resume to restore against this run's part files
            for d in (c.entries_dir, c.images_dir, c.ckpt_dir):
                shutil.rmtree(d, ignore_errors=True)
                os.makedirs(d, exist_ok=True)
        frontier = Frontier.create(
            FrontierConfig(num_shards=cfg.num_shards,
                           capacity_per_shard=cfg.capacity_per_shard,
                           default_rate=cfg.default_rate)
        )
        for host, rate in cfg.host_rates.items():
            frontier.set_host_policy(host, rate)
        for host, dis in c._robots_rules().items():
            frontier.set_robots(host, dis)
        if cfg.restrict_to_seeds:
            from ..urlnorm import host_of, normalize_url

            frontier.set_allowed_bases(sorted({
                f"http://{host_of(normalize_url(s['seed_url']))}/"
                for s in c.seeds
            }))
        if resume:
            frontier.restore(os.path.join(c.ckpt_dir, f"tick={ckpt_tick}"))
            # restore() rebuilt buckets + robots from the snapshot;
            # re-apply the CURRENT config so operator changes made
            # between runs win (r5 review; mirrors Crawler.run)
            for host, rate in cfg.host_rates.items():
                frontier.set_host_policy(host, rate)
            for host, dis in c._robots_rules().items():
                frontier.set_robots(host, dis)
        else:
            frontier.offer(c.seed_entries())
        # honor the HTTP-gateway seam exactly like the wave Crawler:
        # the pump path silently crawled the parquet fixture (or raised
        # FileNotFoundError) when http_gateway was configured (r5 review)
        if cfg.http_gateway is not None:
            store_box = [("http", cfg.http_gateway, cfg.timeout_s,
                          cfg.user_agent)]
        else:
            store_box = [put_store(c.pages_path)]

        shard_ids = list(range(cfg.num_shards))
        pumps = [
            PumpActor.options(runtime_env=_STAGE_RUNTIME_ENV).remote(
                p, frontier, shard_ids[p::self.n_pumps], store_box,
                c.entries_dir, c.images_dir,
                rows_per_task=max(cfg.min_rows_per_task, 64),
                # cluster-wide, not /n_pumps: a skewed (hot-host) shard
                # set must be able to fill every core on its own — see
                # pump_drain_bench's max_inflight note
                max_inflight=max(cfg.max_inflight_waves * 4,
                                 2 * int(ray.cluster_resources().get("CPU", 4))),
                fetch_assets=cfg.fetch_assets, flaky_rate=cfg.flaky_rate,
                retries=cfg.retries, start_part=start_parts.get(p, 0),
                backoff_base=cfg.backoff_base,
                backoff_multiplier=cfg.backoff_multiplier,
            )
            for p in range(self.n_pumps)
        ]
        t0 = time.perf_counter()
        ticks = ckpt_tick
        n_total = 0
        # pumps run autonomous tick BURSTS (PumpActor.drain) — one
        # coordinator RPC per burst instead of per tick — capped so a
        # burst never crosses a checkpoint boundary or the max_waves
        # tick budget (the tests' "kill" point)
        next_ckpt = ticks + cfg.checkpoint_every if cfg.checkpoint_every else None
        while True:
            budget = 64
            if next_ckpt is not None:
                budget = min(budget, next_ckpt - ticks)
            if cfg.max_waves:
                budget = min(budget, ckpt_tick + cfg.max_waves - ticks)
            stats = ray.get([p.drain.remote(max_ticks=budget) for p in pumps])
            ticks += max(s["ticks"] for s in stats)
            n_total = sum(s["total"] for s in stats)
            busy = any(s["busy"] for s in stats)
            if next_ckpt is not None and ticks >= next_ckpt:
                self._checkpoint(frontier, pumps, ticks)
                while next_ckpt <= ticks:
                    next_ckpt += cfg.checkpoint_every
            if not busy and frontier.pending_count() == 0:
                break
            if cfg.max_waves and ticks - ckpt_tick >= cfg.max_waves:
                # tick budget (tests use this as the "kill"): drain
                # in-flight writes so no task is still writing part
                # files when a resume later prunes by watermark
                ray.get([p.quiesce.remote() for p in pumps])
                break
            if not busy:
                time.sleep(0.01)  # politeness tokens refilling
        elapsed = time.perf_counter() - t0

        os.makedirs(c.out_dir, exist_ok=True)
        pq.write_table(frontier.seen_table(),
                       os.path.join(c.out_dir, "seen.parquet"))
        stats = {
            "pumps": self.n_pumps,
            "ticks": ticks,
            "elapsed_sec": elapsed,
            "urls_fetched": n_total,
            "urls_per_sec": n_total / elapsed if elapsed > 0 else 0.0,
            **frontier.counters(),
        }
        with open(os.path.join(c.out_dir, "stats.json"), "w") as f:
            json.dump(stats, f, indent=1)
        return stats

    def _checkpoint(self, frontier: Frontier, pumps, tick: int) -> None:
        """Quiesce → snapshot → manifest, marked atomically (_DONE
        written last, LATEST_PUMP after — a killed checkpoint leaves
        either nothing or a complete restore point)."""
        parts = ray.get([p.quiesce.remote() for p in pumps])
        d = os.path.join(self.inner.ckpt_dir, f"tick={tick}")
        shutil.rmtree(d, ignore_errors=True)
        frontier.snapshot(d)
        with open(os.path.join(d, "pumps.json"), "w") as f:
            json.dump({"tick": tick,
                       "n_pumps": self.n_pumps,
                       "parts": {str(i): r["part"] for i, r in enumerate(parts)}},
                      f)
        with open(os.path.join(d, "_DONE"), "w") as f:
            f.write("ok")
        with open(os.path.join(self.inner.ckpt_dir, "LATEST_PUMP"), "w") as f:
            f.write(str(tick))

    def _resume_prune(self) -> tuple[int, dict[int, int]]:
        """Load the latest pump checkpoint and delete every part file
        at-or-above its per-pump watermark (written after the snapshot;
        the restored frontier re-dispatches that work)."""
        ckpt_dir = self.inner.ckpt_dir
        latest = os.path.join(ckpt_dir, "LATEST_PUMP")
        if not os.path.exists(latest):
            raise FileNotFoundError(f"no pump checkpoint under {ckpt_dir}")
        tick = int(open(latest).read().strip())
        d = os.path.join(ckpt_dir, f"tick={tick}")
        if not os.path.exists(os.path.join(d, "_DONE")):
            raise FileNotFoundError(f"incomplete pump checkpoint {d}")
        with open(os.path.join(d, "pumps.json")) as f:
            manifest = json.load(f)
        if manifest["n_pumps"] != self.n_pumps:
            raise ValueError(
                f"checkpoint has {manifest['n_pumps']} pumps, crawler has "
                f"{self.n_pumps} — part watermarks are per-pump")
        parts = {int(k): int(v) for k, v in manifest["parts"].items()}
        for root in (self.inner.entries_dir, self.inner.images_dir):
            for p in range(self.n_pumps):
                pdir = os.path.join(root, f"pump={p}")
                if not os.path.isdir(pdir):
                    continue
                for name in os.listdir(pdir):
                    # parse the FULL number between 'part-' and the
                    # extension: f'{part:06d}' widens past 6 digits at
                    # part 10^6, and a fixed [5:11] slice would read
                    # 'part-1000000' as 100000 and let the stale
                    # post-checkpoint file survive pruning (r5 review)
                    if (name.startswith("part-")
                            and int(name[5:].split(".", 1)[0])
                            >= parts.get(p, 0)):
                        os.remove(os.path.join(pdir, name))
        return tick, parts
