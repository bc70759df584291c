"""Frontier facade: routes offer/poll traffic across the shard pool.

Sharding (SURVEY.md §7.3):
- seen-set membership is routed by ``url_hash % num_shards`` (uniform),
- queue entries are routed by ``hash64(host) % num_shards`` so the
  owning shard holds the host's entire queue, token bucket and robots
  rules (politeness stays single-source per host even when the fetch
  stage salts a hot host across workers, SURVEY.md §7.4).

``offer`` is called from INSIDE parse workers (the facade is
serializable: it carries only actor handles + config), so newly
discovered URLs flow worker → shard directly without a driver hop.
The driver only calls ``poll`` to assemble the next wave.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import numpy as np
import pyarrow as pa

import ray

from ..schemas import FRONTIER_ENTRY
from ..urlnorm import url_hash64, url_hash64_array
from .shard import FrontierShard

# per-task offer ordinals for _offer_key (module global: lives in the
# worker process; a retried task runs in a FRESH worker — the retry
# trigger is worker death — so the sequence replays deterministically)
_OFFER_SEQS: dict[str, int] = {}


def _offer_key() -> str | None:
    """Identity for one offer() call, deterministic across Ray task
    retries and unique across distinct offers: (task_id, per-task
    ordinal). Returns None outside a Ray task (driver offers — seeds,
    benches — have no retry mechanism, so no caching is needed and the
    dup-offer fast path stays allocation-free)."""
    try:
        import ray as _ray

        tid = _ray.get_runtime_context().get_task_id()
    except Exception:
        return None
    if tid is None:
        return None
    seq = _OFFER_SEQS.get(tid, -1) + 1
    _OFFER_SEQS[tid] = seq
    if len(_OFFER_SEQS) > 1024:  # bound: drop ordinals of other tasks
        for k in list(_OFFER_SEQS):
            if k != tid:
                del _OFFER_SEQS[k]
    return f"{tid}:{seq}"


@dataclass
class FrontierConfig:
    num_shards: int = 8
    capacity_per_shard: int = 1_000_000
    exact: bool = True              # keep the exact side-set (test scale oracle)
    default_rate: float = float("inf")  # tokens/sec per host; inf = no politeness cap
    shard_num_cpus: float = 0.25


class Frontier:
    def __init__(self, shards: list[Any], config: FrontierConfig):
        self.shards = shards
        self.config = config
        self.num_shards = len(shards)

    # ------------------------------------------------------------- lifecycle
    @classmethod
    def create(cls, config: FrontierConfig | None = None) -> "Frontier":
        config = config or FrontierConfig()
        # Shard actors must import this package even when the driver's
        # cwd is not the repo root (Ray workers resolve module paths via
        # the driver cwd in local mode) — pin PYTHONPATH explicitly.
        import os

        repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        runtime_env = {"env_vars": {"PYTHONPATH": repo_root}}
        shards = [
            FrontierShard.options(
                num_cpus=config.shard_num_cpus, runtime_env=runtime_env
            ).remote(i, config.capacity_per_shard, config.exact, config.default_rate)
            for i in range(config.num_shards)
        ]
        return cls(shards, config)

    def __reduce__(self):
        return (Frontier, (self.shards, self.config))

    # ----------------------------------------------------------------- offer
    def offer(self, entries: pa.Table | list[dict[str, Any]]) -> int:
        """Anti-join + enqueue: dedup URLs against the sharded seen set,
        then enqueue only the fresh ones into their host-owning shard.
        Returns the number of fresh entries enqueued. Fully vectorized:
        numpy routing masks, arrow sub-tables on the wire (no per-row
        dicts past this point)."""
        from ..schemas import FRONTIER_ENTRY

        rows: list[dict[str, Any]] | None = None
        if isinstance(entries, pa.Table):
            n = entries.num_rows
            if n == 0:
                return 0
            hashes = entries["url_hash"].to_numpy(zero_copy_only=False).astype(np.int64)
            urls = entries["url"].to_pylist()
        else:
            rows = entries
            n = len(rows)
            if n == 0:
                return 0
            hashes = np.fromiter(
                (r["url_hash"] for r in rows), dtype=np.int64, count=n
            )
            urls = [r["url"] for r in rows]
        # 1) seen anti-join, sharded by url_hash (dup offers end here —
        # no arrow conversion on that path). Both RPC waves carry a
        # retry-stable idempotence key: a parse worker dying between
        # the waves would otherwise leave its URLs marked seen but
        # never enqueued, and Ray's task retry would then drop the
        # whole discovered subtree (r5 review; FrontierShard._idem).
        # keys also fold in a digest of the leg's url_hash content: a
        # replay that somehow differs (e.g. a live-HTTP page changed
        # between attempts) must MISS the cache and be re-decided, not
        # have a stale mask applied to mismatched rows
        import hashlib as _hl

        base = _offer_key()
        shard_of = hashes % self.num_shards
        futures = {}
        for s in np.unique(shard_of):
            ii = np.nonzero(shard_of == s)[0]
            key = None
            if base is not None:
                dg = _hl.blake2b(hashes[ii].tobytes(), digest_size=8).hexdigest()
                key = (base, "s", int(s), dg)
            futures[int(s)] = (
                ii,
                self.shards[int(s)].seen_offer.remote(
                    hashes[ii], [urls[i] for i in ii], key=key,
                ),
            )
        fresh = np.zeros(n, dtype=bool)
        for s, (ii, fut) in futures.items():
            fresh[ii] = ray.get(fut)
        if not fresh.any():
            return 0
        # 2) enqueue fresh entries into the host-owning shard, as arrow
        # sub-tables (built only now, only for fresh rows)
        fresh_idx = np.nonzero(fresh)[0]
        if rows is None:
            fresh_t = entries.take(fresh_idx)
        else:
            names = [f.name for f in FRONTIER_ENTRY]
            fresh_rows = [rows[i] for i in fresh_idx]
            fresh_t = pa.table(
                {nm: [r.get(nm) for r in fresh_rows] for nm in names},
                schema=FRONTIER_ENTRY,
            )
        # hosts repeat heavily (a crawl has few hosts, many URLs):
        # hash each unique host once, scatter via the inverse index
        hosts = np.asarray(fresh_t["host"].to_pylist(), dtype=object)
        uniq_hosts, inv = np.unique(hosts, return_inverse=True)
        host_shard = (url_hash64_array(list(uniq_hosts)) % np.int64(self.num_shards))[inv]
        enq = []
        for s in np.unique(host_shard):
            jj = np.nonzero(host_shard == s)[0]
            sub = fresh_t.take(jj)
            key = None
            if base is not None:
                hs = sub["url_hash"].to_numpy(zero_copy_only=False)
                dg = _hl.blake2b(np.ascontiguousarray(hs).tobytes(),
                                 digest_size=8).hexdigest()
                key = (base, "q", int(s), dg)
            enq.append(self.shards[int(s)].enqueue.remote(sub, key=key))
        return int(sum(ray.get(enq))) if enq else 0

    def mark_failed(self, urls: list[str]) -> None:
        if not urls:
            return
        hashes = url_hash64_array(urls)
        by_shard: dict[int, list[int]] = {}
        for i, h in enumerate(hashes):
            by_shard.setdefault(int(h) % self.num_shards, []).append(i)
        ray.get(
            [
                self.shards[s].mark_failed.remote(hashes[np.array(ii)], [urls[i] for i in ii])
                for s, ii in by_shard.items()
            ]
        )

    # ------------------------------------------------------------------ poll
    def poll(self, now: float, max_total: int = 4096) -> pa.Table:
        per_shard = max(1, max_total // self.num_shards)
        tables = ray.get([s.poll.remote(now, per_shard) for s in self.shards])
        tables = [t for t in tables if t.num_rows]
        if not tables:
            return FRONTIER_ENTRY.empty_table()
        return pa.concat_tables(tables)

    def pending_count(self) -> int:
        return int(sum(ray.get([s.pending_count.remote() for s in self.shards])))

    # -------------------------------------------------------------- policies
    def set_host_policy(self, host: str, rate: float, burst: float | None = None) -> None:
        s = url_hash64(host) % self.num_shards
        ray.get(self.shards[s].set_host_policy.remote(host, rate, burst))

    def set_robots(self, host: str, disallow: list[str]) -> None:
        s = url_hash64(host) % self.num_shards
        ray.get(self.shards[s].set_robots.remote(host, disallow))

    def set_allowed_bases(self, bases: list[str] | None) -> None:
        """Same-site crawl scope (M2): offers not under any base URL are
        dropped at enqueue (every shard owns some hosts, so all get it)."""
        ray.get([s.set_allowed_bases.remote(bases) for s in self.shards])

    # ----------------------------------------------------- oracle/checkpoint
    def seen_table(self) -> pa.Table:
        """Exact seen set (url_hash, url, failed) across shards — the
        golden-oracle comparison surface (test scale only)."""
        return pa.concat_tables(ray.get([s.seen_table.remote() for s in self.shards]))

    def counters(self) -> dict[str, int]:
        per = ray.get([s.counters.remote() for s in self.shards])
        out: dict[str, int] = {}
        for c in per:
            for k, v in c.items():
                out[k] = out.get(k, 0) + v
        return out

    def snapshot(self, path: str) -> None:
        """Checkpoint every shard to ``path/shard=K/`` (parquet + filter
        bytes) — per-partition, so restore parallelizes and a partial
        checkpoint is detectable by missing shard dirs."""
        import os

        import pyarrow.parquet as pq

        snaps = ray.get([s.snapshot.remote() for s in self.shards])
        for snap in snaps:
            d = os.path.join(path, f"shard={snap['shard_id']}")
            os.makedirs(d, exist_ok=True)
            pq.write_table(snap["pending"], os.path.join(d, "pending.parquet"))
            pq.write_table(snap["seen"], os.path.join(d, "seen.parquet"))
            with open(os.path.join(d, "filters.bin"), "wb") as f:
                bloom = snap["bloom"]
                f.write(len(bloom).to_bytes(8, "little"))
                f.write(bloom)
                f.write(snap["cuckoo"])
            with open(os.path.join(d, "meta.json"), "w") as f:
                f.write(snap["meta"])

    def restore(self, path: str) -> None:
        import os

        import pyarrow.parquet as pq

        # seen hashes were partitioned by h % num_shards at snapshot
        # time: restoring into a different shard count silently drops
        # the extra shard dirs' pending work AND mis-routes every
        # dup-check (previously seen URLs re-fetch). Refuse, like
        # pump's n_pumps and the exports' n_shards guards (r5 review).
        snap_dirs = [n for n in os.listdir(path) if n.startswith("shard=")]
        if len(snap_dirs) != self.num_shards:
            raise ValueError(
                f"checkpoint at {path} has {len(snap_dirs)} shard dirs "
                f"but this frontier runs num_shards={self.num_shards} — "
                "seen-set routing is h % num_shards; resume with the "
                "original shard count")
        futs = []
        for i, shard in enumerate(self.shards):
            d = os.path.join(path, f"shard={i}")
            with open(os.path.join(d, "filters.bin"), "rb") as f:
                n = int.from_bytes(f.read(8), "little")
                bloom = f.read(n)
                cuckoo = f.read()
            snap = {
                "shard_id": i,
                "bloom": bloom,
                "cuckoo": cuckoo,
                "pending": pq.read_table(os.path.join(d, "pending.parquet")),
                "seen": pq.read_table(os.path.join(d, "seen.parquet")),
                "meta": open(os.path.join(d, "meta.json")).read(),
            }
            futs.append(shard.restore.remote(snap))
        ray.get(futs)
