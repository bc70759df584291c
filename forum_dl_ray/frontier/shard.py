"""A single frontier shard: URL-seen membership + pending queue + politeness.

Replaces the reference's process-global ``Session._past_requests`` /
``_past_failed_requests`` sets and implicit "work list" of generator
frames (/root/reference/forum_dl/session.py:54-59,105-115;
extractors/common.py:334-366) with shard-local state designed to be
held in a pool of Ray actors (SURVEY.md §7.3):

- **seen role** (rows routed by ``url_hash % num_shards``): bloom
  pre-check → cuckoo filter → exact side-set (test scale only).
  ``seen_offer`` is the distributed anti-join J4: it returns the mask
  of URLs never seen before, and marks them seen (first-wins).
- **queue role** (rows routed by ``hash(host) % num_shards`` so one
  shard owns ALL of a host's queue + its politeness budget — the
  salting interplay in SURVEY.md §7.4): a priority heap ordered by
  ``(depth, seq)`` plus per-host token buckets and robots rules.
  Poll-time budget enforcement keeps the single source of truth for a
  host's rate in its owning shard even when fetch-stage partitioning
  salts the hot host across workers.

`ShardState` is plain Python (unit-testable without Ray);
`FrontierShard` is the thin ``@ray.remote`` wrapper.
"""

from __future__ import annotations

import heapq
import json
from typing import Any

import numpy as np
import pyarrow as pa

import ray

from ..schemas import FRONTIER_ENTRY, SEEN_CHECKPOINT
from .filters import BloomFilter, CuckooFilter

_ENTRY_COLS = [f.name for f in FRONTIER_ENTRY]


class ShardState:
    def __init__(
        self,
        shard_id: int,
        capacity: int = 1_000_000,
        exact: bool = True,
        default_rate: float = float("inf"),
        default_burst: float = 64.0,
    ):
        self.shard_id = shard_id
        # --- seen role ---
        self.bloom = BloomFilter(capacity, fp_rate=0.01)
        self.cuckoo = CuckooFilter(capacity)
        self.exact_enabled = exact
        # hash -> (url, failed); exact oracle at test scale, disabled at 10^10
        self.exact: dict[int, tuple[str, bool]] = {}
        self.n_seen = 0
        self.n_failed = 0
        # --- queue role ---
        self.heap: list[tuple[int, int, int]] = []  # (depth, seq, idx into _entries)
        self._entries: dict[int, dict[str, Any]] = {}
        self._next_idx = 0
        self.default_rate = default_rate
        self.default_burst = default_burst
        # host -> [tokens, last_refill_ts, rate, burst]
        self.buckets: dict[str, list[float]] = {}
        self.robots: dict[str, list[str]] = {}  # host -> disallowed path prefixes
        self.n_robots_denied = 0
        self.stats_offered = 0
        self.stats_fresh = 0
        self.stats_polled = 0

    # ------------------------------------------------------------------ seen
    def seen_offer(self, hashes: np.ndarray, urls: list[str], failed: bool = False) -> np.ndarray:
        """First-wins insert; True where the key was fresh (never seen)."""
        hashes = np.asarray(hashes, dtype=np.int64)
        self.stats_offered += len(hashes)
        maybe = self.bloom.contains_many(hashes)
        fresh = np.ones(len(hashes), dtype=bool)
        if maybe.any():
            idx = np.nonzero(maybe)[0]
            if self.exact_enabled:
                # exact resolution of bloom/cuckoo false positives (test scale)
                hit = np.fromiter(
                    (int(h) in self.exact for h in hashes[idx]), dtype=bool, count=len(idx)
                )
            else:
                hit = self.cuckoo.contains_many(hashes[idx])
            fresh[idx[hit]] = False
        # batch-intra dedup: same hash twice in one offer → first wins
        new_hashes = hashes[fresh]
        if len(new_hashes):
            _, first_pos = np.unique(new_hashes, return_index=True)
            dup_mask = np.ones(len(new_hashes), dtype=bool)
            dup_mask[:] = False
            dup_mask[first_pos] = True
            fresh_idx = np.nonzero(fresh)[0]
            fresh[fresh_idx[~dup_mask]] = False
            new_hashes = hashes[fresh]
        if len(new_hashes):
            self.bloom.add_many(new_hashes)
            self.cuckoo.insert_many(new_hashes)
            if self.exact_enabled:
                for i in np.nonzero(fresh)[0]:
                    self.exact[int(hashes[i])] = (urls[i], failed)
            self.n_seen += len(new_hashes)
            if failed:
                self.n_failed += len(new_hashes)
        self.stats_fresh += int(fresh.sum())
        return fresh

    def mark_failed(self, hashes: np.ndarray, urls: list[str]) -> None:
        """Record fetch failures (reference failed-set, session.py:112-115).

        The URL is already in the seen filters (offered before fetch);
        this only flips the exact-set flag / counter so the golden
        seen-set export distinguishes failed URLs.
        """
        for h, u in zip(np.asarray(hashes, dtype=np.int64), urls):
            if self.exact_enabled:
                self.exact[int(h)] = (u, True)
        self.n_failed += len(hashes)

    # ----------------------------------------------------------------- queue
    def _bucket(self, host: str) -> list[float]:
        b = self.buckets.get(host)
        if b is None:
            b = [self.default_burst, 0.0, self.default_rate, self.default_burst]
            self.buckets[host] = b
        return b

    def set_host_policy(self, host: str, rate: float, burst: float | None = None) -> None:
        burst = burst if burst is not None else max(1.0, rate)
        self.buckets[host] = [burst, 0.0, rate, burst]

    def set_robots(self, host: str, disallow: list[str]) -> None:
        self.robots[host] = list(disallow)

    def _robots_allows(self, host: str, url: str) -> bool:
        rules = self.robots.get(host)
        if not rules:
            return True
        # path component only (canonical URLs: scheme://host/path...)
        path = url.split(host, 1)[-1]
        return not any(path.startswith(p) for p in rules)

    def enqueue(self, entries: list[dict[str, Any]]) -> int:
        n = 0
        for e in entries:
            if not self._robots_allows(e["host"], e["url"]):
                self.n_robots_denied += 1
                continue
            idx = self._next_idx
            self._next_idx += 1
            self._entries[idx] = e
            heapq.heappush(self.heap, (int(e["depth"]), int(e["seq"]), idx))
            n += 1
        return n

    def poll(self, now: float, max_n: int) -> pa.Table:
        """Pop up to max_n entries whose host has politeness tokens.

        Entries whose host is out of tokens are held back (re-pushed
        with unchanged priority). Scan is bounded to avoid O(pending)
        sweeps when one hot host dominates the top of the heap.
        """
        out: list[dict[str, Any]] = []
        held: list[tuple[int, int, int]] = []
        scan_budget = max_n * 4 + 256
        blocked_hosts: set[str] = set()
        while self.heap and len(out) < max_n and scan_budget > 0:
            scan_budget -= 1
            item = heapq.heappop(self.heap)
            e = self._entries[item[2]]
            host = e["host"]
            if host in blocked_hosts:
                held.append(item)
                continue
            b = self._bucket(host)
            tokens, last, rate, burst = b
            if rate != float("inf"):
                tokens = min(burst, tokens + (now - last) * rate)
                b[1] = now
            if tokens >= 1.0 or rate == float("inf"):
                b[0] = tokens - 1.0 if rate != float("inf") else tokens
                del self._entries[item[2]]
                out.append(e)
            else:
                b[0] = tokens
                blocked_hosts.add(host)
                held.append(item)
        for item in held:
            heapq.heappush(self.heap, item)
        self.stats_polled += len(out)
        return _entries_to_table(out)

    def pending_count(self) -> int:
        return len(self.heap)

    # ------------------------------------------------------------ checkpoint
    def snapshot(self) -> dict[str, Any]:
        pending = [self._entries[i] for (_, _, i) in sorted(self.heap)]
        seen = pa.table(
            {
                "url_hash": pa.array([h for h in self.exact], type=pa.int64()),
                "url": pa.array([v[0] for v in self.exact.values()], type=pa.string()),
                "failed": pa.array([v[1] for v in self.exact.values()], type=pa.bool_()),
            },
            schema=SEEN_CHECKPOINT,
        )
        return {
            "shard_id": self.shard_id,
            "bloom": self.bloom.to_bytes(),
            "cuckoo": self.cuckoo.to_bytes(),
            "pending": _entries_to_table(pending),
            "seen": seen,
            "meta": json.dumps(
                {
                    "n_seen": self.n_seen,
                    "n_failed": self.n_failed,
                    "next_idx": self._next_idx,
                    "exact_enabled": self.exact_enabled,
                    "buckets": {h: list(b) for h, b in self.buckets.items()},
                    "robots": self.robots,
                    "default_rate": self.default_rate,
                    "default_burst": self.default_burst,
                }
            ),
        }

    def restore(self, snap: dict[str, Any]) -> None:
        meta = json.loads(snap["meta"])
        self.bloom = BloomFilter.from_bytes(snap["bloom"])
        self.cuckoo = CuckooFilter.from_bytes(snap["cuckoo"])
        self.n_seen = meta["n_seen"]
        self.n_failed = meta["n_failed"]
        self._next_idx = meta["next_idx"]
        self.exact_enabled = meta["exact_enabled"]
        self.default_rate = meta["default_rate"]
        self.default_burst = meta["default_burst"]
        self.buckets = {h: list(b) for h, b in meta["buckets"].items()}
        self.robots = {h: list(v) for h, v in meta["robots"].items()}
        seen = snap["seen"]
        self.exact = {
            int(h): (u, f)
            for h, u, f in zip(
                seen["url_hash"].to_pylist(), seen["url"].to_pylist(), seen["failed"].to_pylist()
            )
        }
        self.heap = []
        self._entries = {}
        for e in snap["pending"].to_pylist():
            idx = self._next_idx
            self._next_idx += 1
            self._entries[idx] = e
            heapq.heappush(self.heap, (int(e["depth"]), int(e["seq"]), idx))

    def counters(self) -> dict[str, int]:
        return {
            "n_seen": self.n_seen,
            "n_failed": self.n_failed,
            "pending": len(self.heap),
            "offered": self.stats_offered,
            "fresh": self.stats_fresh,
            "polled": self.stats_polled,
            "robots_denied": self.n_robots_denied,
        }


def _entries_to_table(entries: list[dict[str, Any]]) -> pa.Table:
    if not entries:
        return FRONTIER_ENTRY.empty_table()
    cols = {name: [e.get(name) for e in entries] for name in _ENTRY_COLS}
    return pa.table(cols, schema=FRONTIER_ENTRY)


@ray.remote
class FrontierShard:
    """Ray actor wrapper; one per shard, sized num_cpus≈0.25 so a pool
    of shards coexists with fetch/parse stages on the same nodes."""

    def __init__(self, shard_id: int, capacity: int, exact: bool, default_rate: float):
        self.state = ShardState(shard_id, capacity, exact=exact, default_rate=default_rate)

    def seen_offer(self, hashes: np.ndarray, urls: list[str], failed: bool = False) -> np.ndarray:
        return self.state.seen_offer(hashes, urls, failed=failed)

    def mark_failed(self, hashes: np.ndarray, urls: list[str]) -> None:
        self.state.mark_failed(hashes, urls)

    def enqueue(self, entries: list[dict[str, Any]]) -> int:
        return self.state.enqueue(entries)

    def poll(self, now: float, max_n: int) -> pa.Table:
        return self.state.poll(now, max_n)

    def pending_count(self) -> int:
        return self.state.pending_count()

    def set_host_policy(self, host: str, rate: float, burst: float | None = None) -> None:
        self.state.set_host_policy(host, rate, burst)

    def set_robots(self, host: str, disallow: list[str]) -> None:
        self.state.set_robots(host, disallow)

    def snapshot(self) -> dict[str, Any]:
        return self.state.snapshot()

    def restore(self, snap: dict[str, Any]) -> None:
        self.state.restore(snap)

    def counters(self) -> dict[str, int]:
        return self.state.counters()

    def seen_table(self) -> pa.Table:
        return self.state.snapshot()["seen"]
