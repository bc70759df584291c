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


def _compile_robots(rules: list[str]):
    """Compile one host's robots rules (crawl/robots.py encoding:
    disallow = raw pattern, allow = ``"!"+pattern``; ``*`` wildcard,
    trailing ``$`` anchor — RFC 9309 §2.2.3, r4 verdict Next #6).

    Returns ``(prefixes, None)`` for the fast path — all rules are
    plain disallow prefixes, where any-prefix-match ≡ RFC longest-match
    because every matching rule votes disallow — else ``(None,
    [(segments, anchored, pattern_len, allow)])`` for the general
    longest-match evaluator. Wildcards are matched by the greedy
    segment algorithm in :func:`_wild_match`, NOT a compiled regex: a
    chain of ``.*`` groups backtracks catastrophically on star-heavy
    patterns (a crafted ``/*a*a*a*...$`` robots.txt line would hang
    the shard actor on every offer), while greedy find is linear and
    complete for the * / $ language (no other metachars exist)."""
    pats = [(r[1:], True) if r.startswith("!") else (r, False) for r in rules]
    if all(not allow and "*" not in p and not p.endswith("$")
           for p, allow in pats):
        return [p for p, _ in pats], None
    compiled = []
    for p, allow in pats:
        anchored = p.endswith("$")
        core = p[:-1] if anchored else p
        compiled.append((core.split("*"), anchored, len(p), allow))
    return None, compiled


def _wild_match(segs: list[str], anchored: bool, path: str) -> bool:
    """Linear-time match of a robots pattern split on ``*`` against
    ``path``. First segment anchors at the start; middle segments are
    placed greedily left-to-right (complete for pure-wildcard
    patterns); the last segment anchors at the end when the pattern
    ended in ``$``."""
    first = segs[0]
    if not path.startswith(first):
        return False
    if len(segs) == 1:
        return path == first if anchored else True
    pos = len(first)
    for seg in segs[1:-1]:
        i = path.find(seg, pos)
        if i < 0:
            return False
        pos = i + len(seg)
    last = segs[-1]
    if anchored:
        return len(path) - len(last) >= pos and path.endswith(last)
    return path.find(last, pos) >= 0


def _robots_decision(compiled: list, path: str) -> bool:
    """RFC 9309 §2.2.2 precedence over compiled rules: the longest
    matching PATTERN wins; on a length tie Allow beats Disallow; no
    match = allowed. Returns True when fetching is allowed."""
    best_len, best_allow = -1, True
    for segs, anchored, plen, allow in compiled:
        if _wild_match(segs, anchored, path):
            if plen > best_len or (plen == best_len and allow):
                best_len, best_allow = plen, allow
    return best_allow


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
        # column-store queue: entries live in immutable arrow chunks,
        # the heap holds (depth, seq, chunk_id, row) — no per-row dicts
        # (at 10^10-frontier scale dict-of-dicts costs ~10x the memory
        # and the per-row churn dominated enqueue/poll profiles)
        self.heap: list[tuple[int, int, int, int]] = []
        self._chunks: dict[int, pa.Table] = {}
        self._chunk_live: dict[int, int] = {}  # chunk_id -> rows not yet polled
        self._next_chunk = 0
        self._next_idx = 0  # retained for snapshot meta compat
        self.default_rate = default_rate
        self.default_burst = default_burst
        # host -> [tokens, last_refill_ts, rate, burst]
        self.buckets: dict[str, list[float]] = {}
        # host -> raw rule strings (robots.py encoding; snapshot form);
        # compiled matchers are derived per host in set_robots
        self.robots: dict[str, list[str]] = {}
        self._robots_c: dict[str, tuple] = {}
        self.n_robots_denied = 0
        # same-site scope (M2): None = unrestricted; else offers whose
        # URL is not under any base are dropped at enqueue like robots
        self.allowed_bases: list[str] | None = None
        self.n_offsite_denied = 0
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

    def set_robots(self, host: str, rules: list[str]) -> None:
        """``rules`` in crawl/robots.py encoding (disallow patterns,
        ``"!"+pattern`` allows; ``*`` / trailing ``$`` wildcards). An
        empty list clears the host (operator allow-all override)."""
        self.robots[host] = list(rules)
        if rules:
            self._robots_c[host] = _compile_robots(rules)
        else:
            self._robots_c.pop(host, None)

    def set_allowed_bases(self, bases: list[str] | None) -> None:
        self.allowed_bases = list(bases) if bases is not None else None
        # fast path: a site-root base (path "/") reduces to a host check
        self._allowed_hosts: set[str] | None = None
        if bases is not None:
            from ..urlnorm import host_of

            roots = {host_of(b) for b in bases
                     if b.endswith("/") and b.count("/") == 3}
            if len(roots) == len(bases):
                self._allowed_hosts = roots

    def _same_site_allows(self, url: str) -> bool:
        if self.allowed_bases is None:
            return True
        from ..urlnorm import host_of, is_same_site

        if self._allowed_hosts is not None:
            return host_of(url) in self._allowed_hosts
        return any(is_same_site(url, b) for b in self.allowed_bases)

    def _robots_allows(self, host: str, url: str) -> bool:
        entry = self._robots_c.get(host)
        if entry is None:
            return True
        # path component only (canonical URLs: scheme://host/path...)
        path = url.split(host, 1)[-1]
        prefixes, compiled = entry
        if compiled is None:  # disallow-prefix-only fast path
            return not any(path.startswith(p) for p in prefixes)
        return _robots_decision(compiled, path)

    def enqueue(self, entries: "list[dict[str, Any]] | pa.Table") -> int:
        if not isinstance(entries, pa.Table):
            entries = _entries_to_table(entries)
        if entries.num_rows == 0:
            return 0
        # robots + same-site filters: fast path when neither is
        # configured (the common case is robots empty, scope = seeds)
        if self.robots or self.allowed_bases is not None:
            hosts = entries["host"].to_pylist()
            urls = entries["url"].to_pylist()
            keep = [
                self._robots_allows(h, u) and self._same_site_allows(u)
                for h, u in zip(hosts, urls)
            ]
            denied = len(keep) - sum(keep)
            if denied:
                # split the count for stats (recompute only on the miss path)
                off = sum(
                    1 for h, u in zip(hosts, urls)
                    if self._robots_allows(h, u) and not self._same_site_allows(u)
                )
                self.n_offsite_denied += off
                self.n_robots_denied += denied - off
                entries = entries.filter(pa.array(keep, pa.bool_()))
                if entries.num_rows == 0:
                    return 0
        cid = self._next_chunk
        self._next_chunk += 1
        self._chunks[cid] = entries
        self._chunk_live[cid] = entries.num_rows
        depths = entries["depth"].to_pylist()
        seqs = entries["seq"].to_pylist()
        push = heapq.heappush
        heap = self.heap
        for row, (d, s) in enumerate(zip(depths, seqs)):
            push(heap, (d, s, cid, row))
        return entries.num_rows

    def _release_rows(self, taken: list[tuple[int, int]],
                      free: bool = True) -> pa.Table:
        """(chunk_id, row) list → one output table; frees drained
        chunks unless ``free=False`` (snapshot reads the queue without
        consuming it). One function for both paths — poll output and
        snapshot output MUST agree row-for-row, so the take/offset
        reassembly logic must never diverge (r5 review)."""
        if not taken:
            return FRONTIER_ENTRY.empty_table()
        by_chunk: dict[int, list[int]] = {}
        order: list[tuple[int, int]] = []  # (chunk, position-in-chunk-take)
        for c, r in taken:
            lst = by_chunk.setdefault(c, [])
            order.append((c, len(lst)))
            lst.append(r)
        pieces = {c: self._chunks[c].take(rows) for c, rows in by_chunk.items()}
        if free:  # snapshot passes free=False: chunks stay in place
            for c, rows in by_chunk.items():
                self._chunk_live[c] -= len(rows)
                if self._chunk_live[c] == 0:
                    del self._chunks[c]
                    del self._chunk_live[c]
        # single-chunk fast path (typical poll)
        if len(pieces) == 1:
            return next(iter(pieces.values()))
        chunk_ids = list(by_chunk)
        offsets: dict[int, int] = {}
        off = 0
        for c in chunk_ids:
            offsets[c] = off
            off += len(by_chunk[c])
        big = pa.concat_tables([pieces[c] for c in chunk_ids])
        return big.take([offsets[c] + p for c, p in order])

    def poll(self, now: float, max_n: int) -> pa.Table:
        """Pop up to max_n entries whose host has politeness tokens.

        Entries whose host is out of tokens are held back (re-pushed
        with unchanged priority). Scan is bounded to avoid O(pending)
        sweeps when one hot host dominates the top of the heap.
        """
        taken: list[tuple[int, int]] = []
        held: list[tuple[int, int, int, int]] = []
        scan_budget = max_n * 4 + 256
        blocked_hosts: set[str] = set()
        unlimited = self.default_rate == float("inf") and not self.buckets
        heap = self.heap
        pop = heapq.heappop
        while heap and len(taken) < max_n and scan_budget > 0:
            scan_budget -= 1
            item = pop(heap)
            _, _, cid, row = item
            if unlimited:
                taken.append((cid, row))
                continue
            host = self._chunks[cid]["host"][row].as_py()
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
                taken.append((cid, row))
            else:
                b[0] = tokens
                blocked_hosts.add(host)
                held.append(item)
        for item in held:
            heapq.heappush(self.heap, item)
        out = self._release_rows(taken)
        self.stats_polled += out.num_rows
        return out

    def pending_count(self) -> int:
        return len(self.heap)

    def seen_table(self) -> pa.Table:
        """Exact seen rows only — the oracle/export surface. Dedicated
        method: going through snapshot() serialized megabytes of
        bloom/cuckoo bytes and materialized the whole pending queue per
        call, all discarded (r5 review)."""
        return pa.table(
            {
                "url_hash": pa.array([h for h in self.exact], type=pa.int64()),
                "url": pa.array([v[0] for v in self.exact.values()], type=pa.string()),
                "failed": pa.array([v[1] for v in self.exact.values()], type=pa.bool_()),
            },
            schema=SEEN_CHECKPOINT,
        )

    # ------------------------------------------------------------ checkpoint
    def snapshot(self) -> dict[str, Any]:
        pending = self._release_rows(
            [(c, r) for (_, _, c, r) in sorted(self.heap)], free=False
        )
        seen = self.seen_table()
        return {
            "shard_id": self.shard_id,
            "bloom": self.bloom.to_bytes(),
            "cuckoo": self.cuckoo.to_bytes(),
            "pending": pending,
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
        self.robots, self._robots_c = {}, {}
        for h, v in meta["robots"].items():
            self.set_robots(h, list(v))  # recompile wildcard matchers
        seen = snap["seen"]
        self.exact = {
            int(h): (u, f)
            for h, u, f in zip(
                seen["url_hash"].to_pylist(), seen["url"].to_pylist(), seen["failed"].to_pylist()
            )
        }
        self.heap = []
        self._chunks = {}
        self._chunk_live = {}
        self._next_chunk = 0
        self.enqueue(snap["pending"])

    def counters(self) -> dict[str, int]:
        return {
            "n_seen": self.n_seen,
            "n_failed": self.n_failed,
            "pending": len(self.heap),
            "offered": self.stats_offered,
            "fresh": self.stats_fresh,
            "polled": self.stats_polled,
            "robots_denied": self.n_robots_denied,
            "offsite_denied": self.n_offsite_denied,
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
        from collections import OrderedDict

        self.state = ShardState(shard_id, capacity, exact=exact, default_rate=default_rate)
        # idempotence cache for offer legs (r5 review): offer() is TWO
        # RPC waves (seen check-and-set, then enqueue) issued from
        # parse workers that Ray retries on worker death. A crash
        # between the waves replays the offer, the seen set says
        # "duplicate", and the discovered URLs would be silently lost.
        # Each leg therefore carries a key deterministic across retries
        # (task_id + per-task ordinal, frontier.py:_offer_key); replays
        # return the FIRST attempt's result instead of re-deciding, so
        # the retried task re-issues the exact enqueues the dead worker
        # never sent (and an enqueue that DID land is not duplicated).
        self._idem: "OrderedDict[tuple, Any]" = OrderedDict()

    def _idem_get(self, key):
        if key is None:
            return None
        v = self._idem.get(key)
        if v is not None:
            self._idem.move_to_end(key)
        return v

    def _idem_put(self, key, val) -> None:
        if key is None:
            return
        self._idem[key] = val
        while len(self._idem) > 2048:
            self._idem.popitem(last=False)

    def seen_offer(self, hashes: np.ndarray, urls: list[str],
                   failed: bool = False, key: tuple | None = None) -> np.ndarray:
        cached = self._idem_get(key)
        if cached is not None:
            return cached
        out = self.state.seen_offer(hashes, urls, failed=failed)
        self._idem_put(key, out)
        return out

    def mark_failed(self, hashes: np.ndarray, urls: list[str]) -> None:
        self.state.mark_failed(hashes, urls)

    def enqueue(self, entries: list[dict[str, Any]],
                key: tuple | None = None) -> int:
        cached = self._idem_get(key)
        if cached is not None:
            return cached
        out = self.state.enqueue(entries)
        self._idem_put(key, out)
        return out

    def poll(self, now: float, max_n: int) -> pa.Table:
        return self.state.poll(now, max_n)

    def pending_count(self) -> int:
        return self.state.pending_count()

    def set_host_policy(self, host: str, rate: float, burst: float | None = None) -> None:
        self.state.set_host_policy(host, rate, burst)

    def set_robots(self, host: str, disallow: list[str]) -> None:
        self.state.set_robots(host, disallow)

    def set_allowed_bases(self, bases: list[str] | None) -> None:
        self.state.set_allowed_bases(bases)

    def snapshot(self) -> dict[str, Any]:
        return self.state.snapshot()

    def restore(self, snap: dict[str, Any]) -> None:
        self.state.restore(snap)

    def counters(self) -> dict[str, int]:
        return self.state.counters()

    def seen_table(self) -> pa.Table:
        return self.state.seen_table()
