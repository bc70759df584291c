"""Unit tests for ShardState (no Ray needed)."""

import numpy as np

from forum_dl_ray.frontier.shard import ShardState
from forum_dl_ray.schemas import order_key
from forum_dl_ray.urlnorm import url_hash64


def entry(url, host="h.test", depth=0, seq=0, kind="board_page"):
    return {
        "url": url,
        "url_hash": url_hash64(url),
        "host": host,
        "engine": "html-generic",
        "kind": kind,
        "depth": depth,
        "seq": seq,
        "order_key": order_key(seq),
        "path": "[]",
        "title": "",
        "cursor": "{}",
    }


def test_seen_offer_first_wins_and_intra_batch_dedup():
    s = ShardState(0, capacity=1000)
    urls = ["u/a", "u/b", "u/a", "u/c"]
    hashes = np.array([url_hash64(u) for u in urls], dtype=np.int64)
    fresh = s.seen_offer(hashes, urls)
    assert fresh.tolist() == [True, True, False, True]
    fresh2 = s.seen_offer(hashes[:2], urls[:2])
    assert fresh2.tolist() == [False, False]
    assert s.n_seen == 3


def test_priority_order_depth_then_seq():
    s = ShardState(0)
    s.enqueue([entry("u/3", depth=1, seq=3), entry("u/1", depth=0, seq=5), entry("u/2", depth=0, seq=1)])
    t = s.poll(now=0.0, max_n=10)
    assert t["url"].to_pylist() == ["u/2", "u/1", "u/3"]


def test_politeness_token_bucket_limits_rate():
    s = ShardState(0, default_rate=2.0, default_burst=2.0)
    s.enqueue([entry(f"u/{i}", seq=i) for i in range(10)])
    t0 = s.poll(now=0.0, max_n=10)
    assert t0.num_rows == 2  # burst
    t1 = s.poll(now=0.0, max_n=10)
    assert t1.num_rows == 0
    t2 = s.poll(now=1.0, max_n=10)  # 1s at 2 tokens/sec
    assert t2.num_rows == 2
    assert s.pending_count() == 6


def test_politeness_only_blocks_owning_host():
    s = ShardState(0, default_rate=float("inf"))
    s.set_host_policy("slow.test", rate=1.0, burst=1.0)
    s.enqueue(
        [entry(f"u/{i}", host="slow.test", seq=i) for i in range(5)]
        + [entry(f"v/{i}", host="fast.test", seq=100 + i) for i in range(5)]
    )
    t = s.poll(now=0.0, max_n=20)
    hosts = t["host"].to_pylist()
    assert hosts.count("slow.test") == 1 and hosts.count("fast.test") == 5


def test_robots_denies_prefixes():
    s = ShardState(0)
    s.set_robots("h.test", ["/private"])
    n = s.enqueue([entry("http://h.test/private/x"), entry("http://h.test/public/y")])
    assert n == 1
    assert s.counters()["robots_denied"] == 1


def test_snapshot_restore_roundtrip():
    s = ShardState(0, capacity=1000, default_rate=5.0)
    urls = [f"u/{i}" for i in range(50)]
    s.seen_offer(np.array([url_hash64(u) for u in urls], dtype=np.int64), urls)
    s.mark_failed(np.array([url_hash64("u/1")]), ["u/1"])
    s.enqueue([entry(f"p/{i}", seq=i, depth=i % 3) for i in range(20)])
    s.set_robots("h.test", ["/admin"])
    snap = s.snapshot()

    s2 = ShardState(0)
    s2.restore(snap)
    assert s2.n_seen == s.n_seen and s2.pending_count() == 20
    # seen-set equality incl. failed flags
    t1, t2 = snap["seen"], s2.snapshot()["seen"]
    assert sorted(t1.to_pylist(), key=lambda r: r["url_hash"]) == sorted(
        t2.to_pylist(), key=lambda r: r["url_hash"]
    )
    # re-offer of seen URL is rejected after restore
    assert not s2.seen_offer(np.array([url_hash64("u/5")]), ["u/5"])[0]
    # poll order preserved
    a = s.poll(0.0, 50)["url"].to_pylist()
    b = s2.poll(0.0, 50)["url"].to_pylist()
    assert a == b


def test_offer_legs_idempotent_under_retry_keys(ray_session):
    """r5 review: offer() is two RPC waves from retryable parse tasks.
    With a retry-stable key, a replayed seen_offer returns the FIRST
    attempt's fresh mask (so the retry re-issues the enqueues a dead
    worker never sent) and a replayed enqueue is a no-op (so an
    enqueue that DID land is not duplicated). Keyless calls keep the
    plain check-and-set semantics."""
    import ray

    from forum_dl_ray.frontier.frontier import Frontier, FrontierConfig

    f = Frontier.create(FrontierConfig(num_shards=1))
    shard = f.shards[0]
    url = "http://idem.test/a"
    h = np.array([url_hash64(url)], dtype=np.int64)

    k_seen = ("task1:0", "s", 0, "dg")
    m1 = ray.get(shard.seen_offer.remote(h, [url], key=k_seen))
    m2 = ray.get(shard.seen_offer.remote(h, [url], key=k_seen))  # replay
    assert m1.tolist() == [True] and m2.tolist() == [True]
    # a DIFFERENT offer of the same URL is still a duplicate
    assert not ray.get(shard.seen_offer.remote(h, [url]))[0]
    assert not ray.get(
        shard.seen_offer.remote(h, [url], key=("task2:0", "s", 0, "dg")))[0]

    k_enq = ("task1:0", "q", 0, "dg")
    e = [entry(url)]
    n1 = ray.get(shard.enqueue.remote(e, key=k_enq))
    n2 = ray.get(shard.enqueue.remote(e, key=k_enq))  # replay: no-op
    assert n1 == 1 and n2 == 1
    assert ray.get(shard.pending_count.remote()) == 1  # not 2
