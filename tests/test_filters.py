import numpy as np
import pytest

from forum_dl_ray.frontier.filters import BloomFilter, CuckooFilter


@pytest.fixture
def keys():
    rng = np.random.default_rng(7)
    return rng.integers(-(2**62), 2**62, size=20_000, dtype=np.int64)


def test_bloom_no_false_negatives_and_bounded_fp(keys):
    bf = BloomFilter(capacity=len(keys), fp_rate=0.01)
    bf.add_many(keys)
    assert bf.contains_many(keys).all()
    rng = np.random.default_rng(8)
    others = rng.integers(-(2**62), 2**62, size=50_000, dtype=np.int64)
    others = np.setdiff1d(others, keys)
    fp = bf.contains_many(others).mean()
    assert fp < 0.03


def test_bloom_roundtrip(keys):
    bf = BloomFilter(capacity=len(keys))
    bf.add_many(keys)
    bf2 = BloomFilter.from_bytes(bf.to_bytes())
    assert bf2.contains_many(keys).all()
    assert bf2.m_bits == bf.m_bits and bf2.k == bf.k


def test_cuckoo_insert_lookup_delete(keys):
    cf = CuckooFilter(capacity=len(keys))
    cf.insert_many(keys)
    assert cf.contains_many(keys).all()
    rng = np.random.default_rng(9)
    others = np.setdiff1d(rng.integers(-(2**62), 2**62, size=50_000, dtype=np.int64), keys)
    fp = cf.contains_many(others).mean()
    assert fp < 0.002  # 16-bit fingerprints, 2 buckets x 4 slots -> ~1.2e-4
    # delete first 100 then they're (mostly) gone; others still present
    for k in keys[:100]:
        assert cf.delete(int(k))
    assert cf.contains_many(keys[100:]).all()


def test_cuckoo_roundtrip(keys):
    cf = CuckooFilter(capacity=len(keys))
    cf.insert_many(keys)
    cf2 = CuckooFilter.from_bytes(cf.to_bytes())
    assert cf2.contains_many(keys).all()
    assert cf2.n_items == cf.n_items


def test_cuckoo_load_factor_headroom():
    cf = CuckooFilter(capacity=10_000)
    rng = np.random.default_rng(10)
    cf.insert_many(rng.integers(-(2**62), 2**62, size=10_000, dtype=np.int64))
    assert cf.load_factor < 0.96


def test_shard_seen_without_exact_sideset():
    """exact=False is the 10^10-scale mode: membership via cuckoo only.
    No false negatives allowed (a seen URL must never be re-fetched);
    a small false-positive rate (fresh URL wrongly 'seen') is the
    accepted trade at that scale."""
    import numpy as np

    from forum_dl_ray.frontier.shard import ShardState

    n = 20_000
    s = ShardState(0, capacity=2 * n, exact=False)
    h1 = np.arange(1, n + 1, dtype=np.int64) * 2_654_435_761
    urls = [f"u{i}" for i in range(n)]
    fresh = s.seen_offer(h1, urls)
    # inserts may see rare cuckoo-fingerprint collisions -> tiny FP rate
    assert fresh.sum() >= n * 0.999
    # duplicate re-offer: NONE may come back fresh (no false negatives)
    again = s.seen_offer(h1, urls)
    assert not again.any()
    # disjoint second set: mostly fresh (bounded false positives)
    h2 = h1 + 1
    fresh2 = s.seen_offer(h2, urls)
    assert fresh2.sum() >= n * 0.99


def test_response_cache_lru_semantics():
    """S3/ST2: bounded LRU with the reference's should_cache semantics
    (session.py:105-111,145) — should_cache hits keep entries hot,
    plain hits consume one-shot, capacity evicts oldest."""
    from forum_dl_ray.crawl.fetch import ResponseCache

    c = ResponseCache(capacity=3)
    for i in range(3):
        c.put(f"u{i}", {"i": i})
    assert len(c) == 3
    # should_cache hit refreshes recency
    assert c.get("u0")["i"] == 0
    c.put("u3", {"i": 3})  # evicts u1 (oldest), not the refreshed u0
    assert c.get("u0") is not None
    assert c.get("u1") is None
    assert c.hits == 2 and c.misses == 1
    # one-shot (should_cache=False) hit consumes the entry
    assert c.get("u2", should_cache=False)["i"] == 2
    assert c.get("u2") is None


def test_same_site_filter_predicate():
    """M2: is_same_site = same host + path under base (ValueError raise
    of get_relative_url folded into a predicate, common.py:22-32)."""
    from forum_dl_ray.urlnorm import is_same_site

    assert is_same_site("http://a.test/board/b1/", "http://a.test/")
    assert not is_same_site("http://b.test/board/b1/", "http://a.test/")
    assert is_same_site("http://a.test/forum/t/1/", "http://a.test/forum/")
    assert not is_same_site("http://a.test/other/t/1/", "http://a.test/forum/")


def test_frontier_same_site_scope(ray_session):
    """Offsite offers are dropped at enqueue (counted), never polled,
    but still enter the seen set — mirroring the robots path."""
    from forum_dl_ray.frontier import Frontier, FrontierConfig
    from forum_dl_ray.urlnorm import url_hash64

    f = Frontier.create(FrontierConfig(num_shards=2))
    f.set_allowed_bases(["http://in.test/"])

    def entry(url, seq):
        return {"url": url, "url_hash": url_hash64(url), "host": url.split("/")[2],
                "engine": "html-generic", "kind": "board_page", "depth": 1,
                "seq": seq, "order_key": "00000000", "path": "[]", "title": "",
                "cursor": "{}"}

    f.offer([entry("http://in.test/board/b1/", 1),
             entry("http://out.test/board/x/", 2)])
    t = f.poll(now=0.0, max_total=64)
    assert t["url"].to_pylist() == ["http://in.test/board/b1/"]
    assert f.counters()["offsite_denied"] == 1
    assert f.pending_count() == 0


def test_cuckoo_vectorized_insert_with_mid_row_holes():
    """The vectorized insert fast path assumes occupied slots form a
    row PREFIX; deletes punch mid-row holes, which must route those
    rows to the per-key path (pattern LUT = -1), never misplace a
    fingerprint. Interleave inserts and deletes heavily and assert the
    no-false-negative contract after every round."""
    rng = np.random.default_rng(11)
    cf = CuckooFilter(capacity=8_192)
    live: list[int] = []
    pool = rng.integers(-(2**62), 2**62, size=6_000, dtype=np.int64)
    pool = np.unique(pool)
    off = 0
    for round_no in range(6):
        batch = pool[off:off + 800]
        off += 800
        cf.insert_many(batch)
        live.extend(int(k) for k in batch)
        # delete a scattered third — creates holes at varied slots
        victims = live[round_no % 3::3][:400]
        for k in victims:
            cf.delete(k)
        live = [k for k in live if k not in set(victims)]
        assert cf.contains_many(np.array(live, dtype=np.int64)).all(), (
            f"false negative after round {round_no}")
    # refill the holes through the vectorized path
    refill = pool[off:off + 1_500]
    cf.insert_many(refill)
    live.extend(int(k) for k in refill)
    assert cf.contains_many(np.array(live, dtype=np.int64)).all()
