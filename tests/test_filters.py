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
