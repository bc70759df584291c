"""Property-based tests (hypothesis) for the foundational pure
kernels: URL canonicalization, free-text date parsing, shingle
hashing, and the fixed-point quality math. These don't need Ray —
they pin invariants the goldens can't enumerate."""

import os
import sys
from datetime import datetime

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from forum_dl_ray.engines.dates import parse_freeform
from forum_dl_ray.ops.text import simhash64, token_hashes
from forum_dl_ray.urlnorm import normalize_url, url_hash64

URLS = st.builds(
    lambda host, path, q, frag: f"http://{host}/{path}{q}{frag}",
    host=st.from_regex(r"[a-z]{1,10}(\.[a-z]{2,5}){1,2}", fullmatch=True),
    path=st.from_regex(r"([a-z0-9._~-]{0,8}/){0,4}[a-z0-9._~-]{0,8}", fullmatch=True),
    q=st.sampled_from(["", "?page=2", "?a=1&page=3", "?utm_source=x", "?x=1#y"]),
    frag=st.sampled_from(["", "#top", "#post-9"]),
)


@settings(max_examples=300, deadline=None)
@given(URLS)
def test_normalize_idempotent(url):
    once = normalize_url(url, keep_queries=("page",))
    twice = normalize_url(once, keep_queries=("page",))
    assert once == twice
    assert "#" not in once  # fragments always dropped
    assert url_hash64(once) == url_hash64(twice)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=200))
def test_parse_freeform_total(text):
    """Never raises on arbitrary text; any result is a valid ISO naive
    datetime."""
    out = parse_freeform(text)
    if out is not None:
        dt = datetime.fromisoformat(out)
        assert dt.tzinfo is None


@settings(max_examples=100, deadline=None)
@given(st.datetimes(min_value=datetime(1971, 1, 1),
                    max_value=datetime(2199, 12, 31)).map(
                        lambda d: d.replace(microsecond=0)))
def test_parse_freeform_roundtrips_known_styles(dt):
    for fmt in ("%Y-%m-%dT%H:%M:%S", "%d %B %Y, %H:%M:%S",
                "%a, %d %b %Y %H:%M:%S +0000", "%a %b %d %H:%M:%S %Y",
                "%B %d, %Y, %I:%M:%S %p"):
        assert parse_freeform(dt.strftime(fmt)) == dt.isoformat(), fmt


WORDS = st.lists(st.from_regex(r"[a-z]{1,6}", fullmatch=True), max_size=40)


@settings(max_examples=150, deadline=None)
@given(st.lists(WORDS, min_size=1, max_size=8))
def test_token_hashes_batch_invariant(token_lists):
    """Per-doc shingle hashes must not depend on how docs are batched
    together (the vocab cache is an optimization, not a semantic)."""
    texts = [" ".join(ws) for ws in token_lists]
    together = token_hashes(texts, shingle=3)
    separate = [token_hashes([t], shingle=3)[0] for t in texts]
    for a, b in zip(together, separate):
        assert np.array_equal(a, b)


@settings(max_examples=100, deadline=None)
@given(WORDS)
def test_simhash_batch_invariant(words):
    t = " ".join(words)
    alone = simhash64([t])[0]
    batched = simhash64(["filler one two", t, "other doc"])[1]
    assert alone == batched


# ---------------------------------------------------------------- frontier
from forum_dl_ray.frontier.shard import ShardState  # noqa: E402


def _mk_state():
    return ShardState(shard_id=0, capacity=100_000, exact=True,
                      default_rate=float("inf"))


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=500), min_size=1, max_size=200),
       st.integers(min_value=1, max_value=32))
def test_seen_offer_batching_invariant(keys, batch):
    """The final accepted set must not depend on batch boundaries, and
    each distinct key is accepted exactly once regardless of how often
    or in what grouping it is re-offered."""
    urls = [f"http://h.test/t/{k}" for k in keys]
    hashes = np.array([url_hash64(u) for u in urls], dtype=np.int64)

    one = _mk_state()
    fresh_all = one.seen_offer(hashes, urls)

    many = _mk_state()
    accepted = []
    for i in range(0, len(keys), batch):
        accepted.extend(many.seen_offer(hashes[i:i + batch], urls[i:i + batch]))

    # same multiset of per-position decisions
    assert list(fresh_all) == accepted
    # exactly one acceptance per distinct key, at its first occurrence
    first_pos = {}
    for i, k in enumerate(keys):
        first_pos.setdefault(k, i)
    expect = [i == first_pos[k] for i, k in enumerate(keys)]
    assert list(fresh_all) == expect
    # re-offering everything is a no-op
    assert not any(one.seen_offer(hashes, urls))
