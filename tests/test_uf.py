"""ops/_uf.py — the shared union-find + int64-safe root assignment.

Regression for the r5 review's confirmed corruption: the former
pandas ``Series.map(roots).fillna(ids)`` assignment in
minhash_clusters promoted to float64 and ROUNDED doc_ids >= 2^53
(the crawl corpus assigns 62-bit blake2b doc_ids)."""

import numpy as np

from forum_dl_ray.ops._uf import assign_roots_i64, roots_arrays, union_find_roots


def test_union_find_min_root_and_collapse():
    roots = union_find_roots([2, 5, 9, 9], [5, 7, 11, 2])
    # {2,5,7,9,11} all connect; min root = 2
    assert roots == {2: 2, 5: 2, 7: 2, 9: 2, 11: 2}
    # string ids (image curation) work identically
    sroots = union_find_roots(["b", "c"], ["a", "d"])
    assert sroots == {"a": "a", "b": "a", "c": "c", "d": "c"}


def test_assign_roots_i64_is_exact_above_2_53():
    # ids in the float64-rounding zone: consecutive int64s that a
    # float64 round-trip collapses onto the same value
    big = 4611686018427387901  # 2^62 - 3
    assert int(np.int64(float(big))) != big  # the hazard is real
    roots = union_find_roots([big], [big - 1])
    keys, vals = roots_arrays(roots)
    ids = np.array([big, big - 1, big - 2, 17], dtype=np.int64)
    out = assign_roots_i64(ids, keys, vals)
    # clustered ids map to the exact min root; others stay themselves
    assert out.tolist() == [big - 1, big - 1, big - 2, 17]
    assert out.dtype == np.int64


def test_assign_roots_empty_cases():
    keys, vals = roots_arrays({})
    ids = np.array([3, 1], dtype=np.int64)
    assert assign_roots_i64(ids, keys, vals).tolist() == [3, 1]
    assert assign_roots_i64(np.array([], dtype=np.int64), keys, vals).tolist() == []
