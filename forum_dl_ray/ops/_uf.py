"""Shared union-find over verified near-dup pair lists.

One implementation for the four former hand-rolled copies
(dedup.minhash_clusters, curate.neardup_drop_set,
images_ops.image_phash_clusters / image_dedup_drop_set) — the copies
had already diverged: the dedup one assigned roots through pandas
``Series.map(...).fillna(...)``, which promotes to float64 and rounds
doc_ids >= 2^53 to WRONG values (r5 review, reproduced on the 62-bit
blake2b doc_ids curate.crawl_documents_table assigns). Root maps are
O(ids-in-pairs), pairs ≪ corpus by LSH construction, so the driver-side
loop is fine; assignment over the corpus is vectorized int64-only.
"""

from __future__ import annotations

import numpy as np


def union_find_roots(id_a, id_b) -> dict:
    """Collapsed min-root map over the pair edges: every id that
    appears in a pair maps to the smallest id reachable from it.
    Ids not in any pair are absent (callers treat absence as
    self-root). Works for int64 doc_ids and string image_ids alike
    (numpy scalars are unboxed so the map holds plain Python ids)."""
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(id_a, id_b):
        if isinstance(a, np.generic):
            a = a.item()
        if isinstance(b, np.generic):
            b = b.item()
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {d: find(d) for d in list(parent)}


def roots_arrays(roots: dict[int, int]) -> tuple[np.ndarray, np.ndarray]:
    """(sorted_keys, values) int64 arrays for broadcast — built ONCE on
    the driver, not per batch."""
    if not roots:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
    keys = np.fromiter(roots.keys(), dtype=np.int64, count=len(roots))
    vals = np.fromiter(roots.values(), dtype=np.int64, count=len(roots))
    order = np.argsort(keys)
    return keys[order], vals[order]


def assign_roots_i64(ids: np.ndarray, keys: np.ndarray,
                     vals: np.ndarray) -> np.ndarray:
    """cluster_id per id: the mapped root for ids present in keys,
    the id itself otherwise. Pure int64 throughout — never a pandas
    map/fillna float64 round-trip."""
    ids = np.asarray(ids, dtype=np.int64)
    out = ids.copy()
    if len(keys) and len(ids):
        pos = np.minimum(np.searchsorted(keys, ids), len(keys) - 1)
        hit = keys[pos] == ids
        out[hit] = vals[pos[hit]]
    return out
