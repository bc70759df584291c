"""Cluster-derived shuffle widths.

Round-2 verdict: fixed ``n_buckets=64/128`` constants bound groupby
parallelism to <=128 tasks regardless of cluster size. Every coarse
bucketed shuffle in the ops family now derives its default width from
``ray.cluster_resources()`` (the pattern ``lang_id`` established for
its actor pool): a few buckets per CPU, rounded up to a power of two
so ``key & (n-1)`` masking stays valid, floored at 64 (below that the
per-group vectorization win evaporates) and capped so tiny groups
don't drown in task overhead on huge clusters.

Results never depend on the width — buckets are an internal
co-location key, not a semantic one — so oracles stay green at any
value (pinned by a two-width pytest).
"""

from __future__ import annotations


def default_buckets(per_cpu: int = 2, lo: int = 64, hi: int = 4096) -> int:
    """Power-of-two shuffle width scaled with the cluster."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    n = max(lo, min(hi, per_cpu * cpus))
    return 1 << (n - 1).bit_length()
