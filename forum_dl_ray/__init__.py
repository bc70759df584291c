"""forum_dl_ray — a from-scratch Ray-Data-native crawl engine.

A brand-new URL-frontier + fetch scheduler with the query and
data-processing capabilities of the reference (mikwielgus/forum-dl,
read-only at /root/reference), re-expressed Ray-Data-first:

- ``ray.data.Dataset`` pipelines of ``map_batches`` over zero-copy
  Arrow batches (fetch + parse stages),
- a pool of stateful frontier actors holding the sharded URL-seen set
  (bloom pre-check + cuckoo filter + exact side-set at test scale),
  per-host politeness token buckets, robots rules and the priority
  heap ordered by (depth, recency, host budget),
- payload tables of ``(image_id, bytes, w, h, fmt, caption, phash)``
  rows written as partitioned Parquet (Lance gated behind import-try —
  not present in this container),
- training-data-scale ops (dedup, similarity search, text analysis)
  over the driver-provided parquet tables.

Nothing here calls ``ray.init()``/``ray.shutdown()`` — session
ownership belongs to the caller (driver, bench.py, test fixture).
"""

__version__ = "0.1.0"


def ship_by_value() -> None:
    """Register every loaded ``forum_dl_ray`` module for cloudpickle
    by-value serialization so Ray workers can deserialize our batch
    kernels and actor classes even when the driver's cwd (and hence
    the workers' default sys.path) does not contain this repo — the
    local-mode import gotcha. Idempotent; safe to call repeatedly.
    Subpackage ``__init__`` modules call this after importing their
    submodules, so any entry point (`forum_dl_ray.ops`, `.crawl`, ...)
    registers the full loaded module set.
    """
    import sys

    try:
        from ray import cloudpickle
    except Exception:  # pragma: no cover - ray always present here
        return
    for name, mod in list(sys.modules.items()):
        if mod is not None and (name == __name__ or name.startswith(__name__ + ".")):
            try:
                cloudpickle.register_pickle_by_value(mod)
            except Exception:
                pass
