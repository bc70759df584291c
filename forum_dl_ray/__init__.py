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
