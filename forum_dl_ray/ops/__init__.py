"""Training-data-scale operations over the driver-provided tables.

Beyond crawl parity with the reference, these are the operations a
large-scale training-data pipeline needs (dedup, similarity search,
text analysis, relational aggregates) — each expressed Ray-Data-first:
vectorized ``map_batches`` kernels, partial aggregation before
shuffles, broadcast small sides, explicit LSH bucketing for near-dup
joins. Exposed via ``__ray_entry__.queries()`` with DuckDB oracles
where SQL can express the semantics.
"""

from . import audio_ops, dedup, images_ops, queries, similarity, sketches, text  # noqa: F401
