"""Shared read seam for the ops family.

``read_parquet_clean`` = ``ray.data.read_parquet`` with the schema
metadata stripped. Parquet files written via pandas/pyarrow carry
``b'pandas'`` schema metadata, and in this pyarrow version
``pa.Schema.__hash__`` raises ``unhashable type: 'dict'`` on any
schema with metadata — so every block concat/unify (the read task's
own block builder, and every downstream batcher whose ``batch_size``
spans blocks) logged "Failed to hash the schemas (for deduplication)"
(round-4 verdict What's-wrong #4) and, worse, silently skipped
``unify_schemas``'s fast ``len(set(schemas)) == 1`` dedup path on
every concat.

Primary fix: read ONE footer on the driver (metadata-only, no scan),
strip schema+field metadata, and hand the clean schema to
``read_parquet(schema=...)`` — the read tasks then never see the
metadata at all (verified: silences the in-read ``SplitBlocks``
warning that a post-read strip stage cannot reach). Fallback when the
footer isn't probeable (exotic path types): a zero-copy
``replace_schema_metadata(None)`` lambda fused onto the read (lambdas
pickle by value, so no runtime_env is needed and read-stage fusion is
preserved — CLAUDE.md worker-import gotcha).
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd


def _clean_schema(path, columns) -> pa.Schema | None:
    """Footer schema with all schema- and field-level metadata removed,
    projected to ``columns`` (order preserved); None if unprobeable."""
    p = path[0] if isinstance(path, (list, tuple)) else path
    if os.path.isdir(p):
        cand = sorted(glob.glob(os.path.join(p, "**", "*.parquet"), recursive=True))
        if not cand:
            return None
        p = cand[0]
    try:
        s = pq.read_schema(p)
    except Exception:
        return None
    names = columns if columns is not None else s.names
    try:
        return pa.schema([s.field(n).remove_metadata() for n in names])
    except Exception:
        return None


def read_parquet_clean(path, *, columns=None, **kw) -> rd.Dataset:
    schema = _clean_schema(path, columns)
    if schema is not None:
        return rd.read_parquet(path, columns=columns, schema=schema, **kw)
    return rd.read_parquet(path, columns=columns, **kw).map_batches(
        lambda b: b.replace_schema_metadata(None),
        batch_format="pyarrow",
        batch_size=None,
    )
