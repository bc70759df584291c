"""Entry envelope projection + JSONL serialization (SURVEY.md M21/M22).

The reference wraps every item in
``Entry{generator, version, extractor, download_time, type, item}``
(/root/reference/forum_dl/writers/common.py:261-281) and serializes
one JSON object per line with bytes → base64
(writers/common.py:58-61, writers/jsonl.py:8-10). Both are pure
per-batch projections here. ``download_time`` is stamped by the
CALLER (one constant per run) — the reference stamps ``now()`` per
item, which is non-reproducible; a single run stamp keeps output
deterministic for the golden oracles.
"""

from __future__ import annotations

import base64
import json

import pyarrow as pa

GENERATOR = "forum-dl-ray"
VERSION = "0.1.0"

_ITEM_FIELDS = [
    "path", "subpath", "url", "origin", "title", "author",
    "creation_time", "content", "content_type", "content_bytes", "data",
]


def entry_envelope(batch: pa.Table, *, extractor: str, download_time: str) -> pa.Table:
    """Add the constant envelope columns (M21)."""
    n = batch.num_rows
    return (
        batch.append_column("generator", pa.array([GENERATOR] * n, pa.string()))
        .append_column("version", pa.array([VERSION] * n, pa.string()))
        .append_column("extractor", pa.array([extractor] * n, pa.string()))
        .append_column("download_time", pa.array([download_time] * n, pa.string()))
    )


def to_jsonl_lines(batch: pa.Table) -> pa.Table:
    """Envelope batch → one JSON line per row (M22: bytes → base64;
    reference field order generator, version, extractor,
    download_time, type, item)."""
    cols = {name: batch[name].to_pylist() for name in batch.column_names}
    n = batch.num_rows
    lines = []
    for i in range(n):
        item = {}
        for f in _ITEM_FIELDS:
            if f not in cols:
                continue
            v = cols[f][i]
            if v is None:
                continue
            if f in ("path", "subpath"):
                v = json.loads(v) if isinstance(v, str) else v
            elif f == "content_bytes":
                item["content"] = base64.b64encode(v).decode("ascii")
                continue
            elif f == "data":
                v = json.loads(v) if isinstance(v, str) else v
            elif f == "creation_time":
                v = v.isoformat() if hasattr(v, "isoformat") else str(v)
            item[f] = v
        env = {
            "generator": cols["generator"][i],
            "version": cols["version"][i],
            "extractor": cols["extractor"][i],
            "download_time": cols["download_time"][i],
            "type": cols["type"][i],
            "item": item,
        }
        lines.append(json.dumps(env, separators=(",", ":"), sort_keys=False))
    return pa.table(
        {"order_key": batch["order_key"], "line": pa.array(lines, pa.string())}
    )
