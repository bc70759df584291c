"""Canonical Arrow schemas for every table the engine produces/consumes.

Mapping of the reference's pydantic row models (SURVEY.md §1.1,
/root/reference/forum_dl/extractors/common.py:95-126) onto columnar
Arrow types (SURVEY.md §1.2). Paths (tree positions) are serialized as
JSON strings rather than ``list<string>`` so that every downstream op
(sort keys, groupby keys, DuckDB oracles) can treat them as plain
strings; helpers here convert.
"""

from __future__ import annotations

import json
import re

import pyarrow as pa

# --- frontier entries -------------------------------------------------------
# One row per URL waiting to be fetched. `cursor` carries per-chain mutable
# traversal state (reference's PageState subclasses, common.py:95-97,
# discourse.py:14-15, pipermail.py:18-19) as JSON. `order_key` is the
# emission-order sort key assigned at ENQUEUE time (SURVEY.md §7.4).
FRONTIER_ENTRY = pa.schema(
    [
        ("url", pa.string()),          # canonical (normalize_url applied)
        ("url_hash", pa.int64()),      # url_hash64(url)
        ("host", pa.string()),
        ("engine", pa.string()),       # adapter name, e.g. "html-generic"
        ("kind", pa.string()),         # seed|board_index|board_page|thread_page|api_json|asset
        ("depth", pa.int32()),         # tree depth for priority
        ("seq", pa.int64()),           # enqueue sequence (priority tiebreak / recency)
        ("order_key", pa.string()),    # hex-tuple lexicographic emission key
        ("path", pa.string()),         # JSON list[str]: board path of the item
        ("title", pa.string()),        # carried link text (thread/board title)
        ("cursor", pa.string()),       # JSON dict: page no, accumulators, id streams
    ]
)

# --- fetched pages ----------------------------------------------------------
PAGE = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("kind", pa.string()),
        ("engine", pa.string()),
        ("body", pa.large_binary()),
        ("content_type", pa.string()),
        ("status", pa.int32()),
        ("next_url", pa.string()),     # nullable: the page's own next-page link
    ]
)

# --- output items (union of board/thread/post/file kinds) -------------------
# The Entry envelope (writers/common.py:50-61): one table, `type`
# discriminator, nullable per-kind columns.
ENTRY = pa.schema(
    [
        ("type", pa.string()),              # board|thread|post|file
        ("path", pa.string()),              # JSON list[str]
        ("subpath", pa.string()),           # JSON list[str] (posts/files)
        ("url", pa.string()),
        ("origin", pa.string()),
        ("title", pa.string()),             # boards/threads
        ("author", pa.string()),            # posts
        ("creation_time", pa.timestamp("us")),
        ("content", pa.large_string()),     # posts: HTML body
        ("content_type", pa.string()),      # files
        ("content_bytes", pa.large_binary()),  # files (inline, e.g. data: URLs)
        ("data", pa.string()),              # open-schema JSON (Item.data)
        ("order_key", pa.string()),         # emission-order key (ordering parity)
        ("origin_seq", pa.int64()),         # seq of the page that produced it
    ]
)

# --- image payload table (BASELINE.json input_hint — authoritative shape) ---
IMAGES = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
    ]
)

# --- per-fetch lineage (WARC-capture analog, session.py:37-48 → S5) ---------
LINEAGE = pa.schema(
    [
        ("url", pa.string()),
        ("url_hash", pa.int64()),
        ("host", pa.string()),
        ("status", pa.int32()),
        ("wave", pa.int32()),
        ("partition_id", pa.int32()),
        ("bytes_sha1", pa.string()),
        ("n_bytes", pa.int64()),
        ("error", pa.string()),        # nullable: swallow-and-continue parity (§2.6.4)
    ]
)

# --- frontier checkpoint tables --------------------------------------------
SEEN_CHECKPOINT = pa.schema(
    [
        ("url_hash", pa.int64()),
        ("url", pa.string()),
        ("failed", pa.bool_()),
    ]
)


_SAFE_ID = re.compile(r"[A-Za-z0-9._\-]*\Z")


def path_to_json(path: tuple[str, ...] | list[str]) -> str:
    """JSON-encode a path of item ids. Ids are almost always plain
    ASCII slugs, so build the JSON directly (~8x faster than
    json.dumps — this runs per emitted entry row in the parse hot
    path); fall back to json.dumps when escaping could matter."""
    if not path:
        return "[]"
    for p in path:
        if not _SAFE_ID.match(p):
            return json.dumps(list(path), separators=(",", ":"))
    return '["' + '","'.join(path) + '"]'


def path_from_json(s: str) -> tuple[str, ...]:
    return tuple(json.loads(s)) if s else ()


def empty_table(schema: pa.Schema) -> pa.Table:
    return schema.empty_table()


def order_key(*components: int) -> str:
    """Fixed-width hex tuple → lexicographic sort == numeric tuple sort.

    8 hex digits per component supports 2^32 siblings per level; a
    plain string column sorts cheaply in Arrow/Ray (`ds.sort`).
    """
    return "".join(format(c, "08x") for c in components)


def order_key_extend(prefix: str, *components: int) -> str:
    return prefix + order_key(*components)
