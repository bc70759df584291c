"""Discourse-style JSON API engine (stream-chunk cursor).

Models the reference's Discourse extractor cursor style
(/root/reference/forum_dl/extractors/discourse.py:200-244): a thread's
first API page carries the full ordered post-id stream; posts are then
fetched in fixed-size id chunks, the *remaining id list* being the
mutable cursor (DiscourseThreadPageState.stream_data, discourse.py:14-15)
— carried here in the frontier entry's cursor JSON, never in actor
state (SURVEY.md ST4).

Site shape (synthetic):
  /api/index.json               -> {"site": ..., "boards": [{id,title}]}
  /api/board/{bid}.json?page=k  -> {"threads": [{id,title}], "more": bool}
  /api/t/{tid}.json             -> {"title":..., "stream": [post ids]}
  /api/t/{tid}/posts.json?ids=a,b,c -> {"posts": [{id,author,time,indent,content,images}]}
"""

from __future__ import annotations

import json
from ..urlnorm import join_canon

CHUNK = 20
KEEP_QUERIES = ("page", "ids")


def canon(href: str, base_url: str) -> str:
    return join_canon(href, base_url, keep_queries=KEEP_QUERIES)


def detect(url: str, body: bytes) -> bool:
    head = body[:256]
    return head.startswith(b"{") and b'"synthforum-json-stream"' in body[:512]


def parse_index(body: bytes, page_url: str) -> dict:
    d = json.loads(body)
    boards = [(canon(f"/api/board/{b['id']}.json", page_url), b["title"]) for b in d["boards"]]
    return {"title": d.get("site", ""), "subboards": boards, "threads": [], "next_url": None}


def parse_board_page(body: bytes, page_url: str) -> dict:
    d = json.loads(body)
    threads = [(canon(f"/api/t/{t['id']}.json", page_url), t["title"]) for t in d["threads"]]
    next_url = canon(d["next"], page_url) if d.get("next") else None
    return {"title": d.get("title", ""), "subboards": [], "threads": threads, "next_url": next_url}


def parse_thread_head(body: bytes, page_url: str) -> dict:
    """First thread page: emits no posts, yields the id-stream cursor."""
    d = json.loads(body)
    return {"title": d.get("title", ""), "stream": list(d["stream"]), "tid": d["id"]}


def chunk_url(tid: str, ids: list[int], base_url: str) -> str:
    return canon(f"/api/t/{tid}/posts.json?ids={','.join(str(i) for i in ids)}", base_url)


def parse_posts_chunk(body: bytes, page_url: str) -> list[dict]:
    d = json.loads(body)
    posts = []
    for p in d["posts"]:
        posts.append(
            {
                "pid": str(p["id"]),
                "author": p["author"],
                "time_iso": p["time"],
                "indent": int(p.get("indent", 0)),
                "content": p["content"],
                "images": [(canon(u, page_url), alt) for u, alt in p.get("images", [])],
            }
        )
    return posts
