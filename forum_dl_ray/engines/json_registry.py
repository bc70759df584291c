"""Hacker-News-style JSON engine (descending-id registry).

Models the reference's HN extractor (/root/reference/forum_dl/
extractors/hackernews.py:82-260): the "board" is iterated by
descending item id from a maxitem registry, and reply trees are an
explicit BFS over ``kids`` worklists. The descending-id position and
the BFS worklist are cursors carried in frontier entries (SURVEY.md
ST4/A5), not actor state.

Site shape (synthetic):
  /v0/maxitem.json        -> int
  /v0/item/{id}.json      -> {"id","type":"story"|"comment","by","time",
                              "title"?,"text"?,"kids":[ids]}
"""

from __future__ import annotations

import json
from ..urlnorm import join_canon


def canon(href: str, base_url: str) -> str:
    return join_canon(href, base_url)


def detect(url: str, body: bytes) -> bool:
    return b'"synthforum-json-registry"' in body[:512]


def item_url(item_id: int, base_url: str) -> str:
    return canon(f"/v0/item/{item_id}.json", base_url)


def parse_item(body: bytes) -> dict:
    return json.loads(body)
