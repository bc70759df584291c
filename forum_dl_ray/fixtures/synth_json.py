"""JSON-engine synthetic sites (cursor-style diversity, SURVEY.md ST4).

Two API shapes exercising the reference's non-HTML cursor styles:

- ``json-stream`` (Discourse style, extractors/discourse.py:200-244):
  a thread's head page carries the full ordered post-id stream; posts
  are fetched in fixed-size id chunks, the remaining-id list being the
  mutable cursor.
- ``json-registry`` (Hacker News style, extractors/hackernews.py:
  82-260): the board is a descending story-id list (the top-stories
  registry); reply trees hang off per-item ``kids`` lists.

Both builders reuse the seeded text/image generators of the HTML
builder so goldens stay deterministic.
"""

from __future__ import annotations

import json
from datetime import timedelta

import numpy as np

from ..engines.json_stream import CHUNK
from ..images import encode_image, phash64, synth_pixels
from ..urlnorm import normalize_url
from .synth import SiteSpec, _EPOCH, _caption, _sentence, hash_host


class _JsonSiteBase:
    def __init__(self, spec: SiteSpec):
        self.spec = spec
        self.rng = np.random.default_rng(spec.seed + hash_host(spec.host))
        self.base = f"http://{spec.host}"
        self.pages: list[dict] = []
        self.images: list[dict] = []
        self.post_counter = 0
        self.image_counter = 0
        self.host_tag = spec.host.split(".")[0]

    def add_page(self, url: str, kind: str, body: bytes, status: int = 200,
                 content_type: str = "application/json") -> None:
        self.pages.append(
            {
                "url": url, "host": self.spec.host, "kind": kind,
                "engine": self.spec.engine, "body": body,
                "content_type": content_type, "status": status, "next_url": None,
            }
        )

    def add_json(self, path: str, obj: dict, kind: str, keep=()) -> str:
        url = normalize_url(self.base + path, keep_queries=keep)
        self.add_page(url, kind, json.dumps(obj, separators=(",", ":")).encode())
        return url

    def maybe_image(self) -> list:
        """Images list for one post: [[url, alt]] at image_rate."""
        if self.rng.random() >= self.spec.image_rate:
            return []
        self.image_counter += 1
        fmt = "png" if self.image_counter % 2 == 0 else "jpeg"
        image_id = f"{self.host_tag}-im{self.image_counter:05d}"
        caption = _caption(self.rng, image_id)
        w = int(self.rng.integers(24, 64))
        h = int(self.rng.integers(24, 64))
        px = synth_pixels(image_id, w, h)
        data = encode_image(px, fmt)
        self.images.append(
            {"image_id": image_id, "bytes": data, "w": w, "h": h,
             "fmt": fmt, "caption": caption, "phash": phash64(px)}
        )
        self.add_page(
            normalize_url(f"{self.base}/img/{image_id}.{fmt}"), "asset", data,
            content_type=f"image/{fmt}",
        )
        return [[f"/img/{image_id}.{fmt}", caption]]

    def make_post(self, pid_num: int) -> dict:
        self.post_counter += 1
        t_iso = (_EPOCH + timedelta(minutes=self.post_counter)).isoformat()
        return {
            "id": pid_num,
            "author": f"user{int(self.rng.integers(1, 20))}@{self.host_tag}",
            "time": t_iso,
            "content": f"<p>{_sentence(self.rng, f'p{pid_num}')}</p>",
        }


def build_json_stream_site(spec: SiteSpec) -> tuple[list[dict], list[dict]]:
    b = _JsonSiteBase(spec)
    boards = [
        {"id": f"b{i + 1}", "title": f"Board b{i + 1} of {b.host_tag}"}
        for i in range(spec.n_top_boards)
    ]
    b.add_json(
        "/api/index.json",
        {"generator": "synthforum-json-stream", "site": f"Site {b.host_tag}",
         "boards": boards},
        "api_index",
    )
    tid_n = 0
    pid_n = 0
    for board in boards:
        threads = []
        for _ in range(spec.threads_per_board):
            tid_n += 1
            tid = f"t{tid_n}"
            threads.append(
                {"id": tid, "title": f"Thread {tid}: {_sentence(b.rng, tid)[:40]}"}
            )
        n_pages = max(1, -(-len(threads) // spec.threads_per_page))
        for page in range(1, n_pages + 1):
            chunk = threads[(page - 1) * spec.threads_per_page : page * spec.threads_per_page]
            nxt = (
                f"/api/board/{board['id']}.json?page={page + 1}"
                if page < n_pages else None
            )
            path = (
                f"/api/board/{board['id']}.json"
                if page == 1
                else f"/api/board/{board['id']}.json?page={page}"
            )
            b.add_json(
                path,
                {"title": board["title"], "threads": chunk, "next": nxt},
                "board_page", keep=("page",),
            )
        for t in threads:
            # posts: indent walk identical in spirit to the HTML builder
            posts, indent = [], 0
            for _ in range(spec.posts_per_thread):
                pid_n += 1
                p = b.make_post(pid_n)
                p["indent"] = indent
                p["images"] = b.maybe_image()
                posts.append(p)
                indent = min(4, max(0, indent + int(b.rng.integers(-2, 2))))
            stream = [p["id"] for p in posts]
            b.add_json(
                f"/api/t/{t['id']}.json",
                {"id": t["id"], "title": t["title"], "stream": stream},
                "thread_head",
            )
            by_id = {p["id"]: p for p in posts}
            for c0 in range(0, len(stream), CHUNK):
                ids = stream[c0 : c0 + CHUNK]
                b.add_json(
                    f"/api/t/{t['id']}/posts.json?ids={','.join(str(i) for i in ids)}",
                    {"posts": [by_id[i] for i in ids]},
                    "post_chunk", keep=("page", "ids"),
                )
    return b.pages, b.images


def build_json_registry_site(spec: SiteSpec) -> tuple[list[dict], list[dict]]:
    """Stories + comment trees; the registry lists story ids descending
    (the top-stories model — comments are only reachable via kids)."""
    b = _JsonSiteBase(spec)
    next_id = 0

    def new_id() -> int:
        nonlocal next_id
        next_id += 1
        return next_id

    stories = []
    n_stories = spec.n_top_boards * spec.threads_per_board
    for _ in range(n_stories):
        sid = new_id()
        title = f"Story s{sid}: {_sentence(b.rng, f's{sid}')[:40]}"
        root_post = b.make_post(sid)
        kids_of: dict[int, list[int]] = {sid: []}
        items = {sid: {"id": sid, "type": "story", "by": root_post["author"],
                       "time": root_post["time"], "title": title,
                       "text": root_post["content"]}}
        # comment tree: each comment attaches to a random earlier item
        parents = [sid]
        for _ in range(spec.posts_per_thread - 1):
            cid = new_id()
            parent = parents[int(b.rng.integers(0, len(parents)))]
            cp = b.make_post(cid)
            items[cid] = {"id": cid, "type": "comment", "by": cp["author"],
                          "time": cp["time"], "text": cp["content"]}
            kids_of.setdefault(parent, []).append(cid)
            kids_of[cid] = []
            parents.append(cid)
        for iid, item in items.items():
            if kids_of.get(iid):
                item["kids"] = kids_of[iid]
            b.add_json(f"/v0/item/{iid}.json", item, "item")
        stories.append(sid)

    b.add_json(
        "/v0/maxitem.json",
        {"generator": "synthforum-json-registry", "maxitem": next_id,
         "stories": sorted(stories, reverse=True), "site": f"News {b.host_tag}"},
        "api_index",
    )
    return b.pages, b.images
