"""Golden oracle: a tiny sequential simulator of the reference crawl.

Replays forum-dl's traversal semantics over the fixture page table —
DFS board recursion (board, then all its threads page-by-page, then
subboards; /root/reference/forum_dl/writers/common.py:100-108), lazy
page-by-page cursors (extractors/common.py:334-366), reply-tree
subpath stacks (hyperkitty.py:283-324), first-wins URL dedup with a
failed-set (session.py:105-115), error swallowing (common.py:234-240)
— producing the golden crawl order, final seen set, ordered Entry
stream with order keys, harvested image payloads, and the SHA-1
titles/contents hashes of the reference test harness
(tests/test_extractors.py:88-109).

It shares the page-parse kernels with the Ray engine (engines/*) but
NOT the traversal wiring: the simulator is sequential recursion, the
crawler is wave-parallel. Equality of their outputs is the parity
gate (BASELINE.md correctness row).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field
from datetime import datetime

import pyarrow.parquet as pq

from ..engines import ENGINES, detect_engine
from ..engines.replytree import advance_stack
from ..schemas import order_key as ok
from ..schemas import order_key_extend as okx
from ..schemas import path_to_json
from ..urlnorm import DATA_URL_RE, normalize_url


@dataclass
class GoldenResult:
    crawl_order: list[str] = field(default_factory=list)
    seen: dict[str, bool] = field(default_factory=dict)  # url -> failed?
    entries: list[dict] = field(default_factory=list)
    images: list[dict] = field(default_factory=list)  # image_id, bytes, fmt, caption
    hashes: dict[str, dict] = field(default_factory=dict)  # per-seed oracle hashes


def item_id_from_url(url: str) -> str:
    return url.rstrip("/").rsplit("/", 1)[-1].split("?")[0]


def image_id_from_url(url: str) -> tuple[str, str]:
    name = url.rstrip("/").rsplit("/", 1)[-1]
    image_id, _, ext = name.rpartition(".")
    return image_id, ext


class _Sim:
    def __init__(self, pages: dict[str, dict]):
        self.pages = pages
        self.res = GoldenResult()

    def fetch(self, url: str) -> dict | None:
        """First-wins record + failed-set semantics (session.py:105-115).
        A repeat access returns None — the subtree is walked exactly
        once, matching the reference's AlreadyVisitedError skip
        (session.py:105-108) and the crawler's frontier dedup. A failed
        URL is never retried."""
        if url in self.res.seen:
            return None
        row = self.pages.get(url)
        failed = row is None or row["status"] != 200
        self.res.seen[url] = failed
        self.res.crawl_order.append(url)
        return None if failed else row

    # ------------------------------------------------------------- entries
    def emit_board(self, url, path, title, key):
        self.res.entries.append(
            {
                "type": "board",
                "path": path_to_json(path),
                "subpath": None,
                "url": url,
                "origin": url,
                "title": title,
                "author": None,
                "creation_time": None,
                "content": None,
                "content_type": None,
                "content_bytes": None,
                "data": "{}",
                "order_key": key,
                "origin_seq": None,
            }
        )

    def emit_thread(self, url, origin, path, title, key):
        self.res.entries.append(
            {
                "type": "thread",
                "path": path_to_json(path),
                "subpath": None,
                "url": url,
                "origin": origin,
                "title": title,
                "author": None,
                "creation_time": None,
                "content": None,
                "content_type": None,
                "content_bytes": None,
                "data": "{}",
                "order_key": key,
                "origin_seq": None,
            }
        )

    def emit_post(self, url, origin, path, subpath, author, time_iso, content, key):
        self.res.entries.append(
            {
                "type": "post",
                "path": path_to_json(path),
                "subpath": path_to_json(subpath),
                "url": url,
                "origin": origin,
                "title": None,
                "author": author,
                "creation_time": datetime.fromisoformat(time_iso) if time_iso else None,
                "content": content,
                "content_type": None,
                "content_bytes": None,
                "data": "{}",
                "order_key": key,
                "origin_seq": None,
            }
        )

    def emit_file(self, url, origin, path, subpath, content_type, key,
                  content_bytes=None):
        self.res.entries.append(
            {
                "type": "file",
                "path": path_to_json(path),
                "subpath": path_to_json(subpath),
                "url": url,
                "origin": origin,
                "title": None,
                "author": None,
                "creation_time": None,
                "content": None,
                "content_type": content_type,
                "content_bytes": content_bytes,
                "data": "{}",
                "order_key": key,
                "origin_seq": None,
            }
        )

    def emit_page_files(self, eng, body, page_url, key, n_items, tail_seg,
                        content_urls):
        """Golden mirror of crawl/parse.py _emit_page_files (M7/J1):
        same anti-join, same key scheme."""
        page_files = [
            em for em in eng.page_embeds(body, page_url)
            if em["url"] is None or em["url"] not in content_urls
        ]
        for f_idx, em in enumerate(page_files):
            fk = (
                okx(key, 1, n_items - 1, tail_seg, f_idx)
                if n_items > 0
                else okx(key, 0, tail_seg - 1, f_idx)
            )
            self.emit_file(
                em["url"] or page_url, page_url, [],
                [em["url"]] if em["url"] else [],
                em["content_type"], fk, content_bytes=em["content_bytes"],
            )

    # ---------------------------------------------------------- html walk
    def walk_board_html(self, eng, board_url, path, title, key_prefix, row0=None):
        """``row0``: pre-fetched first-page row (seed flow — the seed
        fetch already recorded the URL; re-fetching would now skip)."""
        page_url = board_url
        j = 0
        subboards: list[tuple[str, str]] = []
        first = True
        while page_url:
            row = row0 if (first and row0 is not None) else self.fetch(page_url)
            if row is None:
                break
            parsed = eng.parse_board_page(row["body"], page_url)
            if first:
                # board Entry only after a successful page-1 fetch+parse
                # (crawler parity, crawl/parse.py:165-176): a board whose
                # first page fails yields no board entry on either side
                self.emit_board(
                    board_url, path, title or parsed["title"], okx(key_prefix, 0)
                )
                subboards = parsed["subboards"]
                first = False
            for t_url, t_title in parsed["threads"]:
                tid = item_id_from_url(t_url)
                t_path = path + [tid]
                t_key = okx(key_prefix, 1, j)
                self.emit_thread(t_url, page_url, t_path, t_title, okx(t_key, 0))
                self.walk_thread_html(eng, t_url, t_path, t_key)
                j += 1
            self.emit_page_files(eng, row["body"], page_url, key_prefix, j, 3, set())
            page_url = parsed["next_url"]
        for i, (s_url, s_title) in enumerate(subboards):
            bid = item_id_from_url(s_url)
            self.walk_board_html(eng, s_url, path + [bid], s_title, okx(key_prefix, 2, i))

    def walk_thread_html(self, eng, thread_url, path, key_t, row0=None):
        page_url = thread_url
        k = 0
        stack: list[str] = []
        first = True
        while page_url:
            row = row0 if (first and row0 is not None) else self.fetch(page_url)
            first = False
            if row is None:
                break
            parsed = eng.parse_thread_page(row["body"], page_url)
            for p in parsed["posts"]:
                advance_stack(stack, p["indent"], p["pid"])
                subpath = list(stack)
                p_key = okx(key_t, 1, k)
                self.emit_post(
                    page_url, page_url, path, subpath, p["author"], p["time_iso"],
                    p["content"], okx(p_key, 0),
                )
                for f_idx, (img_url, _caption) in enumerate(p["images"]):
                    dm = DATA_URL_RE.match(img_url)
                    if dm:
                        from base64 import b64decode

                        self.emit_file(
                            img_url, page_url, path, subpath + [str(f_idx)],
                            dm.group(1), okx(p_key, 1, f_idx),
                            content_bytes=b64decode(dm.group(2)),
                        )
                        continue
                    asset = self.fetch(img_url)
                    image_id, ext = image_id_from_url(img_url)
                    self.emit_file(
                        img_url, page_url, path, subpath + [str(f_idx)],
                        f"image/{ext}", okx(p_key, 1, f_idx),
                    )
                    if asset is not None:
                        self.res.images.append(
                            {
                                "image_id": image_id,
                                "bytes": asset["body"],
                                "fmt": ext,
                                "caption": _caption,
                                "origin": page_url,
                            }
                        )
                k += 1
            content_urls = {u for p in parsed["posts"] for (u, _c) in p["images"]}
            self.emit_page_files(eng, row["body"], page_url, key_t, k, 2, content_urls)
            page_url = parsed["next_url"]


def simulate(pages_rows: list[dict], seeds: list[dict]) -> GoldenResult:
    pages = {r["url"]: r for r in pages_rows}
    sim = _Sim(pages)
    for s_idx, seed in enumerate(seeds):
        canon_seed = normalize_url(seed["seed_url"], keep_queries=("page",))
        entry_mark = len(sim.res.entries)
        row = sim.fetch(canon_seed)
        if row is None:
            continue
        engine_name = detect_engine(canon_seed, row["body"])
        assert engine_name == seed["engine"], (engine_name, seed)
        eng = ENGINES[engine_name]
        if engine_name == "html-generic":
            if eng.classify_page(row["body"]) == "thread":
                # J5 thread seed: board path via breadcrumbs (J2)
                t_title = eng.page_title(row["body"])
                tid = item_id_from_url(canon_seed)
                t_path = eng.board_path_from_crumbs(row["body"], canon_seed) + [tid]
                sim.emit_thread(canon_seed, canon_seed, t_path, t_title, okx(ok(s_idx), 0))
                sim.walk_thread_html(eng, canon_seed, t_path, ok(s_idx), row0=row)
            else:
                # seed page IS the root board index (already fetched for
                # detection; the walker reuses the row instead of a
                # repeat fetch, which would now skip)
                title = eng.page_title(row["body"])
                sim.walk_board_html(eng, canon_seed, [], title, ok(s_idx), row0=row)
        elif engine_name == "json-stream":
            from .golden_json import walk_json_stream

            walk_json_stream(sim, eng, canon_seed, row, ok(s_idx))
        elif engine_name == "json-registry":
            from .golden_json import walk_json_registry

            walk_json_registry(sim, eng, canon_seed, row, ok(s_idx))
        elif engine_name == "mail-archive":
            from .golden_mail import walk_mail_archive

            walk_mail_archive(sim, eng, canon_seed, row, ok(s_idx))
        # per-seed oracle hashes (test_extractors.py:88-109 semantics)
        seed_entries = sim.res.entries[entry_mark:]
        titles = [e["title"] for e in seed_entries if e["type"] in ("board", "thread")]
        contents = [e["content"] for e in seed_entries if e["type"] == "post"]
        sim.res.hashes[seed["host"]] = {
            "titles_sha1": hashlib.sha1("\0".join(titles).encode()).hexdigest(),
            "contents_sha1": hashlib.sha1("\0".join(contents).encode()).hexdigest(),
            "item_count": len(seed_entries),
            "post_count": len(contents),
        }
    return sim.res


def simulate_fixture_dir(fixture_dir: str) -> GoldenResult:
    import json
    import os

    pages = pq.read_table(os.path.join(fixture_dir, "pages.parquet")).to_pylist()
    seeds = json.load(open(os.path.join(fixture_dir, "seeds.json")))
    return simulate(pages, seeds)
