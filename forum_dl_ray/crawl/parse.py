"""Parse stage: fetched page batches → Entry rows + new frontier offers.

The Ray analog of the reference's generator chain (extractors/
common.py:334-366 board/thread page iterators and writers/common.py:
100-129 DFS emission): each fetched page row is parsed by its engine's
pure kernels, emitting

- Entry rows (board/thread/post/file) tagged with the emission-order
  key assigned at ENQUEUE time (SURVEY.md §7.4 "ordering metadata must
  be derivable at enqueue time"), plus one "lineage" row per fetch;
- new frontier entries (next pages, threads, subboards, assets) that
  are offered to the frontier actors DIRECTLY FROM THE WORKER (batched
  RPC per map_batches call) — new URLs never round-trip the driver.

Pagination-chain state (thread reply stack, per-board thread
accumulator, page numbers — the reference's PageState subclasses,
SURVEY.md ST4) travels in the entry's cursor JSON, not in any actor.

Failed fetches emit only a lineage row (error containment parity,
common.py:334-346: swallow and continue).
"""

from __future__ import annotations

import json
from datetime import datetime
from typing import Any

import pyarrow as pa

from ..engines import ENGINES, detect_engine
from ..engines.replytree import advance_stack
from ..fixtures.golden import image_id_from_url, item_id_from_url
from ..schemas import ENTRY, order_key_extend as okx, path_to_json
from ..urlnorm import DATA_URL_RE, host_of, url_hash64

_ENTRY_NAMES = [f.name for f in ENTRY]


def _new_frontier_entry(
    url: str, kind: str, engine: str, depth: int, order_key: str,
    path: list[str], title: str, cursor: dict,
) -> dict:
    h = url_hash64(url)
    return {
        "url": url,
        "url_hash": h,
        "host": host_of(url),
        "engine": engine,
        "kind": kind,
        "depth": depth,
        "seq": abs(h) % (1 << 31),  # deterministic priority tiebreak
        "order_key": order_key,
        "path": path_to_json(path),
        "title": title,
        "cursor": json.dumps(cursor, separators=(",", ":")),
    }


def _entry_row(**kw) -> dict:
    row = {name: None for name in _ENTRY_NAMES}
    row["data"] = "{}"
    row.update(kw)
    return row


def parse_batch(batch: pa.Table, *, frontier: Any, wave: int = -1) -> pa.Table:
    out_entries: list[dict] = []
    new_frontier: list[dict] = []

    cols = {name: batch[name].to_pylist() for name in batch.column_names}
    n = batch.num_rows
    for i in range(n):
        url = cols["url"][i]
        status = cols["status"][i]
        body = cols["body"][i]
        kind = cols["kind"][i]
        engine_name = cols["engine"][i]
        key = cols["order_key"][i]
        path = json.loads(cols["path"][i]) if cols["path"][i] else []
        title = cols["title"][i] or ""
        cursor = json.loads(cols["cursor"][i]) if cols["cursor"][i] else {}
        depth = cols["depth"][i]
        seq = cols["seq"][i]

        out_entries.append(
            _entry_row(
                type="lineage", url=url, origin=url, order_key=key, origin_seq=seq,
                data=json.dumps(
                    {
                        "status": status,
                        "sha1": cols["bytes_sha1"][i],
                        "n_bytes": cols["n_bytes"][i],
                        "wave": wave,
                        "host": cols["host"][i],
                    },
                    separators=(",", ":"),
                ),
            )
        )
        if status != 200 or not body:
            continue  # error containment: lineage row only, crawl continues

        try:
            if kind == "seed":
                detected = detect_engine(url, body)
                if detected is None:
                    continue
                engine_name = detected
                if detected != "html-generic":
                    kind = "api_index"
                    cursor = {"j": 0, "page": 1}
                elif ENGINES[detected].classify_page(body) == "thread":
                    # J5 thread seed: recover the board path from the
                    # breadcrumb trail (J2) and emit the thread entry
                    # the board walk would have produced
                    eng0 = ENGINES[detected]
                    t_title = eng0.page_title(body)
                    tid = item_id_from_url(url)
                    path = eng0.board_path_from_crumbs(body, url) + [tid]
                    title = t_title
                    kind = "thread_page"
                    cursor = {"k": 0, "stack": [], "page": 1}
                    out_entries.append(
                        _entry_row(
                            type="thread", path=path_to_json(path), url=url,
                            origin=url, title=t_title, order_key=okx(key, 0),
                        )
                    )
                else:
                    kind = "board_page"
                    cursor = {"j": 0, "page": 1}
            eng = ENGINES[engine_name]
            if engine_name == "html-generic":
                _parse_html_row(
                    eng, url, body, kind, key, path, title, cursor, depth,
                    out_entries, new_frontier,
                )
            else:
                from .parse_json import parse_json_row

                parse_json_row(
                    eng, engine_name, url, body, kind, key, path, title, cursor,
                    depth, out_entries, new_frontier,
                )
        except Exception as exc:  # parity: swallow, record, continue
            out_entries.append(
                _entry_row(
                    type="lineage", url=url, origin=url, order_key=key, origin_seq=seq,
                    data=json.dumps({"error": repr(exc)[:200], "wave": wave}),
                )
            )

    if new_frontier:
        frontier.offer(new_frontier)

    cols_out = {name: [e[name] for e in out_entries] for name in _ENTRY_NAMES}
    return pa.table(cols_out, schema=ENTRY)


def _parse_html_row(
    eng, url, body, kind, key, path, title, cursor, depth, out_entries, new_frontier
) -> None:
    engine_name = "html-generic"
    if kind == "board_page":
        parsed = eng.parse_board_page(body, url)
        page_no = cursor.get("page", 1)
        if page_no == 1:
            # board Entry emitted once, on its first page (title carried
            # from the discovering link; root board falls back to <title>)
            out_entries.append(
                _entry_row(
                    type="board", path=path_to_json(path), url=url, origin=url,
                    title=title or parsed["title"], order_key=okx(key, 0),
                )
            )
        j = cursor.get("j", 0)
        for t_url, t_title in parsed["threads"]:
            tid = item_id_from_url(t_url)
            t_path = path + [tid]
            t_key = okx(key, 1, j)
            out_entries.append(
                _entry_row(
                    type="thread", path=path_to_json(t_path), url=t_url, origin=url,
                    title=t_title, order_key=okx(t_key, 0),
                )
            )
            new_frontier.append(
                _new_frontier_entry(
                    t_url, "thread_page", engine_name, depth + 1, t_key, t_path,
                    t_title, {"k": 0, "stack": [], "page": 1},
                )
            )
            j += 1
        if page_no == 1:
            for s_idx, (s_url, s_title) in enumerate(parsed["subboards"]):
                bid = item_id_from_url(s_url)
                new_frontier.append(
                    _new_frontier_entry(
                        s_url, "board_page", engine_name, depth + 1, okx(key, 2, s_idx),
                        path + [bid], s_title, {"j": 0, "page": 1},
                    )
                )
        # M7 page-level embeds: board pages yield every embed object,
        # path=[] (outside files; no anti-join on board pages —
        # common.py:421)
        _emit_page_files(
            eng, body, url, key, j, 3, set(), out_entries, _entry_row
        )
        if parsed["next_url"]:
            new_frontier.append(
                _new_frontier_entry(
                    parsed["next_url"], "board_page", engine_name, depth, key, path,
                    title, {"j": j, "page": page_no + 1},
                )
            )
    elif kind == "thread_page":
        parsed = eng.parse_thread_page(body, url)
        k = cursor.get("k", 0)
        stack = list(cursor.get("stack", []))
        path_json = path_to_json(path)  # invariant across the page's rows
        for p in parsed["posts"]:
            advance_stack(stack, p["indent"], p["pid"])
            subpath = list(stack)
            subpath_json = path_to_json(subpath)
            p_key = okx(key, 1, k)
            out_entries.append(
                _entry_row(
                    type="post", path=path_json, subpath=subpath_json,
                    url=url, origin=url, author=p["author"],
                    creation_time=datetime.fromisoformat(p["time_iso"]) if p["time_iso"] else None,
                    content=p["content"], order_key=okx(p_key, 0),
                )
            )
            for f_idx, (img_url, caption) in enumerate(p["images"]):
                dm = DATA_URL_RE.match(img_url)
                if dm:
                    # M22 inline file: decode the payload from the URL,
                    # emit the File row directly — no fetch, no frontier
                    # offer (writers/common.py:161-187)
                    from base64 import b64decode

                    out_entries.append(
                        _entry_row(
                            type="file", path=path_json,
                            subpath=path_to_json(subpath + [str(f_idx)]),
                            url=img_url, origin=url, content_type=dm.group(1),
                            content_bytes=b64decode(dm.group(2)),
                            order_key=okx(p_key, 1, f_idx),
                        )
                    )
                    continue
                _image_id, ext = image_id_from_url(img_url)
                out_entries.append(
                    _entry_row(
                        type="file", path=path_json,
                        subpath=path_to_json(subpath + [str(f_idx)]),
                        url=img_url, origin=url, content_type=f"image/{ext}",
                        order_key=okx(p_key, 1, f_idx),
                    )
                )
                new_frontier.append(
                    _new_frontier_entry(
                        img_url, "asset", engine_name, depth + 1, okx(p_key, 1, f_idx),
                        path, caption, {},
                    )
                )
            k += 1
        # J1 content-file anti-join: page-level embeds minus the URLs
        # already emitted as post-content files (common.py:439-459)
        content_urls = {u for p in parsed["posts"] for (u, _c) in p["images"]}
        _emit_page_files(
            eng, body, url, key, k, 2, content_urls, out_entries, _entry_row
        )
        if parsed["next_url"]:
            new_frontier.append(
                _new_frontier_entry(
                    parsed["next_url"], "thread_page", engine_name, depth, key, path,
                    title, {"k": k, "stack": stack, "page": cursor.get("page", 1) + 1},
                )
            )
    else:
        raise ValueError(f"html-generic cannot parse kind={kind!r}")


def _emit_page_files(
    eng, body, page_url, key, n_items, tail_seg, content_urls, out_entries, _entry_row
) -> None:
    """Emit a page's outside-file rows (M7, path=[]) with keys that sort
    directly after the page's last item subtree and before the next
    page's items: okx(key, 1, n_items-1, tail_seg, f) — or before the
    first item when the page had none. Inline svg carries its content;
    URL embeds carry only the URL (the writer decides whether outside
    files are fetched, writers/common.py:135-189)."""
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
        out_entries.append(
            _entry_row(
                type="file", path=path_to_json([]),
                subpath=path_to_json([em["url"]] if em["url"] else []),
                url=em["url"] or page_url, origin=page_url,
                content_type=em["content_type"],
                content_bytes=em["content_bytes"], order_key=fk,
            )
        )
