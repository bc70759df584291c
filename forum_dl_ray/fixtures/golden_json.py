"""Golden walkers for the JSON engines (sequential reference order).

Mirror crawl/parse_json.py exactly — same emission keys, same
first-wins fetch recording — but as sequential recursion, so the
golden emission order equals the order-key sort of the crawler's
parallel output (the parity gate).

Registry note: the reference HN extractor linearizes reply trees
breadth-first with a worklist (hackernews.py:222-260); a BFS rank is
not derivable at enqueue time in a parallel crawl (a comment's
within-depth rank depends on all earlier branches), so this engine
pair — walker AND parse kernel — linearizes DEPTH-first, the same
stack linearization the reference's mail-archive extractors use
(hyperkitty.py:283-324). The golden walker defines the oracle; both
sides agree by construction and the choice is documented here.
"""

from __future__ import annotations

import json

from ..engines.json_stream import CHUNK
from ..schemas import order_key_extend as okx
from .golden import image_id_from_url


def walk_json_stream(sim, eng, seed_url, seed_row, key) -> None:
    parsed = eng.parse_index(seed_row["body"], seed_url)
    sim.emit_board(seed_url, [], parsed["title"], okx(key, 0))
    for i, (b_url, b_title) in enumerate(parsed["subboards"]):
        bid = b_url.rstrip("/").rsplit("/", 1)[-1].split(".")[0]
        _walk_stream_board(sim, eng, b_url, [bid], b_title, okx(key, 2, i))


def _walk_stream_board(sim, eng, board_url, path, title, bkey) -> None:
    page_url = board_url
    page_no = 1
    j = 0
    while page_url:
        row = sim.fetch(page_url)
        if row is None:
            break
        parsed = eng.parse_board_page(row["body"], page_url)
        if page_no == 1:
            sim.emit_board(page_url, path, title or parsed["title"], okx(bkey, 0))
        for t_url, t_title in parsed["threads"]:
            tid = t_url.rstrip("/").rsplit("/", 1)[-1].split(".")[0]
            t_key = okx(bkey, 1, j)
            sim.emit_thread(t_url, page_url, path + [tid], t_title, okx(t_key, 0))
            _walk_stream_thread(sim, eng, t_url, path + [tid], t_key)
            j += 1
        page_url = parsed["next_url"]
        page_no += 1


def _walk_stream_thread(sim, eng, head_url, path, t_key) -> None:
    from ..engines.replytree import advance_stack

    row = sim.fetch(head_url)
    if row is None:
        return
    head = eng.parse_thread_head(row["body"], head_url)
    stream = head["stream"]
    k = 0
    stack: list[str] = []
    pos = 0
    while pos < len(stream):
        ids = stream[pos : pos + CHUNK]
        chunk_u = eng.chunk_url(head["tid"], ids, head_url)
        crow = sim.fetch(chunk_u)
        if crow is None:
            break
        for p in eng.parse_posts_chunk(crow["body"], chunk_u):
            advance_stack(stack, p["indent"], p["pid"])
            subpath = list(stack)
            p_key = okx(t_key, 1, k)
            sim.emit_post(
                chunk_u, chunk_u, path, subpath, p["author"], p["time_iso"],
                p["content"], okx(p_key, 0),
            )
            for f_idx, (img_url, caption) in enumerate(p["images"]):
                asset = sim.fetch(img_url)
                image_id, ext = image_id_from_url(img_url)
                sim.emit_file(
                    img_url, chunk_u, path, subpath + [str(f_idx)],
                    f"image/{ext}", okx(p_key, 1, f_idx),
                )
                if asset is not None:
                    sim.res.images.append(
                        {"image_id": image_id, "bytes": asset["body"], "fmt": ext,
                         "caption": caption, "origin": chunk_u}
                    )
            k += 1
        pos += CHUNK


def walk_json_registry(sim, eng, seed_url, seed_row, key) -> None:
    d = json.loads(seed_row["body"])
    sim.emit_board(seed_url, [], d.get("site", ""), okx(key, 0))
    for i, sid in enumerate(d["stories"]):  # descending story ids
        _walk_registry_item(
            sim, eng, eng.item_url(sid, seed_url), okx(key, 1, i), [], [],
        )


def _walk_registry_item(sim, eng, url, key, path, sp) -> None:
    row = sim.fetch(url)
    if row is None:
        return
    item = eng.parse_item(row["body"])
    iid = str(item["id"])
    if item["type"] == "story":
        t_path = [iid]
        sim.emit_thread(url, url, t_path, item.get("title", ""), okx(key, 0))
        p_key = okx(key, 1)
        sim.emit_post(
            url, url, t_path, [iid], item.get("by", ""), item.get("time"),
            item.get("text", ""), okx(p_key, 0),
        )
        child_path, child_sp = t_path, [iid]
    else:
        child_path = path
        child_sp = sp + [iid]
        p_key = key
        sim.emit_post(
            url, url, path, child_sp, item.get("by", ""), item.get("time"),
            item.get("text", ""), okx(key, 0),
        )
    for j, kid in enumerate(item.get("kids", [])):
        _walk_registry_item(
            sim, eng, eng.item_url(kid, url), okx(p_key, 2, j), child_path, child_sp,
        )
