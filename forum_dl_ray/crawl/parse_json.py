"""Parse kernels for the JSON cursor-style engines (SURVEY.md ST4).

Shares the wave scheduler with the HTML engine; what differs is the
cursor payload carried in each frontier entry:

- ``json-stream``: the remaining post-id stream
  (DiscourseThreadPageState.stream_data parity,
  /root/reference/forum_dl/extractors/discourse.py:14-15,200-244);
- ``json-registry``: descending story registry + per-comment reply
  subpath (hackernews.py:82-260; the reply tree is linearized
  depth-first here — keys chain parent → child so the order-key sort
  IS the DFS, derivable entirely at enqueue time, SURVEY.md §7.4).

Emission-key scheme (must match fixtures/golden_json.py walkers):
  stream: index board okx(S,0); board i key BK=okx(S,2,i); board
  entry okx(BK,0); thread j key TK=okx(BK,1,j); thread okx(TK,0);
  post k pk=okx(TK,1,k) → okx(pk,0); file f okx(pk,1,f).
  registry: root board okx(S,0); story i (descending id) IK=okx(S,1,i);
  thread okx(IK,0); story post PK=okx(IK,1) → okx(PK,0); kid j of a
  post with key PK → item key okx(PK,2,j).
"""

from __future__ import annotations

import json

from ..engines.json_stream import CHUNK
from ..schemas import order_key_extend as okx
from ..schemas import path_to_json


def parse_json_row(
    eng, engine_name, url, body, kind, key, path, title, cursor, depth,
    out_entries, new_frontier,
) -> None:
    from .parse import _entry_row, _new_frontier_entry

    if engine_name == "json-stream":
        _parse_stream_row(
            eng, url, body, kind, key, path, title, cursor, depth,
            out_entries, new_frontier, _entry_row, _new_frontier_entry,
        )
    elif engine_name == "json-registry":
        _parse_registry_row(
            eng, url, body, kind, key, path, title, cursor, depth,
            out_entries, new_frontier, _entry_row, _new_frontier_entry,
        )
    elif engine_name == "mail-archive":
        from .parse_mail import parse_mail_row

        parse_mail_row(
            eng, url, body, kind, key, path, title, cursor, depth,
            out_entries, new_frontier, _entry_row, _new_frontier_entry,
        )
    else:
        raise ValueError(f"unknown json engine {engine_name!r}")


# ------------------------------------------------------------- json-stream
def _parse_stream_row(
    eng, url, body, kind, key, path, title, cursor, depth,
    out_entries, new_frontier, _entry_row, _new_frontier_entry,
) -> None:
    if kind == "api_index":
        parsed = eng.parse_index(body, url)
        out_entries.append(
            _entry_row(
                type="board", path=path_to_json(path), url=url, origin=url,
                title=parsed["title"], order_key=okx(key, 0),
            )
        )
        for i, (b_url, b_title) in enumerate(parsed["subboards"]):
            bid = _board_id(b_url)
            new_frontier.append(
                _new_frontier_entry(
                    b_url, "board_page", "json-stream", depth + 1, okx(key, 2, i),
                    path + [bid], b_title, {"j": 0, "page": 1},
                )
            )
    elif kind == "board_page":
        parsed = eng.parse_board_page(body, url)
        page_no = cursor.get("page", 1)
        if page_no == 1:
            out_entries.append(
                _entry_row(
                    type="board", path=path_to_json(path), url=url, origin=url,
                    title=title or parsed["title"], order_key=okx(key, 0),
                )
            )
        j = cursor.get("j", 0)
        for t_url, t_title in parsed["threads"]:
            tid = _thread_id(t_url)
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
                    t_url, "thread_head", "json-stream", depth + 1, t_key,
                    t_path, t_title, {},
                )
            )
            j += 1
        if parsed["next_url"]:
            new_frontier.append(
                _new_frontier_entry(
                    parsed["next_url"], "board_page", "json-stream", depth, key,
                    path, title, {"j": j, "page": page_no + 1},
                )
            )
    elif kind == "thread_head":
        parsed = eng.parse_thread_head(body, url)
        stream = parsed["stream"]
        if stream:
            new_frontier.append(
                _new_frontier_entry(
                    eng.chunk_url(parsed["tid"], stream[:CHUNK], url),
                    "post_chunk", "json-stream", depth + 1, key, path, title,
                    {"tid": parsed["tid"], "rest": stream[CHUNK:], "k": 0, "stack": []},
                )
            )
    elif kind == "post_chunk":
        from ..engines.replytree import advance_stack

        posts = eng.parse_posts_chunk(body, url)
        k = cursor.get("k", 0)
        stack = list(cursor.get("stack", []))
        for p in posts:
            advance_stack(stack, p["indent"], p["pid"])
            subpath = list(stack)
            p_key = okx(key, 1, k)
            from datetime import datetime

            out_entries.append(
                _entry_row(
                    type="post", path=path_to_json(path), subpath=path_to_json(subpath),
                    url=url, origin=url, author=p["author"],
                    creation_time=datetime.fromisoformat(p["time_iso"]) if p["time_iso"] else None,
                    content=p["content"], order_key=okx(p_key, 0),
                )
            )
            for f_idx, (img_url, caption) in enumerate(p["images"]):
                from ..fixtures.golden import image_id_from_url

                _iid, ext = image_id_from_url(img_url)
                out_entries.append(
                    _entry_row(
                        type="file", path=path_to_json(path),
                        subpath=path_to_json(subpath + [str(f_idx)]),
                        url=img_url, origin=url, content_type=f"image/{ext}",
                        order_key=okx(p_key, 1, f_idx),
                    )
                )
                new_frontier.append(
                    _new_frontier_entry(
                        img_url, "asset", "json-stream", depth + 1,
                        okx(p_key, 1, f_idx), path, caption, {},
                    )
                )
            k += 1
        rest = cursor.get("rest", [])
        if rest:
            new_frontier.append(
                _new_frontier_entry(
                    eng.chunk_url(cursor["tid"], rest[:CHUNK], url),
                    "post_chunk", "json-stream", depth, key, path, title,
                    {"tid": cursor["tid"], "rest": rest[CHUNK:], "k": k, "stack": stack},
                )
            )
    else:
        raise ValueError(f"json-stream cannot parse kind={kind!r}")


def _board_id(url: str) -> str:
    return url.rstrip("/").rsplit("/", 1)[-1].split(".")[0].split("?")[0]


def _thread_id(url: str) -> str:
    return _board_id(url)


# ----------------------------------------------------------- json-registry
def _parse_registry_row(
    eng, url, body, kind, key, path, title, cursor, depth,
    out_entries, new_frontier, _entry_row, _new_frontier_entry,
) -> None:
    from datetime import datetime

    if kind == "api_index":
        d = json.loads(body)
        out_entries.append(
            _entry_row(
                type="board", path=path_to_json([]), url=url, origin=url,
                title=d.get("site", ""), order_key=okx(key, 0),
            )
        )
        for i, sid in enumerate(d["stories"]):  # descending ids (A5 order)
            new_frontier.append(
                _new_frontier_entry(
                    eng.item_url(sid, url), "item", "json-registry", depth + 1,
                    okx(key, 1, i), [], "", {"sp": []},
                )
            )
    elif kind == "item":
        item = eng.parse_item(body)
        iid = str(item["id"])
        t = item.get("time")
        ct = datetime.fromisoformat(t) if t else None
        if item["type"] == "story":
            t_path = [iid]
            out_entries.append(
                _entry_row(
                    type="thread", path=path_to_json(t_path), url=url, origin=url,
                    title=item.get("title", ""), order_key=okx(key, 0),
                )
            )
            p_key = okx(key, 1)
            out_entries.append(
                _entry_row(
                    type="post", path=path_to_json(t_path),
                    subpath=path_to_json([iid]), url=url, origin=url,
                    author=item.get("by", ""), creation_time=ct,
                    content=item.get("text", ""), order_key=okx(p_key, 0),
                )
            )
            sp = [iid]
            parent_path = t_path
        else:
            parent_path = cursor.get("path", path)
            sp = list(cursor.get("sp", [])) + [iid]
            p_key = key
            out_entries.append(
                _entry_row(
                    type="post", path=path_to_json(parent_path),
                    subpath=path_to_json(sp), url=url, origin=url,
                    author=item.get("by", ""), creation_time=ct,
                    content=item.get("text", ""), order_key=okx(key, 0),
                )
            )
        for j, kid in enumerate(item.get("kids", [])):
            new_frontier.append(
                _new_frontier_entry(
                    eng.item_url(kid, url), "item", "json-registry", depth + 1,
                    okx(p_key, 2, j), parent_path, "", {"sp": sp, "path": parent_path},
                )
            )
    else:
        raise ValueError(f"json-registry cannot parse kind={kind!r}")
