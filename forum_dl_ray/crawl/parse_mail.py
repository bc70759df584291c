"""Parse kernel for the mail-archive engine (M16 / ST4 stack cursor).

The distinguishing state is the ``relative_urls`` month-page stack
(reference pipermail.py:18-19 PipermailPageState): discovered up front
from the archive index, carried in the frontier entry's cursor JSON and
popped one month per board-page step (pipermail.py:226-259). A month
page whose fetch fails drops the remaining stack — chain semantics
identical to a broken next-page link.

Emission-key scheme (must match fixtures/golden_mail.py walker):
  seed listinfo index: root board okx(S,0); list i LK=okx(S,2,i);
  list board entry okx(LK,0); thread j (running across the month
  chain) TK=okx(LK,1,j) → thread entry okx(TK,0); post k of the
  thread (month-page comment order) PK=okx(TK,1,k) → post okx(PK,0).
Subpaths are reconstructed from comment chain depths with the same
``advance_stack`` linearization as every other engine, computed at
month-parse time and carried to the per-post fetch in its cursor.
"""

from __future__ import annotations

from ..engines.replytree import advance_stack
from ..schemas import order_key_extend as okx
from ..schemas import path_to_json


def parse_mail_row(
    eng, url, body, kind, key, path, title, cursor, depth,
    out_entries, new_frontier, _entry_row, _new_frontier_entry,
) -> None:
    if kind == "api_index":  # the seed listinfo index
        parsed = eng.parse_listinfo(body, url)
        out_entries.append(
            _entry_row(
                type="board", path=path_to_json([]), url=url, origin=url,
                title=parsed["title"], order_key=okx(key, 0),
            )
        )
        for i, (list_id, info_url) in enumerate(parsed["lists"]):
            new_frontier.append(
                _new_frontier_entry(
                    info_url, "mail_list", "mail-archive", depth + 1,
                    okx(key, 2, i), [list_id], "", {},
                )
            )
    elif kind == "mail_list":
        board_title = eng.parse_info_title(body)
        out_entries.append(
            _entry_row(
                type="board", path=path_to_json(path), url=url, origin=url,
                title=board_title, order_key=okx(key, 0),
            )
        )
        new_frontier.append(
            _new_frontier_entry(
                eng.pipermail_index_url(path[0], url), "mail_month_index",
                "mail-archive", depth + 1, key, path, board_title, {},
            )
        )
    elif kind == "mail_month_index":
        months = eng.parse_month_index(body, url)
        stack = list(reversed(months))  # pop() from the end = page order
        if stack:
            month_url = stack.pop()
            new_frontier.append(
                _new_frontier_entry(
                    month_url, "mail_month", "mail-archive", depth + 1, key,
                    path, title, {"stack": stack, "j": 0},
                )
            )
    elif kind == "mail_month":
        j = cursor.get("j", 0)
        for t in eng.parse_month_threads(body, url):
            t_key = okx(key, 1, j)
            t_path = path + [t["tid"]]
            out_entries.append(
                _entry_row(
                    type="thread", path=path_to_json(t_path), url=t["url"],
                    origin=url, title=t["title"], order_key=okx(t_key, 0),
                )
            )
            stack_sp: list[str] = []
            for k, p in enumerate(t["posts"]):
                advance_stack(stack_sp, p["depth"], p["num"])
                new_frontier.append(
                    _new_frontier_entry(
                        p["url"], "mail_post", "mail-archive", depth + 1,
                        okx(t_key, 1, k), t_path, "", {"sp": list(stack_sp)},
                    )
                )
            j += 1
        stack = list(cursor.get("stack", []))
        if stack:
            month_url = stack.pop()
            new_frontier.append(
                _new_frontier_entry(
                    month_url, "mail_month", "mail-archive", depth, key, path,
                    title, {"stack": stack, "j": j},
                )
            )
    elif kind == "mail_post":
        from datetime import datetime

        post = eng.parse_post_page(body, url)
        out_entries.append(
            _entry_row(
                type="post", path=path_to_json(path),
                subpath=path_to_json(cursor.get("sp", [])), url=url, origin=url,
                author=post["author"],
                creation_time=datetime.fromisoformat(post["time_iso"]) if post["time_iso"] else None,
                content=post["content"], order_key=okx(key, 0),
            )
        )
    else:
        raise ValueError(f"mail-archive cannot parse kind={kind!r}")
