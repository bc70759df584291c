"""Golden walker for the mail-archive engine (sequential reference order).

Mirrors crawl/parse_mail.py exactly — same emission keys, same
month-stack pop order, same chain-depth subpath linearization — as
sequential recursion, so the golden emission order equals the
order-key sort of the crawler's parallel output. A failed month page
drops the remaining stack on both sides (the stack travels WITH the
month entry); a failed post page is skipped but its subpath slot still
advances (the chain is derived from the month page, not the post).
"""

from __future__ import annotations

from ..engines.replytree import advance_stack
from ..schemas import order_key_extend as okx


def walk_mail_archive(sim, eng, seed_url, seed_row, key) -> None:
    parsed = eng.parse_listinfo(seed_row["body"], seed_url)
    sim.emit_board(seed_url, [], parsed["title"], okx(key, 0))
    for i, (list_id, info_url) in enumerate(parsed["lists"]):
        lk = okx(key, 2, i)
        row = sim.fetch(info_url)
        if row is None:
            continue
        board_title = eng.parse_info_title(row["body"])
        sim.emit_board(info_url, [list_id], board_title, okx(lk, 0))
        idx_url = eng.pipermail_index_url(list_id, info_url)
        idx_row = sim.fetch(idx_url)
        if idx_row is None:
            continue
        stack = list(reversed(eng.parse_month_index(idx_row["body"], idx_url)))
        j = 0
        while stack:
            month_url = stack.pop()
            mrow = sim.fetch(month_url)
            if mrow is None:
                break  # chain semantics: the stack travels with the month entry
            for t in eng.parse_month_threads(mrow["body"], month_url):
                t_key = okx(lk, 1, j)
                t_path = [list_id, t["tid"]]
                sim.emit_thread(t["url"], month_url, t_path, t["title"], okx(t_key, 0))
                stack_sp: list[str] = []
                for k, p in enumerate(t["posts"]):
                    advance_stack(stack_sp, p["depth"], p["num"])
                    prow = sim.fetch(p["url"])
                    if prow is None:
                        continue  # post failure: lineage-only on the crawler side
                    post = eng.parse_post_page(prow["body"], p["url"])
                    sim.emit_post(
                        p["url"], p["url"], t_path, list(stack_sp),
                        post["author"], post["time_iso"], post["content"],
                        okx(okx(t_key, 1, k), 0),
                    )
                j += 1
