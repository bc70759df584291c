"""DOM-backed HTML kernels — robustness fallback for ``html_generic``.

Same output contracts as the regex kernels (parse_board_page /
parse_thread_page / page_embeds / parse_crumbs / classify_page), but
driven by the tolerant stdlib DOM in ``dom.py``, so they survive what
real forum software emits and the attribute-ordered regexes cannot
parse: reordered attributes, extra classes, wrapper divs, whitespace.

The dialect kernels here select the way the reference's bs4 extractors
do — by id pattern / class / data-attribute, not by byte layout:

  phpbb     div[id=post_content(\\d+)] + p.author > (a|span).username*
            + time[datetime] | "» <date>" text     (phpbb.py:451-487)
  xenforo   article.message[data-author], id|data-content post-(\\d+),
            time in ul.message-attribution-main, div.bbWrapper
                                                   (xenforo.py:468-505)
  smf       div[id=msg_(\\d+)], div.poster > h4 (> a), month-name date
            in .smalltext free text        (simplemachines.py:403-436)
  proboards div[id=post-(\\d+)], abbr.time[data-timestamp] epoch-ms,
            a.o-user-link, div.message       (proboards.py:344-363)
  vbulletin div.b-post minus .b-comment rows, [data-node-id],
            div.author > a, time[itemprop=dateCreated],
            div.js-post__content-text        (vbulletin.py:349-371)
  invision  article[id=elComment_(\\d+)], h3.cAuthorPane_author > a,
            time[datetime], div[data-role=commentContent]
                                                  (invision.py:208-228)

Each kernel accepts BOTH the synthetic fixture markup (which carries
data-indent and compact author/date spans) and the realistic layout
shape above (tests/test_dom_fallback.py exercises hand-written
realistic snippets; no markup is copied from anywhere).

Content is recovered via ``Node.inner_html`` — a byte-exact substring
of the source page — so DOM-extracted content hashes identically to
the regex capture on well-formed input.
"""

from __future__ import annotations

import re
from datetime import datetime, timezone

from ..urlnorm import join_canon
from .dom import Node, parse_dom

KEEP_QUERIES = ("page",)


def _canon(href: str, base_url: str) -> str:
    return join_canon(href, base_url, keep_queries=KEEP_QUERIES)


def _first_anchor(node: Node) -> Node | None:
    return node.find("a")


def _node_images(content: Node, page_url: str) -> list[tuple[str, str]]:
    """<img> descendants of a post-content node, document order —
    data: URLs pass through raw (they carry their own payload)."""
    out = []
    for img in content.find_all("img"):
        src = img.get("src")
        if src is None:
            continue
        u = src if src.startswith("data:") else _canon(src, page_url)
        out.append((u, img.get("alt") or ""))
    return out


def page_title_dom(root: Node) -> str:
    t = root.find("title")
    return t.get_text() if t is not None else ""


def parse_board_page_dom(body: bytes, page_url: str) -> dict:
    root = parse_dom(body)
    subboards, threads = [], []
    for div in root.find_all("div", cls="board-item"):
        a = _first_anchor(div)
        if a is not None and a.get("href"):
            subboards.append((_canon(a.get("href"), page_url), a.get_text()))
    for div in root.find_all("div", cls="thread-item"):
        a = _first_anchor(div)
        if a is not None and a.get("href"):
            threads.append((_canon(a.get("href"), page_url), a.get_text()))
    nxt = root.find("a", cls="next")
    return {
        "title": page_title_dom(root),
        "subboards": subboards,
        "threads": threads,
        "next_url": _canon(nxt.get("href"), page_url) if nxt is not None and nxt.get("href") else None,
    }


def find_next_url_dom(body: bytes, page_url: str) -> str | None:
    root = parse_dom(body)
    nxt = root.find("a", cls="next")
    if nxt is not None and nxt.get("href"):
        return _canon(nxt.get("href"), page_url)
    return None


# ------------------------------------------------------------- dialects
_PHPBB_ID = re.compile(r"^post_content(\d+)$")
_XF_POST = re.compile(r"^post-(\d+)$")
_SMF_ID = re.compile(r"^msg_(\d+)$")
_PB_ID = re.compile(r"^post-(\d+)$")
_INV_ID = re.compile(r"^elComment_(\d+)")
_MONTH_DATE = re.compile(
    r"(January|February|March|April|May|June|July|August|September|October"
    r"|November|December|Yesterday|Today) [a-zA-Z0-9,: ]+"
)
_AFTER_RAQUO = re.compile(r"»(.+)", re.M)
_SMF_DATE_FMT = "%B %d, %Y, %H:%M"


def _climb_until(node: Node, pred, max_up: int = 8) -> Node | None:
    """Nearest enclosing ancestor satisfying ``pred``. The bound is 8
    (was 3): hostile real-world markup with unclosed wrapper tags
    nests the body several implicit levels deeper than the clean
    layout, and the nearest-match semantics keep multi-post pages
    scoped to their own row wrapper regardless of the bound."""
    cur = node
    for _ in range(max_up + 1):
        if cur is None:
            return None
        if pred(cur):
            return cur
        cur = cur.parent
    return None


def _freeform_iso(text: str) -> str:
    from .dates import parse_freeform

    return parse_freeform(text.strip()) or ""


def _posts_phpbb_dom(root: Node):
    for id_div in root.find_all("div", id_re=_PHPBB_ID):
        num = _PHPBB_ID.match(id_div.get("id")).group(1)
        container = _climb_until(id_div, lambda n: n.find("p", cls="author") is not None)
        if container is None:
            continue
        author_p = container.find("p", cls="author")
        user = author_p.find(("a", "span"), cls={"username", "username-coloured"})
        author = user.get_text() if user is not None else ""
        time_tag = author_p.find("time")
        if time_tag is not None and time_tag.get("datetime"):
            time_iso = time_tag.get("datetime")
        else:
            m = _AFTER_RAQUO.search(author_p.get_text())
            time_iso = _freeform_iso(m.group(1)) if m else ""
        content = container.find("div", cls="content")
        indent = container.get("data-indent") or "0"
        yield f"p{num}", author, time_iso, indent, (content.inner_html() if content is not None else "")


def _posts_xenforo_dom(root: Node):
    for art in root.find_all("article", cls="message"):
        # synthetic: id="post-N"; realistic XF2: data-content="post-N"
        # while id is "js-post-N" (reference keys on data-content,
        # xenforo.py:474-476) — accept whichever matches
        m = None
        for pid_src in (art.get("id"), art.get("data-content")):
            if pid_src:
                m = _XF_POST.match(pid_src)
                if m:
                    break
        if not m:
            continue
        author = art.get("data-author") or ""
        attribution = art.find("ul", cls="message-attribution-main")
        time_tag = (attribution or art).find("time")
        time_iso = time_tag.get("datetime") if time_tag is not None else ""
        content = art.find("div", cls="bbWrapper")
        indent = art.get("data-indent") or "0"
        yield f"p{m.group(1)}", author, time_iso or "", indent, (
            content.inner_html() if content is not None else ""
        )


def _posts_smf_dom(root: Node):
    for msg_div in root.find_all("div", id_re=_SMF_ID):
        num = _SMF_ID.match(msg_div.get("id")).group(1)
        inner = msg_div.find("div", cls="inner")
        if inner is not None:  # synthetic layout: self-contained row
            h4 = msg_div.find("h4", cls="author")
            author = h4.get_text().strip() if h4 is not None else ""
            date_el = msg_div.find("span", cls="date")
            date_text = date_el.get_text() if date_el is not None else ""
            content = inner.inner_html()
        else:  # realistic layout: msg div is the body, poster pane is a sibling
            wrapper = _climb_until(msg_div, lambda n: n.find("div", cls="poster") is not None)
            if wrapper is None:
                continue
            h4 = wrapper.find("div", cls="poster").find("h4")
            a = h4.find("a") if h4 is not None else None
            author = (a.get_text() if a is not None else h4.get_text() if h4 is not None else "").strip()
            small = wrapper.find(("a", "div", "span"), cls="smalltext")
            dm = _MONTH_DATE.search(small.get_text()) if small is not None else None
            date_text = dm.group(0) if dm else ""
            content = msg_div.inner_html()
        try:
            time_iso = datetime.strptime(date_text, _SMF_DATE_FMT).isoformat()
        except ValueError:
            time_iso = _freeform_iso(date_text)
        indent = msg_div.get("data-indent") or "0"
        yield f"p{num}", author, time_iso, indent, content


def _posts_proboards_dom(root: Node):
    for div in root.find_all("div", id_re=_PB_ID):
        ts = div.get("data-timestamp")
        if ts is None:
            abbr = div.find("abbr", cls="time")
            ts = abbr.get("data-timestamp") if abbr is not None else None
        if ts is None:
            continue
        num = _PB_ID.match(div.get("id")).group(1)
        user = div.find("span", cls="author") or div.find("a", cls="o-user-link")
        author = user.get_text() if user is not None else ""
        # realistic ProBoards keeps the body in div.message and uses
        # div.content as a wrapper (proboards.py:349); synthetic pages
        # have only div.content — prefer .message when present
        content = div.find("div", cls="message") or div.find("div", cls="content")
        dt = datetime.fromtimestamp(int(ts) / 1000, tz=timezone.utc)
        indent = div.get("data-indent") or "0"
        yield f"p{num}", author, dt.replace(tzinfo=None).isoformat(), indent, (
            content.inner_html() if content is not None else ""
        )


def _posts_vbulletin_dom(root: Node):
    for div in root.find_all("div", cls="b-post"):
        if "b-comment" in div.classes():  # reference skips comment rows
            continue
        pid = div.get("data-node-id")
        if pid is None:
            continue
        author_div = div.find("div", cls="author")
        a = author_div.find("a") if author_div is not None else None
        author = a.get_text() if a is not None else ""
        time_tag = div.find("time", attrs={"itemprop": "dateCreated"})
        time_iso = time_tag.get("datetime") if time_tag is not None else ""
        content = div.find("div", cls="js-post__content-text")
        indent = div.get("data-indent") or "0"
        yield f"p{pid}", author, time_iso or "", indent, (
            content.inner_html() if content is not None else ""
        )


def _posts_invision_dom(root: Node):
    for art in root.find_all("article", id_re=_INV_ID):
        num = _INV_ID.match(art.get("id")).group(1)
        pane = art.find("div", cls="cAuthorPane_content") or art
        h3 = pane.find("h3", cls="cAuthorPane_author")
        a = h3.find("a") if h3 is not None else None
        author = (a or h3).get_text() if h3 is not None else ""
        time_tag = pane.find("time")
        time_iso = time_tag.get("datetime") if time_tag is not None else ""
        content = art.find("div", attrs={"data-role": "commentContent"})
        indent = art.get("data-indent") or "0"
        yield f"p{num}", author, time_iso or "", indent, (
            content.inner_html() if content is not None else ""
        )


def _posts_generic_dom(root: Node):
    for div in root.find_all("div", cls="post"):
        pid = div.get("id")
        if pid is None or div.get("data-author") is None:
            continue
        content = div.find("div", cls="content")
        yield (
            pid,
            div.get("data-author") or "",
            div.get("data-time") or "",
            div.get("data-indent") or "0",
            content.inner_html() if content is not None else "",
        )


DIALECT_KERNELS_DOM = {
    "generic": _posts_generic_dom,
    "phpbb": _posts_phpbb_dom,
    "xenforo": _posts_xenforo_dom,
    "smf": _posts_smf_dom,
    "proboards": _posts_proboards_dom,
    "vbulletin": _posts_vbulletin_dom,
    "invision": _posts_invision_dom,
}


def _detect_dialect_dom(root: Node) -> str:
    meta = root.find("meta", attrs={"name": "dialect"})
    if meta is not None and meta.get("content"):
        return meta.get("content")
    return "generic"


def parse_thread_page_dom(body: bytes, page_url: str) -> dict:
    root = parse_dom(body)
    dialect = _detect_dialect_dom(root)
    extract = DIALECT_KERNELS_DOM.get(dialect, _posts_generic_dom)
    posts = []
    for pid, author, time_iso, indent, content in extract(root):
        content_root = parse_dom(content) if "<img" in content else None
        images = _node_images(content_root, page_url) if content_root is not None else []
        posts.append(
            {
                "pid": pid,
                "author": author,
                "time_iso": time_iso,
                "indent": int(indent),
                "content": content.strip(),
                "images": images,
            }
        )
    nxt = root.find("a", cls="next")
    next_url = _canon(nxt.get("href"), page_url) if nxt is not None and nxt.get("href") else None
    return {"title": page_title_dom(root), "posts": posts, "next_url": next_url}


def classify_page_dom(body: bytes) -> str:
    root = parse_dom(body)
    if root.find("div", cls={"board-item", "thread-item"}) is not None:
        return "board"
    dialect = _detect_dialect_dom(root)
    extract = DIALECT_KERNELS_DOM.get(dialect, _posts_generic_dom)
    for _ in extract(root):
        return "thread"
    if dialect == "generic":
        # a dialect page whose meta was stripped: any dialect kernel hit
        for kern in DIALECT_KERNELS_DOM.values():
            for _ in kern(root):
                return "thread"
    return "board"


def page_embeds_dom(body: bytes, page_url: str) -> list[dict]:
    """Document-order embed walk, mirroring the reference's single
    soup.select over link/embed/audio/img/object/svg (common.py:493-495)
    and the regex alternation's emit order: an <audio> emits one row per
    <source> child and its subtree is not revisited."""
    root = parse_dom(body)
    out: list[dict] = []

    def walk(node: Node) -> None:
        for c in node.children:
            if not isinstance(c, Node):
                continue
            if c.tag == "link" and c.get("rel") == "stylesheet" and c.get("href"):
                out.append({"url": _canon(c.get("href"), page_url), "content_type": None, "content_bytes": None})
            elif c.tag == "embed" and c.get("src"):
                src = c.get("src")
                u = src if src.startswith("data:") else _canon(src, page_url)
                out.append({"url": u, "content_type": None, "content_bytes": None})
            elif c.tag == "audio":
                for s in c.find_all("source"):
                    if s.get("src"):
                        out.append({"url": _canon(s.get("src"), page_url), "content_type": None, "content_bytes": None})
                continue  # sources consumed; do not revisit subtree
            elif c.tag == "object" and c.get("data"):
                out.append({"url": _canon(c.get("data"), page_url), "content_type": None, "content_bytes": None})
            elif c.tag == "svg":
                out.append({"url": None, "content_type": "image/svg+xml", "content_bytes": c.inner_html().encode()})
                continue
            elif c.tag == "img" and c.get("src"):
                src = c.get("src")
                u = src if src.startswith("data:") else _canon(src, page_url)
                out.append({"url": u, "content_type": None, "content_bytes": None})
            walk(c)

    walk(root)
    return out


def parse_crumbs_dom(body: bytes, page_url: str) -> list[tuple[str, str]]:
    root = parse_dom(body)
    nav = root.find("nav", cls="crumbs")
    if nav is None:
        return []
    return [
        (_canon(a.get("href"), page_url), a.get_text())
        for a in nav.find_all("a")
        if a.get("href")
    ]
