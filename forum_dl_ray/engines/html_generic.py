"""Generic HTML forum engine (the reference's ``HtmlExtractor`` shape).

The reference's minimal HTML engine is 4 CSS selectors + 2 row-extract
methods (/root/reference/forum_dl/extractors/common.py:404-478, e.g.
invision.py:75-78). Here the same contract is expressed as pure
functions over page bytes with compiled regexes (this container has no
bs4/lxml; the fixture HTML is attribute-ordered, making regex kernels
exact — a DOM-based adapter drops in behind the same function
signatures for arbitrary engines).

Selector analogs:
  _board_item_css   -> BOARD_ITEM_RE
  _board_next_page_css / _thread_next_page_css -> NEXT_RE
  _thread_item_css  -> THREAD_ITEM_RE
  post row extract  -> POST_RE (+ IMG_RE for embeds, common.py:480-569)

All URLs are canonicalized with keep_queries=("page",) so pagination
cursors survive normalization (common.py:35-62 semantics).
"""

from __future__ import annotations

import re
from ..urlnorm import join_canon

MARKER = b'<meta name="generator" content="synthforum/1.0">'

BOARD_ITEM_RE = re.compile(r'<div class="board-item"><a href="([^"]+)">([^<]*)</a></div>')
THREAD_ITEM_RE = re.compile(r'<div class="thread-item"><a href="([^"]+)">([^<]*)</a></div>')
NEXT_RE = re.compile(r'<a class="next" href="([^"]+)">')
TITLE_RE = re.compile(r"<title>([^<]*)</title>")
CRUMB_RE = re.compile(r'<nav class="crumbs">(.*?)</nav>', re.S)
CRUMB_LINK_RE = re.compile(r'<a href="([^"]+)">([^<]*)</a>')
POST_RE = re.compile(
    r'<div class="post" id="([^"]+)" data-author="([^"]*)" data-time="([^"]*)"'
    r' data-indent="(\d+)">\s*<div class="content">(.*?)</div>\s*</div>',
    re.S,
)
IMG_RE = re.compile(r'<img src="([^"]+)" alt="([^"]*)">')

KEEP_QUERIES = ("page",)


def canon(href: str, base_url: str) -> str:
    return join_canon(href, base_url, keep_queries=KEEP_QUERIES)


def detect(url: str, body: bytes) -> bool:
    # attribute-order-tolerant: real generators reorder meta attrs; the
    # value token is order-invariant (DOM fallback rationale in dom.py)
    head = body[:4096]
    return MARKER in head or b'content="synthforum/1.0"' in head


def page_title(body: bytes) -> str:
    m = TITLE_RE.search(body.decode("utf-8", "replace"))
    return m.group(1) if m else ""


def classify_page(body: bytes) -> str:
    """'board' or 'thread' — the J5 node_from_url classification
    (reference common.py:291-298 + per-engine _get_node_from_url):
    a page with post rows and no board/thread item rows is a thread.
    Shared by the crawler seed parse and the golden walker so both
    sides classify identically."""
    text = body.decode("utf-8", "replace")
    if BOARD_ITEM_RE.search(text) or THREAD_ITEM_RE.search(text):
        return "board"
    if POST_RE.search(text) or DIALECT_RE.search(text):
        return "thread"
    # regexes saw nothing: attribute-reordered page (or an empty board).
    # The tolerant DOM classifies by structure, not byte layout (M4).
    from . import html_dom

    return html_dom.classify_page_dom(body)


def board_path_from_crumbs(body: bytes, page_url: str) -> list[str]:
    """Board-id path of a page via its breadcrumb trail — the J2
    breadcrumb→board lookup (reference find_board_from_urls,
    common.py:273-289), page-local here because the crumb URLS carry
    the ids."""
    ids = []
    for href, _title in parse_crumbs(body, page_url):
        if "/board/" in href:
            ids.append(href.rstrip("/").rsplit("/", 1)[-1].split("?")[0])
    return ids


def parse_board_page(body: bytes, page_url: str) -> dict:
    """Board page → subboard links, thread links, next-page cursor.

    Mirrors the reference's board-page walk (common.py:410-436): select
    item rows, extract (url, title) per row, then the next-page link.
    """
    text = body.decode("utf-8", "replace")
    subboards = [(canon(h, page_url), t) for h, t in BOARD_ITEM_RE.findall(text)]
    threads = [(canon(h, page_url), t) for h, t in THREAD_ITEM_RE.findall(text)]
    m = NEXT_RE.search(text)
    next_url = canon(m.group(1), page_url) if m else None
    if next_url is None and 'class="next"' in text:
        # pagination anchor present but attribute-reordered: the regex
        # missed it; losing it would truncate the crawl. DOM recovers it.
        from . import html_dom

        next_url = html_dom.find_next_url_dom(body, page_url)
    return {
        "title": page_title(body),
        "subboards": subboards,
        "threads": threads,
        "next_url": next_url,
    }


def parse_thread_page(body: bytes, page_url: str) -> dict:
    """Thread page → post rows (+ their embeds) and next-page cursor.

    Mirrors common.py:438-478: select post rows, per-row field
    extraction (id/author/time/indent/content), then re-parse each post
    body for embedded files (common.py:480-569 — here <img> only; the
    fixture site embeds images exclusively).

    Post-row markup DIALECTS model the reference's per-engine field
    extractors (M8-M13): the page declares its dialect via a meta tag
    and the matching kernel extracts id/author/time/content from that
    engine family's layout, normalizing every date style to ISO
    (M17). Unknown/absent dialect falls back to the generic layout.
    """
    text = body.decode("utf-8", "replace")
    m = DIALECT_RE.search(text)
    dialect = m.group(1) if m else "generic"
    extract = DIALECT_KERNELS.get(dialect, _posts_generic)
    posts = []
    for pid, author, time_iso, indent, content in extract(text):
        # data: URLs pass through raw — they carry their own payload and
        # must not be canonicalized or fetched (writers/common.py:161-187)
        images = [
            (src if src.startswith("data:") else canon(src, page_url), alt)
            for src, alt in IMG_RE.findall(content)
        ]
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
    m = NEXT_RE.search(text)
    next_url = canon(m.group(1), page_url) if m else None
    if not posts:
        # zero post rows from the regex kernels: either a genuinely
        # empty thread page (rare) or attribute-reordered markup the
        # byte-layout regexes cannot see. One tolerant DOM pass decides
        # — its inner_html content is a byte-exact source substring, so
        # a DOM hit hashes identically to what the regex would have
        # captured on ordered markup (M4; dom.py module doc).
        from . import html_dom

        dom_res = html_dom.parse_thread_page_dom(body, page_url)
        if dom_res["posts"]:
            if next_url is not None:
                dom_res["next_url"] = next_url
            return dom_res
    if next_url is None and 'class="next"' in text:
        from . import html_dom

        next_url = html_dom.find_next_url_dom(body, page_url)
    return {"title": page_title(body), "posts": posts, "next_url": next_url}


# ------------------------------------------------ post-extraction dialects
DIALECT_RE = re.compile(r'<meta name="dialect" content="([a-z]+)">')

# phpBB family (reference phpbb.py:451-487): id from post_content(\d+),
# author in a username span, time in <time datetime=...>
PHPBB_POST_RE = re.compile(
    r'<div class="post_content" id="post_content(\d+)" data-indent="(\d+)">\s*'
    r'<p class="author"><span class="username">([^<]*)</span> » '
    r'<time datetime="([^"]*)"></time></p>\s*'
    r'<div class="content">(.*?)</div>\s*</div>',
    re.S,
)

# XenForo family (xenforo.py:468-505): article.message, data-author,
# id post-(\d+), content in .bbWrapper
XENFORO_POST_RE = re.compile(
    r'<article class="message" data-author="([^"]*)" id="post-(\d+)"'
    r' data-indent="(\d+)">\s*<time datetime="([^"]*)"></time>\s*'
    r'<div class="bbWrapper">(.*?)</div>\s*</article>',
    re.S,
)

# SMF family (simplemachines.py:403-436): id msg_(\d+), free-text date
# parsed by month-name pattern (dateparser stand-in: fixed strptime)
SMF_POST_RE = re.compile(
    r'<div class="smf-post" id="msg_(\d+)" data-indent="(\d+)">\s*'
    r'<h4 class="author">([^<]*)</h4>\s*<span class="date">([^<]*)</span>\s*'
    r'<div class="inner">(.*?)</div>\s*</div>',
    re.S,
)
_SMF_DATE_FMT = "%B %d, %Y, %H:%M"

# ProBoards family (proboards.py:344-363): id post-(\d+), epoch-millis
# data-timestamp
PROBOARDS_POST_RE = re.compile(
    r'<div class="pb-post" id="post-(\d+)" data-timestamp="(\d+)"'
    r' data-indent="(\d+)">\s*<span class="author">([^<]*)</span>\s*'
    r'<div class="content">(.*?)</div>\s*</div>',
    re.S,
)


def _posts_generic(text: str):
    for pid, author, time_iso, indent, content in POST_RE.findall(text):
        yield pid, author, time_iso, indent, content


def _posts_phpbb(text: str):
    for num, indent, author, time_iso, content in PHPBB_POST_RE.findall(text):
        yield f"p{num}", author, time_iso, indent, content


def _posts_xenforo(text: str):
    for author, num, indent, time_iso, content in XENFORO_POST_RE.findall(text):
        yield f"p{num}", author, time_iso, indent, content


def _posts_smf(text: str):
    """SMF dates are free text the reference feeds to dateparser
    (simplemachines.py:434); the strict month-name format is tried
    first (the fixture's default style), then the full freeform kernel
    (engines/dates.py, M17) for the other real-world styles."""
    from datetime import datetime

    from .dates import parse_freeform

    for num, indent, author, date_text, content in SMF_POST_RE.findall(text):
        try:
            time_iso = datetime.strptime(date_text, _SMF_DATE_FMT).isoformat()
        except ValueError:
            time_iso = parse_freeform(date_text) or ""
        yield f"p{num}", author, time_iso, indent, content


def _posts_proboards(text: str):
    from datetime import datetime, timezone

    for num, millis, indent, author, content in PROBOARDS_POST_RE.findall(text):
        # epoch millis -> naive UTC (fromtimestamp without tz would be
        # machine-local and non-deterministic)
        dt = datetime.fromtimestamp(int(millis) / 1000, tz=timezone.utc)
        yield f"p{num}", author, dt.replace(tzinfo=None).isoformat(), indent, content


# vBulletin family (reference vbulletin.py:349-371): data-node-id row
# ids, author in div.author > a, <time itemprop="dateCreated">, content
# in .js-post__content-text; rows whose class list contains `b-comment`
# are SKIPPED ("No support for comments for now", vbulletin.py:352-354)
VBULLETIN_POST_RE = re.compile(
    r'<div class="b-post( b-comment)?" data-node-id="([^"]+)" data-indent="(\d+)">\s*'
    r'<div class="author"><a>([^<]*)</a></div>\s*'
    r'<time itemprop="dateCreated" datetime="([^"]*)"></time>\s*'
    r'<div class="js-post__content-text">(.*?)</div>\s*</div>',
    re.S,
)

# Invision family (reference invision.py:208-228): elComment_(\d+) row
# ids, author h3.cAuthorPane_author > a in the cAuthorPane pane, ISO
# <time datetime>, content in div[data-role=commentContent]
INVISION_POST_RE = re.compile(
    r'<article class="ipsComment" id="elComment_(\d+)" data-indent="(\d+)">\s*'
    r'<div class="cAuthorPane_content">\s*'
    r'<h3 class="cAuthorPane_author"><a>([^<]*)</a></h3>\s*'
    r'<time datetime="([^"]*)"></time></div>\s*'
    r'<div data-role="commentContent">(.*?)</div>\s*</article>',
    re.S,
)


def _posts_vbulletin(text: str):
    for comment, num, indent, author, time_iso, content in VBULLETIN_POST_RE.findall(text):
        if comment:  # b-comment row: reference skips comments
            continue
        yield f"p{num}", author, time_iso, indent, content


def _posts_invision(text: str):
    for num, indent, author, time_iso, content in INVISION_POST_RE.findall(text):
        yield f"p{num}", author, time_iso, indent, content


DIALECT_KERNELS = {
    "generic": _posts_generic,
    "phpbb": _posts_phpbb,
    "xenforo": _posts_xenforo,
    "smf": _posts_smf,
    "proboards": _posts_proboards,
    "vbulletin": _posts_vbulletin,
    "invision": _posts_invision,
}


# ------------------------------------------------- page-level embeds (M7)
# one alternation regex = document order, mirroring the reference's single
# soup.select('link[rel=stylesheet], embed, audio, img, object, svg, video')
# pass (common.py:493-495). `video` matches the reference selector but has
# no extraction branch there — mirrored here by omission.
PAGE_EMBED_RE = re.compile(
    r'<link rel="stylesheet" href="(?P<css>[^"]+)">'
    r'|<embed src="(?P<emb>[^"]+)">'
    r'|<audio>\s*(?P<audio>(?:<source src="[^"]+">\s*)+)</audio>'
    r'|<object data="(?P<obj>[^"]+)"></object>'
    r'|<svg>(?P<svg>.*?)</svg>'
    r'|<img src="(?P<img>[^"]+)" alt="[^"]*">',
    re.S,
)
AUDIO_SOURCE_RE = re.compile(r'<source src="([^"]+)">')
# loose tag census: counts embed-candidate tags irrespective of
# attribute order; a mismatch vs the strict alternation's hit count
# means some tag was attribute-reordered -> take the DOM walk instead
_EMBED_CENSUS_RE = re.compile(r"<(?:link|embed|object|img|source)\b|<svg>")


def page_embeds(body: bytes, page_url: str) -> list[dict]:
    """All embed objects of a page in document order (common.py:481-569):
    css links, embeds, audio sources, imgs, objects, and inline svg
    (which carries its own content instead of a URL). The caller
    anti-joins post-content URLs out of this set (J1,
    common.py:457-459) — img hits here deliberately include the
    post-content ones so the anti-join is real."""
    text = body.decode("utf-8", "replace")
    out: list[dict] = []
    n_loose = len(_EMBED_CENSUS_RE.findall(text))
    for m in PAGE_EMBED_RE.finditer(text):
        if m.group("svg") is not None:
            out.append(
                {"url": None, "content_type": "image/svg+xml",
                 "content_bytes": m.group("svg").encode()}
            )
        elif m.group("audio") is not None:
            for src in AUDIO_SOURCE_RE.findall(m.group("audio")):
                out.append({"url": canon(src, page_url), "content_type": None,
                            "content_bytes": None})
        else:
            src = m.group("css") or m.group("emb") or m.group("obj") or m.group("img")
            u = src if src.startswith("data:") else canon(src, page_url)
            out.append({"url": u, "content_type": None, "content_bytes": None})
    if len(out) != n_loose:
        # some embed tag exists that the ordered alternation missed
        # (attribute-reordered markup) — document-order DOM walk instead
        from . import html_dom

        return html_dom.page_embeds_dom(body, page_url)
    return out


def parse_crumbs(body: bytes, page_url: str) -> list[tuple[str, str]]:
    """Breadcrumb (url, title) list — the lookup key stream for the
    broadcast board-tree join J2 (common.py:273-289)."""
    text = body.decode("utf-8", "replace")
    m = CRUMB_RE.search(text)
    if not m:
        if "crumbs" in text:  # nav present but attribute-reordered
            from . import html_dom

            return html_dom.parse_crumbs_dom(body, page_url)
        return []
    return [(canon(h, page_url), t) for h, t in CRUMB_LINK_RE.findall(m.group(1))]
