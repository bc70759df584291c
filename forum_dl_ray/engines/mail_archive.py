"""Mailman/pipermail-style mail-archive engine (M16).

Models the reference's mail-archive extractor family — pipermail
(/root/reference/forum_dl/extractors/pipermail.py:18-19,293-346),
hypermail (hypermail.py:179-229), hyperkitty (hyperkitty.py:246-331) —
whose shared trait is the ST4 ``relative_urls`` cursor style: the
board's month-page URL list is discovered UP FRONT from the archive
index and carried as a shrinking stack in the page-state cursor, one
month popped per board page step (pipermail.py:201-259).

Site shape (synthetic, one host):
  /mailman/listinfo                     -> list index (the seed; detect marker)
  /mailman/listinfo/<list>              -> per-list info page ("<X> Info Page" title)
  /pipermail/<list>/                    -> month index (YYYY-Month/thread.html anchors)
  /pipermail/<list>/<YYYY-Month>/thread.html
        -> threaded month page: `<!--0 LONGID- -->` root comments and
           `<!--d LONGID-chain- -->` child comments, each followed by an
           `<a href="NNNNNN.html">subject</a>` anchor
           (pipermail.py:56-59 comment regexes, :226-259 root walk,
           :280-318 chain-depth subpath reconstruction)
  /pipermail/<list>/<YYYY-Month>/<NNNNNN>.html
        -> one post: <b>author</b>, <i>free-text date</i>, <pre>content</pre>
           (pipermail.py:320-346 _fetch_post)

Divergence from the reference, by design: the month thread.html is
parsed ONCE for both thread roots and reply chains (the reference
re-fetches it per thread through its response cache); per-post pages
are still fetched individually, so the seen set covers every post URL.
"""

from __future__ import annotations

import re
from datetime import datetime

from ..urlnorm import join_canon

MARKER = b'<meta name="generator" content="synthmailman/1.0">'

TITLE_RE = re.compile(r"<title>([^<]*)</title>")
LISTINFO_HREF_RE = re.compile(r'<a href="listinfo/([^"]+)">([^<]*)</a>')
INFO_TITLE_RE = re.compile(r"^(.+) Info Page$")
MONTH_HREF_RE = re.compile(
    r'<a href="(\d\d\d\d-(?:January|February|March|April|May|June|July|August'
    r'|September|October|November|December)/thread\.html)">'
)
# `<!--0 LONGID- -->` (root) / `<!--d LONGID-c1-c2- -->` (child, depth =
# chain length) followed by the post anchor — pipermail.py:56-59
COMMENT_POST_RE = re.compile(
    r"<!--(\d) ([^ -]+)-([^>]*?)-? -->\s*" r'<a href="(\d+)\.html">([^<]*)</a>'
)
AUTHOR_RE = re.compile(r"<b>([^<]*)</b>")
DATE_RE = re.compile(r"<i>([^<]*)</i>")
PRE_RE = re.compile(r"<pre>(.*?)</pre>", re.S)

# hypermail post-page style (hypermail.py:203-229): Author/Date meta
# tags, content = siblings after the <address> block
HM_AUTHOR_RE = re.compile(r'<meta name="Author" content="([^"]*)">')
HM_DATE_RE = re.compile(r'<meta name="Date" content="([^"]*)">')
HM_TAIL_RE = re.compile(r"</address>(.*?)</body>", re.S)

# hyperkitty post-page style (hyperkitty.py:246-271): email-author /
# time span[title="Sender's time: ..."] / email-body divs
HK_AUTHOR_RE = re.compile(r'<div class="email-author"><a>([^<]*)</a></div>')
HK_TIME_RE = re.compile(r'<div class="time"><span title="Sender\'s time: ([^"]*)">')
HK_BODY_RE = re.compile(r'<div class="email-body">(.*?)</div>', re.S)

# pipermail's free-text date (dateparser stand-in, M17: one more fixed
# format — zero-padded day keeps strptime exact)
DATE_FMT = "%a %b %d %H:%M:%S %Y"
# hypermail's Date meta is RFC-2822-shaped (M17: third date style)
HM_DATE_FMT = "%a, %d %b %Y %H:%M:%S %z"


def canon(href: str, base_url: str) -> str:
    return join_canon(href, base_url)


def detect(url: str, body: bytes) -> bool:
    return MARKER in body[:4096]


def listinfo_url(base: str) -> str:
    return canon("/mailman/listinfo", base)


def pipermail_index_url(list_id: str, base_url: str) -> str:
    return canon(f"/pipermail/{list_id}/", base_url)


def parse_listinfo(body: bytes, page_url: str) -> dict:
    """Seed list index → site title + [(list_id, listinfo_url)] in page
    order (reference _fetch_lazy_subboards, pipermail.py:186-196)."""
    text = body.decode("utf-8", "replace")
    m = TITLE_RE.search(text)
    lists = [
        (lid, canon(f"/mailman/listinfo/{lid}", page_url))
        for lid, _label in LISTINFO_HREF_RE.findall(text)
    ]
    return {"title": m.group(1) if m else "", "lists": lists}


def parse_info_title(body: bytes) -> str:
    """'<X> Info Page' → X (reference _listinfo_title_regex)."""
    m = TITLE_RE.search(body.decode("utf-8", "replace"))
    if not m:
        return ""
    m2 = INFO_TITLE_RE.match(m.group(1))
    return m2.group(1) if m2 else m.group(1)


def parse_month_index(body: bytes, page_url: str) -> list[str]:
    """Archive index → month thread.html URLs in PAGE order. The caller
    reverses this into the relative_urls stack and pops from the end —
    exactly pipermail.py:226-238."""
    text = body.decode("utf-8", "replace")
    return [canon(href, page_url) for href in MONTH_HREF_RE.findall(text)]


def parse_month_threads(body: bytes, page_url: str) -> list[dict]:
    """Month thread.html → [{tid, url, title, posts:[{num, url, depth}]}].

    Roots are depth-0 comments; a child's depth is its long-id chain
    length (pipermail.py:280-318 — the leading digit saturates at 3 in
    real pipermail, the chain carries the true depth)."""
    text = body.decode("utf-8", "replace")
    # post hrefs are siblings of thread.html; the canonicalizer's
    # trailing slash would otherwise make urljoin treat thread.html/ as
    # a directory (reference joins against the unslashed state.url)
    base = page_url[:-len("thread.html/")] if page_url.endswith("thread.html/") else page_url
    threads: list[dict] = []
    for digit, _long_id, chain, num, title in COMMENT_POST_RE.findall(text):
        url = canon(f"{num}.html", base)
        if digit == "0":
            threads.append(
                {"tid": num, "url": url, "title": title,
                 "posts": [{"num": num, "url": url, "depth": 0}]}
            )
        elif threads:
            depth = len([c for c in chain.split("-") if c]) or int(digit)
            threads[-1]["posts"].append({"num": num, "url": url, "depth": depth})
    return threads


def parse_post_page(body: bytes, page_url: str) -> dict:
    """Post page → (author, time_iso, content), dispatching on the
    page's own markup style — the three mail-archive families share the
    crawl/cursor structure and differ only here:

    - hypermail (hypermail.py:203-229): Author/Date meta tags, content
      = siblings after <address>, RFC-2822 date;
    - hyperkitty (hyperkitty.py:246-271): email-author / time-span
      title ("Sender's time: ...") / email-body divs, free-text date;
    - pipermail (pipermail.py:320-346): <b> author, <i> free-text
      date, <pre> content with `><i>...</i>` quote wrappers stripped.
    """
    text = body.decode("utf-8", "replace")
    hm = HM_AUTHOR_RE.search(text)
    if hm:  # hypermail
        dm = HM_DATE_RE.search(text)
        time_iso = ""
        if dm:
            from datetime import timezone

            dt = datetime.strptime(dm.group(1), HM_DATE_FMT)
            time_iso = dt.astimezone(timezone.utc).replace(tzinfo=None).isoformat()
        tail = HM_TAIL_RE.search(text)
        return {
            "author": hm.group(1),
            "time_iso": time_iso,
            "content": tail.group(1).strip() if tail else "",
        }
    hk = HK_AUTHOR_RE.search(text)
    if hk:  # hyperkitty
        tm = HK_TIME_RE.search(text)
        bm = HK_BODY_RE.search(text)
        time_iso = datetime.strptime(tm.group(1), DATE_FMT).isoformat() if tm else ""
        return {
            "author": hk.group(1),
            "time_iso": time_iso,
            "content": bm.group(1).strip() if bm else "",
        }
    am = AUTHOR_RE.search(text)  # pipermail
    dm = DATE_RE.search(text)
    pm = PRE_RE.search(text)
    time_iso = ""
    if dm:
        time_iso = datetime.strptime(dm.group(1), DATE_FMT).isoformat()
    content = pm.group(1).strip() if pm else ""
    content = re.sub(r"><i>(.*?\n)</i>", r">\1", content)
    return {
        "author": am.group(1) if am else "",
        "time_iso": time_iso,
        "content": content,
    }
