"""Mail-archive (pipermail-style) synthetic site (M16 / ST4 stack cursor).

Spec-field mapping: ``n_top_boards`` = mailing lists per host,
``threads_per_board`` = threads per list, ``threads_per_page`` =
threads per MONTH page (months = ceil(threads/threads_per_page) — the
month chain is this engine's pagination), ``posts_per_thread`` = posts
per thread (root + replies, reply depth capped by the pipermail chain
encoding). No images: mail archives carry none, and the engine's
distinguishing surface is the month-URL stack cursor, not assets.
"""

from __future__ import annotations

from datetime import timedelta

from ..engines.mail_archive import DATE_FMT, MARKER
from ..urlnorm import normalize_url
from .synth import SiteSpec, _EPOCH, _sentence
from .synth_json import _JsonSiteBase

_MONTHS = [
    "January", "February", "March", "April", "May", "June",
    "July", "August", "September", "October", "November", "December",
]


def build_mail_archive_site(spec: SiteSpec) -> tuple[list[dict], list[dict]]:
    b = _JsonSiteBase(spec)
    marker = MARKER.decode()

    def add_html(path: str, body: str, kind: str, status: int = 200) -> str:
        url = normalize_url(b.base + path)
        b.add_page(url, kind, body.encode() if status == 200 else b"",
                   status=status, content_type="text/html")
        return url

    lists = [f"list{i + 1}" for i in range(spec.n_top_boards)]
    anchors = "".join(
        f'<a href="listinfo/{lid}">{lid.capitalize()}</a>' for lid in lists
    )
    add_html(
        "/mailman/listinfo",
        f"<html><head>{marker}<title>Mailing Lists of {b.host_tag}</title>"
        f"</head><body>{anchors}</body></html>",
        "mail_listinfo",
    )

    post_n = 0
    for lid in lists:
        add_html(
            f"/mailman/listinfo/{lid}",
            f"<html><head>{marker}<title>{lid.capitalize()} Info Page</title>"
            f"</head><body><p>About {lid}.</p></body></html>",
            "mail_list",
        )

        threads = []
        for _ in range(spec.threads_per_board):
            post_n += 1
            threads.append(
                {"root": post_n,
                 "title": f"[{lid.capitalize()}] {_sentence(b.rng, f'm{post_n}')[:48]}"}
            )
            # replies numbered after their root, depth walk capped at 3
            depth, replies = 0, []
            for _ in range(spec.posts_per_thread - 1):
                post_n += 1
                depth = min(3, max(1, depth + int(b.rng.integers(-1, 2))))
                replies.append({"num": post_n, "depth": depth})
            threads[-1]["replies"] = replies

        per_month = max(1, spec.threads_per_page)
        n_months = max(1, -(-len(threads) // per_month))
        month_names = [
            f"2020-{_MONTHS[m % 12]}" if m < 12 else f"{2020 + m // 12}-{_MONTHS[m % 12]}"
            for m in range(n_months)
        ]
        month_anchors = "".join(
            f'<a href="{mn}/thread.html">{mn}</a>' for mn in month_names
        )
        add_html(
            f"/pipermail/{lid}/",
            f"<html><head>{marker}<title>The {lid.capitalize()} Archives</title>"
            f"</head><body>{month_anchors}</body></html>",
            "mail_month_index",
        )

        for m, mn in enumerate(month_names):
            chunk = threads[m * per_month:(m + 1) * per_month]
            rows = []
            for t in chunk:
                long_id = f"L{t['root']:06d}"
                rows.append(
                    f"<!--0 {long_id}- -->\n"
                    f'<a href="{t["root"]:06d}.html">{t["title"]}</a>'
                )
                for r in t["replies"]:
                    chain = "-".join(f"C{r['num']:06d}x{d}" for d in range(r["depth"]))
                    rows.append(
                        f"<!--{min(3, r['depth'])} {long_id}-{chain}- -->\n"
                        f'<a href="{r["num"]:06d}.html">Re: {t["title"]}</a>'
                    )
            add_html(
                f"/pipermail/{lid}/{mn}/thread.html",
                f"<html><head>{marker}<title>The {mn} Archive by thread</title>"
                f"</head><body>\n" + "\n".join(rows) + "\n</body></html>",
                "mail_month",
            )
            for t in chunk:
                for num, title in (
                    [(t["root"], t["title"])]
                    + [(r["num"], f"Re: {t['title']}") for r in t["replies"]]
                ):
                    author = f"user{int(b.rng.integers(1, 20))} at {b.host_tag}"
                    when_dt = _EPOCH + timedelta(minutes=num)
                    body_txt = _sentence(b.rng, f"{num:06d}")
                    style = spec.archive_style
                    if style == "hypermail":
                        rfc = when_dt.strftime("%a, %d %b %Y %H:%M:%S +0000")
                        page = (
                            f"<html><head>{marker}<title>{title}</title>"
                            f'<meta name="Author" content="{author}">'
                            f'<meta name="Date" content="{rfc}">'
                            f"</head><body><address>{author}</address>"
                            f"<p>{body_txt}</p><p>more text</p></body></html>"
                        )
                    elif style == "hyperkitty":
                        when = when_dt.strftime(DATE_FMT)
                        page = (
                            f"<html><head>{marker}<title>{title}</title></head><body>"
                            f'<div class="email-author"><a>{author}</a></div>'
                            f'<div class="time"><span title="Sender\'s time: {when}">'
                            f"</span></div>"
                            f'<div class="email-body"><p>{body_txt}</p></div>'
                            f"</body></html>"
                        )
                    else:  # pipermail
                        when = when_dt.strftime(DATE_FMT)
                        page = (
                            f"<html><head>{marker}<title>{title}</title></head><body>"
                            f"<b>{author}</b> <i>{when}</i>\n"
                            f"<pre>{body_txt}\n><i>quoted line\n</i>more text</pre>"
                            f"</body></html>"
                        )
                    add_html(f"/pipermail/{lid}/{mn}/{num:06d}.html", page, "mail_post")
    return b.pages, b.images
