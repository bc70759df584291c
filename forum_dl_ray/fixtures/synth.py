"""Deterministic synthetic forum fixture generator (FIXTURES.md F1-F3).

Replaces the reference's live-site test inputs
(/root/reference/forum_dl/tests/test_extractors.py — live network)
with seeded tables: a `pages` table (one row per fetchable URL — the
fetch stage resolves against it instead of HTTP), an `images` payload
table in the authoritative BASELINE.json input_hint shape, and a
`seeds` table of crawl entry points. Same seed → byte-identical
output; no wall-clock anywhere.

The hot-host requirement (FIXTURES.md F1: one host owns >= 50% of
URLs, exercising poll-side politeness + fetch-side salting) is met by
`small_spec`/`bench_spec` giving one site a large multiple of the
others' page counts.
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import dataclass, field
from datetime import datetime, timedelta

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..images import encode_image, phash64, synth_pixels
from ..schemas import IMAGES, PAGE
from ..urlnorm import normalize_url

_EPOCH = datetime(2020, 1, 1, 0, 0, 0)

_ADJ = ["amber", "brisk", "calm", "dusty", "eager", "faded", "grand", "hazy", "ivory", "jolly"]
_NOUN = ["otter", "violin", "comet", "lantern", "meadow", "harbor", "biscuit", "glacier", "sparrow", "anvil"]
_VERB = ["drifts", "hums", "sparkles", "wanders", "settles", "echoes", "glows", "tumbles"]

MARKER = '<meta name="generator" content="synthforum/1.0">'


@dataclass
class SiteSpec:
    host: str
    engine: str = "html-generic"
    n_top_boards: int = 2
    sub_levels: int = 1           # levels of subboards below top boards
    subboards_per_board: int = 1
    threads_per_board: int = 3
    threads_per_page: int = 2
    posts_per_thread: int = 5
    posts_per_page: int = 3
    image_rate: float = 0.3       # fraction of posts embedding one image
    fail_rate: float = 0.0        # fraction of thread pages >= 2 returning 500
    dialect: str = "generic"      # post markup family (M8-M13 kernels)
    seed: int = 42
    # edge-case knobs (golden/crawler divergence locks — ADVICE round 1):
    cross_link_board: str = ""    # bid whose page 1 also links /thread/t1
    fail_page1_board: str = ""    # bid whose FIRST page returns 500
    data_url_rate: float = 0.0    # fraction of posts embedding a data: image (M22)
    page_embed_rate: float = 0.0  # fraction of pages carrying page-level embeds (M7)
    archive_style: str = "pipermail"  # mail-archive post-page markup family (M16)
    date_style: str = "strict"    # smf date text: strict | freeform (M17 kernel)


@dataclass
class FixtureSpec:
    sites: list[SiteSpec] = field(default_factory=list)
    name: str = "fixture"

    def digest(self) -> str:
        # CODEC_VERSION is part of the key: image payload bytes change
        # when the codec does, and /tmp caches must not serve stale
        # payloads encoded by an older codec.
        from ..images import CODEC_VERSION

        blob = json.dumps(
            [vars(s) for s in self.sites] + [{"codec_v": CODEC_VERSION}],
            sort_keys=True,
        ).encode()
        return hashlib.blake2b(blob, digest_size=8).hexdigest()


def _sentence(rng: np.random.Generator, pid: str) -> str:
    a = _ADJ[int(rng.integers(len(_ADJ)))]
    n = _NOUN[int(rng.integers(len(_NOUN)))]
    v = _VERB[int(rng.integers(len(_VERB)))]
    n2 = _NOUN[int(rng.integers(len(_NOUN)))]
    return f"The {a} {n} {v} over the {n2} in post {pid}."


def _caption(rng: np.random.Generator, image_id: str) -> str:
    a = _ADJ[int(rng.integers(len(_ADJ)))]
    n = _NOUN[int(rng.integers(len(_NOUN)))]
    return f"A synthetic {a} {n} labeled {image_id}"


class _SiteBuilder:
    """Builds one html-generic site: page rows + image rows."""

    def __init__(self, spec: SiteSpec):
        self.spec = spec
        self.rng = np.random.default_rng(spec.seed + hash_host(spec.host))
        self.base = f"http://{spec.host}"
        self.pages: list[dict] = []
        self.images: list[dict] = []
        self.thread_counter = 0
        self.post_counter = 0
        self.image_counter = 0
        self.host_tag = spec.host.split(".")[0]
        # (img_row, page_row, image_id, fmt, w, h) awaiting payload encode
        self._pending: list[tuple] = []

    # ---------------------------------------------------------------- URLs
    def board_url(self, bid: str, page: int) -> str:
        if page == 1:
            return normalize_url(f"{self.base}/board/{bid}")
        return normalize_url(f"{self.base}/board/{bid}?page={page}", keep_queries=("page",))

    def thread_url(self, tid: str, page: int) -> str:
        if page == 1:
            return normalize_url(f"{self.base}/thread/{tid}")
        return normalize_url(f"{self.base}/thread/{tid}?page={page}", keep_queries=("page",))

    # ---------------------------------------------------------------- HTML
    def _head(self, title: str) -> str:
        return f"<html><head>{MARKER}<title>{title}</title></head><body>"

    def _crumbs(self, path_urls: list[tuple[str, str]]) -> str:
        links = "".join(f'<a href="{h}">{t}</a>' for h, t in path_urls)
        return f'<nav class="crumbs">{links}</nav>'

    def build(self) -> None:
        spec = self.spec
        # board tree: ids assigned depth-first
        board_n = 0

        def make_board(level: int) -> dict:
            nonlocal board_n
            board_n += 1
            bid = f"b{board_n}"
            children = []
            if level < spec.sub_levels:
                children = [make_board(level + 1) for _ in range(spec.subboards_per_board)]
            return {"bid": bid, "title": f"Board {bid} of {self.host_tag}", "children": children}

        top_boards = [make_board(0) for _ in range(spec.n_top_boards)]

        # index page
        items = "".join(
            f'<div class="board-item"><a href="/board/{b["bid"]}">{b["title"]}</a></div>'
            for b in top_boards
        )
        index_html = (
            self._head(f"Site {self.host_tag}")
            + self._crumbs([("/", f"Site {self.host_tag}")])
            + items
            + "</body></html>"
        )
        self._add_page(normalize_url(self.base), "board_index", index_html.encode())

        crumb_root = [("/", f"Site {self.host_tag}")]
        for b in top_boards:
            self._build_board(b, crumb_root)

    def _build_board(self, board: dict, crumbs: list[tuple[str, str]]) -> None:
        spec = self.spec
        bid, title = board["bid"], board["title"]
        my_crumbs = crumbs + [(f"/board/{bid}", title)]

        threads = []
        for _ in range(spec.threads_per_board):
            self.thread_counter += 1
            tid = f"t{self.thread_counter}"
            threads.append({"tid": tid, "title": f"Thread {tid}: {_sentence(self.rng, tid)[:40]}"})

        n_pages = max(1, -(-len(threads) // spec.threads_per_page))
        for page in range(1, n_pages + 1):
            chunk = threads[(page - 1) * spec.threads_per_page : page * spec.threads_per_page]
            body = self._head(title) + self._crumbs(my_crumbs)
            if self.rng.random() < spec.page_embed_rate:
                # M7 page-level embeds (outside files): css link + inline svg
                body += (
                    f'<link rel="stylesheet" href="/static/{self.host_tag}.css">'
                    f'<svg><circle r="{page}"/></svg>'
                )
            if page == 1:
                body += "".join(
                    f'<div class="board-item"><a href="/board/{c["bid"]}">{c["title"]}</a></div>'
                    for c in board["children"]
                )
            body += "".join(
                f'<div class="thread-item"><a href="/thread/{t["tid"]}">{t["title"]}</a></div>'
                for t in chunk
            )
            if page == 1 and spec.cross_link_board == bid:
                # backward cross-link: this (deeper) board references a
                # thread already discovered earlier in DFS order — the
                # walker/crawler must emit the duplicate thread ENTRY but
                # walk its posts exactly once (AlreadyVisitedError parity)
                body += '<div class="thread-item"><a href="/thread/t1">Crosslinked t1</a></div>'
            next_url = None
            if page < n_pages:
                body += f'<a class="next" href="/board/{bid}?page={page + 1}">Next</a>'
                next_url = self.board_url(bid, page + 1)
            body += "</body></html>"
            status = 500 if (page == 1 and spec.fail_page1_board == bid) else 200
            self._add_page(
                self.board_url(bid, page), "board_page",
                body.encode() if status == 200 else b"",
                status=status, next_url=next_url,
            )

        for t in threads:
            self._build_thread(t, my_crumbs)
        for c in board["children"]:
            self._build_board(c, my_crumbs)

    def _build_thread(self, thread: dict, crumbs: list[tuple[str, str]]) -> None:
        spec = self.spec
        tid, title = thread["tid"], thread["title"]
        posts = []
        indent = 0
        for _ in range(spec.posts_per_thread):
            self.post_counter += 1
            pid = f"p{self.post_counter}"
            t_iso = (_EPOCH + timedelta(minutes=self.post_counter)).isoformat()
            content = f"<p>{_sentence(self.rng, pid)}</p>"
            if self.rng.random() < spec.image_rate:
                self.image_counter += 1
                fmt = "png" if self.image_counter % 2 == 0 else "jpeg"
                image_id = f"{self.host_tag}-im{self.image_counter:05d}"
                caption = _caption(self.rng, image_id)
                w = int(self.rng.integers(24, 64))
                h = int(self.rng.integers(24, 64))
                self._add_image(image_id, fmt, w, h, caption)
                content += f'<img src="/img/{image_id}.{fmt}" alt="{caption}">'
            if self.rng.random() < spec.data_url_rate:
                # M22 inline file: payload embedded as a base64 data: URL
                # (no page-store row — the URL IS the content)
                import base64 as _b64

                self.image_counter += 1
                did = f"{self.host_tag}-dd{self.image_counter:05d}"
                payload = encode_image(synth_pixels(did, 8, 8), "png")
                b64s = _b64.b64encode(payload).decode()
                content += f'<img src="data:image/png;base64,{b64s}" alt="inline {did}">'
            author = f"user{int(self.rng.integers(1, 20))}@{self.host_tag}"
            posts.append(
                {"pid": pid, "author": author, "time": t_iso, "indent": indent, "content": content}
            )
            # deterministic reply-tree walk: down max 1, up to 2, cap 4
            delta = int(self.rng.integers(-2, 2))
            indent = min(4, max(0, indent + delta))

        n_pages = max(1, -(-len(posts) // spec.posts_per_page))
        for page in range(1, n_pages + 1):
            chunk = posts[(page - 1) * spec.posts_per_page : page * spec.posts_per_page]
            body = self._head(title) + self._crumbs(crumbs + [(f"/thread/{tid}", title)])
            if self.rng.random() < spec.page_embed_rate:
                body += f'<audio><source src="/media/{tid}.ogg"></audio>'
            if spec.dialect != "generic":
                body += f'<meta name="dialect" content="{spec.dialect}">'
            for p in chunk:
                body += _post_markup(spec.dialect, p, spec.date_style)
            next_url = None
            if page < n_pages:
                body += f'<a class="next" href="/thread/{tid}?page={page + 1}">Next</a>'
                next_url = self.thread_url(tid, page + 1)
            body += "</body></html>"
            status = 200
            if page >= 2 and self.rng.random() < spec.fail_rate:
                status = 500
            self._add_page(
                self.thread_url(tid, page),
                "thread_page",
                body.encode() if status == 200 else b"",
                status=status,
                next_url=next_url,
            )

    def _add_image(self, image_id: str, fmt: str, w: int, h: int, caption: str) -> None:
        # payload encode is DEFERRED: the real JPEG encoder costs
        # milliseconds per image, so build() records a placeholder here
        # and _encode_pending() fills bytes+phash afterwards — in a
        # process pool for big fixtures (the 1.2M-URL scaling fixture
        # carries ~200k images; serial encode took tens of minutes)
        self.images.append(
            {
                "image_id": image_id,
                "bytes": b"",
                "w": w,
                "h": h,
                "fmt": fmt,
                "caption": caption,
                "phash": 0,
            }
        )
        self._add_page(
            normalize_url(f"{self.base}/img/{image_id}.{fmt}"),
            "asset",
            b"",
            content_type=f"image/{fmt}",
        )
        self._pending.append(
            (len(self.images) - 1, len(self.pages) - 1, image_id, fmt, w, h))

    def _add_page(
        self,
        url: str,
        kind: str,
        body: bytes,
        status: int = 200,
        content_type: str = "text/html",
        next_url: str | None = None,
    ) -> None:
        self.pages.append(
            {
                "url": url,
                "host": self.spec.host,
                "kind": kind,
                "engine": self.spec.engine,
                "body": body,
                "content_type": content_type,
                "status": status,
                "next_url": next_url,
            }
        )


def _post_markup(dialect: str, p: dict, date_style: str = "strict") -> str:
    """Post-row HTML per engine-family dialect (the write side of the
    M8-M13 extraction kernels in engines/html_generic.py)."""
    pid, author, t, ind, content = p["pid"], p["author"], p["time"], p["indent"], p["content"]
    if dialect == "phpbb":
        num = pid.lstrip("p")
        return (
            f'<div class="post_content" id="post_content{num}" data-indent="{ind}">'
            f'<p class="author"><span class="username">{author}</span> » '
            f'<time datetime="{t}"></time></p>'
            f'<div class="content">{content}</div></div>'
        )
    if dialect == "xenforo":
        num = pid.lstrip("p")
        return (
            f'<article class="message" data-author="{author}" id="post-{num}"'
            f' data-indent="{ind}"><time datetime="{t}"></time>'
            f'<div class="bbWrapper">{content}</div></article>'
        )
    if dialect == "smf":
        from datetime import datetime as _dt

        num = pid.lstrip("p")
        dt = _dt.fromisoformat(t)
        if date_style == "freeform":
            # cycle the real-world styles the reference hands to
            # dateparser (M17); the kernel must recover dt exactly
            style = int(num) % 4
            if style == 0:
                date_text = dt.strftime("%d %B %Y, %H:%M:%S")        # day-first
            elif style == 1:
                date_text = dt.strftime("%a, %d %b %Y %H:%M:%S +0000")  # RFC 2822
            elif style == 2:
                date_text = dt.strftime("%a %b %d %H:%M:%S %Y")      # ctime
            else:
                date_text = dt.strftime("%B %d, %Y, %I:%M:%S %p")    # 12-hour
        else:
            date_text = dt.strftime("%B %d, %Y, %H:%M")
        return (
            f'<div class="smf-post" id="msg_{num}" data-indent="{ind}">'
            f'<h4 class="author">{author}</h4><span class="date">{date_text}</span>'
            f'<div class="inner">{content}</div></div>'
        )
    if dialect == "proboards":
        from datetime import datetime as _dt
        from datetime import timezone as _tz

        num = pid.lstrip("p")
        millis = int(_dt.fromisoformat(t).replace(tzinfo=_tz.utc).timestamp() * 1000)
        return (
            f'<div class="pb-post" id="post-{num}" data-timestamp="{millis}"'
            f' data-indent="{ind}"><span class="author">{author}</span>'
            f'<div class="content">{content}</div></div>'
        )
    if dialect == "vbulletin":
        # reference vbulletin.py:349-371 layout: data-node-id rows,
        # js-post__content-text content, itemprop dateCreated time;
        # every post is followed by a `b-comment` row the extractor
        # must SKIP (vbulletin.py:352-354 "No support for comments")
        num = pid.lstrip("p")
        return (
            f'<div class="b-post" data-node-id="{num}" data-indent="{ind}">'
            f'<div class="author"><a>{author}</a></div>'
            f'<time itemprop="dateCreated" datetime="{t}"></time>'
            f'<div class="js-post__content-text">{content}</div></div>'
            f'<div class="b-post b-comment" data-node-id="{num}9000" data-indent="0">'
            f'<div class="author"><a>commenter@{author.split("@")[-1]}</a></div>'
            f'<time itemprop="dateCreated" datetime="{t}"></time>'
            f'<div class="js-post__content-text"><p>comment noise on {pid}</p></div></div>'
        )
    if dialect == "invision":
        # reference invision.py:208-228 layout: elComment_(\d+) ids,
        # cAuthorPane author pane, data-role=commentContent content
        num = pid.lstrip("p")
        return (
            f'<article class="ipsComment" id="elComment_{num}" data-indent="{ind}">'
            f'<div class="cAuthorPane_content">'
            f'<h3 class="cAuthorPane_author"><a>{author}</a></h3>'
            f'<time datetime="{t}"></time></div>'
            f'<div data-role="commentContent">{content}</div></article>'
        )
    return (
        f'<div class="post" id="{pid}" data-author="{author}"'
        f' data-time="{t}" data-indent="{ind}">'
        f'<div class="content">{content}</div></div>'
    )


def hash_host(host: str) -> int:
    return int.from_bytes(hashlib.blake2b(host.encode(), digest_size=4).digest(), "little")


def _encode_image_payload(args: tuple) -> tuple[bytes, int]:
    """Pure worker: (image_id, fmt, w, h) → (payload bytes, phash).
    Module-level so a spawn-based process pool can import it."""
    image_id, fmt, w, h = args
    px = synth_pixels(image_id, w, h)
    return encode_image(px, fmt), phash64(px)


def _fill_pending(builder: "_SiteBuilder") -> None:
    """Encode all deferred payloads, in parallel when it pays.

    Fan-out goes through RAY TASKS, not a multiprocessing pool: every
    caller that builds a big fixture (bench.py, the scaling subjects)
    already has a Ray session up, and mp pools are a footgun here —
    fork can deadlock under Ray's gRPC threads, spawn/forkserver
    re-import the driver's ``__main__`` (re-running unguarded
    scripts). Chunk results are order-mapped, so output is
    byte-identical to the serial path; serial fallback covers no-Ray
    callers and small fixtures."""
    pending = builder._pending
    if not pending:
        return
    specs = [(mid, fmt, w, h) for _, _, mid, fmt, w, h in pending]
    results = None
    if len(pending) >= 512:
        try:
            import ray

            if ray.is_initialized():
                from forum_dl_ray import STAGE_RUNTIME_ENV

                @ray.remote
                def _encode_chunk(chunk: list) -> list:
                    from forum_dl_ray.fixtures.synth import _encode_image_payload

                    return [_encode_image_payload(s) for s in chunk]

                chunks = [specs[i:i + 256] for i in range(0, len(specs), 256)]
                refs = [
                    _encode_chunk.options(
                        runtime_env=STAGE_RUNTIME_ENV).remote(c)
                    for c in chunks
                ]
                results = [r for part in ray.get(refs) for r in part]
        except Exception as e:
            # a genuine encode bug raised INSIDE the worker would only
            # fail again (slowly, serially) — re-raise it; downgrade
            # only Ray-plumbing failures, and say so out loud
            import ray.exceptions as _rex

            if isinstance(e, _rex.RayTaskError):
                raise
            import logging

            logging.getLogger(__name__).warning(
                "parallel payload encode unavailable (%s: %s); "
                "falling back to serial — expect minutes on big fixtures",
                type(e).__name__, e)
            results = None
    if results is None:
        results = [_encode_image_payload(s) for s in specs]
    for (img_i, page_i, *_), (data, ph) in zip(pending, results):
        builder.images[img_i]["bytes"] = data
        builder.images[img_i]["phash"] = ph
        builder.pages[page_i]["body"] = data
    builder._pending = []


def build_site(spec: SiteSpec) -> tuple[list[dict], list[dict]]:
    if spec.engine == "html-generic":
        b = _SiteBuilder(spec)
        b.build()
        _fill_pending(b)
        return b.pages, b.images
    if spec.engine == "json-stream":
        from .synth_json import build_json_stream_site

        return build_json_stream_site(spec)
    if spec.engine == "json-registry":
        from .synth_json import build_json_registry_site

        return build_json_registry_site(spec)
    if spec.engine == "mail-archive":
        from .synth_mail import build_mail_archive_site

        return build_mail_archive_site(spec)
    raise ValueError(f"unknown engine {spec.engine}")


def generate_fixture(spec: FixtureSpec, out_dir: str | None = None, force: bool = False) -> str:
    """Generate (or reuse cached) fixture parquet under out_dir.

    Layout: pages.parquet (PAGE schema), images.parquet (IMAGES
    schema), seeds.json. Cached by spec digest — regeneration with the
    same spec is a no-op (byte-determinism is tested).
    """
    out_dir = out_dir or os.path.join(
        "/tmp", "fdr_fixtures", f"{spec.name}-{spec.digest()}"
    )
    done = os.path.join(out_dir, "_DONE")
    if os.path.exists(done) and not force:
        return out_dir
    os.makedirs(out_dir, exist_ok=True)

    all_pages: list[dict] = []
    all_images: list[dict] = []
    seeds = []
    for site in spec.sites:
        pages, images = build_site(site)
        all_pages.extend(pages)
        all_images.extend(images)
        seed_url = {
            "html-generic": f"http://{site.host}/index.php",
            "json-stream": f"http://{site.host}/api/index.json",
            "json-registry": f"http://{site.host}/v0/maxitem.json",
            "mail-archive": f"http://{site.host}/mailman/listinfo",
        }[site.engine]
        seeds.append(
            {
                "seed_url": seed_url,
                "engine": site.engine,
                "base_url": f"http://{site.host}/",
                "host": site.host,
                "politeness_budget": 0.0,  # 0 = unlimited in tests; bench overrides
            }
        )

    pages_t = pa.table(
        {name: [p[name] for p in all_pages] for name in [f.name for f in PAGE]}, schema=PAGE
    )
    images_t = pa.table(
        {name: [i[name] for i in all_images] for name in [f.name for f in IMAGES]}, schema=IMAGES
    )
    pq.write_table(pages_t, os.path.join(out_dir, "pages.parquet"))
    pq.write_table(images_t, os.path.join(out_dir, "images.parquet"))
    with open(os.path.join(out_dir, "seeds.json"), "w") as f:
        json.dump(seeds, f, indent=1)
    with open(done, "w") as f:
        f.write(spec.digest())
    return out_dir


# ------------------------------------------------------------------- presets
def micro_spec() -> FixtureSpec:
    """~10^2 URLs, 2 sites — smoke/t1 scale, hand-checkable."""
    return FixtureSpec(
        name="micro",
        sites=[
            SiteSpec(host="alpha.test", n_top_boards=2, sub_levels=1, subboards_per_board=1,
                     threads_per_board=2, threads_per_page=2, posts_per_thread=4,
                     posts_per_page=3, image_rate=0.4, fail_rate=0.0, seed=42),
            SiteSpec(host="beta.test", n_top_boards=1, sub_levels=0,
                     threads_per_board=3, threads_per_page=2, posts_per_thread=5,
                     posts_per_page=2, image_rate=0.3, fail_rate=0.2, seed=43),
        ],
    )


def small_spec() -> FixtureSpec:
    """~5-6k URLs, 4 hosts, one hot host with >= 50% of URLs."""
    return FixtureSpec(
        name="small",
        sites=[
            SiteSpec(host="hot.delta.test", n_top_boards=8, sub_levels=1, subboards_per_board=2,
                     threads_per_board=15, threads_per_page=5, posts_per_thread=16,
                     posts_per_page=5, image_rate=0.25, fail_rate=0.03, seed=44),
            SiteSpec(host="alpha.test", n_top_boards=3, sub_levels=1, subboards_per_board=1,
                     threads_per_board=8, threads_per_page=5, posts_per_thread=8,
                     posts_per_page=5, image_rate=0.25, fail_rate=0.02, seed=45),
            SiteSpec(host="beta.test", n_top_boards=2, sub_levels=1, subboards_per_board=2,
                     threads_per_board=6, threads_per_page=4, posts_per_thread=8,
                     posts_per_page=5, image_rate=0.2, fail_rate=0.02, seed=46),
            SiteSpec(host="gamma.test", n_top_boards=2, sub_levels=0,
                     threads_per_board=10, threads_per_page=5, posts_per_thread=6,
                     posts_per_page=4, image_rate=0.2, fail_rate=0.0, seed=47),
        ],
    )


def bench_spec() -> FixtureSpec:
    """~5x10^4 URLs for throughput runs (FIXTURES.md F1 sizing)."""
    return FixtureSpec(
        name="bench",
        sites=[
            SiteSpec(host="hot.delta.test", n_top_boards=10, sub_levels=1, subboards_per_board=3,
                     threads_per_board=55, threads_per_page=20, posts_per_thread=40,
                     posts_per_page=20, image_rate=0.15, fail_rate=0.02, seed=50),
            SiteSpec(host="alpha.test", n_top_boards=8, sub_levels=1, subboards_per_board=2,
                     threads_per_board=30, threads_per_page=15, posts_per_thread=30,
                     posts_per_page=15, image_rate=0.1, fail_rate=0.02, seed=51),
            SiteSpec(host="beta.test", n_top_boards=6, sub_levels=1, subboards_per_board=2,
                     threads_per_board=25, threads_per_page=15, posts_per_thread=25,
                     posts_per_page=15, image_rate=0.1, fail_rate=0.01, seed=52),
            SiteSpec(host="gamma.test", n_top_boards=5, sub_levels=0,
                     threads_per_board=30, threads_per_page=15, posts_per_thread=20,
                     posts_per_page=12, image_rate=0.1, fail_rate=0.0, seed=53),
        ],
    )


def steady_spec() -> FixtureSpec:
    """~10^5 URLs, wide and shallow — the steady-state scaling fixture.

    At 10^10-frontier scale the ready set never starves, so throughput
    is breadth-bound, not chain-bound; this spec maximizes breadth
    (many boards/threads, short pagination chains) so the sandbox
    scaling run measures the same regime (SURVEY.md §2.6.2:
    parallelism comes from breadth, never within a pagination chain).
    """
    sites = []
    for i, host in enumerate(
        ["hot.delta.test", "alpha.test", "beta.test", "gamma.test"]
    ):
        sites.append(
            SiteSpec(
                host=host,
                n_top_boards=20,
                sub_levels=0,
                threads_per_board=1200 if i == 0 else 600,
                threads_per_page=100,
                posts_per_thread=8,
                posts_per_page=4,
                image_rate=0.06,
                fail_rate=0.01,
                seed=60 + i,
            )
        )
    return FixtureSpec(name="steady", sites=sites)


def steady_big_spec() -> FixtureSpec:
    """~1.2M URLs — the scaling-run fixture (compute must dominate the
    ~2 s per-pipeline fixed cost for N→4N efficiency to be measurable;
    see BASELINE.md scaling protocol)."""
    spec = steady_spec()
    for s in spec.sites:
        s.threads_per_board *= 8
    spec.name = "steady-big"
    return spec


def mixed_spec() -> FixtureSpec:
    """One site per engine — cursor-style diversity e2e (ST4):
    html pagination chains, json-stream multi-chunk id streams
    (posts_per_thread > CHUNK=20), json-registry story/kids trees."""
    return FixtureSpec(
        name="mixed",
        sites=[
            SiteSpec(host="alpha.test", engine="html-generic", n_top_boards=2,
                     sub_levels=1, subboards_per_board=1, threads_per_board=2,
                     threads_per_page=2, posts_per_thread=4, posts_per_page=3,
                     image_rate=0.3, fail_rate=0.0, seed=42),
            SiteSpec(host="stream.test", engine="json-stream", n_top_boards=2,
                     threads_per_board=3, threads_per_page=2, posts_per_thread=25,
                     image_rate=0.15, seed=70),
            SiteSpec(host="news.test", engine="json-registry", n_top_boards=1,
                     threads_per_board=4, posts_per_thread=10, seed=71),
            SiteSpec(host="lists.test", engine="mail-archive", n_top_boards=2,
                     threads_per_board=4, threads_per_page=2, posts_per_thread=4,
                     seed=72),
        ],
    )


def mail_spec() -> FixtureSpec:
    """Mail-archive engine fixture (M16): two mailing lists, a 3-month
    archive chain per list (the ST4 relative_urls stack cursor), reply
    trees encoded as pipermail chain comments."""
    return FixtureSpec(
        name="mail",
        sites=[
            SiteSpec(host="pipermail.test", engine="mail-archive",
                     n_top_boards=2, threads_per_board=6, threads_per_page=2,
                     posts_per_thread=5, seed=95),
            SiteSpec(host="hypermail.test", engine="mail-archive",
                     archive_style="hypermail", n_top_boards=1,
                     threads_per_board=4, threads_per_page=2,
                     posts_per_thread=4, seed=96),
            SiteSpec(host="hyperkitty.test", engine="mail-archive",
                     archive_style="hyperkitty", n_top_boards=1,
                     threads_per_board=4, threads_per_page=2,
                     posts_per_thread=4, seed=97),
        ],
    )


def edge_spec() -> FixtureSpec:
    """Edge-class parity locks (ADVICE round 1): a board whose FIRST
    page fails (no board entry, subtree undiscovered on both sides) and
    a deeper board cross-linking an earlier-DFS thread (duplicate
    thread entry, posts walked exactly once). The cross-link points
    backward (child board -> top board's t1) so the crawler's
    first-offer-wins frontier resolves it deterministically to the same
    winner as the golden DFS."""
    return FixtureSpec(
        name="edge",
        sites=[
            SiteSpec(host="edge.test", n_top_boards=2, sub_levels=1,
                     subboards_per_board=1, threads_per_board=3,
                     threads_per_page=2, posts_per_thread=4, posts_per_page=3,
                     image_rate=0.2, fail_rate=0.0, seed=90,
                     cross_link_board="b2", fail_page1_board="b4",
                     data_url_rate=0.3, page_embed_rate=0.5),
        ],
    )


def dialects_spec() -> FixtureSpec:
    """One site per post-markup dialect (M8-M13 extraction kernels +
    M17 date-style normalization: ISO <time>, free-text month-name,
    epoch millis)."""
    sites = []
    for i, dialect in enumerate(
        ["phpbb", "xenforo", "smf", "proboards", "vbulletin", "invision"]
    ):
        sites.append(
            SiteSpec(host=f"{dialect}.test", dialect=dialect, n_top_boards=1,
                     sub_levels=0, threads_per_board=2, threads_per_page=2,
                     posts_per_thread=5, posts_per_page=3, image_rate=0.25,
                     fail_rate=0.0, seed=80 + i)
        )
    # smf again with every free-text date style the M17 kernel covers
    # (day-first, RFC 2822, ctime, 12-hour month-name)
    sites.append(
        SiteSpec(host="smf-freeform.test", dialect="smf", date_style="freeform",
                 n_top_boards=1, sub_levels=0, threads_per_board=2,
                 threads_per_page=2, posts_per_thread=5, posts_per_page=3,
                 image_rate=0.25, fail_rate=0.0, seed=97)
    )
    return FixtureSpec(name="dialects", sites=sites)
