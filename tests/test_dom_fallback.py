"""Tolerant-DOM fallback (SURVEY.md M4; round-2 verdict Next #9).

The regex fast path in ``html_generic`` is byte-layout-exact; real
forum software reorders attributes. These tests prove that

1. the stdlib DOM (``engines/dom.py``) builds a usable tree from
   malformed markup and recovers inner HTML byte-exactly;
2. every public kernel (classify / board / thread / embeds / crumbs)
   produces identical structured output on attribute-REORDERED copies
   of every fixture page — the DOM fallback engages transparently;
3. a full crawl over an attribute-shuffled page store still reproduces
   the golden walk (order keys, URL-seen set);
4. the DOM dialect kernels extract the right fields from hand-written
   REALISTIC layouts modeled on the reference's real-site selectors
   (phpbb.py:451-487, xenforo.py:468-505, simplemachines.py:403-436,
   vbulletin.py:349-371, invision.py:208-228, proboards.py:344-363) —
   not just the synthetic fixture markup.
"""

import os
import re
import shutil
import sys

import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from forum_dl_ray.engines import html_dom, html_generic as hg
from forum_dl_ray.engines.dom import parse_dom, shuffle_attributes
from forum_dl_ray.fixtures import dialects_spec, generate_fixture
from forum_dl_ray.fixtures.synth import edge_spec, micro_spec


# ------------------------------------------------------------- DOM core
def test_dom_tolerant_tree_and_exact_inner_html():
    doc = (
        '<div class="a"><p>one<p>two</p>'  # unclosed first <p>
        "<img src=\"x.png\" alt='y'>"  # void element, mixed quotes
        "</div></span>"  # stray end tag
        '<div id="tail">t <b>bold</b></div>'
    )
    root = parse_dom(doc)
    divs = root.find_all("div")
    assert [d.get("id") for d in divs] == [None, "tail"]
    # inner_html is a raw substring: tag soup inside comes back verbatim
    assert divs[1].inner_html() == "t <b>bold</b>"
    assert divs[1].get_text() == "t bold"
    imgs = root.find_all("img")
    assert len(imgs) == 1 and imgs[0].get("src") == "x.png"
    # unclosed <p> was implicitly closed by the next <p>... tolerated
    assert root.find_all("p")[0].get_text() in ("one", "onetwo")


def test_dom_attrs_first_wins_and_class_list():
    root = parse_dom('<div class="a b" class="c" data-x>')
    d = root.find("div")
    assert d.classes() == ["a", "b"]
    assert d.get("data-x") == ""


def test_shuffle_attributes_deterministic_and_effective():
    page = '<a class="next" href="/p2">n</a><div class="one">x</div>'
    s1 = shuffle_attributes(page)
    assert s1 == shuffle_attributes(page)
    assert 'href="/p2" class="next"' in s1  # multi-attr tag reversed
    assert '<div class="one">' in s1  # single-attr tag untouched


# ------------------------------------- kernel parity on shuffled pages
def _html_pages(spec):
    d = generate_fixture(spec)
    rows = pq.read_table(os.path.join(d, "pages.parquet")).to_pylist()
    return [r for r in rows if r["content_type"] == "text/html"]


_STRIP_ATTRS = re.compile(r"<(\w+)[^>]*>")


def _norm_content(s: str) -> str:
    return _STRIP_ATTRS.sub(r"<\1>", s)


@pytest.mark.parametrize("spec_fn", [dialects_spec, edge_spec], ids=["dialects", "edge"])
def test_shuffled_kernel_parity(spec_fn):
    pages = _html_pages(spec_fn())
    assert pages
    for r in pages:
        body, url = r["body"], r["url"]
        shuf = shuffle_attributes(body)
        assert hg.classify_page(shuf) == hg.classify_page(body)
        assert hg.parse_crumbs(shuf, url) == hg.parse_crumbs(body, url)
        e_ref = [x["url"] for x in hg.page_embeds(body, url)]
        e_got = [x["url"] for x in hg.page_embeds(shuf, url)]
        assert e_got == e_ref, url
        if r["kind"] in ("board_index", "board_page"):
            assert hg.parse_board_page(shuf, url) == hg.parse_board_page(body, url)
        elif r["kind"] == "thread_page":
            ref = hg.parse_thread_page(body, url)
            got = hg.parse_thread_page(shuf, url)
            assert got["next_url"] == ref["next_url"], url
            key = lambda p: (p["pid"], p["author"], p["time_iso"], p["indent"], p["images"])
            assert [key(p) for p in got["posts"]] == [key(p) for p in ref["posts"]], url
            # content equal modulo attribute order inside embedded tags
            assert [_norm_content(p["content"]) for p in got["posts"]] == [
                _norm_content(p["content"]) for p in ref["posts"]
            ], url


# -------------------------------------------- full crawl on shuffled store
@pytest.fixture(scope="module")
def shuffled_fixture(tmp_path_factory):
    src = generate_fixture(micro_spec())
    dst = str(tmp_path_factory.mktemp("shuf") / "fixture")
    shutil.copytree(src, dst)
    t = pq.read_table(os.path.join(dst, "pages.parquet"))
    bodies = [
        shuffle_attributes(b) if ct == "text/html" else b
        for b, ct in zip(t["body"].to_pylist(), t["content_type"].to_pylist())
    ]
    import pyarrow as pa

    t = t.set_column(t.schema.get_field_index("body"), "body", pa.array(bodies, pa.binary()))
    pq.write_table(t, os.path.join(dst, "pages.parquet"))
    return src, dst


def test_shuffled_crawl_matches_unshuffled_golden(ray_session, shuffled_fixture, tmp_path):
    from forum_dl_ray.crawl import CrawlConfig, Crawler
    from forum_dl_ray.crawl.crawler import ordered_items
    from forum_dl_ray.fixtures.golden import simulate_fixture_dir

    src, dst = shuffled_fixture
    golden_ref = simulate_fixture_dir(src)
    golden_shuf = simulate_fixture_dir(dst)
    # the golden walker itself sees identical structure through the DOM
    assert [e["order_key"] for e in golden_shuf.entries] == [
        e["order_key"] for e in golden_ref.entries
    ]
    assert golden_shuf.seen == golden_ref.seen

    out = str(tmp_path / "crawl")
    Crawler(dst, out, CrawlConfig(num_shards=2, target_tasks=2)).run()
    df = ordered_items(out).to_pandas()
    assert df["order_key"].tolist() == [e["order_key"] for e in golden_ref.entries]
    seen = pq.read_table(os.path.join(out, "seen.parquet")).to_pylist()
    assert {r["url"]: r["failed"] for r in seen} == golden_ref.seen


# --------------------------------------------- realistic layout fidelity
# Hand-written snippets in the shape real forum software emits (wrapper
# divs, extra classes, attribute order as served) — nothing copied from
# any site or repo; structure follows the public selector contracts the
# reference engines target.
PHPBB_REAL = """
<div id="p15" class="post has-profile bg2">
 <div class="inner">
  <div class="postbody">
   <h3 class="first"><a href="#p15">Re: topic</a></h3>
   <p class="author"><span class="responsive-hide">by
     <a href="./memberlist.php?mode=viewprofile&amp;u=2" style="color:#A00" class="username-coloured">alice</a>
     &raquo; </span><time datetime="2023-05-04T12:30:00">Thu May 04, 2023 12:30 pm</time></p>
   <div class="content" id="post_content15">Hello <b>world</b></div>
  </div>
 </div>
</div>
"""

XENFORO_REAL = """
<article class="message message--post js-post" data-author="bob" data-content="post-123" id="js-post-123">
 <div class="message-inner"><div class="message-cell message-cell--main">
  <header class="message-attribution">
   <ul class="message-attribution-main listInline">
    <li class="u-concealed"><a href="/threads/x.1/post-123" rel="nofollow"><time class="u-dt" datetime="2022-01-15T08:00:00" data-time="1642233600">Jan 15, 2022</time></a></li>
   </ul>
  </header>
  <div class="message-content js-messageContent">
   <article class="message-body js-selectToQuote"><div class="bbWrapper">Some <i>content</i> here</div></article>
  </div>
 </div></div>
</article>
"""

SMF_REAL = """
<div class="post_wrapper">
 <div class="poster"><h4><a href="/index.php?action=profile;u=5" title="View profile">carol</a></h4></div>
 <div class="postarea">
  <div class="flow_hidden"><div class="keyinfo">
   <h5 id="subject_99"><a href="/index.php?topic=1.msg99#msg99" rel="nofollow">Re: subject</a></h5>
   <div class="smalltext">&#171; <strong>Reply #3 on:</strong> March 10, 2021, 14:05:33 &#187;</div>
  </div></div>
  <div class="post"><div class="inner" id="msg_99">Body text <b>more</b></div></div>
 </div>
</div>
"""

VBULLETIN_REAL = """
<div class="b-post js-post" data-node-id="456">
 <div class="b-post__body">
  <div class="author h-text-size--14"><a href="/member/7-dave" class="js-user-link">dave</a></div>
  <div class="b-post__meta"><a class="b-post__count" href="/forum/t/1#post456">#4</a>
   <time itemprop="dateCreated" datetime="2020-08-08T10:00:00"></time></div>
  <div class="js-post__content-text restore h-wordwrap">vb content</div>
 </div>
</div>
<div class="b-post b-comment" data-node-id="457">
 <div class="author"><a>lurker</a></div>
 <time itemprop="dateCreated" datetime="2020-08-08T11:00:00"></time>
 <div class="js-post__content-text">comment noise</div>
</div>
"""

INVISION_REAL = """
<article class="cPost ipsComment ipsComment_parent" id="elComment_789">
 <aside class="ipsComment_author cAuthorPane"><h3 class="ipsType_sectionHead cAuthorPane_author"><a href="/profile/9-erin/">erin</a></h3></aside>
 <div class="ipsComment_content cAuthorPane_content">
  <div class="ipsComment_meta"><h3 class="cAuthorPane_author ipsType_blendLinks"><a href="/profile/9-erin/">erin</a></h3>
   <div class="ipsType_reset"><a href="/topic/1/?do=findComment&amp;comment=789"><time datetime="2019-12-01T09:30:00">Dec 1, 2019</time></a></div></div>
  <div data-role="commentContent" class="ipsType_normal">ips content</div>
 </div>
</article>
"""

PROBOARDS_REAL = """
<div class="post item" id="post-321">
 <div class="content">
  <div class="info"><a href="/user/3" class="user-link o-user-link">frank</a>
   <abbr class="time" data-timestamp="1600000000000" title="Sep 13, 2020">Sep 13, 2020</abbr></div>
  <div class="message">pb content</div>
 </div>
</div>
"""


@pytest.mark.parametrize(
    "dialect,markup,expected",
    [
        ("phpbb", PHPBB_REAL, ("p15", "alice", "2023-05-04T12:30:00", "Hello <b>world</b>")),
        ("xenforo", XENFORO_REAL, ("p123", "bob", "2022-01-15T08:00:00", "Some <i>content</i> here")),
        ("smf", SMF_REAL, ("p99", "carol", "2021-03-10T14:05:33", "Body text <b>more</b>")),
        ("vbulletin", VBULLETIN_REAL, ("p456", "dave", "2020-08-08T10:00:00", "vb content")),
        ("invision", INVISION_REAL, ("p789", "erin", "2019-12-01T09:30:00", "ips content")),
        ("proboards", PROBOARDS_REAL, ("p321", "frank", "2020-09-13T12:26:40", "pb content")),
    ],
)
def test_realistic_layout_extraction(dialect, markup, expected):
    kernel = html_dom.DIALECT_KERNELS_DOM[dialect]
    posts = list(kernel(parse_dom(markup)))
    assert len(posts) == 1, posts  # vbulletin: the b-comment row is skipped
    pid, author, time_iso, _indent, content = posts[0]
    assert (pid, author, time_iso, content.strip()) == expected


PHPBB_REAL_NO_TIME_TAG = """
<div id="p16" class="post bg1">
 <div class="postbody">
  <h3><a href="#p16">Re: topic</a></h3>
  <p class="author">by <a class="username" href="./memberlist.php?u=3">glen</a> &raquo; Thu May 04, 2023 12:30 pm</p>
  <div class="content" id="post_content16">plain text</div>
 </div>
</div>
"""


def test_phpbb_raquo_date_fallback():
    # older phpBB skins omit <time>: the reference regex-matches the
    # text after the raquo and feeds it to dateparser (phpbb.py:465-471)
    posts = list(html_dom.DIALECT_KERNELS_DOM["phpbb"](parse_dom(PHPBB_REAL_NO_TIME_TAG)))
    assert len(posts) == 1
    pid, author, time_iso, _indent, content = posts[0]
    assert (pid, author, time_iso, content.strip()) == (
        "p16", "glen", "2023-05-04T12:30:00", "plain text"
    )


def test_realistic_layouts_shuffle_invariant():
    for dialect, markup in [
        ("phpbb", PHPBB_REAL),
        ("xenforo", XENFORO_REAL),
        ("smf", SMF_REAL),
        ("vbulletin", VBULLETIN_REAL),
        ("invision", INVISION_REAL),
        ("proboards", PROBOARDS_REAL),
    ]:
        kernel = html_dom.DIALECT_KERNELS_DOM[dialect]
        ref = [(p[0], p[1], p[2]) for p in kernel(parse_dom(markup))]
        got = [(p[0], p[1], p[2]) for p in kernel(parse_dom(shuffle_attributes(markup)))]
        assert got == ref, dialect


def test_detect_survives_attribute_reorder():
    page = b'<html><head><meta name="generator" content="synthforum/1.0"></head></html>'
    assert hg.detect("http://x.test/", page)
    assert hg.detect("http://x.test/", shuffle_attributes(page))


# --------------------------------------------- hostile real-world markup
# r3 verdict Next #7: the lxml-recovery class of inputs — unclosed
# tags, entity soup, nested quotes, uppercase tag names, unquoted
# attributes, stray comments. Hand-written in the shape of real aged
# forum skins (nothing copied from any site); the DOM fallback must
# still extract the same structured fields.
PHPBB_HOSTILE = """
<DIV id=p15 class="post has-profile bg2">
 <div class=inner>
  <div class="postbody">
   <h3 class=first><a href="#p15">Re: &quot;topic&quot; &amp;amp; more</a>
   <p class="author"><span class=responsive-hide>by
     <a href="./memberlist.php?mode=viewprofile&u=2" class="username-coloured">alice</a>
     &raquo; </span><TIME datetime="2023-05-04T12:30:00">Thu May 04, 2023 12:30 pm</TIME>
   <!-- skin comment <b>not real markup</b> -->
   <div class="content" id="post_content15">Hello&nbsp;<b>world</b>
    <blockquote class="quote"><cite>bob wrote: &#8230;</cite>
     outer quote
     <blockquote><cite>carol wrote:</cite> inner &lt;quote&gt;</blockquote>
    </blockquote>
   </div>
  </div>
 </div>
</DIV>
"""

SMF_HOSTILE = """
<div class="post_wrapper">
 <div class="poster"><h4><a href="/index.php?action=profile;u=5">carol</a></h4>
 <div class="postarea">
  <div class="flow_hidden"><div class="keyinfo">
   <h5 id=subject_99><a href="/index.php?topic=1.msg99#msg99">Re: subject</a></h5>
   <div class="smalltext">&#171; <strong>Reply #3 on:</strong> March 10, 2021, 14:05:33 &#187;</div>
  </div>
  <div class="post"><div class="inner" id="msg_99">Body text <b>more</b></div></div>
 </div>
</div>
"""

VBULLETIN_HOSTILE = """
<div class="b-post js-post" data-node-id=456>
 <div class="b-post__body">
  <div class="author"><a href=/member/7-dave class=js-user-link>dave</a>
  <div class="b-post__meta">
   <time itemprop=dateCreated datetime="2020-08-08T10:00:00">
  <div class="js-post__content-text restore">vb content</div>
 </div>
</div>
<div class="b-post b-comment" data-node-id="457">
 <div class="author"><a>lurker</a></div>
 <time itemprop="dateCreated" datetime="2020-08-08T11:00:00">
 <div class="js-post__content-text">comment noise</div>
</div>
"""

PROBOARDS_HOSTILE = """
<div class="post item" id=post-321>
 <div class="content">
  <div class="info"><a href="/user/3" class="user-link o-user-link">frank</a>
   <ABBR class="time" data-timestamp=1600000000000 title="Sep 13, 2020">Sep 13, 2020</ABBR>
  <div class="message">pb&nbsp;content</div>
 </div>
"""


@pytest.mark.parametrize(
    "dialect,markup,pid,author,time_iso,content_frag",
    [
        ("phpbb", PHPBB_HOSTILE, "p15", "alice", "2023-05-04T12:30:00",
         "inner &lt;quote&gt;"),
        ("smf", SMF_HOSTILE, "p99", "carol", "2021-03-10T14:05:33",
         "Body text <b>more</b>"),
        ("vbulletin", VBULLETIN_HOSTILE, "p456", "dave",
         "2020-08-08T10:00:00", "vb content"),
        ("proboards", PROBOARDS_HOSTILE, "p321", "frank",
         "2020-09-13T12:26:40", "pb&nbsp;content"),
    ],
)
def test_hostile_markup_extraction(dialect, markup, pid, author, time_iso,
                                   content_frag):
    kernel = html_dom.DIALECT_KERNELS_DOM[dialect]
    posts = list(kernel(parse_dom(markup)))
    assert len(posts) == 1, (dialect, posts)
    got = posts[0]
    assert (got[0], got[1], got[2]) == (pid, author, time_iso), dialect
    assert content_frag in got[4], (dialect, got[4])


def test_hostile_nested_quotes_roundtrip():
    # nested <blockquote> inside the content div must come back with
    # its structure intact (inner_html is a raw substring)
    posts = list(html_dom.DIALECT_KERNELS_DOM["phpbb"](parse_dom(PHPBB_HOSTILE)))
    content = posts[0][4]
    assert content.count("<blockquote") == 2
    assert content.count("</blockquote>") == 2
    assert "outer quote" in content and "carol wrote:" in content


# ------------------------------------------- full-page real-skin fixtures
# r4 verdict Next #8: complete documents (doctype, head, inline JS with
# `<`/`&&`, nav, breadcrumbs, forms, pagination, footers) in the shape
# phpBB 3.3 prosilver / XenForo 2.2 / SMF 2.1 actually serve — the
# kernels must find the posts amid ~10 KB of page chrome, not in a bare
# snippet. Markup is hand-written to the public templates' structure
# (class names / nesting are facts of the public software); every post,
# author and date is invented.
_REALPAGES = os.path.join(os.path.dirname(__file__), "fixtures_realpages")


def _realpage(name: str) -> str:
    with open(os.path.join(_REALPAGES, name), encoding="utf-8") as f:
        return f.read()


@pytest.mark.parametrize(
    "fname,dialect,expected",
    [
        ("phpbb_viewtopic.html", "phpbb", [
            ("p101", "mallard", "2023-05-04T09:12:00+00:00",
             "This week's build is up"),
            ("p102", "teal", "2023-05-04T12:30:00+00:00",
             "the installer works now"),
            ("p103", "mallard", "2023-05-05T07:45:10+00:00",
             "Mirrors updated"),
        ]),
        ("xenforo_thread.html", "xenforo", [
            ("p4411", "quartz", "2022-01-15T08:00:12+0000",
             "New build is live"),
            ("p4412", "fern", "2022-01-15T09:22:47+0000",
             "Works great on my machine"),
        ]),
        ("smf_topic.html", "smf", [
            ("p9901", "heron", "2021-03-10T14:05:33",
             "New build posted"),
            ("p9907", "wren", "2021-03-11T08:40:02",
             "Confirmed working on my end"),
        ]),
    ],
    ids=["phpbb", "xenforo", "smf"],
)
def test_full_realpage_extraction(fname, dialect, expected):
    page = _realpage(fname)
    kernel = html_dom.DIALECT_KERNELS_DOM[dialect]
    posts = list(kernel(parse_dom(page)))
    assert [(p[0], p[1], p[2]) for p in posts] == \
        [(pid, a, t) for pid, a, t, _frag in expected]
    for post, (_pid, _a, _t, frag) in zip(posts, expected):
        assert frag in post[4], (fname, post[0])
    # full-page chrome (jumpbox selects, quickreply forms, quick-mod
    # divs, footers) must never leak extra "posts"
    assert len(posts) == len(expected)


@pytest.mark.parametrize(
    "fname", ["phpbb_viewtopic.html", "xenforo_thread.html", "smf_topic.html"])
def test_full_realpage_classifies_as_thread(fname):
    # no synthetic <meta name="dialect"> hint anywhere: classification
    # falls through the dialect kernels and still lands on "thread"
    assert html_dom.classify_page_dom(_realpage(fname)) == "thread"


@pytest.mark.parametrize(
    "fname,dialect",
    [("phpbb_viewtopic.html", "phpbb"), ("xenforo_thread.html", "xenforo"),
     ("smf_topic.html", "smf")],
    ids=["phpbb", "xenforo", "smf"],
)
def test_full_realpage_shuffle_invariant(fname, dialect):
    page = _realpage(fname)
    kernel = html_dom.DIALECT_KERNELS_DOM[dialect]
    ref = [(p[0], p[1], p[2]) for p in kernel(parse_dom(page))]
    got = [(p[0], p[1], p[2]) for p in kernel(parse_dom(shuffle_attributes(page)))]
    assert got == ref and ref


def test_realpage_quote_structure_roundtrip():
    # nested quote markup inside post bodies comes back byte-exact
    # (inner_html is a raw substring of the page)
    page = _realpage("xenforo_thread.html")
    posts = list(html_dom.DIALECT_KERNELS_DOM["xenforo"](parse_dom(page)))
    content = posts[1][4]
    assert content.count("<blockquote") == 1
    assert 'data-source="post: 4411"' in content
    assert "quartz said:" in content
    # and the phpBB inline image attachment survives with its attrs
    page = _realpage("phpbb_viewtopic.html")
    posts = list(html_dom.DIALECT_KERNELS_DOM["phpbb"](parse_dom(page)))
    assert '<img class="postimage" src="./download/file.php?id=33"' in posts[1][4]
