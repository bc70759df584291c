"""robots.txt discovery + enforcement (crawl/robots.py + frontier ST7).

The reference has no robots support; the north rule requires it. The
e2e appends a real /robots.txt document to a COPY of the micro
fixture's page store (specs stay untouched — fixture digests and the
pinned micro goldens must not move) and asserts disallowed subtrees
are pruned at enqueue on both crawler paths, while a config override
still wins."""

import os
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from forum_dl_ray.crawl import CrawlConfig, Crawler
from forum_dl_ray.crawl.crawler import ordered_items
from forum_dl_ray.crawl.robots import discover_robots, parse_robots
from forum_dl_ray.fixtures import generate_fixture, micro_spec
from forum_dl_ray.fixtures.golden import simulate_fixture_dir

ROBOTS = b"""# test robots
User-agent: evilbot
Disallow: /

User-agent: *
Disallow: /star-only/
Disallow:

User-agent: forum-dl-ray
User-agent: otherbot
Disallow: /thread/
Disallow: /img/
"""


def test_parse_robots_groups():
    rules = parse_robots(ROBOTS.decode())
    # RFC 9309 §2.2.1: only the most specific matching group applies;
    # '*' is a fallback, never unioned with a specific match
    assert rules == ["/thread/", "/img/"]
    assert parse_robots(ROBOTS.decode(), user_agent="evilbot") == ["/"]
    assert parse_robots(ROBOTS.decode(), user_agent="otherbot") == [
        "/thread/", "/img/"]
    # unmatched UA falls back to the '*' group
    assert parse_robots(ROBOTS.decode(), user_agent="nobody") == ["/star-only/"]
    assert parse_robots("") == []
    # Allow lines are carried with the '!' encoding, file order kept
    assert parse_robots("User-agent: *\nAllow: /x\nDisallow: /y") == ["!/x", "/y"]


def test_parse_robots_most_specific_wins():
    text = ("User-agent: forum\nDisallow: /a\n\n"
            "User-agent: forum-dl-ray\nDisallow: /b\n\n"
            "User-agent: forum-dl\nDisallow: /c\n\n"
            "User-agent: forum-dl-ray\nDisallow: /d\n")
    # longest matching token wins; equal-length groups merge in order
    assert parse_robots(text) == ["/b", "/d"]
    assert parse_robots(text, user_agent="forum-dl-bot") == ["/c"]
    # rules before any User-agent line are ignored
    assert parse_robots("Disallow: /x\nUser-agent: *\nDisallow: /y") == ["/y"]


@pytest.fixture(scope="module")
def robots_fixture(tmp_path_factory):
    src = generate_fixture(micro_spec())
    dst = str(tmp_path_factory.mktemp("robots_fx") / "fx")
    shutil.copytree(src, dst)
    pages = os.path.join(dst, "pages.parquet")
    t = pq.read_table(pages)
    host = sorted(set(t["host"].to_pylist()))[0]  # alpha.test
    extra = pa.table({
        "url": [f"http://{host}/robots.txt"],
        "host": [host],
        "kind": ["page"],
        "engine": ["html-generic"],
        "body": [ROBOTS],
        "content_type": ["text/plain"],
        "status": [200],
        "next_url": [""],
    }).cast(t.schema)
    pq.write_table(pa.concat_tables([t, extra]), pages)
    return dst, host


def test_discover_robots_point_lookup(robots_fixture):
    fx, host = robots_fixture
    got = discover_robots(os.path.join(fx, "pages.parquet"), [host, "nosuch.test"])
    assert got == {host: ["/thread/", "/img/"]}


def test_e2e_robots_pruned_and_override(ray_session, robots_fixture, tmp_path):
    fx, host = robots_fixture
    golden = simulate_fixture_dir(fx)
    golden_host_t = {u for u in golden.seen
                     if u.startswith(f"http://{host}/thread/")}
    assert golden_host_t, "micro fixture must have /thread/ URLs on the robots host"

    out = str(tmp_path / "obey")
    stats = Crawler(fx, out, CrawlConfig(num_shards=2, target_tasks=2)).run()
    # offered-then-denied URLs stay in the seen set (dedup semantics:
    # a denied URL must not be re-offered forever); the enforcement
    # contract is that they are never POLLED or FETCHED
    assert stats["robots_denied"] > 0
    df = ordered_items(out).to_pandas()
    pref = f"http://{host}/thread/"
    assert len(df) > 0
    # thread ITEM rows (parsed from allowed board pages, url = the
    # thread's address) legitimately remain; nothing may have been
    # parsed FROM a disallowed page (origin under the pruned subtree)
    assert not df["origin"].str.startswith(pref).any()
    assert len(df) < len(golden.entries)  # posts behind /thread/ gone
    # other hosts unaffected
    assert (df["url"].str.contains("beta.test") | df["origin"].str.contains("beta.test")).any()

    # operator override: config wins for that host
    out2 = str(tmp_path / "override")
    Crawler(fx, out2, CrawlConfig(num_shards=2, target_tasks=2,
                                  robots={host: []})).run()
    seen2 = {r["url"]: r["failed"] for r in pq.read_table(
        os.path.join(out2, "seen.parquet")).to_pylist()}
    assert seen2 == golden.seen  # nothing pruned anywhere: golden crawl

    # opt-out flag restores the golden crawl exactly
    out3 = str(tmp_path / "optout")
    Crawler(fx, out3, CrawlConfig(num_shards=2, target_tasks=2,
                                  obey_robots_txt=False)).run()
    seen3 = {r["url"]: r["failed"] for r in pq.read_table(
        os.path.join(out3, "seen.parquet")).to_pylist()}
    assert seen3 == golden.seen


def test_pump_obeys_robots(ray_session, robots_fixture, tmp_path):
    from forum_dl_ray.crawl.pump import MultiPumpCrawler

    fx, host = robots_fixture
    golden = simulate_fixture_dir(fx)
    golden_host_t = {u for u in golden.seen if u.startswith(f"http://{host}/thread/")}
    out = str(tmp_path / "pump_obey")
    MultiPumpCrawler(fx, out, CrawlConfig(num_shards=4, min_rows_per_task=64),
                     n_pumps=2).run()
    df = ordered_items(out).to_pandas()
    pref = f"http://{host}/thread/"
    assert len(df) > 0
    assert not df["origin"].str.startswith(pref).any()
    assert len(df) < len(golden.entries)


# ------------------------------------------------------- property tests
from hypothesis import given, settings
from hypothesis import strategies as st

_path = st.from_regex(r"/[a-z0-9/]{0,12}", fullmatch=True)
_agent = st.sampled_from(["*", "forum-dl-ray", "forum", "evilbot", "x"])
_group = st.tuples(st.lists(_agent, min_size=1, max_size=3),
                   st.lists(_path, min_size=0, max_size=4))


@settings(max_examples=200, deadline=None)
@given(st.lists(_group, min_size=0, max_size=5))
def test_parse_robots_group_semantics(groups):
    """Reference model (RFC 9309 §2.2.1): only the group(s) with the
    LONGEST specific (non-'*') agent token that prefixes ours apply;
    '*' groups apply only when no specific group matches; rules keep
    file order; non-empty only."""
    text = "\n".join(
        "\n".join([f"User-agent: {a}" for a, _ in [(a, None) for a in agents]]
                  + [f"Disallow: {p}" for p in paths])
        for agents, paths in groups
    )
    ua = "forum-dl-ray"
    # RFC 9309: consecutive User-agent lines form ONE group, so a
    # rule-less group's agents merge into the next group that has
    # rules (hypothesis found this — blank lines don't split groups)
    merged, pending = [], []
    for agents, paths in groups:
        pending += agents
        if paths:
            merged.append((pending, paths))
            pending = []
    if pending:
        # a trailing rule-less group is still a group: a specific UA
        # match there means "this agent: allow all", suppressing '*'
        merged.append((pending, []))
    best = max((len(a) for agents, _ in merged for a in agents
                if a != "*" and ua.startswith(a)), default=-1)
    if best >= 0:
        want = [p for agents, paths in merged
                if any(a != "*" and ua.startswith(a) and len(a) == best
                       for a in agents)
                for p in paths if p]
    else:
        want = [p for agents, paths in merged if "*" in agents
                for p in paths if p]
    assert parse_robots(text, user_agent=ua) == want


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet=st.characters(blacklist_categories=("Cs",)),
               max_size=400))
def test_parse_robots_never_raises(text):
    rules = parse_robots(text)
    assert all(isinstance(r, str) and r for r in rules)


# --------------------------------------------- Allow + wildcards (RFC §2.2.2)
from forum_dl_ray.frontier.shard import ShardState, _compile_robots, _robots_decision


def _allows(rules, path):
    s = ShardState(0, capacity=64)
    s.set_robots("h.test", rules)
    return s._robots_allows("h.test", f"http://h.test{path}")


def test_allow_carves_out_of_disallow():
    rules = ["/admin/", "!/admin/public/"]
    assert not _allows(rules, "/admin/secret")
    assert _allows(rules, "/admin/public/page")
    assert _allows(rules, "/other")
    # tie between equal-length patterns -> Allow wins (RFC §2.2.2)
    assert _allows(["/p/", "!/p/"], "/p/x")
    # longest match wins regardless of file order
    assert not _allows(["!/a/", "/a/b/"], "/a/b/c")
    assert _allows(["/a/b/", "!/a/"][::-1], "/a/c")


def test_wildcard_and_anchor_patterns():
    assert not _allows(["/*.php"], "/index.php")
    assert not _allows(["/*.php"], "/dir/page.php?x=1")
    assert _allows(["/*.php$"], "/index.php?x=1")   # anchored: query breaks it
    assert not _allows(["/*.php$"], "/index.php")
    assert not _allows(["/thread/*/edit"], "/thread/42/edit")
    assert _allows(["/thread/*/edit"], "/thread/42/view")
    # '*' in an Allow carve-out
    assert _allows(["/files/", "!/files/*.css"], "/files/site.css")
    assert not _allows(["/files/", "!/files/*.css"], "/files/doc.pdf")
    # plain prefixes still take the fast path (no regex compiled)
    prefixes, compiled = _compile_robots(["/a/", "/b/"])
    assert compiled is None and prefixes == ["/a/", "/b/"]
    _, compiled2 = _compile_robots(["/a/", "!/a/b/"])
    assert compiled2 is not None


def test_robots_rules_survive_snapshot_restore():
    s = ShardState(0, capacity=64)
    s.set_robots("h.test", ["/admin/", "!/admin/pub*", "/tmp$"])
    snap = s.snapshot()
    s2 = ShardState(0, capacity=64)
    s2.restore(snap)
    for path, want in [("/admin/x", False), ("/admin/pub/y", True),
                       ("/tmp", False), ("/tmpX", True)]:
        assert s2._robots_allows("h.test", f"http://h.test{path}") is want


def _model_match(pattern: str, path: str) -> bool:
    """Independent char-walk matcher (no regex): does `pattern` match
    a prefix of `path`? '*' = any run (incl. empty), trailing '$' =
    must consume the WHOLE path."""
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    starts = {0}
    for c in pattern:
        nxt = set()
        if c == "*":
            for s0 in starts:
                nxt.update(range(s0, len(path) + 1))
        else:
            for s0 in starts:
                if s0 < len(path) and path[s0] == c:
                    nxt.add(s0 + 1)
        starts = nxt
        if not starts:
            return False
    return (len(path) in starts) if anchored else True


_rpat = st.from_regex(r"/[a-z0-9*$/.]{0,8}", fullmatch=True).filter(
    lambda p: "$" not in p[:-1])
_rrule = st.tuples(_rpat, st.booleans())


@settings(max_examples=300, deadline=None)
@given(st.lists(_rrule, min_size=0, max_size=6),
       st.from_regex(r"/[a-z0-9/.]{0,10}", fullmatch=True))
def test_robots_precedence_model(rules, path):
    """RFC §2.2.2 reference model: among matching rules the longest
    pattern wins; tie -> allow; none -> allow. The shard matcher must
    agree for every generated rule set / path."""
    enc = [("!" + p) if allow else p for p, allow in rules]
    matches = [(len(p), allow) for p, allow in rules if _model_match(p, path)]
    if not matches:
        want = True
    else:
        top = max(n for n, _ in matches)
        want = any(allow for n, allow in matches if n == top)
    prefixes, compiled = _compile_robots(enc) if enc else ([], None)
    if compiled is None:
        got = not any(path.startswith(p) for p in (prefixes or []))
    else:
        got = _robots_decision(compiled, path)
    assert got is want


def test_e2e_allow_carveout(ray_session, tmp_path, tmp_path_factory):
    """A Disallow with an Allow carve-out: the carved subtree is
    crawled, the rest of the disallowed subtree is pruned."""
    src = generate_fixture(micro_spec())
    fx = str(tmp_path_factory.mktemp("carve") / "fx")
    shutil.copytree(src, fx)
    pages = os.path.join(fx, "pages.parquet")
    t = pq.read_table(pages)
    host = sorted(set(t["host"].to_pylist()))[0]
    # find a real thread subtree to carve back in
    threads = sorted(u for u in t["url"].to_pylist()
                     if u.startswith(f"http://{host}/thread/"))
    assert threads
    carve = threads[0].split(host, 1)[1]  # e.g. /thread/t0
    body = (f"User-agent: *\nDisallow: /thread/\n"
            f"Allow: {carve}\n").encode()
    extra = pa.table({
        "url": [f"http://{host}/robots.txt"], "host": [host],
        "kind": ["page"], "engine": ["html-generic"], "body": [body],
        "content_type": ["text/plain"], "status": [200], "next_url": [""],
    }).cast(t.schema)
    pq.write_table(pa.concat_tables([t, extra]), pages)

    out = str(tmp_path / "carve_out")
    Crawler(fx, out, CrawlConfig(num_shards=2, target_tasks=2)).run()
    df = ordered_items(out).to_pandas()
    origins = df["origin"].tolist()
    pref = f"http://{host}/thread/"
    carved_pref = f"http://{host}{carve}"
    # carved thread WAS crawled; its sibling threads were not
    assert any(o.startswith(carved_pref) for o in origins)
    assert not any(o.startswith(pref) and not o.startswith(carved_pref)
                   for o in origins)


def test_hostile_star_pattern_is_linear_time():
    """r5 review: chained '.*' regexes backtrack catastrophically on
    star-heavy patterns — one crafted robots.txt line would hang the
    shard actor on every offer. The greedy segment matcher must decide
    in linear time."""
    import time

    rules = ["/" + "*a" * 20 + "$"]
    _, compiled = _compile_robots(rules)
    path = "/" + "a" * 2000 + "b"
    t0 = time.perf_counter()
    allowed = _robots_decision(compiled, path)
    elapsed = time.perf_counter() - t0
    assert allowed is True  # $-anchored pattern can't match ...b
    assert elapsed < 0.5, f"matcher not linear: {elapsed:.3f}s"
    # and the matching variant still matches
    assert _robots_decision(compiled, "/" + "a" * 2000) is False


def test_malformed_disallow_cannot_inject_allow():
    """r5 review: 'Disallow: !<path>' must not decode as an Allow
    carve-out through the internal '!'-prefix encoding (it would make
    a malformed remote line WEAKEN a legitimate Disallow). Values not
    starting with '/' or '*' are dropped at parse time."""
    txt = "User-agent: *\nDisallow: /private\nDisallow: !/private/x\n"
    rules = parse_robots(txt)
    assert rules == ["/private"]
    prefixes, compiled = _compile_robots(rules)
    if compiled is None:
        assert any("/private/x".startswith(p) for p in prefixes)
    else:
        assert _robots_decision(compiled, "/private/x") is False
    # same for Allow lines with junk values
    assert parse_robots("User-agent: *\nAllow: !x\nDisallow: /a\n") == ["/a"]


def test_non_rule_lines_do_not_split_agent_runs():
    """r5 review: RFC 9309 §2.2.2 — lines the parser doesn't support
    MUST NOT interfere with group parsing. A Sitemap:/Crawl-delay:
    line between two User-agent lines must not split the merged
    group (it dropped the earlier agent's rules)."""
    txt = ("User-agent: forum-dl\n"
           "Sitemap: http://h/s.xml\n"
           "User-agent: other\n"
           "Crawl-delay: 5\n"
           "Disallow: /private\n")
    assert parse_robots(txt, "forum-dl-ray") == ["/private"]
    assert parse_robots(txt, "other-bot") == ["/private"]
    # and a rule line still closes the run: a later User-agent opens
    # a NEW group that does not inherit /private
    txt2 = txt + "User-agent: third\nDisallow: /only-third\n"
    assert parse_robots(txt2, "third-bot") == ["/only-third"]
    assert parse_robots(txt2, "forum-dl-ray") == ["/private"]
