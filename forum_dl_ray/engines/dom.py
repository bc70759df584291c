"""Tolerant stdlib DOM — the bs4 stand-in behind the HTML kernels (M4).

The reference parses every page with bs4/lxml (soup.py:12-205). This
container has neither, so the fast path in ``html_generic`` uses
compiled regexes that are exact ONLY because the fixture HTML is
attribute-ordered. Real phpBB/XenForo pages reorder attributes, add
classes and whitespace — a regex kernel silently extracts nothing.

This module is the robustness seam: a small DOM built on stdlib
``html.parser.HTMLParser`` (always present) with

- tolerant tree building: unclosed tags are implicitly closed, stray
  end tags ignored, void elements (img/br/link/meta/...) never pushed;
- byte-exact inner HTML: node content is recovered as a raw substring
  of the original document via event offsets (``get_starttag_text`` +
  ``getpos``), NOT re-serialized — so content extracted through the
  DOM is identical to what the regex kernels capture on well-formed
  input (golden hashes are preserved);
- a bs4-shaped query surface (``find_all(tag, cls=, id_re=, attrs=)``)
  sufficient for every selector the reference uses
  (extractors/phpbb.py:451-487, xenforo.py:468-505,
  simplemachines.py:403-436, vbulletin.py:349-371,
  invision.py:208-228, proboards.py:344-363).

Cost: pure-Python parse, ~10x a regex scan. ``html_generic`` therefore
keeps the regex fast path and falls back here only when a regex kernel
comes up empty on a page that plainly has the content (the
attribute-reordered case) — the hot crawl path never pays for it.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

# HTML void elements: start tag only, never receive an end tag, must
# not be pushed onto the open-element stack (WHATWG spec list).
VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)


class Node:
    __slots__ = ("tag", "attrs", "parent", "children", "_inner_start", "_inner_end", "_doc")

    def __init__(self, tag: str, attrs: dict, parent: "Node | None", doc: str):
        self.tag = tag
        self.attrs = attrs
        self.parent = parent
        self.children: list = []  # Node | str (text runs), document order
        self._inner_start = -1
        self._inner_end = -1
        self._doc = doc

    # -- content ----------------------------------------------------------
    def inner_html(self) -> str:
        """Raw inner markup: a byte-exact substring of the source
        document (never re-serialized — attribute order inside content
        is whatever the page had)."""
        if self._inner_start < 0:
            return ""
        return self._doc[self._inner_start : self._inner_end]

    def get_text(self) -> str:
        parts: list[str] = []
        stack = list(reversed(self.children))
        while stack:
            c = stack.pop()
            if isinstance(c, str):
                parts.append(c)
            else:
                stack.extend(reversed(c.children))
        return "".join(parts)

    @property
    def string(self) -> str:
        return self.get_text()

    # -- attributes -------------------------------------------------------
    def get(self, name: str, default=None):
        return self.attrs.get(name, default)

    def classes(self) -> list[str]:
        return (self.attrs.get("class") or "").split()

    # -- queries ----------------------------------------------------------
    def iter(self):
        """All element descendants (not self), document order."""
        stack = list(reversed([c for c in self.children if isinstance(c, Node)]))
        while stack:
            n = stack.pop()
            yield n
            stack.extend(reversed([c for c in n.children if isinstance(c, Node)]))

    def find_all(self, tag=None, cls: str | None = None, id_re=None, attrs: dict | None = None):
        return [n for n in self.iter() if _matches(n, tag, cls, id_re, attrs)]

    def find(self, tag=None, cls: str | None = None, id_re=None, attrs: dict | None = None):
        for n in self.iter():
            if _matches(n, tag, cls, id_re, attrs):
                return n
        return None

    def __repr__(self) -> str:  # debugging aid only
        return f"<Node {self.tag} {self.attrs}>"


def _matches(n: Node, tag, cls, id_re, attrs) -> bool:
    """bs4-``find`` style predicate. ``tag``: str or set/tuple of str;
    ``cls``: one class that must appear in the class list (str) or a
    set — any member suffices; ``id_re``: compiled regex fullmatch on
    id; ``attrs``: {name: True (present) | str (equal) | regex
    (search)}."""
    if tag is not None:
        if isinstance(tag, str):
            if n.tag != tag:
                return False
        elif n.tag not in tag:
            return False
    if cls is not None:
        cl = n.classes()
        if isinstance(cls, str):
            if cls not in cl:
                return False
        elif not any(c in cl for c in cls):
            return False
    if id_re is not None:
        i = n.attrs.get("id")
        if i is None or not id_re.match(i):
            return False
    if attrs:
        for k, want in attrs.items():
            have = n.attrs.get(k)
            if want is True:
                if have is None:
                    return False
            elif isinstance(want, str):
                if have != want:
                    return False
            else:  # compiled regex
                if have is None or not want.search(have):
                    return False
    return True


class _TreeBuilder(HTMLParser):
    def __init__(self, doc: str):
        # convert_charrefs=True coalesces entity refs into text runs
        # (get_text sees decoded text); inner_html is offset-based so
        # raw markup is unaffected.
        super().__init__(convert_charrefs=True)
        self.doc = doc
        # absolute offset of the start of each line, for getpos()->offset
        self.line_starts = [0]
        pos = doc.find("\n")
        while pos != -1:
            self.line_starts.append(pos + 1)
            pos = doc.find("\n", pos + 1)
        self.root = Node("[document]", {}, None, doc)
        self.root._inner_start = 0
        self.root._inner_end = len(doc)
        self.stack = [self.root]

    def _offset(self) -> int:
        line, col = self.getpos()
        return self.line_starts[line - 1] + col

    # -- events -----------------------------------------------------------
    def handle_starttag(self, tag, attrs):
        # first-wins on duplicate attribute names (browser behavior)
        ad: dict = {}
        for k, v in attrs:
            if k not in ad:
                ad[k] = v if v is not None else ""
        parent = self.stack[-1]
        node = Node(tag, ad, parent, self.doc)
        parent.children.append(node)
        raw = self.get_starttag_text() or ""
        node._inner_start = self._offset() + len(raw)
        if raw.endswith("/>") or tag in VOID_TAGS:
            node._inner_end = node._inner_start
        else:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self.handle_starttag(tag, attrs)
        # handle_starttag saw the '/>' (or void tag) and did not push

    def handle_endtag(self, tag):
        end = self._offset()
        # tolerant close: pop to the nearest matching open tag; if none
        # is open, the end tag is stray — ignore it.
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                for n in self.stack[i:]:
                    n._inner_end = end
                del self.stack[i:]
                return

    def handle_data(self, data):
        self.stack[-1].children.append(data)

    def finish(self) -> Node:
        self.close()
        end = len(self.doc)
        for n in self.stack[1:]:
            n._inner_end = end
        return self.root


def parse_dom(text: str | bytes) -> Node:
    """Parse (possibly malformed) HTML into a tolerant DOM; returns the
    document root node."""
    if isinstance(text, bytes):
        text = text.decode("utf-8", "replace")
    b = _TreeBuilder(text)
    b.feed(text)
    return b.finish()


_TAG_RE = re.compile(r"<(\w[\w:-]*)((?:\s+[\w:-]+(?:=\"[^\"]*\")?)+)(\s*/?)>")
_ATTR_RE = re.compile(r"\s+([\w:-]+(?:=\"[^\"]*\")?)")


def shuffle_attributes(html: str | bytes, *, reverse: bool = True) -> str | bytes:
    """Deterministically reorder every tag's attributes (reverse order).

    Test helper: produces the attribute-reordered variant of a page
    that real forum software emits and that the regex fast path cannot
    parse — used to prove the DOM fallback path yields identical
    structured output (tests/test_dom_fallback.py)."""
    is_bytes = isinstance(html, bytes)
    text = html.decode("utf-8", "replace") if is_bytes else html

    def sub(m: re.Match) -> str:
        parts = _ATTR_RE.findall(m.group(2))
        if len(parts) > 1 and reverse:
            parts = parts[::-1]
        return f"<{m.group(1)} " + " ".join(parts) + f"{m.group(3)}>"

    out = _TAG_RE.sub(sub, text)
    return out.encode("utf-8") if is_bytes else out
