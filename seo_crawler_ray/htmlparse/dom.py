"""Minimal DOM built on stdlib ``html.parser`` for reference-parity extraction.

BeautifulSoup is not available in this environment, so this module provides
the small subset of DOM semantics the extraction operators need, matching
the behavior of ``BeautifulSoup(content, 'html.parser')`` as used by the
reference (``/root/reference/src/core/seo_extractor.py`` and
``/root/reference/src/core/link_manager.py``):

- character references are decoded (``convert_charrefs=True`` default),
- ``get_text()`` concatenates all descendant text (scripts/styles included,
  comments excluded) with no separator,
- attributes keep their first occurrence; multi-valued attributes (``rel``)
  can be matched by membership,
- void elements (``meta``, ``img``, ``link``, ``br``, ...) never take
  children,
- mismatched end tags pop the open-element stack up to the matching tag and
  are otherwise ignored (the synthetic corpus is well-formed, so the exotic
  implied-end-tag rules of html5 parsers are intentionally out of scope).

Parsing is row-wise by nature (like the reference's per-page soup); the Ray
pipeline amortizes it via ``map_batches`` actor pools.
"""
from __future__ import annotations

from html.parser import HTMLParser

VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

# rel is the only multi-valued attribute the extractors match on
_MULTI_VALUED = frozenset({"rel"})


class Node:
    """One element node. ``children`` holds Node and str (text) members."""

    __slots__ = ("name", "attrs", "children", "parent")

    def __init__(self, name: str, attrs: dict, parent: "Node | None"):
        self.name = name
        self.attrs = attrs
        self.children: list = []
        self.parent = parent

    # -- attribute access -------------------------------------------------
    def get(self, key: str, default=None):
        return self.attrs.get(key, default)

    def has_attr(self, key: str) -> bool:
        return key in self.attrs

    def attr_contains(self, key: str, value: str) -> bool:
        """Membership match for (possibly) multi-valued attributes,
        mirroring bs4's list-valued ``rel`` handling."""
        raw = self.attrs.get(key)
        if raw is None:
            return False
        if key in _MULTI_VALUED:
            return value in raw.split()
        return raw == value

    # -- traversal --------------------------------------------------------
    def iter_elements(self):
        """All descendant elements in document order (self excluded)."""
        stack = list(reversed(self.children))
        while stack:
            node = stack.pop()
            if isinstance(node, Node):
                yield node
                stack.extend(reversed(node.children))

    def get_text(self) -> str:
        parts: list[str] = []
        stack = list(reversed(self.children))
        while stack:
            node = stack.pop()
            if isinstance(node, str):
                parts.append(node)
            else:
                stack.extend(reversed(node.children))
        return "".join(parts)

    @property
    def string(self) -> str | None:
        """bs4 ``.string``: the single text child, else None."""
        texts = [c for c in self.children if isinstance(c, str)]
        if len(texts) == 1 and all(isinstance(c, str) for c in self.children):
            return texts[0]
        if not self.children:
            return None
        if len(self.children) == 1 and isinstance(self.children[0], str):
            return self.children[0]
        return None

    # -- finders ----------------------------------------------------------
    def find(self, _tag: str | None = None, **attr_filters):
        # keyword filters may include "name" (e.g. find("meta", name="description")),
        # so the tag is the positional argument only
        for el in self.iter_elements():
            if _matches(el, _tag, attr_filters):
                return el
        return None

    def find_all(self, _tag: str | None = None, limit: int | None = None, **attr_filters):
        out = []
        for el in self.iter_elements():
            if _matches(el, _tag, attr_filters):
                out.append(el)
                if limit is not None and len(out) >= limit:
                    break
        return out

    def __repr__(self):  # pragma: no cover - debug aid
        return f"<Node {self.name} {self.attrs}>"


def _matches(el: Node, name: str | None, attr_filters: dict) -> bool:
    if name is not None and el.name != name:
        return False
    for key, want in attr_filters.items():
        key = key.rstrip("_")  # allow class_= style
        if want is True:  # attribute presence
            if key not in el.attrs:
                return False
        elif hasattr(want, "search"):  # compiled regex on the raw value
            raw = el.attrs.get(key)
            if raw is None or not want.search(raw):
                return False
        else:
            if not el.attr_contains(key, want):
                return False
    return True


class IndexedDoc:
    """Index over a parsed tree: elements grouped by tag name (in document
    order) plus the concatenated text. Presents the same
    ``find``/``find_all``/``get_text`` surface the extractors use, so the
    ten extractor passes cost zero extra tree walks (semantics identical to
    walking the tree each time — start-tag event order IS DFS pre-order,
    and handle_data order IS text document order).

    Built either inline by the parser (``parse_html_indexed``, the hot
    path) or by walking an existing tree (``IndexedDoc(root)``)."""

    __slots__ = ("root", "by_tag", "elements", "_text")

    def __init__(self, root: Node, _prebuilt: tuple | None = None):
        self.root = root
        if _prebuilt is not None:
            self.by_tag, self.elements, self._text = _prebuilt
            return
        by_tag: dict[str, list[Node]] = {}
        elements: list[Node] = []
        parts: list[str] = []
        stack = list(reversed(root.children))
        while stack:
            node = stack.pop()
            if isinstance(node, str):
                parts.append(node)
                continue
            elements.append(node)
            by_tag.setdefault(node.name, []).append(node)
            stack.extend(reversed(node.children))
        self.by_tag = by_tag
        self.elements = elements
        self._text = "".join(parts)

    def get_text(self) -> str:
        return self._text

    def find(self, _tag: str | None = None, **attr_filters):
        pool = self.by_tag.get(_tag, []) if _tag else self.elements
        for el in pool:
            if _matches(el, None, attr_filters):
                return el
        return None

    def find_all(self, _tag: str | None = None, limit: int | None = None,
                 **attr_filters):
        pool = self.by_tag.get(_tag, []) if _tag else self.elements
        if not attr_filters:
            return pool[:limit] if limit is not None else list(pool)
        out = []
        for el in pool:
            if _matches(el, None, attr_filters):
                out.append(el)
                if limit is not None and len(out) >= limit:
                    break
        return out


class _TreeBuilder(HTMLParser):
    """Builds the Node tree AND the IndexedDoc structures in one pass:
    start-tag event order equals DFS pre-order and data event order equals
    text document order, so no post-parse walk is needed."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("[document]", {}, None)
        self.stack = [self.root]
        self.by_tag: dict[str, list[Node]] = {}
        self.elements: list[Node] = []
        self.text_parts: list[str] = []

    def _attrs_dict(self, attrs) -> dict:
        out = {}
        for k, v in attrs:
            if k not in out:  # first occurrence wins
                out[k] = v if v is not None else ""
        return out

    def _record(self, node: Node) -> None:
        self.elements.append(node)
        bucket = self.by_tag.get(node.name)
        if bucket is None:
            self.by_tag[node.name] = [node]
        else:
            bucket.append(node)

    def handle_starttag(self, tag, attrs):
        node = Node(tag, self._attrs_dict(attrs), self.stack[-1])
        self.stack[-1].children.append(node)
        self._record(node)
        if tag not in VOID_ELEMENTS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        node = Node(tag, self._attrs_dict(attrs), self.stack[-1])
        self.stack[-1].children.append(node)
        self._record(node)

    def handle_endtag(self, tag):
        if tag in VOID_ELEMENTS:
            return
        # pop to the matching open tag; ignore stray end tags
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].name == tag:
                del self.stack[i:]
                return

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)
            self.text_parts.append(data)

    def updatepos(self, i, j):
        # line/column tracking is unused (no getpos() callers); skip the
        # newline-count walk _markupbase does — contract is "return j"
        return j

    # comments, PIs, declarations: ignored (not part of get_text)


# --------------------------------------------------------- fast scanner --
# Reuse html.parser's own compiled regexes for tag-name / attribute / tag-end
# tolerance so attribute parsing is byte-identical to the stdlib path.
import re as _re
from html import unescape as _unescape
from html.parser import (attrfind_tolerant as _ATTR,
                         locatestarttagend_tolerant as _STARTEND,
                         tagfind_tolerant as _TAGNAME)

_ENDTAG = _re.compile(r"</\s*([a-zA-Z][-.a-zA-Z0-9:_]*)\s*>")
_TAG_CONTINUATION = frozenset(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ=/")
_COMMENTCLOSE = _re.compile(r"--\s*>")     # html.parser's _markupbase close
# html.parser (3.11) set_cdata_mode: interesting = r'</\s*%s\s*>' — the close
# must include the '>'; '</scriptfoo>' or a truncated '</script' at EOF never
# leaves CDATA mode and all buffered content is dropped.
_CDATA_CLOSE = {
    t: _re.compile(rf"</\s*{t}\s*>", _re.IGNORECASE)
    for t in ("script", "style")
}
CDATA_CONTENT_ELEMENTS = ("script", "style")


class _FastTreeBuilder:
    """Regex scanner emitting the same events as ``_TreeBuilder`` on
    html.parser (convert_charrefs=True): one data call per inter-tag text
    span (charrefs converted except inside script/style CDATA), stdlib
    regexes for start-tag/attribute tolerance, comments/declarations/PIs
    skipped. ~3x faster than html.parser's goahead; the stdlib builder
    remains the reference and a parity test diffs the two over the corpus
    and adversarial snippets."""

    __slots__ = ("root", "stack", "by_tag", "elements", "text_parts")

    def __init__(self):
        self.root = Node("[document]", {}, None)
        self.stack = [self.root]
        self.by_tag: dict[str, list[Node]] = {}
        self.elements: list[Node] = []
        self.text_parts: list[str] = []

    def _data(self, data: str, convert: bool) -> None:
        if convert and "&" in data:
            data = _unescape(data)     # may become '' (invalid charrefs)
        if not data:
            return
        self.stack[-1].children.append(data)
        self.text_parts.append(data)

    def _start(self, tag: str, attrs: dict, self_closing: bool) -> None:
        node = Node(tag, attrs, self.stack[-1])
        self.stack[-1].children.append(node)
        self.elements.append(node)
        bucket = self.by_tag.get(tag)
        if bucket is None:
            self.by_tag[tag] = [node]
        else:
            bucket.append(node)
        if not self_closing and tag not in VOID_ELEMENTS:
            self.stack.append(node)

    def _end(self, tag: str) -> None:
        if tag in VOID_ELEMENTS:
            return
        stack = self.stack
        for i in range(len(stack) - 1, 0, -1):
            if stack[i].name == tag:
                del stack[i:]
                return

    def feed(self, s: str) -> None:
        pos = 0
        n = len(s)
        find = s.find
        while pos < n:
            lt = find("<", pos)
            if lt < 0:
                self._data(s[pos:], True)
                break
            if lt > pos:
                self._data(s[pos:lt], True)
            nxt = s[lt + 1] if lt + 1 < n else ""
            if nxt == "/":
                m = _ENDTAG.match(s, lt)
                if m:
                    self._end(m.group(1).lower())
                    pos = m.end()
                elif s.startswith("</>", lt):
                    pos = lt + 3           # tokenizer end-tag-open state
                else:
                    nm = _TAGNAME.match(s, lt + 2)
                    if nm:                 # tolerant endtag: '</A/x>' still
                        gt = find(">", nm.end())   # closes A at the next '>'
                        if gt < 0:
                            pos = self._eof_recover(s, lt, n, find)
                        else:
                            self._end(nm.group(1).lower())
                            pos = gt + 1
                    else:                  # bogus comment: drop to '>'
                        gt = find(">", lt)
                        if gt < 0:
                            self._data(s[lt:], True)
                            pos = n
                        else:
                            pos = gt + 1
            elif nxt.isalpha():
                pos = self._parse_starttag(s, lt, n, find)
            elif s.startswith("<!--", lt):
                cm = _COMMENTCLOSE.search(s, lt + 4)
                if cm is None:
                    pos = self._eof_recover(s, lt, n, find)
                else:
                    pos = cm.end()
            elif nxt in ("!", "?"):
                gt = find(">", lt)
                if gt < 0:
                    pos = self._eof_recover(s, lt, n, find)
                else:
                    pos = gt + 1
            else:                          # lone '<' is text
                self._data("<", False)
                pos = lt + 1

    def _eof_recover(self, s: str, lt: int, n: int, find) -> int:
        """Unterminated <!-- / <! / <? construct: html.parser's close()
        recovery emits data up to and including the NEXT '>' (converted)
        and resumes parsing there; with no '>' left it degrades to '<' +
        trailing text — identical merged text to flushing the rest."""
        gt = find(">", lt + 1)
        if gt >= 0:
            self._data(s[lt:gt + 1], True)
            return gt + 1
        self._data(s[lt:], True)
        return n

    def _parse_starttag(self, s: str, lt: int, n: int, find) -> int:
        # endpos exactly as html.parser's check_for_whole_start_tag: the
        # tolerant match bound decides; '>' / '/>' close the tag, a
        # continuation char (letter, '=', '/') or EOF means "incomplete"
        # (close()-recovery = data up to the next '>'), anything else is
        # junk bounded at the match end
        endm = _STARTEND.match(s, lt)
        j = endm.end()
        nxt2 = s[j:j + 1]
        if nxt2 == ">":
            endpos = j + 1
        elif nxt2 == "/" and s.startswith("/>", j):
            endpos = j + 2
        elif nxt2 == "" or nxt2 in _TAG_CONTINUATION:
            return self._eof_recover(s, lt, n, find)
        else:
            endpos = j if j > lt else lt + 1
        m = _TAGNAME.match(s, lt + 1)
        tag = m.group(1).lower()
        attrs: dict = {}
        k = m.end()
        while k < endpos:
            am = _ATTR.match(s, k)
            if not am:
                break
            name, _eq, value = am.group(1, 2, 3)
            if value is None:
                value = ""
            else:
                if value[:1] in ("'", '"') and value[:1] == value[-1:]:
                    value = value[1:-1]
                if "&" in value:
                    value = _unescape(value)
            name = name.lower()
            if name not in attrs:          # first occurrence wins
                attrs[name] = value
            k = am.end()
        rest = s[k:endpos].strip()
        if rest not in (">", "/>"):        # junk in tag: stdlib emits the
            self._data(s[lt:endpos], True)     # whole tag as converted data
            return endpos
        self_closing = rest == "/>"
        self._start(tag, attrs, self_closing)
        pos = endpos
        if not self_closing and tag in CDATA_CONTENT_ELEMENTS:
            cm = _CDATA_CLOSE[tag].search(s, pos)
            if cm:                         # full '</tag>' close: emit raw
                self._data(s[pos:cm.start()], False)   # data, close, resume
                self._end(tag)             # right after the matched '>'
                pos = cm.end()
            else:                          # unterminated CDATA at EOF:
                pos = n                    # html.parser drops it (goahead
                                           # breaks in cdata mode w/o close)
        return pos


def parse_html(content: bytes | str) -> Node:
    """Parse HTML bytes/str into a Node tree (document root)."""
    if isinstance(content, (bytes, bytearray)):
        content = content.decode("utf-8", errors="replace")
    builder = _FastTreeBuilder()
    builder.feed(content)
    return builder.root


def parse_html_indexed(content: bytes | str) -> IndexedDoc:
    """Parse straight into an IndexedDoc (hot path: no post-parse walk)."""
    if isinstance(content, (bytes, bytearray)):
        content = content.decode("utf-8", errors="replace")
    builder = _FastTreeBuilder()
    builder.feed(content)
    return IndexedDoc(builder.root,
                      _prebuilt=(builder.by_tag, builder.elements,
                                 "".join(builder.text_parts)))


def parse_html_stdlib(content: bytes | str) -> IndexedDoc:
    """Reference path on stdlib html.parser — kept for parity testing."""
    if isinstance(content, (bytes, bytearray)):
        content = content.decode("utf-8", errors="replace")
    builder = _TreeBuilder()
    builder.feed(content)
    builder.close()
    return IndexedDoc(builder.root,
                      _prebuilt=(builder.by_tag, builder.elements,
                                 "".join(builder.text_parts)))
