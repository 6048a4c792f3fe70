"""HTML parsing to a lightweight DOM, matching the reference engine's
observable behavior on its test fixtures.

The reference parses HTTP bodies with libxml
(reference: lib/Request.js:51-52 ``libxml.parseHtml(document, {baseUrl,
huge: true})``) and exposes Document/Element/Attribute nodes
(reference: index.js:429-434). This module re-creates the *fixture-visible*
subset of that behavior on the stdlib ``html.parser`` — no lxml dependency —
so it can run inside Arrow UDFs on any executor.

Fixture-visible behaviors reproduced here:

- implicit ``html``/``head``/``body`` structure for fragment inputs;
- libxml's Content-Type ``<meta>`` injected as the first child of an
  explicit ``<head>`` (visible in the reference golden for ``head:html``,
  reference: test/set.js:8-9);
- ``text()`` = concatenation of descendant text nodes (no normalization);
- ``toString()`` (``:source``) / ``innerHTML`` (``:html``) serialization;
- attribute values kept raw (no URL decoding) so ``follow('@href')``
  preserves encoding (reference: lib/commands/follow.js:39-46).
"""

from __future__ import annotations

import os
import re
from html import unescape as _unescape
from html.parser import HTMLParser as _StdHTMLParser

try:
    # private stdlib regexes the fast tokenizer reuses for bit-identical
    # attribute parsing; undocumented, so a future Python may rename or
    # drop them — fall back to the stdlib feed path instead of failing
    # the whole package import
    from html.parser import (
        attrfind_tolerant as _attrfind,
        locatestarttagend_tolerant as _locatestart,
        tagfind_tolerant as _tagfind,
    )
    _HAVE_TOLERANT_RE = True
except ImportError:  # pragma: no cover — depends on stdlib version
    _attrfind = _locatestart = _tagfind = None
    _HAVE_TOLERANT_RE = False

VOID_ELEMENTS = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}

# Tags placed into <head> when they appear before any body content.
_HEAD_TAGS = {"title", "meta", "link", "base", "style"}

_TEXT_ESCAPES = [("&", "&amp;"), ("<", "&lt;"), (">", "&gt;")]


def _escape_text(s: str) -> str:
    for raw, esc in _TEXT_ESCAPES:
        s = s.replace(raw, esc)
    return s


def _escape_attr(s: str) -> str:
    return s.replace("&", "&amp;").replace('"', "&quot;")


class Node:
    """Base node: document-order index assigned after parse.

    ``order``/``_end_order`` bracket the node's subtree in document order:
    descendants of a node with order *o* are exactly the nodes with orders
    ``o+1 .. _end_order`` — so descendant iteration is an O(1) slice of the
    document's flat node array instead of a recursive generator walk (the
    selector engine's hottest loop: ~30% of extraction-kernel time)."""

    __slots__ = ("parent", "order", "_end_order")

    def __init__(self) -> None:
        self.parent = None
        self.order = -1
        self._end_order = -1

    # -- reference API surface (used by the interpreter) ---------------
    def text(self) -> str:
        raise NotImplementedError

    def doc(self) -> "Document":
        node = self
        while node.parent is not None:
            node = node.parent
        return node  # type: ignore[return-value]

    def ancestors(self):
        node = self.parent
        while node is not None:
            yield node
            node = node.parent

    # libxmljs node-query surface exposed to user callbacks (reference
    # test/run.js:14 `context.get('div')`, lib/Command.js uses node.find):
    # find = all matches in document order, get = first match or None.
    # Compiled selectors are cached module-wide, so callback use is cheap.
    def find(self, selector: str, relative: bool = False) -> list:
        from .selector import compile_selector
        return compile_selector(selector).find(self, relative=relative)

    def get(self, selector: str, relative: bool = False):
        matches = self.find(selector, relative=relative)
        return matches[0] if matches else None


class TextNode(Node):
    __slots__ = ("data",)

    def __init__(self, data: str) -> None:
        super().__init__()
        self.data = data

    def text(self) -> str:
        return self.data

    def serialize(self) -> str:
        return _escape_text(self.data)

    def __repr__(self) -> str:  # pragma: no cover
        return f"TextNode({self.data!r})"


class Attribute(Node):
    """An attribute node (what ``@attr`` selectors yield).

    ``value()`` mirrors libxml Attribute.value(); the raw source encoding is
    preserved because we never URL-decode attribute values
    (reference: lib/commands/follow.js:39-46 slices the serialized
    attribute to keep encoding).
    """

    __slots__ = ("owner", "name", "_value")

    def __init__(self, owner: "Element", name: str, value: str) -> None:
        super().__init__()
        self.owner = owner
        self.parent = owner
        self.name = name
        self._value = value

    def value(self) -> str:
        return self._value

    def text(self) -> str:
        return self._value

    def serialize(self) -> str:
        return f' {self.name}="{_escape_attr(self._value)}"'

    def __repr__(self) -> str:  # pragma: no cover
        return f"Attribute({self.name}={self._value!r})"


class Element(Node):
    __slots__ = ("tag", "attrs", "children")

    def __init__(self, tag: str, attrs=None) -> None:
        super().__init__()
        self.tag = tag.lower()
        # list of (name, value) preserving source order; names lowercased
        self.attrs = list(attrs or [])
        self.children: list[Node] = []

    # -- tree ----------------------------------------------------------
    def append(self, child: Node) -> None:
        child.parent = self
        self.children.append(child)

    def child_elements(self):
        return [c for c in self.children if isinstance(c, Element)]

    def descendants(self, include_self: bool = False):
        if self.order >= 0:
            nodes = self.doc()._nodes
            if nodes is not None:
                if include_self:
                    return [self, *nodes[self.order:self._end_order]]
                return nodes[self.order:self._end_order]
        return list(self._walk(include_self))

    def _walk(self, include_self: bool = False):
        # fallback for trees without assigned order (builder-time)
        if include_self:
            yield self
        for child in self.children:
            yield child
            if isinstance(child, Element):
                yield from child._walk()

    # -- attributes ------------------------------------------------------
    def get_attribute(self, name: str):
        name = name.lower()
        for k, v in self.attrs:
            if k == name:
                return v
        return None

    def has_attribute(self, name: str) -> bool:
        return self.get_attribute(name) is not None

    def attr(self, name: str):
        name = name.lower()
        for k, v in self.attrs:
            if k == name:
                return Attribute(self, k, v)
        return None

    # -- content ---------------------------------------------------------
    def text(self) -> str:
        parts: list[str] = []
        for node in self.descendants():
            if isinstance(node, TextNode):
                parts.append(node.data)
        return "".join(parts)

    @property
    def inner_html(self) -> str:
        return "".join(_serialize_iter(c) for c in self.children)

    def serialize(self) -> str:
        return _serialize_iter(self)

    def __repr__(self) -> str:  # pragma: no cover
        return f"Element(<{self.tag}> order={self.order})"


class Document(Node):
    """Document node. Deliberately has NO ``text``/``value`` methods exposed
    to the record fallback path — the reference Document lacks ``.text``,
    which is why empty sub-chains on a Document context merge as ``{}``
    rather than the page text (reference: lib/Command.js:209-221 +
    golden ``then_none: {}`` in test/set.js).
    """

    __slots__ = ("children", "location", "request", "response",
                 "_data_sort_index", "opts", "_nodes", "_by_tag",
                 "_tag_orders")

    def __init__(self) -> None:
        super().__init__()
        self.children: list[Node] = []
        self.location = None   # set by the fetch layer (str URL)
        self.request = None    # dict: method/params/headers/count
        self.response = None   # dict: status/headers
        self.opts = {}         # scoped options at the current command
        self._nodes = None     # flat document-order node array (see Node)
        self._by_tag = None    # tag -> [Element] in document order
        self._tag_orders = None  # tag -> [element.order] (bisect keys)

    text = None  # sentinel: Document has no text() (see class docstring)

    def append(self, child: Node) -> None:
        child.parent = self
        self.children.append(child)

    def doc(self) -> "Document":
        return self

    @property
    def root(self):
        for c in self.children:
            if isinstance(c, Element):
                return c
        return None

    def descendants(self, include_self: bool = False):
        if self._nodes is not None:
            return self._nodes
        return list(self._walk())

    def _walk(self):
        for child in self.children:
            yield child
            if isinstance(child, Element):
                yield from child._walk()

    def serialize(self) -> str:
        return "".join(_serialize_iter(c) for c in self.children)

    def __repr__(self) -> str:  # pragma: no cover
        return f"Document({self.location})"


def _serialize_iter(root: Node) -> str:
    """Recursion-free subtree serialization (explicit stack with close
    events, same shape as the lxml replay walk): ``:html`` captures run
    inside extraction UDFs over crawled pages, and a hostile page
    nesting 10^4+ elements must not kill the task with RecursionError.
    Byte-identical to the old recursive form."""
    out: list[str] = []
    stack: list[tuple[Node, bool]] = [(root, False)]
    while stack:
        node, closing = stack.pop()
        if closing:
            out.append(f"</{node.tag}>")
            continue
        if isinstance(node, Element):
            attrs = "".join(f' {k}="{_escape_attr(v)}"'
                            for k, v in node.attrs)
            out.append(f"<{node.tag}{attrs}>")
            if node.tag in VOID_ELEMENTS:
                continue
            stack.append((node, True))
            for child in reversed(node.children):
                stack.append((child, False))
        else:                      # TextNode (comments/doctype drop)
            out.append(node.serialize())
    return "".join(out)


class _TreeBuilder(_StdHTMLParser):
    """Builds the tree AND numbers it as it goes: nodes are created in
    document (preorder) order by both parser engines, so ``order``, the
    flat ``_nodes`` array and the ``_by_tag`` index are assigned at
    creation time; only the subtree end-brackets need the single reverse
    sweep in ``parse_html`` (the one post-parse mutation — libxml's meta
    injection — falls back to the full ``_assign_order`` renumber)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.doc = Document()
        self.html: Element | None = None
        self.head: Element | None = None
        self.body: Element | None = None
        self.had_explicit_head = False
        self.stack: list[Element] = []
        self._counter = 0
        self._nodes: list[Node] = []
        self._by_tag: dict[str, list[Element]] = {}

    def _number(self, node: Node) -> None:
        self._counter += 1
        node.order = self._counter
        self._nodes.append(node)

    def _number_el(self, el: Element) -> None:
        self._counter += 1
        el.order = self._counter
        self._nodes.append(el)
        lst = self._by_tag.get(el.tag)
        if lst is None:
            self._by_tag[el.tag] = [el]
        else:
            lst.append(el)

    # -- implicit structure -------------------------------------------
    def _ensure_html(self) -> Element:
        if self.html is None:
            self.html = Element("html")
            self._number_el(self.html)
            self.doc.append(self.html)
        return self.html

    def _ensure_head(self) -> Element:
        if self.head is None:
            html = self._ensure_html()
            self.head = Element("head")
            self._number_el(self.head)
            html.append(self.head)
        return self.head

    def _ensure_body(self) -> Element:
        if self.body is None:
            html = self._ensure_html()
            self.body = Element("body")
            self._number_el(self.body)
            html.append(self.body)
        return self.body

    def _top(self, for_tag: str | None = None):
        if self.stack:
            return self.stack[-1]
        # top level: route by tag kind
        if for_tag in _HEAD_TAGS and self.body is None:
            return self._ensure_head()
        return self._ensure_body()

    # -- parser callbacks -----------------------------------------------
    # Both engines (stdlib html.parser and _fast_feed) lowercase tag and
    # attribute names before these callbacks fire, so no re-lowering here;
    # Elements are built by direct slot assignment to skip the redundant
    # normalization in Element.__init__ (this is the hottest path of the
    # extraction kernel).
    def handle_starttag(self, tag, attrs):
        if tag == "html":
            self._ensure_html()
            return
        if tag == "head":
            self.had_explicit_head = True
            head = self._ensure_head()
            self.stack.append(head)
            return
        if tag == "body":
            body = self._ensure_body()
            self.stack.append(body)
            return
        top = self._top(tag)  # may lazily create head/body: number first
        el = Element.__new__(Element)
        el.parent = top
        el._end_order = -1
        el.tag = tag
        el.attrs = [(k, v if v is not None else "") for k, v in attrs]
        el.children = []
        self._number_el(el)
        top.children.append(el)
        if tag not in VOID_ELEMENTS:
            self.stack.append(el)

    def handle_startendtag(self, tag, attrs):
        top = self._top(tag)
        el = Element.__new__(Element)
        el.parent = top
        el._end_order = -1
        el.tag = tag
        el.attrs = [(k, v if v is not None else "") for k, v in attrs]
        el.children = []
        self._number_el(el)
        top.children.append(el)

    # -- _fast_feed entry points ----------------------------------------
    # Identical semantics to handle_starttag/handle_startendtag, minus the
    # attrs normalization (the simple-start regex guarantees (str, str)
    # tuples, never None values) and with _number_el inlined — together
    # ~10% of whole-kernel time on a 5 KB-page corpus.
    def _start_fast(self, tag, attrs):
        # The sweep only routes the structural tags here; every other
        # start tag is built inline in _fast_feed's hot loop. Delegate
        # the non-struct remainder to handle_starttag (identical
        # semantics — the (str, str) attrs make its None-normalization
        # the identity) so this entry point stays total without a
        # second, unreachable copy of the element-construction block.
        if tag == "html":
            self._ensure_html()
            return
        if tag == "head":
            self.had_explicit_head = True
            self.stack.append(self._ensure_head())
            return
        if tag == "body":
            self.stack.append(self._ensure_body())
            return
        self.handle_starttag(tag, attrs)

    def _startend_fast(self, tag, attrs):
        stack = self.stack
        top = stack[-1] if stack else self._top(tag)
        el = Element.__new__(Element)
        el.parent = top
        el._end_order = -1
        el.tag = tag
        el.attrs = attrs
        el.children = []
        self._counter += 1
        el.order = self._counter
        self._nodes.append(el)
        lst = self._by_tag.get(tag)
        if lst is None:
            self._by_tag[tag] = [el]
        else:
            lst.append(el)
        top.children.append(el)

    def handle_endtag(self, tag):
        stack = self.stack
        if stack and stack[-1].tag == tag:  # the overwhelmingly common case
            stack.pop()
            return
        if tag == "html":
            return
        for i in range(len(stack) - 1, -1, -1):
            if stack[i].tag == tag:
                del stack[i:]
                return
        # unmatched end tag: ignore

    def handle_data(self, data):
        stack = self.stack
        if stack:
            top = stack[-1]
        elif data.strip():
            top = self._ensure_body()
        else:
            # whitespace-only text at top level is dropped (libxml does too)
            return
        tn = TextNode.__new__(TextNode)
        tn.parent = top
        tn._end_order = -1
        tn.data = data
        self._counter += 1
        tn.order = self._counter
        self._nodes.append(tn)
        top.children.append(tn)


_CDATA_TAGS = {"script", "style"}
# stdlib (3.11) set_cdata_mode: CDATA content ends ONLY at a full strict
# end tag of the owning element ('</\s*tag\s*>', any case); '</script foo>',
# '</scriptx>', or an unterminated '</script' never leave CDATA mode — the
# content (and at EOF, everything after) stays raw script/style data.
_CDATA_END = {t: re.compile(rf"</\s*{t}\s*>", re.IGNORECASE)
              for t in _CDATA_TAGS}
# stdlib html.parser endtagfind (strict form; tolerant fallback below).
# Not called directly — it is the TEMPLATE for _SIMPLE_TAG's group-4
# alternation (leading '<' factored out), which must stay byte-for-byte
# in sync; test_parser_diff.test_group4_is_endtag_re pins the identity.
_ENDTAG_RE = re.compile(r"</\s*([a-zA-Z][-.a-zA-Z0-9:_]*)\s*>")
_USE_STD_PARSER = (os.environ.get("OSMOSPARK_STD_PARSER") == "1"
                   or not _HAVE_TOLERANT_RE)
# opt-in libxml2 engine (the north-star parser; this sandbox has no
# lxml, so the flag must be set explicitly in an environment that does
# — see osmospark/html/lxml_backend.py). Checked lazily at first parse
# so importing this module never requires lxml.
_USE_LXML = os.environ.get("OSMOSPARK_LXML") == "1"
# stdlib check_for_whole_start_tag's "end of input in or before attribute
# value" character class
_INCOMPLETE_NEXT = frozenset(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ=/")

# One-regex fast path for the overwhelmingly common start-tag shape:
# double-quoted attribute values with no '&'/'<'/'>' inside and whitespace
# before every attribute. Inputs matching this shape parse bit-identically
# under the stdlib tolerant regex cascade (_locatestart/_tagfind/_attrfind
# + unescape), which remains the fallback for everything else; the
# differential suite (tests/test_parser_diff.py) fuzzes both paths.
# Name classes are strict subsets of the stdlib tolerant ones, and the
# value class excludes '&' so skipping unescape() is exact.
# The end-tag alternation (group 4) is byte-for-byte _ENDTAG_RE with the
# leading '<' factored out, so the hot loop runs a single regex against
# every '<' instead of a failed start-match followed by an end-match.
_SIMPLE_TAG = re.compile(
    r"<(?:([a-zA-Z][-.a-zA-Z0-9:_]*)"
    r"((?:\s+[a-zA-Z_:][-.a-zA-Z0-9:_]*=\"[^\"&<>]*\")*)"
    r"\s*(/?)>"
    r"|/\s*([a-zA-Z][-.a-zA-Z0-9:_]*)\s*>)")
_SIMPLE_ATTR = re.compile(r"([a-zA-Z_:][-.a-zA-Z0-9:_]*)=\"([^\"]*)\"")
# attr spans with no uppercase letter need no per-name .lower() pass —
# _SIMPLE_ATTR's findall tuples are final as-is (values are never lowered)
_UPPER_SEARCH = re.compile(r"[A-Z]").search
# tags whose start handling routes through the implicit-structure builders
# (_ensure_html/head/body) instead of plain element construction
_STRUCT_TAGS = frozenset(("html", "head", "body"))


def _fast_feed(builder: "_TreeBuilder", rawdata: str) -> None:
    """Whole-document regex tokenizer emitting the exact handle_* callbacks
    ``html.parser.HTMLParser(convert_charrefs=True)`` would — ~2× faster
    because it skips the incremental-feed machinery (goahead/updatepos).
    The hot loop is ONE ``_SIMPLE_TAG.finditer`` sweep (a single C-level
    scan yields every simple start/end tag; the gap between consecutive
    matches is the text run) — a ``<`` inside a gap marks a construct the
    simple regex rejected, handled by ``complex_step`` (the stdlib's own
    tolerant tag/attr regexes, so attribute parsing is bit-identical)
    after which the sweep restarts. Differential-tested against the
    stdlib path over every fixture page plus hypothesis-fuzzed inputs
    (tests/test_parser_diff.py); ``OSMOSPARK_STD_PARSER=1`` forces the
    stdlib engine."""
    i, n = 0, len(rawdata)
    find = rawdata.find
    cdata_elem = None   # compiled strict-end-tag pattern while in CDATA
    # hot-loop locals: skip the attribute lookup per token
    handle_data = builder.handle_data
    start_fast = builder._start_fast
    startend_fast = builder._startend_fast
    finditer = _SIMPLE_TAG.finditer
    attr_findall = _SIMPLE_ATTR.findall
    has_upper = _UPPER_SEARCH
    # builder.stack and builder._nodes are bound once in __init__ and only
    # mutated in place afterwards, so these aliases stay live; the inline
    # text/end-tag blocks below replicate handle_data's stack-nonempty
    # branch and handle_endtag's top-matches branch exactly, falling back
    # to the methods for the structural cases (empty stack, mis-nesting)
    stack = builder.stack
    nodes_append = builder._nodes.append
    text_new = TextNode.__new__
    el_new = Element.__new__
    by_tag_get = builder._by_tag.get
    cdata_get = _CDATA_END.get
    void_elements = VOID_ELEMENTS
    struct_tags = _STRUCT_TAGS

    def recover(lt: int) -> int:
        # stdlib goahead's incomplete-construct-at-EOF recovery: emit data
        # up to one past the first '>' (else to the next '<', else 1 char)
        k = find(">", lt + 1)
        if k < 0:
            k = find("<", lt + 1)
            if k < 0:
                k = lt + 1
        else:
            k += 1
        builder.handle_data(_unescape(rawdata[lt:k]))
        return k

    def complex_step(lt: int):
        # One stateful step at a '<' the simple regex rejected (off the
        # sweep's hot path — doctype, comments, PIs, single-quoted or
        # unquoted attrs, bogus markup). Returns (new_i, cdata_pattern).
        nxt = rawdata[lt + 1:lt + 2]
        # stdlib starttagopen is '<[a-zA-Z]' — ASCII only. nxt.isalpha()
        # here would accept any Unicode letter ('a<éb') and then crash on
        # _locatestart's None; stdlib treats such '<' as plain data.
        if "a" <= nxt <= "z" or "A" <= nxt <= "Z":
            # faithful port of stdlib parse_starttag +
            # check_for_whole_start_tag (tolerant mode)
            j = _locatestart.match(rawdata, lt).end()
            nextc = rawdata[j:j + 1]
            if nextc == ">":
                endpos = j + 1
            elif nextc == "/" and rawdata[j:j + 2] == "/>":
                endpos = j + 2
            elif nextc in ("", "/") or nextc in _INCOMPLETE_NEXT:
                # stdlib check_for_whole_start_tag: EOF in or before an
                # attribute value → incomplete → EOF recovery
                return recover(lt), None
            else:
                # buggy start tag: junk to the scan end is one RAW chunk
                k0 = j if j > lt else lt + 1
                builder.handle_data(rawdata[lt:k0])
                return k0, None
            tm = _tagfind.match(rawdata, lt + 1)
            tag = tm.group(1).lower()
            k = tm.end()
            attrs = []
            while k < endpos:
                am = _attrfind.match(rawdata, k)
                if not am:
                    break
                attrname, rest, attrvalue = am.group(1, 2, 3)
                if not rest:
                    attrvalue = None
                elif (attrvalue[:1] == "'" == attrvalue[-1:]
                      or attrvalue[:1] == '"' == attrvalue[-1:]):
                    attrvalue = attrvalue[1:-1]
                if attrvalue:
                    attrvalue = _unescape(attrvalue)
                attrs.append((attrname.lower(), attrvalue))
                k = am.end()
            end_str = rawdata[k:endpos].strip()
            if end_str not in (">", "/>"):
                builder.handle_data(rawdata[lt:endpos])
                return endpos, None
            if end_str == "/>":
                builder.handle_startendtag(tag, attrs)
                return endpos, None
            builder.handle_starttag(tag, attrs)
            return endpos, _CDATA_END.get(tag)
        if nxt == "/":
            # the strict end-tag form is _SIMPLE_TAG's own alternation, so
            # only the tolerant forms ('</div foo>', bogus comments) land
            # here
            gtpos = find(">", lt + 1)
            if gtpos < 0:
                return recover(lt), None
            tm = _tagfind.match(rawdata, lt + 2)
            if tm is not None:
                builder.handle_endtag(tm.group(1).lower())
            return gtpos + 1, None
        if rawdata.startswith("<!--", lt):
            j = find("-->", lt + 4)
            if j < 0:
                return recover(lt), None
            return j + 3, None
        if nxt in ("!", "?"):
            j = find(">", lt + 2)
            if j < 0:
                return recover(lt), None
            return j + 1, None
        builder.handle_data("<")
        return lt + 1, None

    while i < n:
        if cdata_elem is not None:
            # the pattern is the FULL strict end tag (see _CDATA_END), so
            # a match here is guaranteed to be handled as a strict end tag
            # by the resumed sweep (group 4 matches exactly this span);
            # no match → stdlib discards the unterminated content at EOF
            m = cdata_elem.search(rawdata, i)
            if m is None:
                return
            j = m.start()
            if j > i:
                builder.handle_data(rawdata[i:j])  # raw: no charref convert
            cdata_elem = None
            i = j
        broke = False
        for sm in finditer(rawdata, i):
            s = sm.start()
            if s > i:
                run = rawdata[i:s]
                lt = run.find("<")
                if lt >= 0:
                    # a construct the simple regex rejected sits inside
                    # the gap: emit the text before it, take one stateful
                    # step, then restart the sweep
                    if lt:
                        run = run[:lt]
                        if "&" in run:
                            run = _unescape(run)
                        handle_data(run)
                    i, cdata_elem = complex_step(i + lt)
                    broke = True
                    break
                if "&" in run:
                    run = _unescape(run)
                if stack:
                    top = stack[-1]
                    tn = text_new(TextNode)
                    tn.parent = top
                    tn._end_order = -1
                    tn.data = run
                    c = builder._counter + 1
                    builder._counter = c
                    tn.order = c
                    nodes_append(tn)
                    top.children.append(tn)
                else:
                    handle_data(run)
            tag, rawattrs, slash, endtag = sm.group(1, 2, 3, 4)
            if tag is None:
                # strict end tag (alternation group 4 == _ENDTAG_RE)
                tag = endtag.lower()
                if stack and stack[-1].tag == tag:
                    stack.pop()
                else:
                    builder.handle_endtag(tag)
                i = sm.end()
                continue
            tag = tag.lower()
            if rawattrs:
                # attr names are already lowercase unless the raw span
                # contains an uppercase letter (values may — then fall
                # back to the exact per-name lowering)
                attrs = (attr_findall(rawattrs) if has_upper(rawattrs)
                         is None else [(a.lower(), v)
                                       for a, v in attr_findall(rawattrs)])
            else:
                attrs = []
            # inline of _start_fast/_startend_fast for plain tags (the
            # structural html/head/body tags keep the method path); with
            # an empty stack and an existing body, _top(tag) always
            # returns body (head routing only applies while body is None)
            if tag not in struct_tags:
                if stack:
                    top = stack[-1]
                else:
                    top = builder.body
                    if top is None:
                        top = builder._top(tag)
                el = el_new(Element)
                el.parent = top
                el._end_order = -1
                el.tag = tag
                el.attrs = attrs
                el.children = []
                c = builder._counter + 1
                builder._counter = c
                el.order = c
                nodes_append(el)
                lst = by_tag_get(tag)
                if lst is None:
                    builder._by_tag[tag] = [el]
                else:
                    lst.append(el)
                top.children.append(el)
                if not slash:
                    if tag not in void_elements:
                        stack.append(el)
                    cd = cdata_get(tag)
                    if cd is not None:
                        cdata_elem = cd
                        i = sm.end()
                        broke = True
                        break
            elif slash:
                startend_fast(tag, attrs)
            else:
                start_fast(tag, attrs)
                cd = cdata_get(tag)
                if cd is not None:
                    cdata_elem = cd
                    i = sm.end()
                    broke = True
                    break
            i = sm.end()
        if broke:
            continue
        # sweep exhausted: whatever remains is text, unless it hides a
        # rejected construct
        if i < n:
            run = rawdata[i:]
            lt = run.find("<")
            if lt >= 0:
                if lt:
                    run = run[:lt]
                    if "&" in run:
                        run = _unescape(run)
                    handle_data(run)
                i, cdata_elem = complex_step(i + lt)
                continue
            if "&" in run:
                run = _unescape(run)
            if stack:
                top = stack[-1]
                tn = text_new(TextNode)
                tn.parent = top
                tn._end_order = -1
                tn.data = run
                c = builder._counter + 1
                builder._counter = c
                tn.order = c
                nodes_append(tn)
                top.children.append(tn)
            else:
                handle_data(run)
        return


def parse_html(html, base_url: str | None = None) -> Document:
    """Parse an HTML string/bytes into a Document.

    Mirrors ``libxml.parseHtml`` usage at reference lib/Request.js:51-52 and
    ``Osmosis.prototype.parse`` at reference index.js:281-294 (baseUrl option).
    """
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    builder = _TreeBuilder()
    if _USE_LXML:
        # explicit opt-in: fail loudly if the environment lacks lxml
        # rather than silently benchmarking the wrong engine
        from .lxml_backend import feed_lxml
        feed_lxml(builder, html)
    elif _USE_STD_PARSER:
        builder.feed(html)
        builder.close()
    else:
        _fast_feed(builder, html)
    doc = builder.doc
    # libxml injects a Content-Type meta as the first child of an explicit
    # <head> (observable in the `head:html` golden, reference test/set.js:8-9)
    injected = False
    if builder.had_explicit_head and builder.head is not None:
        has_meta = any(
            isinstance(c, Element) and c.tag == "meta" for c in builder.head.children
        )
        if not has_meta:
            meta = Element(
                "meta",
                [("http-equiv", "Content-Type"),
                 ("content", "text/html; charset=UTF-8")],
            )
            meta.parent = builder.head
            builder.head.children.insert(0, meta)
            injected = True
    if injected:
        # the insert shifts document order — renumber from the tree
        _assign_order(doc)
    else:
        # nodes were numbered at creation (creation order == preorder);
        # only the subtree end-brackets remain. One reverse sweep: a
        # node's bracket is its last child's (children appear after the
        # parent in _nodes, so in reverse they are already finalized).
        nodes = builder._nodes
        for node in reversed(nodes):
            if type(node) is Element and node.children:
                node._end_order = node.children[-1]._end_order
            else:
                node._end_order = node.order
        doc.order = 0
        doc._end_order = builder._counter
        doc._nodes = nodes
        doc._by_tag = builder._by_tag
        doc._tag_orders = {t: [e.order for e in lst]
                           for t, lst in builder._by_tag.items()}
    if base_url is not None:
        doc.location = base_url
    return doc


def _assign_order(doc: Document) -> None:
    """Number nodes in document order and build the flat node array +
    subtree end-brackets that make descendant iteration an O(1) slice."""
    doc.order = 0
    nodes: list[Node] = []
    counter = 0
    stack: list = [(c, False) for c in reversed(doc.children)]
    while stack:
        node, is_exit = stack.pop()
        if is_exit:
            node._end_order = counter
            continue
        counter += 1
        node.order = counter
        nodes.append(node)
        if isinstance(node, Element) and node.children:
            stack.append((node, True))
            for c in reversed(node.children):
                stack.append((c, False))
        else:
            node._end_order = counter
    doc._end_order = counter
    doc._nodes = nodes
    # per-tag structural index: a descendant-axis tag step becomes a
    # bisected slice of this list instead of a subtree scan
    by_tag: dict[str, list[Element]] = {}
    for node in nodes:
        if type(node) is Element:
            lst = by_tag.get(node.tag)
            if lst is None:
                by_tag[node.tag] = [node]
            else:
                lst.append(node)
    doc._by_tag = by_tag
    doc._tag_orders = {t: [e.order for e in lst]
                       for t, lst in by_tag.items()}
