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

from html.parser import HTMLParser as _StdHTMLParser

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
    """Base node: document-order index assigned after parse."""

    __slots__ = ("parent", "order")

    def __init__(self) -> None:
        self.parent = None
        self.order = -1

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
        if include_self:
            yield self
        for child in self.children:
            yield child
            if isinstance(child, Element):
                yield from child.descendants()

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
        return "".join(c.serialize() for c in self.children)

    def serialize(self) -> str:
        attrs = "".join(f' {k}="{_escape_attr(v)}"' for k, v in self.attrs)
        if self.tag in VOID_ELEMENTS:
            return f"<{self.tag}{attrs}>"
        return f"<{self.tag}{attrs}>{self.inner_html}</{self.tag}>"

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
                 "_data_sort_index", "opts")

    def __init__(self) -> None:
        super().__init__()
        self.children: list[Node] = []
        self.location = None   # set by the fetch layer (str URL)
        self.request = None    # dict: method/params/headers/count
        self.response = None   # dict: status/headers
        self.opts = {}         # scoped options at the current command

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
        for child in self.children:
            yield child
            if isinstance(child, Element):
                yield from child.descendants()

    def serialize(self) -> str:
        return "".join(c.serialize() for c in self.children)

    def __repr__(self) -> str:  # pragma: no cover
        return f"Document({self.location})"


class _TreeBuilder(_StdHTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.doc = Document()
        self.html: Element | None = None
        self.head: Element | None = None
        self.body: Element | None = None
        self.had_explicit_head = False
        self.stack: list[Element] = []

    # -- implicit structure -------------------------------------------
    def _ensure_html(self) -> Element:
        if self.html is None:
            self.html = Element("html")
            self.doc.append(self.html)
        return self.html

    def _ensure_head(self) -> Element:
        if self.head is None:
            self.head = Element("head")
            self._ensure_html().append(self.head)
        return self.head

    def _ensure_body(self) -> Element:
        if self.body is None:
            self.body = Element("body")
            self._ensure_html().append(self.body)
        return self.body

    def _top(self, for_tag: str | None = None):
        if self.stack:
            return self.stack[-1]
        # top level: route by tag kind
        if for_tag in _HEAD_TAGS and self.body is None:
            return self._ensure_head()
        return self._ensure_body()

    # -- parser callbacks -----------------------------------------------
    def handle_starttag(self, tag, attrs):
        tag = tag.lower()
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
        el = Element(tag, [(k.lower(), v if v is not None else "") for k, v in attrs])
        self._top(tag).append(el)
        if tag not in VOID_ELEMENTS:
            self.stack.append(el)

    def handle_startendtag(self, tag, attrs):
        tag = tag.lower()
        el = Element(tag, [(k.lower(), v if v is not None else "") for k, v in attrs])
        self._top(tag).append(el)

    def handle_endtag(self, tag):
        tag = tag.lower()
        if tag == "html":
            return
        for i in range(len(self.stack) - 1, -1, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return
        # unmatched end tag: ignore

    def handle_data(self, data):
        if self.stack:
            self.stack[-1].append(TextNode(data))
        elif data.strip():
            self._ensure_body().append(TextNode(data))
        # whitespace-only text at top level is dropped (libxml does too)


def parse_html(html, base_url: str | None = None) -> Document:
    """Parse an HTML string/bytes into a Document.

    Mirrors ``libxml.parseHtml`` usage at reference lib/Request.js:51-52 and
    ``Osmosis.prototype.parse`` at reference index.js:281-294 (baseUrl option).
    """
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    builder = _TreeBuilder()
    builder.feed(html)
    builder.close()
    doc = builder.doc
    # libxml injects a Content-Type meta as the first child of an explicit
    # <head> (observable in the `head:html` golden, reference test/set.js:8-9)
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
    _assign_order(doc)
    if base_url is not None:
        doc.location = base_url
    return doc


def _assign_order(doc: Document) -> None:
    counter = 0
    doc.order = counter
    for node in doc.descendants():
        counter += 1
        node.order = counter
