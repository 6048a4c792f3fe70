"""Differential suite for the opt-in lxml engine (OSMOSPARK_LXML=1):
skipped entirely when lxml is absent (this sandbox), green goldens
required when it is present. The lxml engine replays libxml2's tree as
the standard _TreeBuilder callback stream, so the assertion is the same
as tests/test_parser_diff.py: same DOM dump, same serialization, same
extracted text — except the documented top-level-bare-text divergence
(libxml wraps it in <p>), where only text() must agree."""

import pytest

lxml = pytest.importorskip("lxml")

from osmospark.html import parser as P  # noqa: E402
from osmospark.html.lxml_backend import feed_lxml  # noqa: E402


def _build(html: str, engine: str) -> P.Document:
    b = P._TreeBuilder()
    if engine == "lxml":
        feed_lxml(b, html)
    else:
        P._fast_feed(b, html)
    P._assign_order(b.doc)
    return b.doc


def _dump(doc: P.Document):
    out = []
    for n in doc.descendants():
        if isinstance(n, P.Element):
            out.append(("el", n.tag, tuple(n.attrs)))
        elif isinstance(n, P.TextNode):
            out.append(("text", n.data))
    return out


def _text(doc: P.Document) -> str:
    root = doc.root
    return root.text() if root is not None else ""


def test_fixture_pages_identical():
    from osmospark.corpus import fixture_pages
    for page in fixture_pages():
        a, b = _build(page.html, "lxml"), _build(page.html, "fast")
        assert _dump(a) == _dump(b), page.url
        assert a.serialize() == b.serialize(), page.url


def test_synth_pages_identical():
    from osmospark.corpus import _host_sizes, _synth_page
    sizes = _host_sizes(60, 4, 1.2)
    hosts = [f"host{h:04d}.test" for h in range(4)]
    for h in range(4):
        for i in range(sizes[h]):
            _, html = _synth_page(h, i, hosts, sizes, 4, 2, 60)
            a, b = _build(html, "lxml"), _build(html, "fast")
            assert _dump(a) == _dump(b), html[:120]


def test_bare_text_divergence_text_agrees():
    # the one documented divergence: libxml wraps top-level bare text
    # in <p>; extracted text (the byte-identity invariant) must agree
    a, b = _build("plain text only", "lxml"), _build("plain text only",
                                                     "fast")
    assert _text(a) == _text(b) == "plain text only"


def test_goldens_under_lxml(monkeypatch):
    # the full extraction goldens must hold under the lxml engine:
    # flip the module flag and replay the fixture chain end-to-end
    monkeypatch.setattr(P, "_USE_LXML", True)
    from osmospark.corpus import FIXTURE_HOST, fixture_store
    from osmospark.interpreter import Runner
    from osmospark.spec import O

    records = []
    chain = (O.get(f"{FIXTURE_HOST}/set")
             .set({"title": "title",
                   "pages": O.follow("a").set({"page": "title"})})
             .data(records.append))
    Runner(store=fixture_store()).run(chain)
    assert records == [
        {"title": "TITLE", "pages": [{"page": "1"}, {"page": "2"}]}]


def test_xml_declaration_page_parses():
    # lxml refuses unicode input with an XML encoding declaration;
    # feed_lxml strips the declaration (a PI the tokenizer engines
    # ignore) so common XHTML pages parse instead of killing the task
    page = ('<?xml version="1.0" encoding="UTF-8"?>\n'
            "<html><head><title>t</title></head>"
            "<body><p>hi</p></body></html>")
    a, b = _build(page, "lxml"), _build(page, "fast")
    assert _text(a) == _text(b)
    assert a.serialize() == b.serialize()
