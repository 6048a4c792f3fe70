"""Optional lxml/libxml2 parse engine behind the standard tree builder.

The north star parses HTML "using lxml" — the same libxml2 the reference
binds (reference lib/Request.js:51-52 ``libxml.parseHtml``). This sandbox
ships no lxml, so the default engine is the pure-Python regex tokenizer
(``parser._fast_feed``, at its measured ~850 pages/s/core floor); this
module is the documented swap point: an environment WITH lxml sets
``OSMOSPARK_LXML=1`` (before executor Python workers fork — use
``spark.executorEnv.OSMOSPARK_LXML``) and every ``parse_html`` call
routes through libxml2's C parser instead, feeding the SAME
``_TreeBuilder`` callback stream so the selector engine, serialization,
implicit-structure and meta-injection logic stay byte-identical code.

Design: lxml is used as the TOKENIZER only. The libxml2 tree is walked
iteratively (no recursion limit on deep pages) and re-emitted as the
``handle_starttag``/``handle_data``/``handle_endtag`` events the stdlib
and fast engines produce, so all downstream behavior lives in one place
(``_TreeBuilder``). ``had_explicit_head`` — which gates the libxml
Content-Type ``<meta>`` injection golden (reference test/set.js:8-9) —
cannot be read off the libxml tree (libxml also synthesizes implicit
heads), so it is re-detected from the source with the same
``<head[\\s/>]`` shape the tokenizers recognize.

Known divergence class (why the flag is opt-in and differential-tested
where lxml exists, tests/test_parser_lxml.py): libxml wraps top-level
bare text in an implicit ``<p>`` while the regex/stdlib engines attach
it to ``<body>`` directly — ``text()`` (the per-url byte-identity
invariant) agrees, ``:source``/``:html`` serializations of such
fragments differ.
"""

from __future__ import annotations

import re

_EXPLICIT_HEAD_RX = re.compile(r"<head[\s/>]", re.IGNORECASE)
# lxml refuses unicode input that still carries an XML encoding
# declaration (ValueError before parsing, recover=True cannot help);
# parse_html always decodes bytes → str first, so strip the
# declaration — a PI the tokenizer engines ignore anyway
_XMLDECL_RX = re.compile(r"^\s*<\?xml\b[^>]*\?>", re.IGNORECASE)
# blind spots for head re-detection: '<head' inside comments or
# script/style CDATA is never a start-tag token to the tokenizer
# engines, so it must not count here either (unterminated blocks and
# '<head' inside attribute values remain a documented residual
# divergence — both are malformed-markup corners)
_HEAD_BLIND_RX = re.compile(
    r"<!--.*?-->|<script\b.*?</script\s*>|<style\b.*?</style\s*>",
    re.IGNORECASE | re.DOTALL)

_AVAILABLE: bool | None = None


def detect_explicit_head(rawdata: str) -> bool:
    """Source-level ``had_explicit_head`` re-detection (pure regex, no
    lxml needed — unit-testable in lxml-less environments): does the
    page carry a real ``<head`` start tag, ignoring '<head' text inside
    comments and script/style bodies?"""
    return bool(_EXPLICIT_HEAD_RX.search(_HEAD_BLIND_RX.sub("", rawdata)))


def lxml_available() -> bool:
    global _AVAILABLE
    if _AVAILABLE is None:
        try:
            import lxml.etree  # noqa: F401
            _AVAILABLE = True
        except ImportError:
            _AVAILABLE = False
    return _AVAILABLE


def feed_lxml(builder, rawdata: str) -> None:
    """Parse ``rawdata`` with libxml2 and replay it into ``builder``
    (a ``parser._TreeBuilder``) as the standard callback stream."""
    from lxml import etree

    from .parser import VOID_ELEMENTS

    src = _XMLDECL_RX.sub("", rawdata, count=1)
    root = None
    if src.strip():
        root = etree.fromstring(
            src, etree.HTMLParser(recover=True, no_network=True))
    if root is not None:
        # iterative pre-order walk with explicit close events
        # (recursion-free: real pages nest arbitrarily deep)
        stack = [(root, False)]
        while stack:
            el, closing = stack.pop()
            if closing:
                builder.handle_endtag(el.tag.lower())
                if el.tail:
                    builder.handle_data(el.tail)
                continue
            if not isinstance(el.tag, str):
                # comment / PI / entity-ref nodes contribute no tree
                # nodes (the tokenizer engines' handle_comment is a
                # no-op too); tail text still belongs to the parent
                if el.tail:
                    builder.handle_data(el.tail)
                continue
            tag = el.tag.lower()
            attrs = [(k.lower(), v if v is not None else "")
                     for k, v in el.items()]
            builder.handle_starttag(tag, attrs)
            if tag in VOID_ELEMENTS:
                # void: no close event; tail goes straight to parent
                if el.tail:
                    builder.handle_data(el.tail)
                continue
            stack.append((el, True))
            if el.text:
                builder.handle_data(el.text)
            for child in reversed(list(el)):
                stack.append((child, False))
    # libxml synthesizes implicit heads, so the meta-injection flag is
    # re-detected from the source exactly like the tokenizer engines —
    # with comment and script/style bodies blinded first: a '<head'
    # inside them is never a start-tag token to those engines
    builder.had_explicit_head = detect_explicit_head(rawdata)
