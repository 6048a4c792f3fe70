"""Pure-Python HTML DOM + selector engine (runs inside Arrow UDFs)."""

from .parser import (
    Attribute,
    Document,
    Element,
    Node,
    TextNode,
    parse_html,
)
from .selector import CompiledSelector, compile_selector

__all__ = [
    "Attribute",
    "Document",
    "Element",
    "Node",
    "TextNode",
    "parse_html",
    "CompiledSelector",
    "compile_selector",
]


def find(context, selector, relative: bool = False):
    """Evaluate a selector against a node (document-wide by default,
    mirroring reference lib/commands/find.js:33-37)."""
    return compile_selector(selector).find(context, relative=relative)


def get(context, selector, relative: bool = False):
    res = find(context, selector, relative)
    return res[0] if res else None
