"""Reference-scheduler simulator: Osmosis's visit ordering, in ~80 lines.

The reference runs requests through a concurrency gate of 5 in-flight
requests (reference index.js:93, :245-258: run immediately if
``requests < concurrency``, else push) backed by a LIFO stack
(reference lib/Queue.js:24-33: ``enqueue`` appends, ``dequeue`` takes from
the top), yielding depth-first visit ordering with a sliding window.

This simulator reproduces that discipline over a PageStore corpus for a
plain crawl (follow a selector recursively). It is the oracle for the
north-rule ordering invariant: the engine's visit SET must equal the
simulator's, and the engine's per-round admission must be depth-first
(deepest available first), the batch linearization of LIFO.

Delays: the reference's interleaving depends on response latency; the
*data-visible* contract is sortIndex document order (reference
Changes.md:32), which both the simulator (zero-delay: child requests issue
in document order) and the engine (sort lineage priority) honor.
"""

from __future__ import annotations

from ..html import Attribute, Element, compile_selector
from ..interpreter import build_document
from ..urlnorm import canonicalize, link_resolver

DEFAULT_CONCURRENCY = 5  # reference index.js:93


def crawl_order(
    store,
    seeds: list[str],
    follow_selector: str,
    max_depth: int = 3,
    concurrency: int = DEFAULT_CONCURRENCY,
    dedup: bool = True,
):
    """Simulate the reference queue discipline; returns (visit_order, seen).

    Zero-latency model: a request started is processed to completion (its
    outlinks enqueued) before the next slot is filled; the LIFO stack then
    hands out the most recently enqueued (deepest) URL first.
    """
    sel = compile_selector(follow_selector)
    stack: list[tuple[str, int]] = []   # LIFO (lib/Queue.js:24-33)
    visit_order: list[str] = []
    seen: set[str] = set()

    def enqueue(url: str, depth: int) -> None:
        stack.append((url, depth))

    for i, s in enumerate(reversed(seeds)):
        enqueue(canonicalize(s), 0)

    while stack:
        url, depth = stack.pop()
        if dedup:
            if url in seen:
                continue
            seen.add(url)
        visit_order.append(url)
        status, page = store.fetch(url, "get", None)
        if page is None or depth >= max_depth:
            continue
        doc = build_document(page.html, url)
        # one base canonicalization per page, same as the extraction
        # kernel (exactly equal to canonicalize(resolve(url, href)))
        resolve_link = link_resolver(url)
        outlinks = []
        for node in sel.find(doc, relative=True):
            if isinstance(node, Attribute):
                href = node.value()
            elif isinstance(node, Element):
                a = node.attr("href")
                href = a.value() if a is not None else node.text()
            else:
                href = None
            if href:
                outlinks.append(resolve_link(href)[0])
        # children pushed in document order → LIFO pops the LAST link first;
        # the reference issues requests in document order and the stack
        # holds the overflow beyond the concurrency window
        for link in reversed(outlinks):
            enqueue(link, depth + 1)

    return visit_order, seen
