"""CSS3-hybrid-XPath selector engine over the osmospark DOM.

The reference translates CSS to XPath via css2xpath and evaluates with
libxml (selector compile cache at reference index.js:413-427; hybrid
CSS//XPath selectors documented in reference Changes.md:92-95). This module
implements the selector *subset exercised by the reference test fixtures*
directly against our Node tree — one compiled evaluator instead of a
translate-then-XPath pipeline:

- combinators: descendant (space), child (``>``), XPath ``/`` and ``//``;
- node tests: tag, ``*``, ``node()`` (includes text nodes), ``@attr`` steps;
- predicates: ``.class``, ``#id``, ``[attr]``, ``[attr=v]``, ``[@attr]``,
  ``[@attr='v']``, numeric position ``[n]``, ``:first``, ``:last``,
  ``:skip-last``, ``:not(...)``, ``:contains('x')``, ``:internal``,
  ``:external``;
- axes: ``preceding::``, ``following::`` (hybrid form
  ``.content//preceding::[@name]``, reference test/find.js:81-93);
- trailing ``@attr`` extraction (``a@href``), incl. bare ``@attr``
  (reference test/follow.js:28-31 ``follow('@href')``).

Positional predicates follow XPath child-position semantics: position is
taken within the group of matches sharing a parent (so ``li[2]`` is the
second matching ``li`` of its parent, ``b:last`` the last ``b`` under one
parent), matching css2xpath's ``[n]``/``[last()]`` translation.
"""

from __future__ import annotations

import re
from bisect import bisect_right
from urllib.parse import urlsplit

from .parser import Attribute, Document, Element, Node, TextNode

_SCHEME_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.\-]*://")


class _Step:
    __slots__ = ("axis", "test", "preds", "positional")

    def __init__(self, axis: str, test: str, preds, positional) -> None:
        self.axis = axis        # 'desc' | 'child' | 'self' | 'preceding' | 'following' | 'desc-or-self'
        self.test = test        # tag | '*' | 'node()'
        self.preds = preds      # list[callable(node, env) -> bool]
        self.positional = positional  # list of ('pos', n) | ('first',) | ('last',) | ('skip-last',)

    def __repr__(self) -> str:  # pragma: no cover
        return f"_Step({self.axis},{self.test},pos={self.positional})"


class CompiledSelector:
    def __init__(self, source: str, alternatives) -> None:
        self.source = source
        # each alternative: (steps: list[_Step], final_attr: str|None)
        self.alternatives = alternatives

    def find(self, context: Node, relative: bool = False) -> list[Node]:
        """Evaluate; returns matches in document order, deduplicated."""
        doc = context.doc()
        env = {"doc": doc, "base": getattr(doc, "location", None)}
        out: list[Node] = []
        seen: set[int] = set()
        for steps, final_attr in self.alternatives:
            nodes = _eval_steps(context, steps, relative, env)
            if final_attr is not None:
                attr_nodes = []
                for n in nodes:
                    if isinstance(n, Element):
                        a = n.attr(final_attr)
                        if a is not None:
                            attr_nodes.append(a)
                nodes = attr_nodes
            for n in nodes:
                if id(n) not in seen:
                    seen.add(id(n))
                    out.append(n)
        out.sort(key=_order_key)
        return out

    def get(self, context: Node, relative: bool = False):
        res = self.find(context, relative)
        return res[0] if res else None


def _order_key(node: Node):
    if isinstance(node, Attribute):
        return (node.owner.order, 1)
    return (node.order, 0)


# --------------------------------------------------------------------------
# parsing
# --------------------------------------------------------------------------

_cache: dict[str, CompiledSelector] = {}


def compile_selector(sel) -> CompiledSelector:
    """Compile with memoization (analogue of reference index.js:413-427)."""
    if isinstance(sel, (list, tuple)):
        sel = ", ".join(sel)  # reference lib/commands/find.js:69 joins arrays
    cached = _cache.get(sel)
    if cached is None:
        cached = CompiledSelector(sel, [_parse_alt(a) for a in _split_top(sel, ",")])
        _cache[sel] = cached
    return cached


def _split_top(s: str, sep: str) -> list[str]:
    parts, depth, quote, cur = [], 0, None, []
    for ch in s:
        if quote:
            cur.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in "'\"":
            quote = ch
            cur.append(ch)
        elif ch in "([":
            depth += 1
            cur.append(ch)
        elif ch in ")]":
            depth -= 1
            cur.append(ch)
        elif ch == sep and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    tail = "".join(cur).strip()
    if tail:
        parts.append(tail)
    return parts


def _tokenize_alt(s: str):
    """Yield (combinator, step_string) pairs. Combinators: desc/child/xpath."""
    tokens = []
    depth, quote, cur = 0, None, []
    pending_comb = None
    i, n = 0, len(s)

    def flush():
        nonlocal cur, pending_comb
        step = "".join(cur).strip()
        if step:
            tokens.append((pending_comb or "desc", step))
            pending_comb = None
        cur = []

    while i < n:
        ch = s[i]
        if quote:
            cur.append(ch)
            if ch == quote:
                quote = None
            i += 1
            continue
        if ch in "'\"":
            quote = ch
            cur.append(ch)
        elif ch in "([":
            depth += 1
            cur.append(ch)
        elif ch in ")]":
            depth -= 1
            cur.append(ch)
        elif depth == 0 and ch == "/":
            flush()
            if i + 1 < n and s[i + 1] == "/":
                pending_comb = "dslash"
                i += 1
            else:
                pending_comb = "child"
        elif depth == 0 and ch == ">":
            flush()
            pending_comb = "child"
        elif depth == 0 and ch.isspace():
            flush()
            # whitespace between a flushed step and the next: descendant,
            # unless a combinator is already pending
        else:
            cur.append(ch)
        i += 1
    flush()
    return tokens


def _parse_alt(s: str):
    steps: list[_Step] = []
    final_attr: str | None = None
    for comb, raw in _tokenize_alt(s):
        step, attr = _parse_step(raw)
        if comb == "dslash":
            if step.axis in ("preceding", "following"):
                # hybrid `X//preceding::Y`: expand descendant-or-self first
                steps.append(_Step("desc-or-self", "node()", [], []))
            else:
                step.axis = "desc"
        elif comb == "child":
            if step.axis not in ("preceding", "following"):
                step.axis = "child"
        # comb == 'desc': keep default axis from _parse_step ('desc' unless
        # an explicit axis prefix was present)
        steps.append(step)
        if attr is not None:
            final_attr = attr
    return steps, final_attr


_STEP_HEAD_RE = re.compile(r"^(?:(preceding|following|self|descendant)::)?(node\(\)|\*|[a-zA-Z][\w\-]*)?")


def _parse_step(raw: str):
    """Parse one step string -> (_Step, trailing_attr|None)."""
    axis = "desc"
    final_attr = None

    # bare attribute step: '@href'
    if raw.startswith("@"):
        return _Step("self", "*", [], []), raw[1:]

    m = _STEP_HEAD_RE.match(raw)
    explicit_axis, test = m.group(1), m.group(2)
    if explicit_axis in ("preceding", "following"):
        axis = explicit_axis
    elif explicit_axis == "self":
        axis = "self"
    rest = raw[m.end():]
    if test is None:
        test = "*"

    preds = []
    positional = []
    i, n = 0, len(rest)
    while i < n:
        ch = rest[i]
        if ch == "@":
            final_attr = rest[i + 1:]
            break
        if ch == ".":
            j = _ident_end(rest, i + 1)
            cls = rest[i + 1:j]
            preds.append(_pred_class(cls))
            i = j
        elif ch == "#":
            j = _ident_end(rest, i + 1)
            preds.append(_pred_attr("id", rest[i + 1:j]))
            i = j
        elif ch == "[":
            j = _bracket_end(rest, i)
            inner = rest[i + 1:j]
            p, pos = _parse_bracket(inner)
            if p is not None:
                preds.append(p)
            if pos is not None:
                positional.append(("pos", pos))
            i = j + 1
        elif ch == ":":
            j = i + 1
            k = _ident_end(rest, j)
            name = rest[j:k]
            arg = None
            if k < n and rest[k] == "(":
                close = _paren_end(rest, k)
                arg = rest[k + 1:close]
                k = close + 1
            p, pos = _parse_pseudo(name, arg)
            if p is not None:
                preds.append(p)
            if pos is not None:
                positional.append(pos)
            i = k
        else:
            raise ValueError(f"cannot parse selector step {raw!r} at {rest[i:]!r}")

    return _Step(axis, test, preds, positional), final_attr


def _ident_end(s: str, i: int) -> int:
    n = len(s)
    while i < n and (s[i].isalnum() or s[i] in "-_"):
        i += 1
    return i


def _bracket_end(s: str, i: int) -> int:
    depth, quote = 0, None
    for j in range(i, len(s)):
        ch = s[j]
        if quote:
            if ch == quote:
                quote = None
        elif ch in "'\"":
            quote = ch
        elif ch == "[":
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth == 0:
                return j
    raise ValueError(f"unterminated [ in {s!r}")


def _paren_end(s: str, i: int) -> int:
    depth, quote = 0, None
    for j in range(i, len(s)):
        ch = s[j]
        if quote:
            if ch == quote:
                quote = None
        elif ch in "'\"":
            quote = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return j
    raise ValueError(f"unterminated ( in {s!r}")


def _strip_quotes(s: str) -> str:
    s = s.strip()
    if len(s) >= 2 and s[0] == s[-1] and s[0] in "'\"":
        return s[1:-1]
    return s


def _parse_bracket(inner: str):
    """``[...]`` contents: positional int, attr existence, or attr=value."""
    inner = inner.strip()
    if inner.isdigit():
        return None, int(inner)
    if inner.startswith("@"):
        inner = inner[1:]
    if "=" in inner:
        name, _, val = inner.partition("=")
        return _pred_attr(name.strip(), _strip_quotes(val)), None
    return _pred_attr(inner.strip(), None), None


def _parse_pseudo(name: str, arg):
    if name == "first":
        return None, ("first",)
    if name == "last":
        return None, ("last",)
    if name == "skip-last":
        return None, ("skip-last",)
    if name == "contains":
        needle = _strip_quotes(arg or "")
        return (lambda node, env: needle in _node_text(node)), None
    if name == "not":
        raw = (arg or "*").strip()
        inner_step, _ = _parse_step(raw)
        if raw.startswith((":", "[", ".", "#")):
            # bare predicate, e.g. :not(:contains('1')) — css2xpath emits
            # [not(contains(.,'1'))]: no implicit element test, so text
            # nodes are judged by the predicate alone
            inner_step.test = "node()"
        def _not(node, env, _s=inner_step):
            return not _node_matches_step_preds(node, _s, env)
        return _not, None
    if name == "internal":
        return _pred_internal(True), None
    if name == "external":
        return _pred_internal(False), None
    if name == "domain":
        return _pred_link_part("domain", _strip_quotes(arg or "")), None
    if name == "path":
        return _pred_link_part("path", _strip_quotes(arg or "")), None
    if name == "html" or name == "source":
        # handled at the `set` level (reference lib/commands/set.js:4-5);
        # reaching here means the caller did not strip it
        raise ValueError(f":{name} must be stripped by the set compiler")
    raise ValueError(f"unsupported pseudo :{name}")


def _pred_class(cls: str):
    def pred(node, env):
        if not isinstance(node, Element):
            return False
        val = node.get_attribute("class")
        return val is not None and cls in val.split()
    return pred


def _pred_attr(name: str, value):
    def pred(node, env):
        if not isinstance(node, Element):
            return False
        v = node.get_attribute(name)
        if v is None:
            return False
        return value is None or v == value
    return pred


def _pred_internal(want_internal: bool):
    """:internal / :external on link nodes (reference Changes.md:92-95;
    exercised by test/follow.js:59-73 ``li > a:internal``)."""
    def pred(node, env):
        if not isinstance(node, Element):
            return False
        href = node.get_attribute("href")
        if href is None:
            return not want_internal
        if not _SCHEME_RE.match(href) and not href.startswith("//"):
            internal = True
        else:
            base = env.get("base")
            base_host = urlsplit(base).netloc if base else None
            internal = base_host is not None and urlsplit(
                href if _SCHEME_RE.match(href) else "http:" + href
            ).netloc == base_host
        return internal == want_internal
    return pred


def _pred_link_part(part: str, want: str):
    """``:domain(host)`` / ``:path(prefix)`` — search links by the domain /
    path of their RESOLVED href (reference Changes.md:92-95 lists both
    pseudos; css2xpath is not vendored in the reference, so the semantics
    here are the documented intent: domain matches the link host exactly or
    as a parent domain, path matches as a path prefix)."""
    from ..urlnorm import resolve as _resolve

    def pred(node, env):
        if not isinstance(node, Element):
            return False
        href = node.get_attribute("href")
        if href is None:
            return False
        resolved = _resolve(env.get("base"), href)
        parts = urlsplit(resolved)
        if part == "domain":
            host = parts.netloc.rsplit("@", 1)[-1].split(":")[0].lower()
            w = want.lower()
            return host == w or host.endswith("." + w)
        return parts.path.startswith(want)
    return pred


def _node_text(node: Node) -> str:
    if isinstance(node, TextNode):
        return node.data
    if isinstance(node, Element):
        return node.text()
    if isinstance(node, Attribute):
        return node.value()
    return ""


def _node_matches_step_preds(node: Node, step: _Step, env) -> bool:
    if not _test_match(node, step.test):
        return False
    return all(p(node, env) for p in step.preds)


def _test_match(node: Node, test: str) -> bool:
    if test == "node()":
        return isinstance(node, (Element, TextNode))
    if test == "*":
        return isinstance(node, Element)
    return isinstance(node, Element) and node.tag == test


# --------------------------------------------------------------------------
# evaluation
# --------------------------------------------------------------------------

def _axis_nodes(node: Node, axis: str, env):
    if axis in ("desc",):
        if isinstance(node, (Element, Document)):
            yield from node.descendants()
    elif axis == "desc-or-self":
        yield node
        if isinstance(node, (Element, Document)):
            yield from node.descendants()
    elif axis == "child":
        if isinstance(node, (Element, Document)):
            yield from node.children
    elif axis == "self":
        yield node
    elif axis == "preceding":
        doc = env["doc"]
        ancestors = {id(a) for a in node.ancestors()}
        for cand in doc.descendants():
            if cand.order >= node.order:
                break
            if id(cand) not in ancestors:
                yield cand
    elif axis == "following":
        doc = env["doc"]
        descendants = (
            {id(d) for d in node.descendants()}
            if isinstance(node, (Element, Document))
            else set()
        )
        for cand in doc.descendants():
            if cand.order > node.order and id(cand) not in descendants:
                yield cand
    else:  # pragma: no cover
        raise ValueError(f"unknown axis {axis}")


def _eval_steps(context: Node, steps, relative: bool, env) -> list[Node]:
    if not steps:
        return [context]
    contexts: list[Node] = [context]
    if not relative and not isinstance(context, Document):
        contexts = [context.doc()]
    for step in steps:
        matched: list[Node] = []
        seen: set[int] = set()
        # fast path: descendant-axis plain-tag step → bisect the per-tag
        # structural index instead of scanning the subtree (the most common
        # step shape by far: `div`, `a`, `li` ... of `find`/`follow`)
        if (step.axis == "desc" and not step.preds
                and step.test not in ("*", "node()")):
            doc = env["doc"]
            by_tag = getattr(doc, "_by_tag", None)
            if by_tag is not None:
                lst = by_tag.get(step.test)
                if lst:
                    orders = doc._tag_orders[step.test]
                    for ctx in contexts:
                        if ctx is doc:
                            cands = lst
                        elif isinstance(ctx, Element):
                            lo = bisect_right(orders, ctx.order)
                            hi = bisect_right(orders, ctx._end_order)
                            cands = lst[lo:hi]
                        else:
                            continue
                        for cand in cands:
                            key = id(cand)
                            if key not in seen:
                                seen.add(key)
                                matched.append(cand)
                matched.sort(key=_order_key)
                if step.positional:
                    matched = _apply_positional(matched, step.positional)
                contexts = matched
                if not contexts:
                    break
                continue
        for ctx in contexts:
            for cand in _axis_nodes(ctx, step.axis, env):
                if id(cand) in seen:
                    continue
                if _node_matches_step_preds(cand, step, env):
                    seen.add(id(cand))
                    matched.append(cand)
        matched.sort(key=_order_key)
        if step.positional:
            matched = _apply_positional(matched, step.positional)
        contexts = matched
        if not contexts:
            break
    return contexts


def _apply_positional(nodes: list[Node], positional) -> list[Node]:
    """XPath child-position semantics: position within the per-parent group."""
    groups: dict[int, list[Node]] = {}
    order: list[int] = []
    for n in nodes:
        key = id(n.parent)
        if key not in groups:
            groups[key] = []
            order.append(key)
        groups[key].append(n)
    out: list[Node] = []
    for key in order:
        group = groups[key]
        for spec in positional:
            if spec[0] == "pos":
                group = [group[spec[1] - 1]] if len(group) >= spec[1] else []
            elif spec[0] == "first":
                group = group[:1]
            elif spec[0] == "last":
                group = group[-1:]
            elif spec[0] == "skip-last":
                group = group[:-1]
        out.extend(group)
    out.sort(key=_order_key)
    return out
