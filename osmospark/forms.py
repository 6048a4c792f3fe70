"""Form parameter collection (behavior of reference lib/Form.js).

Used by ``paginate('form', ...)`` and the ``submit``/``login`` operators:
collect named, non-disabled, non-submit inputs; selects take the selected
(or first) option; textareas their text; checkboxes only when checked (with
``[]`` array-name stripping); duplicate names promote to arrays; the chosen
submit button contributes its name/value (reference lib/Form.js:84-174).
"""

from __future__ import annotations

from .html import Element
from .urlnorm import resolve as _resolve_url


def _find(node: Element, pred):
    return [e for e in node.descendants() if isinstance(e, Element) and pred(e)]


def get_form(node: Element):
    if node.tag == "form":
        return node
    form_id = node.get_attribute("form")
    if form_id is not None:
        doc = node.doc()
        for e in doc.descendants():
            if isinstance(e, Element) and e.get_attribute("id") == form_id:
                return e
    cur = node
    while cur is not None and isinstance(cur, Element):
        if cur.tag == "form":
            return cur
        cur = cur.parent if isinstance(cur.parent, Element) else None
    return None


def form_action(node: Element) -> str:
    # reference lib/Form.js:44-54
    doc = node.doc()
    base = getattr(doc, "location", None)
    for attr in ("action", "formaction"):
        v = node.get_attribute(attr)
        if v is not None:
            return _resolve_url(base, v)
    return base


def form_method(node: Element) -> str:
    # reference lib/Form.js:74-82
    for attr in ("method", "formmethod"):
        v = node.get_attribute(attr)
        if v is not None:
            return v.lower()
    return "get"


def form_enctype(node: Element) -> str:
    for attr in ("enctype", "formenctype"):
        v = node.get_attribute(attr)
        if v is not None:
            return v
    return "application/x-www-form-urlencoded"


def is_multipart(node: Element) -> bool:
    return form_enctype(node).startswith("multi")


def get_submit_button(node: Element):
    # reference lib/Form.js:30-42
    if node.tag == "form":
        form_id = node.get_attribute("id")
        for e in _find(node, lambda e: e.get_attribute("type") == "submit"
                       and not e.has_attribute("disabled")):
            ref = e.get_attribute("form")
            if ref is None or ref == form_id:
                return e
        return None
    if node.tag in ("input", "button") and node.get_attribute("type") == "submit":
        return node
    return None


def form_params(node: Element) -> dict:
    # reference lib/Form.js:84-174
    form = get_form(node) or node
    params: dict = {}
    submit = get_submit_button(node)
    inputs = _find(
        form,
        lambda e: e.has_attribute("name")
        and not e.has_attribute("disabled")
        and e.get_attribute("type") != "submit",
    )
    for inp in inputs:
        name = inp.get_attribute("name")
        typ = (inp.get_attribute("type") or "").lower()
        value = None
        if name.endswith("]"):
            name = name[:-2]
        if inp.tag == "select":
            opt = None
            for o in _find(inp, lambda e: e.tag == "option"):
                if o.has_attribute("selected"):
                    opt = o
                    break
            if opt is None:
                opts = _find(inp, lambda e: e.tag == "option")
                opt = opts[0] if opts else None
            if opt is not None:
                value = (opt.get_attribute("value")
                         if opt.has_attribute("value") else opt.text())
        elif inp.tag == "textarea":
            value = inp.text()
        elif inp.tag == "input":
            if typ in ("radio", "image", "checkbox"):
                if typ == "image":
                    for p in ("x", "y"):
                        key = f"{name}.{p}" if name else p
                        params[key] = 0
                if not inp.has_attribute("checked"):
                    continue
                value = inp.get_attribute("value") or "on"
            else:
                value = inp.get_attribute("value")
        if value is not None:
            current = params.get(name)
            if isinstance(current, list):
                current.append(value)
            elif current is not None:
                params[name] = [current, value]
            else:
                params[name] = value
    if submit is not None and submit.has_attribute("name"):
        params[submit.get_attribute("name")] = (
            submit.get_attribute("value") or "Submit Query"
        )
    return params
