"""Chain runtime: executes a Chain against pages, one node at a time.

Two modes share this interpreter:

1. **sync mode** (``Runner(store=...)``): fetch boundaries resolve
   immediately against a PageStore. This is the single-process correctness
   anchor — its records are byte-identical to the reference fixtures.
2. **page scope mode** (``Runner(page_scope=True)``): fetch boundaries
   *register continuations* instead of fetching, leaving the affected
   record branches open. The Spark frontier engine runs this inside
   mapInPandas: per round each page is processed to completion of its local
   work, continuations become next-round frontier rows, and open records are
   assembled by grouped merge afterwards.

Execution semantics mirror the reference interpreter step
(reference lib/Command.js:117-181 ``Command.start``: ref/unref bookkeeping,
clone-on-second-``next``, fall-through to ``end`` when ``next`` was never
called) and chain end behavior (lib/Command.js:189-227: empty-record
fallback to the context node's text/value, merge-up into the parent).
"""

from __future__ import annotations

import inspect
import numbers
import re as _re
from urllib.parse import parse_qsl, urlencode, urljoin, urlsplit, urlunsplit

from .forms import form_action, form_method, form_params
from .html import Attribute, Document, Element, compile_selector, parse_html
from .html.parser import Node, TextNode
from .record import _UNSET, Record
from .spec import Chain, Cmd, collect_chains
from .urlnorm import resolve as _resolve_url

DEFAULT_TRIES = 3        # reference index.js:104
DEFAULT_REDIRECTS = 3    # reference index.js:95
DEFAULT_CONCURRENCY = 5  # reference index.js:93


# --------------------------------------------------------------------------
# node content helpers (reference lib/commands/set.js:246-258 getContent;
# lib/Command.js:209-221 end-of-chain fallback)
# --------------------------------------------------------------------------

def get_content(node):
    """Trimmed text/value of a node; None for missing/Document."""
    if node is None:
        return None
    if isinstance(node, Attribute):
        return node.value().strip()
    if isinstance(node, Element):
        return node.text().strip()
    if isinstance(node, TextNode):
        return node.data.strip()
    return None


def raw_content(node):
    """Untrimmed text/value (used by contains/match and the end fallback,
    which call text()/value() without trim)."""
    if isinstance(node, Attribute):
        return node.value()
    if isinstance(node, (Element, TextNode)):
        return node.text() if isinstance(node, Element) else node.data
    return None


class Continuation:
    """A fetch boundary captured in page-scope mode."""

    __slots__ = ("method", "url", "params", "resume_index", "data",
                 "sort_index", "kind", "count", "referer", "chain")

    def __init__(self, method, url, params, resume_index, data, sort_index,
                 kind, count=None, referer=None, chain=None):
        if method == "get" and isinstance(params, dict) and params:
            # GET params merge into the URL at the fetch boundary exactly
            # as the sync request layer does (reference
            # lib/Command.js:343-351) — the distributed fetch joins the
            # corpus on the FULL url, so the params must already be there
            url, params = _merge_get_params(url, params)
        self.method = method
        self.url = url
        self.params = params
        self.resume_index = resume_index  # command index WITHIN self.chain
        self.data = data          # live Record at registration time
        self.sort_index = sort_index
        self.kind = kind          # 'follow' | 'get' | 'paginate'
        self.count = count        # paginate page counter
        self.referer = referer
        self.chain = chain        # the Chain the resume index refers to


class ProxyRecord(Record):
    """Stands in for a parent record living in a previous round. Merges are
    captured as (parent_record_id, key, sort_index, value) child-value rows
    instead of mutating an in-memory dict."""

    __slots__ = ("record_id", "captured")

    def __init__(self, record_id, captured: list) -> None:
        super().__init__(None)
        self.record_id = record_id
        self.captured = captured

    def merge(self, child: Record) -> None:
        if child.object is _UNSET:
            return
        self.captured.append(
            (self.record_id, child.get_index(), child.get_sort_index(),
             child.object)
        )

    def is_array(self, val=None):
        if val is not None:
            return super().is_array(val)
        return False  # arrayness is resolved at assembly time


class Runner:
    """Executes chains. See module docstring for the two modes."""

    def __init__(self, store=None, page_scope=False, tries=DEFAULT_TRIES,
                 max_redirects=DEFAULT_REDIRECTS, python_callbacks=True,
                 opts: dict | None = None):
        self.store = store
        self.page_scope = page_scope
        self.tries = tries
        self.max_redirects = max_redirects
        self.python_callbacks = python_callbacks
        # instance-level options (reference osmosis.config); per-command
        # scoped deltas fold on top — see _opts_at
        self.base_opts: dict = dict(opts or {})
        self.current_opts: dict = self.base_opts
        # keyed by the Chain object itself (weakly): an id()-keyed cache
        # could silently serve a dead chain's folds to a new chain reusing
        # the same address on a long-lived Runner
        import weakref
        self._opts_cache: "weakref.WeakKeyDictionary[Chain, list[dict]]" = \
            weakref.WeakKeyDictionary()
        self.results: list = []          # .data(cb) outputs, in arrival order
        self.errors: list[str] = []
        self.logs: list[str] = []
        self.fetch_log: list[dict] = []  # (url, method, params, referer, status)
        self.continuations: list[Continuation] = []
        self.child_values: list = []     # ProxyRecord captures
        # proxy round-robin state per proxy-list (reference
        # lib/Command.js:353-365: opts.proxies carries a rotating index;
        # failing proxies are dropped, index.js:197-208)
        self._proxy_rotation: dict[int, dict] = {}
        self.stopped = False
        # chain-level pause/resume (reference lib/commands/pause.js /
        # resume.js: instance-level flags; paused work queues and resumes)
        self.paused = False
        self._deferred: list = []        # (chain, i, context, data)
        self._root_chain: Chain | None = None
        self._done_fired = False

    # -- entry points ---------------------------------------------------
    def run(self, chain: Chain, context=None, data: Record | None = None):
        """Run a chain from its first command. Returns .data() results."""
        if data is None:
            data = Record()
        self._attach(chain)
        self._root_chain = chain
        self._done_fired = False
        self._start(chain, 0, context, data)
        self._maybe_done()
        return self.results

    def resume(self, chain: Chain, index: int, context, data: Record):
        """Resume at command ``index`` (used for round continuations)."""
        self._attach(chain)
        self._start(chain, index, context, data)

    def _attach(self, chain: Chain) -> None:
        """Bind this runner to every chain reachable from ``chain`` (the
        analogue of reference index.js:350-354 setParent: nested instances
        share the parent instance's queue, so chain.pause()/.resume()/
        .stop() act on the whole run). Pre-run flags set on the chain
        before a runner existed are folded in."""
        for c in collect_chains(chain):
            c._runner = self
        if getattr(chain, "_stopped_flag", False):
            self.stopped = True
        if getattr(chain, "_paused_flag", False):
            self.paused = True

    def _drain(self) -> None:
        """Execute work deferred while paused (reference index.js:364-377
        resumeQueue flush)."""
        while self._deferred and not self.paused and not self.stopped:
            chain, i, context, data = self._deferred.pop(0)
            self._start(chain, i, context, data)

    def _maybe_done(self) -> None:
        """Fire .done() callbacks once all work has drained (or the run
        was stopped — the reference fires done after stop too,
        test/stop.js)."""
        if (self._deferred or self.paused) and not self.stopped:
            return
        if self._root_chain is not None and not self._done_fired:
            self._done_fired = True
            for cb in self._root_chain.on_done:
                cb()

    # -- interpreter core (reference lib/Command.js:117-181) --------------
    def _start(self, chain: Chain, i: int, context, data: Record) -> None:
        if context is None and i > 0:
            return
        if self.stopped:
            return
        if self.paused:
            # reference Command.js:133-139: paused instances queue the
            # pending start on the resume queue
            self._deferred.append((chain, i, context, data))
            return
        if i >= len(chain.commands):
            self._end(chain, context, data)
            return
        cmd = chain.commands[i]
        called_next = [False]

        def next_fn(c, d, index=None):
            if called_next[0]:
                d = d.clone()
                d.set_sort_index(index)
                d.ref()
                self._start(chain, i + 1, c, d)
            else:
                called_next[0] = True
                d.set_sort_index(index)
                self._start(chain, i + 1, c, d)

        def done_fn(err=None):
            data.unref()
            if not called_next[0]:
                self._end(chain, context, data)
            if err is not None:
                self._error(chain, cmd, err)

        data.ref()
        # positional opts scoping (reference lib/Command.js:235-251): the
        # opts visible at command i are the instance opts + every config
        # delta at positions <= i; attach to the context doc so `then`
        # callbacks can introspect them (reference this.getOpts())
        self.current_opts = self._opts_at(chain, i)
        if context is not None:
            try:
                # attach a COPY: a user callback mutating ctx.doc().opts must
                # not corrupt the cached folds shared across positions (the
                # reference isolates writes via Object.create inheritance)
                context.doc().opts = dict(self.current_opts)
            except Exception:
                pass
        handler = _HANDLERS[cmd.name]
        handler(self, chain, i, cmd, context, data, next_fn, done_fn)

    def _opts_at(self, chain: Chain, i: int) -> dict:
        """Folded options at command position ``i``.

        Reference semantics (lib/commands/config.js doc: options apply to
        "the *preceding* command on down the chain"; config-type commands
        don't create chain nodes — they mutate the previous real command's
        prototype-linked opts at build time, lib/Command.js:229-251). So a
        config delta at position j takes effect from the nearest preceding
        NON-config command onward — ``.get(url).config({tries: 9})``
        configures the get's own request. Copy-on-write: a new dict is
        built only at positions where a delta lands."""
        folds = self._opts_cache.get(chain)
        if folds is None:
            deltas_at: dict[int, list[dict]] = {}
            last_real = 0
            for j, cmd in enumerate(chain.commands):
                if cmd.name == "config":
                    start = last_real if j > 0 else 0
                    deltas_at.setdefault(start, []).append(cmd.args[0])
                else:
                    last_real = j
            folds = []
            cur = self.base_opts
            for j in range(len(chain.commands)):
                for delta in deltas_at.get(j, ()):
                    cur = dict(cur)
                    for k, v in delta.items():
                        if k in ("headers", "cookies") and isinstance(
                                v, dict):
                            merged = dict(cur.get(k) or {})
                            merged.update(v)
                            if k == "cookies":
                                # setting a cookie to None DELETES it
                                # (reference lib/commands/cookie.js:24-27)
                                merged = {ck: cv for ck, cv in
                                          merged.items() if cv is not None}
                            cur[k] = merged
                        else:
                            cur[k] = v
                folds.append(cur)
            self._opts_cache[chain] = folds
        if i >= len(folds):
            return folds[-1] if folds else self.base_opts
        return folds[i]

    def _end(self, chain: Chain, context, data: Record) -> None:
        # reference lib/Command.js:189-227
        parent = data.parent
        if parent is not None:
            if data.is_empty():
                data = data.clone()
                fallback = raw_content(context)
                if fallback is not None:
                    data.set_object(fallback)
            parent.merge(data)
            data.unref()

    def _error(self, chain: Chain, cmd: Cmd, msg) -> None:
        text = f"({cmd.name}) {msg}"
        self.errors.append(text)
        for cb in chain.on_error:
            cb(text)

    def _log(self, chain: Chain, cmd: Cmd, msg) -> None:
        text = f"({cmd.name}) {msg}"
        self.logs.append(text)
        for cb in chain.on_log:
            cb(text)

    # -- request layer (reference lib/Command.js:287-402 + Request.js) ----
    def request(self, chain, cmd, method, context, href, params, cb,
                sort_index=None):
        if not href:
            cb("Invalid URL", None)
            return
        referer = None
        if context is not None:
            base = context.doc().location
            url = _resolve_url(base, href)
            referer = base
        else:
            url = _resolve_url(None, href)

        query = dict(parse_qsl(urlsplit(url).query, keep_blank_values=True))
        if method == "get" and isinstance(params, dict):
            url, query = _merge_get_params(url, params)
            params = query

        # scoped opts → request headers/cookies/user-agent
        # (reference lib/Request.js:70-76, cookie merge :145-167)
        opts = self.current_opts
        req_headers = dict(opts.get("headers") or {})
        cookies = opts.get("cookies") or {}
        if cookies:
            req_headers["cookie"] = "; ".join(
                f"{k}={v}" for k, v in sorted(cookies.items()))
        ua = opts.get("user_agent")
        if ua is not None:
            req_headers["user-agent"] = ua() if callable(ua) else ua
        proxy, proxy_state = self._select_proxy(opts)

        # retry loop (reference index.js:210-218): EVERY request-level
        # error — connection failure, HTTP 4xx/5xx, max-redirects, empty
        # body — retries up to `tries` attempts, emitting
        # "<err>, retrying <url> (n/tries)" per retry; the final failure
        # surfaces the bare error (reference Request.js callback path).
        tries = max(1, int(opts.get("tries", self.tries)))
        status = 0
        page = None
        final_url = url
        err = None
        for attempt in range(tries):
            status, page, final_url, max_redirects_hit = \
                self._fetch_once(chain, cmd, url, method, params)
            err = None
            if page is None:
                err = f"[{method}] {url} - {status}"
            elif max_redirects_hit:
                # needle's error when `follow` is exhausted and the
                # response still redirects (reference test/get.js:85-106)
                err = f"Max redirects reached. Possible loop in: {final_url}"
            elif (400 <= status <= 500
                    and not opts.get("ignore_http_errors")):
                # fetch error taxonomy (reference lib/Request.js:29-37)
                err = f"{status} {_STATUS_TEXT.get(status, 'Error')}"
            elif page.html is None or len(page.html) == 0:
                err = "Data is empty"  # Request.js:39-42
            if err is None:
                break
            if attempt + 1 < tries:
                self._error(chain, cmd,
                            f"{err}, retrying {url} "
                            f"({attempt + 2}/{tries})")
        self.fetch_log.append(
            {"url": url, "final_url": final_url, "method": method,
             "params": dict(params) if isinstance(params, dict) else None,
             "referer": referer, "status": status,
             "headers": req_headers, "proxy": proxy}
        )
        if err is not None:
            if page is None and status != 404 and proxy_state is not None:
                # connection-level failure through a proxy: report and drop
                # it from rotation (reference index.js:197-208)
                plist = proxy_state["list"]
                self._error(
                    chain, cmd,
                    f"proxy {proxy_state['index'] + 1}/{len(plist)} "
                    f"failed ({proxy})")
                if len(plist) > 1:
                    plist.pop(proxy_state["index"])
                    proxy_state["index"] %= len(plist)
            self._error(chain, cmd, err)
            cb(status if page is None else err, None)
            return
        # redirects set the referer for the final hop when the chain gave
        # none (reference follow_set_referer default, needle behavior)
        if final_url != url and referer is None:
            referer = url
        raw = page.html

        # process_response hook (reference lib/Request.js:88-100): sync
        # form returns replacement data; async form (arity > 2) gets
        # (data, res, next[, callback]) and either next(data') or
        # callback(err)
        hook = opts.get("process_response")
        if callable(hook):
            meta = _ResponseMeta(status, getattr(page, "content_type",
                                                 "text/html"), final_url)
            raw, err = apply_process_response(hook, raw, meta)
            if err is not None:
                self._error(chain, cmd, err)
                cb(err, None)
                return

        if opts.get("parse") is False:
            # reference Request.js:43-46: skip parsing; downstream
            # commands receive the raw body as their context
            cb(None, raw)
            return

        doc = build_document(raw, final_url, method=method,
                             params=query if method == "get" else params,
                             referer=referer, status=status,
                             content_type=getattr(page, "content_type",
                                                  "text/html"))
        if doc.root is None:
            # reference Request.js:60-63
            self._error(chain, cmd, "Document has no root")
            cb("Document has no root", None)
            return
        doc.response["size"] = {"body": len(raw)}  # Request.js:110-117
        if opts.get("keep_data") is True:
            doc.response["data"] = raw             # Request.js:81-83
        for k, v in req_headers.items():
            doc.request["headers"].setdefault(k, v)
        doc._data_sort_index = sort_index
        cb(None, doc)

    def _select_proxy(self, opts):
        """Round-robin proxy selection (reference lib/Command.js:353-365:
        a list proxy option rotates per request). Returns
        (proxy_or_None, rotation_state_or_None); against the static
        corpus the proxy is recorded on the fetch log rather than used
        for transport."""
        plist = opts.get("proxies")
        if plist is None:
            p = opts.get("proxy")
            if not isinstance(p, (list, tuple)):
                return p, None
            plist = p
        # stable VALUE key, not id(plist): a GC'd list whose address is
        # reused would otherwise serve the dead list's rotation state to
        # an unrelated new list (the same id-reuse hazard fixed for
        # _opts_cache). Equal proxy lists sharing one rotation is the
        # reference's observable behavior for a re-declared option.
        key = tuple(str(p) for p in plist)
        st = self._proxy_rotation.get(key)
        if st is None:
            st = {"list": list(plist), "index": -1}
            self._proxy_rotation[key] = st
        if not st["list"]:
            return None, None
        st["index"] = (st["index"] + 1) % len(st["list"])
        return st["list"][st["index"]], st

    def _fetch_once(self, chain, cmd, url, method, params):
        """One fetch attempt, following redirects up to the `follow` opt
        (reference lib/Request.js:103-105 + needle, default 3). Each hop
        logs "[redirect] from -> to" (reference index.js:226-231); if the
        limit is exhausted while the response still redirects, returns
        max_redirects_hit=True (needle's Max-redirects error). Returns
        (status, page, final_url, max_redirects_hit)."""
        redirects = int(self.current_opts.get("follow", self.max_redirects))
        status, page = self.store.fetch(url, method, params)
        final_url = url
        hops = 0
        while page is not None and 300 <= status < 400 and hops < redirects:
            target = getattr(page, "redirect_to", None)
            if not target:
                break
            new_url = _resolve_url(final_url, target)
            self._log(chain, cmd, f"[redirect] {final_url} -> {new_url}")
            final_url = new_url
            status, page = self.store.fetch(final_url, "get", None)
            hops += 1
        max_redirects_hit = (page is not None and 300 <= status < 400
                             and getattr(page, "redirect_to", None)
                             is not None)
        return status, page, final_url, max_redirects_hit


_STATUS_TEXT = {
    400: "Bad Request", 401: "Unauthorized", 403: "Forbidden",
    404: "Not Found", 410: "Gone", 429: "Too Many Requests",
    500: "Internal Server Error",
}


class _ResponseMeta:
    """The ``res`` argument handed to process_response hooks (the subset of
    needle's response the reference exposes there: statusCode + headers)."""

    __slots__ = ("statusCode", "headers", "url")

    def __init__(self, status: int, content_type, url: str) -> None:
        self.statusCode = status
        self.headers = ({"content-type": content_type}
                        if content_type is not None else {})
        self.url = url


def apply_process_response(hook, raw, meta):
    """Run a process_response hook; returns (data, err). Call convention
    mirrors reference lib/Request.js:88-100: arity > 2 gets
    (data, res, next[, callback]) and continues via next(data') or fails
    via callback(err); otherwise the return value replaces the data."""
    arity = _arity(hook)
    if arity > 2:
        outcome: dict = {}
        args = [raw, meta, lambda d: outcome.__setitem__("data", d)]
        if arity > 3:
            args.append(lambda err=None: outcome.__setitem__("err", err))
        hook(*args)
        if "err" in outcome:
            return None, outcome["err"]
        return outcome.get("data", raw), None
    return (hook(raw, meta) if arity >= 2 else hook(raw)), None


def _response_type(content_type):
    """Content-type → response.type (reference lib/Request.js:128-142)."""
    if content_type is None:
        return None
    if "xml" in content_type:
        return "xml"
    if "html" in content_type:
        return "html"
    return content_type


def _merge_get_params(url: str, params: dict):
    """Merge GET params into the URL's query string (reference
    lib/Command.js:343-351 + needle/qs indexed array serialization).
    Returns (url, merged_query_dict)."""
    query = dict(parse_qsl(urlsplit(url).query, keep_blank_values=True))
    for k, v in params.items():
        if isinstance(v, (list, tuple)):
            # qs-style indexed serialization (the reference's needle
            # client encodes array params as name[0], name[1], ...)
            for j, item in enumerate(v):
                query[f"{k}[{j}]"] = _param_str(item)
        else:
            query[k] = _param_str(v)
    return _set_query(url, query), query


def _param_str(v):
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, numbers.Number):
        f = float(v)
        return str(int(f)) if f.is_integer() else str(f)
    return str(v)


def _set_query(url: str, query: dict) -> str:
    parts = urlsplit(url)
    return urlunsplit(
        (parts.scheme, parts.netloc, parts.path, urlencode(query), "")
    )


def build_document(html, url, method="get", params=None, referer=None,
                   status=200, count=None,
                   content_type="text/html") -> Document:
    doc = parse_html(html, base_url=url)
    q = dict(parse_qsl(urlsplit(url).query, keep_blank_values=True))
    doc.request = {
        "method": method,
        "params": params if params is not None else q,
        "query": q,
        "headers": {"referer": referer} if referer else {},
        "count": count,
        "pathname": urlsplit(url).path,
    }
    doc.response = {"status": status,
                    "type": _response_type(content_type)}
    return doc


# --------------------------------------------------------------------------
# command handlers
# --------------------------------------------------------------------------

def _h_parse(runner, chain, i, cmd, context, data, next_fn, done_fn):
    html, base_url = cmd.args
    doc = build_document(html, base_url or "")
    if not base_url:
        doc.location = None
    next_fn(doc, data)
    done_fn()


def _h_get(runner, chain, i, cmd, context, data, next_fn, done_fn):
    url, params = cmd.args
    method = cmd.name
    if callable(url):
        res = url(context, data.get_object()) if _arity(url) >= 2 else url(context)
        if isinstance(res, Node):
            res = _url_from_node(res)
        url = res
    if callable(params):
        params = params(context, data.get_object())

    if runner.page_scope:
        runner.continuations.append(Continuation(
            method, _resolve_href(context, url), params, i + 1, data, None,
            "get", referer=_doc_location(context), chain=chain))
        # branch stays open: no done(), mirrors a pending async request
        return

    def cb(err, document):
        if err is None:
            next_fn(document, data)
        done_fn()

    runner.request(chain, cmd, method, context, url, params, cb)


def _h_find(runner, chain, i, cmd, context, data, next_fn, done_fn):
    selector = cmd.args[0]
    if callable(selector):
        selector = selector(context, data.get_object())
    relative = cmd.name == "select" or chain.nested
    nodes = compile_selector(selector).find(context, relative=relative)
    if not nodes:
        done_fn(f'no results for "{selector}"')
        return
    last = len(nodes) - 1
    for idx, node in enumerate(nodes):
        next_fn(node, data, idx)
        _ = idx == last
    done_fn()


def _h_follow(runner, chain, i, cmd, context, data, next_fn, done_fn):
    # reference lib/commands/follow.js:13-66
    selector = cmd.args[0]
    nodes = compile_selector(selector).find(context, relative=True)
    document = context.doc()
    if not nodes:
        done_fn(f'no results for "{selector}" in {document.location}')
        return

    urls = []
    for node in nodes:
        if isinstance(node, Attribute):
            url = node.value()
        else:
            attr = node.attr("href") if isinstance(node, Element) else None
            if attr is not None:
                # raw encoding preserved (follow.js:39-46)
                url = attr.value()
            else:
                url = node.text() if isinstance(node, Element) else raw_content(node)
        if url:
            urls.append(url)

    if not urls:
        done_fn()
        return

    if runner.page_scope:
        for idx, url in enumerate(urls):
            runner.continuations.append(Continuation(
                "get", _resolve_href(context, url), None, i + 1, data, idx,
                "follow", referer=document.location, chain=chain))
        return  # branch stays open

    pending = [len(urls)]

    for idx, url in enumerate(urls):
        def cb(err, doc, _idx=None):
            if err is None:
                next_fn(doc, data, getattr(doc, "_data_sort_index", None))
            pending[0] -= 1
            if pending[0] == 0:
                done_fn()
        runner._log(chain, cmd, "url: " + url)
        runner.request(chain, cmd, "get", nodes[idx], url, None, cb, idx)


def _h_paginate(runner, chain, i, cmd, context, data, next_fn, done_fn):
    # reference lib/commands/paginate.js:26-104
    selector, limit_arg = cmd.args
    document = context.doc()
    count = (document.request or {}).get("count") or 1
    limit = _paginate_limit(limit_arg, context, data)

    next_fn(context, data, count)

    if limit is not None and count > limit:
        done_fn()
        return

    method = (document.request or {}).get("method", "get")
    url = document.location
    params: dict = {}
    node = context

    if callable(selector):
        ret = selector(context, data.get_object())
        if isinstance(ret, str):
            url = _resolve_url(document.location, ret)
        else:
            params = ret or {}
    elif isinstance(selector, dict):
        for param, value in selector.items():
            if isinstance(value, numbers.Number) and not isinstance(value, bool):
                cur = (document.request or {}).get("params", {}).get(param)
                try:
                    cur_f = float(cur)
                except (TypeError, ValueError):
                    cur_f = 0.0
                params[param] = cur_f + value
            else:
                params[param] = get_content(
                    compile_selector(value).get(context, relative=True))
    else:
        node = compile_selector(selector).get(document)
        if node is None:
            done_fn(f'no results for "{selector}" in {url}')
            return
        if isinstance(node, Element) and node.tag == "form":
            url = form_action(node)
            method = form_method(node)
            params = form_params(node)
        elif isinstance(node, Element) and node.has_attribute("href"):
            url = node.get_attribute("href")
        else:
            name = node.get_attribute("name") if isinstance(node, Element) else None
            if name is not None:
                value = node.get_attribute("value")
                if value is None:
                    value = get_content(node)
                params[name] = value
            else:
                done_fn(f"no URL found in {selector}")
                return

    runner._log(chain, cmd,
                f"loading page {count}" + (f"/{limit}" if limit else "") + f" - {url}")

    if runner.page_scope:
        runner.continuations.append(Continuation(
            method, _resolve_href(context, url), params, i, data, count,
            "paginate", count=count + 1, referer=document.location,
            chain=chain))
        done_fn()
        return

    def cb(err, doc):
        if err is None:
            doc.request["count"] = count + 1
            runner._start(chain, i, doc, data)

    runner.request(chain, cmd, method, node, url, params, cb)
    done_fn()


def _paginate_limit(limit, context, data):
    # reference lib/commands/paginate.js:106-138
    if limit is None or isinstance(limit, numbers.Number):
        return limit
    if callable(limit):
        value = limit(context, data.get_object())
        if value is False:
            return 0
        if value is True:
            return None
        return value
    node = compile_selector(limit).get(context, relative=True)
    if node is None:
        return 0
    value = get_content(node)
    if not value:
        return 0
    digits = _re.sub(r"[^0-9.]+", "", value)
    try:
        return int(float(digits)) if digits else 0
    except ValueError:
        return 0


# -- filters (reference lib/commands/{filter,fail,success,contains,match}.js)

def _h_filter(runner, chain, i, cmd, context, data, next_fn, done_fn):
    if compile_selector(cmd.args[0]).find(context, relative=True):
        next_fn(context, data)
    done_fn()


def _h_fail(runner, chain, i, cmd, context, data, next_fn, done_fn):
    if compile_selector(cmd.args[0]).find(context, relative=True):
        runner._error(chain, cmd, f"found {cmd.args[0]}")
        done_fn()
    else:
        next_fn(context, data)
        done_fn()


def _h_success(runner, chain, i, cmd, context, data, next_fn, done_fn):
    if compile_selector(cmd.args[0]).find(context, relative=True):
        next_fn(context, data)
        done_fn()
    else:
        runner._error(chain, cmd, f"{cmd.args[0]} not found")
        done_fn()


def _h_contains(runner, chain, i, cmd, context, data, next_fn, done_fn):
    text = raw_content(context) or ""
    if cmd.args[0] in text:
        next_fn(context, data)
    done_fn()


def _h_match(runner, chain, i, cmd, context, data, next_fn, done_fn):
    pattern = cmd.args[0]
    if isinstance(pattern, str):
        pattern = _re.compile(pattern)
    if pattern.search(raw_content(context) or ""):
        next_fn(context, data)
    done_fn()


# -- then (reference lib/commands/then.js:60-125)

def _h_then(runner, chain, i, cmd, context, data, next_fn, done_fn):
    cb = cmd.args[0]
    arity, first_name = _arity(cb), _first_param(cb)
    ctx_arg = context
    if first_name == "document" and context is not None:
        ctx_arg = context.doc()
    data.get_object()  # reference Then always materializes (then.js:68-70)

    called_next = [False]

    def wrapped_next(c, d):
        called_next[0] = True
        next_fn(c, data.set_object(d))

    if arity <= 2:
        if arity == 0:
            cb()
        elif arity == 1:
            cb(ctx_arg)
        else:
            cb(ctx_arg, data.get_object())
        next_fn(ctx_arg, data)
        done_fn()
    elif arity == 3:
        cb(ctx_arg, data.get_object(), wrapped_next)
        # auto-done after synchronous completion (nextTick analogue)
        done_fn()
    else:
        cb(ctx_arg, data.get_object(), wrapped_next, done_fn)


# -- do (reference lib/commands/do.js:16-34)

def _h_do(runner, chain, i, cmd, context, data, next_fn, done_fn):
    branches = cmd.args
    pending = [len(branches)]

    def branch_done():
        pending[0] -= 1
        if pending[0] == 0:
            next_fn(context, data)
            done_fn()

    for branch in branches:
        child = data.child().done(branch_done)
        runner._start(branch, 0, context, child)


# -- set (reference lib/commands/set.js)

_SOURCE_RE = _re.compile(r":source$")
_HTML_RE = _re.compile(r":html$")


def _h_set(runner, chain, i, cmd, context, data, next_fn, done_fn):
    spec, is_array = cmd.args
    entries = _compile_set(spec, is_array)
    _run_set_scope(runner, chain, entries, is_array, None, context, data,
                   next_fn, done_fn)


def _compile_set(spec, is_array: bool):
    """Analogue of loopObject (reference lib/commands/set.js:33-78):
    each entry is (key, kind, payload)."""
    entries = []
    items = (
        list(enumerate(spec)) if isinstance(spec, list) else list(spec.items())
    )
    for key, val in items:
        if isinstance(val, Chain):
            entries.append((key, "instance", val))
        elif isinstance(val, dict):
            entries.append((key, "object", (_compile_set(val, False), False)))
        elif isinstance(val, list):
            if len(val) > 0:
                entries.append((key, "object", (_compile_set(val, True), True)))
        elif val is None:
            entries.append((key, "null", None))
        elif callable(val):
            entries.append((key, "func", val))
        elif is_array or isinstance(spec, list):
            entries.append((key, "array_sel", val))
        elif _SOURCE_RE.search(val):
            entries.append((key, "source", _SOURCE_RE.sub("", val)))
        elif _HTML_RE.search(val):
            entries.append((key, "html", _HTML_RE.sub("", val)))
        else:
            entries.append((key, "sel", val))
    return entries


def _run_set_scope(runner, chain, entries, is_array, index, context, data,
                   next_fn, done_fn):
    """Analogue of setObject (reference lib/commands/set.js:80-144)."""
    total = len(entries)
    is_nested = index is not None
    count = [total if total > 0 else 1]

    def data_done():
        count[0] -= 1
        if count[0] != 0:
            return False
        if is_nested and data_holder[0].parent is not None:
            data_holder[0].parent.merge(data_holder[0])
        next_fn(context, data_holder[0])
        if done_fn is not None:
            done_fn()
        return True

    if context is None:
        if done_fn is not None:
            done_fn("No context")
        return

    d = data
    if done_fn is not None:
        d = d.clone()          # top-level set clones (set.js:119-121)
    if is_nested:
        d = d.child().set_index(index).is_array(is_array).done(data_done).ref()
    data_holder = [d]

    if total == 0:
        data_done()
        return

    if is_array:
        d.to_array()
        _run_set_array(runner, chain, entries, context, d, data_done, 0)
        return

    for key, kind, payload in entries:
        if kind in ("object", "instance"):
            _run_set_value(runner, chain, key, kind, payload, context, d,
                           data_done)
        else:
            d.set(key, _eval_set_scalar(runner, kind, payload, context, d))
            data_done()


def _run_set_array(runner, chain, entries, context, data, data_done, idx):
    """Serial array processing preserving order (set.js:147-167)."""
    if idx >= len(entries):
        return
    key, kind, payload = entries[idx]
    if kind in ("object", "instance"):
        def after():
            if data_done() is False:
                _run_set_array(runner, chain, entries, context, data,
                               data_done, idx + 1)
        _run_set_value(runner, chain, key, kind, payload, context, data,
                       after)
    else:
        data.push(_eval_set_scalar(runner, kind, payload, context, data))
        if data_done() is False:
            _run_set_array(runner, chain, entries, context, data, data_done,
                           idx + 1)


def _run_set_value(runner, chain, key, kind, payload, context, data, done_cb):
    if kind == "object":
        sub_entries, sub_is_array = payload
        _run_set_scope(runner, chain, sub_entries, sub_is_array, key, context,
                       data, lambda c, d: done_cb(), None)
    else:  # instance (setInstance, set.js:169-177)
        instance: Chain = payload
        child = data.child().set_index(key).done(done_cb).ref()
        runner._start(instance, 0, context, child)


def _eval_set_scalar(runner, kind, payload, context, data):
    if kind == "null":
        return get_content(context)
    if kind == "sel":
        return get_content(compile_selector(payload).get(context, relative=True))
    if kind == "array_sel":
        nodes = compile_selector(payload).find(context, relative=True)
        if not nodes:
            return None
        for n in nodes[:-1]:
            data.push(get_content(n))
        return get_content(nodes[-1])
    if kind == "func":
        cb = payload
        val = cb(context, data.get_object()) if _arity(cb) >= 2 else cb(context)
        if isinstance(val, Node):
            return get_content(val)
        return val
    if kind == "source":
        node = compile_selector(payload).get(context, relative=True)
        return node.serialize() if node is not None else None
    if kind == "html":
        node = compile_selector(payload).get(context, relative=True)
        if node is None:
            return None
        return node.inner_html if isinstance(node, Element) else None
    raise ValueError(kind)  # pragma: no cover


# -- misc commands

def _h_data(runner, chain, i, cmd, context, data, next_fn, done_fn):
    obj = data.get_object()
    cmd.args[0](obj)
    runner.results.append(obj)
    next_fn(context, data)
    done_fn()


def _issue_form_request(runner, chain, i, cmd, context, data, next_fn,
                        done_fn, method, url, params):
    """Shared fetch tail of submit/login (reference lib/commands/
    submit.js:38-46, login.js:55-66)."""
    if runner.page_scope:
        runner.continuations.append(Continuation(
            method, url, params, i + 1, data, None, "get",
            referer=_doc_location(context), chain=chain))
        return  # branch stays open: pending async request

    def cb(err, document):
        if err is None:
            next_fn(document, data)
        done_fn()

    runner.request(chain, cmd, method, context, url, params, cb)


def _h_submit(runner, chain, i, cmd, context, data, next_fn, done_fn):
    # reference lib/commands/submit.js:16-49: locate form/submit button,
    # collect input params (lib/Form.js:84-174), merge user params, request
    selector, user_params = cmd.args
    node = compile_selector(selector).get(context, relative=True)
    if node is None or not isinstance(node, Element):
        done_fn(f"No results for {selector}")
        return
    method = form_method(node)
    url = form_action(node)
    params = form_params(node)
    if callable(user_params):
        user_params = (user_params(context, data.get_object())
                       if _arity(user_params) >= 2 else user_params(context))
    if isinstance(user_params, dict):
        params.update(user_params)
    _issue_form_request(runner, chain, i, cmd, context, data, next_fn,
                        done_fn, method, url, params)


def _h_login(runner, chain, i, cmd, context, data, next_fn, done_fn):
    # reference lib/commands/login.js:17-72: find the password form, fill
    # the last named text input before the password field + the password
    # field, submit with the FORM's method/action
    user, password = cmd.args
    doc = context.doc()
    login_form = None
    for e in doc.descendants():
        if isinstance(e, Element) and e.tag == "form" and any(
            isinstance(c, Element) and c.tag == "input"
            and (c.get_attribute("type") or "").lower() == "password"
            for c in e.descendants()
        ):
            login_form = e
            break
    if login_form is None:
        runner._error(chain, cmd, "No login form found")
        done_fn()
        return
    inputs = [c for c in login_form.descendants()
              if isinstance(c, Element) and c.tag == "input"]
    pass_pos = next(
        (k for k, c in enumerate(inputs)
         if (c.get_attribute("type") or "").lower() == "password"), None)
    if pass_pos is None:
        done_fn("No password field found")
        return
    user_input = next(
        (c for c in reversed(inputs[:pass_pos])
         if c.has_attribute("name")
         and (c.get_attribute("type") or "text").lower() == "text"), None)
    if user_input is None:
        done_fn("No user field found")
        return
    pass_input = inputs[pass_pos]
    params = form_params(login_form)
    params[user_input.get_attribute("name")] = user
    params[pass_input.get_attribute("name")] = password
    _issue_form_request(runner, chain, i, cmd, context, data, next_fn,
                        done_fn, form_method(login_form),
                        form_action(login_form), params)


def _h_config(runner, chain, i, cmd, context, data, next_fn, done_fn):
    # pure pass-through at runtime: the delta was folded positionally by
    # Runner._opts_at (reference lib/commands/config.js is a config-type
    # command with no runtime body either)
    next_fn(context, data)
    done_fn()


def _h_delay(runner, chain, i, cmd, context, data, next_fn, done_fn):
    # wall-clock delays are a politeness budget in batch mode (SURVEY §2.6)
    next_fn(context, data)
    done_fn()


_HANDLERS = {
    "parse": _h_parse,
    "get": _h_get,
    "post": _h_get,
    "find": _h_find,
    "select": _h_find,
    "follow": _h_follow,
    "paginate": _h_paginate,
    "submit": _h_submit,
    "login": _h_login,
    "config": _h_config,
    "filter": _h_filter,
    "fail": _h_fail,
    "success": _h_success,
    "contains": _h_contains,
    "match": _h_match,
    "then": _h_then,
    "do": _h_do,
    "set": _h_set,
    "data": _h_data,
    "delay": _h_delay,
}


# --------------------------------------------------------------------------
# small helpers
# --------------------------------------------------------------------------

def _arity(fn) -> int:
    try:
        params = inspect.signature(fn).parameters
    except (TypeError, ValueError):
        return 2
    return sum(
        1 for p in params.values()
        if p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD)
    )


def _first_param(fn):
    try:
        params = list(inspect.signature(fn).parameters)
    except (TypeError, ValueError):
        return None
    return params[0] if params else None


def _url_from_node(node):
    # reference lib/commands/get.js:66-77
    if isinstance(node, Element):
        href = node.get_attribute("href")
        if href:
            return href
        return node.text()
    return raw_content(node)


def _doc_location(context):
    return context.doc().location if context is not None else None


def _resolve_href(context, href):
    if context is not None:
        return _resolve_url(context.doc().location, href)
    return _resolve_url(None, href)
