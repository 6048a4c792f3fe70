"""Vectorized page extraction for the frontier engine.

One ``mapInPandas`` pass per round: each input row is (frontier fields +
joined page html). The UDF parses the page, runs the chain in page-scope
mode (fetch boundaries become continuations), and emits tagged rows:

- ``cont``   — next-round frontier rows (follow/get/paginate expansions);
- ``root``   — records completed entirely within this page;
- ``child``  — values merging into a parent record from a previous round;
- ``open``   — partially-built records awaiting children (assembled later);
- ``fail``   — a continuation whose fetch missed (404) — drives the
               all-failed fallback merge (reference lib/Command.js:168-180:
               a branch that never ``next``s still ``end``s and merges its
               accumulated data);
- ``metric`` — per-partition fetch/parse/error counts (north rule lineage).

All selectors are pre-compiled on the driver (analogue of the reference
selector cache, index.js:413-427); the UDF is Arrow-batched — no per-row
Python is visible to Spark (input_hint mandate).
"""

from __future__ import annotations

import json
from typing import Iterator

import pandas as pd

from .interpreter import ProxyRecord, Runner, build_document
from .record import _UNSET, Record
from .spec import Chain
from .urlnorm import post_fetch_key, url_host, xxhash64_py

OUT_SCHEMA = """
    row_kind string,
    url string, url_hash long, host string,
    method string, params_json string,
    resume_index int, chain_idx int, kind string, count int, depth int,
    referer string,
    record_id string, parent_record_id string, index_key string,
    is_array boolean, sort_index long, seq long,
    partial_json string, value_json string,
    origin_id string, origin_sort_index long, root_id string,
    fetched long, parsed long, errors long, error_msg string
"""

_OUT_COLUMNS = [c.strip().split()[0] for c in OUT_SCHEMA.strip().split(",")]
_OUT_TYPES = {c.strip().split()[0]: c.strip().split()[1]
              for c in OUT_SCHEMA.strip().split(",")}


def _to_pdf(out: list[dict]) -> pd.DataFrame:
    """Build the output batch with nullable Int64/boolean dtypes. The
    column MUST be constructed as object dtype first: ``pd.DataFrame`` on
    dicts coerces None+int columns to float64, silently corrupting 64-bit
    hashes beyond 2^53 — object → Int64 is exact."""
    cols = {}
    for col in _OUT_COLUMNS:
        typ = _OUT_TYPES[col]
        series = pd.Series([row.get(col) for row in out], dtype="object")
        if typ in ("long", "int"):
            series = series.astype("Int64")
        elif typ == "boolean":
            series = series.astype("boolean")
        cols[col] = series
    return pd.DataFrame(cols, columns=_OUT_COLUMNS)


def _blank_row() -> dict:
    return {c: None for c in _OUT_COLUMNS}


def _dump(obj) -> str | None:
    if obj is _UNSET:
        return None
    return json.dumps(obj, ensure_ascii=False, separators=(",", ":"))


def _load(s):
    if s is None or (isinstance(s, float) and pd.isna(s)):
        return _UNSET
    return json.loads(s)


def _clean_row(row: dict) -> dict:
    """pandas ``to_dict`` turns null ints/strings into NaN floats — map any
    NaN back to None so downstream logic sees one null flavor."""
    return {
        k: (None if isinstance(v, float) and pd.isna(v) else v)
        for k, v in row.items()
    }


class _Emitter:
    """Collects output rows for one page row."""

    def __init__(self, round_no: int, row_uid: str):
        self.rows: list[dict] = []
        self.round_no = round_no
        self.row_uid = row_uid
        self._seq = 0

    def next_seq(self) -> int:
        self._seq += 1
        return self._seq

    def rid(self) -> str:
        return f"{self.row_uid}:{self.next_seq()}"

    def emit(self, **fields) -> None:
        row = _blank_row()
        row.update(fields)
        self.rows.append(row)


def process_page_row(chains: list[Chain], row: dict, round_no: int) -> list[dict]:
    """Run one frontier row against its fetched page. ``row`` carries the
    frontier fields plus ``html`` (bytes or None) and ``page_status``.
    ``chains`` is the chain registry (spec.collect_chains); the row's
    ``chain_idx``/``resume_index`` name the exact resume point."""
    uid = f"r{round_no}x{row['url_hash'] & 0xFFFFFFFFFFFF:x}x{row.get('_row_seq', 0)}"
    em = _Emitter(round_no, uid)
    depth = int(row.get("depth") or 0)
    # the ROOT of this row's record tree, carried across rounds so final
    # assembly is a plain groupBy(root_id) — the distributed sortKey merge
    incoming_root = row.get("root_id")

    def _fetch_fail(msg: str) -> list[dict]:
        """metric + fail marker driving the all-failed fallback merge —
        shared by the whole fetch error taxonomy (reference
        lib/Request.js:30-68: HTTP error / empty data / no root)."""
        em.emit(row_kind="metric", host=row.get("host"), fetched=1,
                parsed=0, errors=1, depth=depth, error_msg=msg)
        if row.get("parent_record_id") is not None:
            em.emit(row_kind="fail",
                    parent_record_id=row.get("parent_record_id"),
                    index_key=row.get("index_key"),
                    is_array=bool(row.get("is_array")),
                    origin_id=row.get("origin_id"),
                    origin_sort_index=row.get("origin_sort_index"),
                    partial_json=row.get("partial_json"),
                    sort_index=row.get("sort_index"),
                    root_id=incoming_root or row.get("parent_record_id"))
        return em.rows

    if row.get("html") is None:
        return _fetch_fail(
            f"[{row.get('method') or 'get'}] {row['url']} - 404")

    resume_index = int(row.get("resume_index") or 0)
    chain = chains[int(row.get("chain_idx") or 0)]

    html = row["html"]
    if len(html) == 0:
        return _fetch_fail("Data is empty")
    # decode ONCE before the hook: chain-mode hooks receive the response
    # body as str (reference lib/Request.js:88-100 hands back decoded
    # data), so crawl-mode hooks must too — the same
    # ``lambda d: d.replace(...)`` chain must run unchanged in both modes
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    # process_response hook at the resume position's folded opts (the
    # distributed analogue of the sync request path's scoped hook)
    hook_runner = Runner(page_scope=True)
    opts_here = hook_runner._opts_at(chain, resume_index)
    hook = opts_here.get("process_response")
    if callable(hook):
        from .interpreter import _ResponseMeta, apply_process_response
        html, err = apply_process_response(
            hook, html,
            _ResponseMeta(int(row.get("page_status") or 200),
                          row.get("content_type") or "text/html",
                          row["url"]))
        if err is not None:
            return _fetch_fail(str(err))
        if isinstance(html, (bytes, bytearray)):  # byte-returning hooks
            html = bytes(html).decode("utf-8", errors="replace")

    params = json.loads(row["params_json"]) if row.get("params_json") else None
    doc = build_document(
        html, row["url"], method=row.get("method") or "get",
        params=params, referer=row.get("referer"),
        status=int(row.get("page_status") or 200),
        count=int(row["count"]) if row.get("count") is not None else None,
        content_type=row.get("content_type") or "text/html",
    )
    if doc.root is None:
        return _fetch_fail("Document has no root")
    # response.size / keep_data parity with the chain path
    # (interpreter.py sets both right after build_document —
    # reference lib/Request.js:81-83,110-117)
    doc.response["size"] = {"body": len(html)}
    if opts_here.get("keep_data") is True:
        doc.response["data"] = html

    data = Record()
    captured: list = []
    if row.get("parent_record_id") is not None:
        proxy = ProxyRecord(row["parent_record_id"], captured)
        data = Record(proxy)
    partial = _load(row.get("partial_json"))
    if partial is not _UNSET:
        data.set_object(partial if not isinstance(partial, (dict, list))
                        else (list(partial) if isinstance(partial, list)
                              else dict(partial)))
    if row.get("index_key") is not None:
        data.set_index(row["index_key"])
    if row.get("is_array"):
        data.is_array(True)
    if row.get("sort_index") is not None:
        data.set_sort_index(int(row["sort_index"]))

    runner = Runner(page_scope=True)
    runner.child_values = captured
    closed_roots: list = []
    _orig_end = runner._end

    def _end(chain_, context, d):
        if d.parent is None and d.object is not _UNSET:
            closed_roots.append((d.object, d.get_sort_index()))
        else:
            _orig_end(chain_, context, d)

    runner._end = _end
    chain_index_of = {id(c): i for i, c in enumerate(chains)}
    try:
        runner.resume(chain, resume_index, doc, data)
    except Exception as exc:  # surface, don't kill the task
        em.emit(row_kind="metric", host=row.get("host"), fetched=1, parsed=0,
                errors=1, depth=depth, error_msg=f"{row['url']}: {exc!r}")
        return em.rows

    em.emit(row_kind="metric", host=row.get("host"), fetched=1, parsed=1,
            errors=len(runner.errors), depth=depth,
            error_msg="; ".join(runner.errors[:3]) or None)

    for obj, sort_index in closed_roots:
        em.emit(row_kind="root", value_json=_dump(obj),
                sort_index=sort_index, url=row["url"],
                url_hash=row["url_hash"], depth=depth, seq=em.next_seq())

    for pid, key, sort_index, value in captured:
        em.emit(row_kind="child", parent_record_id=pid, index_key=key,
                sort_index=sort_index, value_json=_dump(value),
                seq=em.next_seq(), root_id=incoming_root or pid)

    # continuations + the open-record ancestry they hang from
    open_ids: dict[int, str] = {}

    def root_for(rec) -> str | None:
        """The cross-round root id of a record's parent chain: the topmost
        local open record's id, or the carried-in root when the chain hangs
        off a previous round's record (ProxyRecord)."""
        cur = rec
        while cur.parent is not None and not isinstance(cur.parent,
                                                        ProxyRecord):
            cur = cur.parent
        if cur.parent is None:
            return open_ids.get(id(cur))
        return incoming_root or cur.parent.record_id

    def record_ref(rec) -> str | None:
        """Assign an id to a local open record, emitting its ancestry."""
        if rec is None:
            return None
        if isinstance(rec, ProxyRecord):
            return rec.record_id
        rec_key = id(rec)
        if rec_key in open_ids:
            return open_ids[rec_key]
        parent_id = record_ref(rec.parent)
        rid = em.rid()
        open_ids[rec_key] = rid
        em.emit(row_kind="open", record_id=rid, parent_record_id=parent_id,
                index_key=rec.get_index(), is_array=bool(rec._is_array),
                sort_index=rec.get_sort_index(),
                partial_json=_dump(rec.object), seq=em.next_seq(),
                root_id=root_for(rec))
        return rid

    origin_ids: dict[int, str] = {}
    for cont in runner.continuations:
        rec = cont.data
        parent_id = record_ref(rec.parent)
        okey = id(rec)
        if okey not in origin_ids:
            origin_ids[okey] = em.rid()
        host = url_host(cont.url)
        fetch_key = (post_fetch_key(cont.url, cont.params)
                     if cont.method == "post" else cont.url)
        em.emit(
            row_kind="cont",
            url=cont.url,
            url_hash=xxhash64_py(fetch_key.encode("utf-8")),
            host=host,
            method=cont.method,
            params_json=json.dumps(cont.params) if cont.params else None,
            resume_index=cont.resume_index,
            chain_idx=chain_index_of.get(id(cont.chain), 0),
            kind=cont.kind,
            count=cont.count,
            depth=depth + 1,
            referer=cont.referer,
            parent_record_id=parent_id,
            index_key=rec.get_index(),
            is_array=bool(rec._is_array),
            sort_index=cont.sort_index,
            partial_json=_dump(rec.object),
            origin_id=origin_ids[okey],
            origin_sort_index=rec.get_sort_index(),
            seq=em.next_seq(),
            root_id=root_for(rec),
        )
    return em.rows


def make_extract_udf(chains: list[Chain], round_no: int):
    """Returns the mapInPandas function for this round."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        seq = 0
        for pdf in batches:
            out: list[dict] = []
            for rec in pdf.to_dict("records"):
                rec = _clean_row(rec)
                seq += 1
                rec["_row_seq"] = seq
                out.extend(process_page_row(chains, rec, round_no))
            yield _to_pdf(out)

    return extract


def _kind_frame(row_kind: str, n: int, data: dict) -> pd.DataFrame:
    """Build one row_kind's sub-batch columnar-style: provided columns from
    Python lists, everything else a vectorized typed-null Series. Object →
    Int64 (never via float64: 64-bit hashes beyond 2^53 must stay exact)."""
    idx = pd.RangeIndex(n)
    cols = {}
    for c in _OUT_COLUMNS:
        t = _OUT_TYPES[c]
        if c == "row_kind":
            cols[c] = pd.Series([row_kind] * n, index=idx, dtype="object")
        elif c in data:
            v = data[c]
            s = (v if isinstance(v, pd.Series)
                 else pd.Series(v, index=idx, dtype="object"))
            if t in ("long", "int"):
                s = s.astype("Int64")
            elif t == "boolean":
                s = s.astype("boolean")
            cols[c] = s
        elif t in ("long", "int"):
            cols[c] = pd.Series(pd.NA, index=idx, dtype="Int64")
        elif t == "boolean":
            cols[c] = pd.Series(pd.NA, index=idx, dtype="boolean")
        else:
            cols[c] = pd.Series(None, index=idx, dtype="object")
    return pd.DataFrame(cols, columns=_OUT_COLUMNS)


def make_crawl_udf(extract_spec: dict | None, follow_selector: str | None,
                   hash_conts: bool = True, process_response=None,
                   respect_meta_robots: bool = False):
    """Crawl-mode mapInPandas: per page, evaluate a static extraction spec
    locally (records close per page) and expand outlinks via the follow
    selector — the 10^10-scale fast path. Raw-encoding URL capture mirrors
    reference lib/commands/follow.js:39-46.

    Emission is columnar (per-kind parallel lists → vectorized sub-frames),
    not dict-per-row: at ~8 output rows/page × 26 columns the dict path was
    the hot loop. ``hash_conts=False`` skips the in-Python xxhash of every
    outlink — the engine recomputes it JVM-side with ``F.xxhash64`` (same
    seed-42 function, verified identical) on the cont branch.

    Every input row yields exactly ONE metric row carrying its ``url_hash``,
    so the metric rows double as the round's exact visit log (the engine
    derives the URL-seen delta and admitted count from them)."""
    from .html import Attribute, Element, compile_selector
    from .interpreter import Runner
    from .urlnorm import link_resolver

    spec_chain = Chain().set(extract_spec) if extract_spec else None
    follow_compiled = (compile_selector(follow_selector)
                       if follow_selector else None)
    # opt-in meta-robots honoring (off by default: reference parity) —
    # page-level noindex suppresses the page's RECORD rows (it is still
    # visited and its links expand), page-level nofollow suppresses its
    # outlinks, and a per-anchor rel~="nofollow" suppresses that link.
    # Directive grammar is shared with the indexer side
    # (functions.metadata.robots_flags); the meta walk compares the
    # lowercased name VALUE itself because HTML defines it ASCII
    # case-insensitive ('<META NAME="ROBOTS">' must match) while the
    # selector engine's [attr=v] is correctly case-sensitive.
    robots_sel = (compile_selector("meta")
                  if respect_meta_robots else None)
    if respect_meta_robots:
        from .functions.metadata import robots_flags

    def _page_robots(doc):
        ni = nf = False
        for el in robots_sel.find(doc):
            name = (el.get_attribute("name") or "").strip().lower()
            if name != "robots":
                continue
            i, f = robots_flags(el.get_attribute("content") or "")
            ni = ni or i
            nf = nf or f
        return ni, nf

    def crawl(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                yield _kind_frame("metric", 0, {})
                continue
            urls = pdf["url"].tolist()
            hashes = pdf["url_hash"].tolist()
            htmls = pdf["html"].tolist()
            depths = pd.to_numeric(pdf["depth"], errors="coerce") \
                .fillna(0).astype("int64").tolist()
            refs = (pdf["referer"].tolist() if "referer" in pdf
                    else [None] * n)
            hosts = (pdf["host"].tolist() if "host" in pdf else [None] * n)
            # real response metadata for process_response hooks (parity
            # with the chain path's process_page_row — hooks keying on
            # res.statusCode see identical values in both modes)
            stats = (pd.to_numeric(pdf["page_status"], errors="coerce")
                     .fillna(200).astype("int64").tolist()
                     if "page_status" in pdf else [200] * n)
            ctypes = (pdf["content_type"].tolist()
                      if "content_type" in pdf else ["text/html"] * n)

            # metric lists (one entry per input row)
            m_host, m_hash, m_depth = hosts, hashes, depths
            m_fetched = [0] * n
            m_parsed = [0] * n
            m_errors = [0] * n
            m_msg: list = [None] * n
            # root lists
            r_url: list = []
            r_hash: list = []
            r_depth: list = []
            r_val: list = []
            # cont lists
            c_url: list = []
            c_hash: list = []
            c_host: list = []
            c_depth: list = []
            c_ref: list = []
            c_sort: list = []

            for i in range(n):
                html = htmls[i]
                depth = depths[i]
                if html is None or (isinstance(html, float)
                                    and pd.isna(html)):
                    m_fetched[i] = 1
                    m_errors[i] = 1
                    m_msg[i] = f"{urls[i]} - 404"
                    continue
                # fetch error taxonomy (reference lib/Request.js:30-68)
                if len(html) == 0:
                    m_fetched[i] = 1
                    m_errors[i] = 1
                    m_msg[i] = "Data is empty"
                    continue
                # hooks receive str in BOTH modes (chain parity); decode
                # once up front, and re-decode byte-returning hooks
                if isinstance(html, (bytes, bytearray)):
                    html = bytes(html).decode("utf-8", errors="replace")
                if process_response is not None:
                    from .interpreter import (
                        _ResponseMeta, apply_process_response,
                    )
                    html, err = apply_process_response(
                        process_response, html,
                        _ResponseMeta(int(stats[i]),
                                      ctypes[i] or "text/html", urls[i]))
                    if err is not None:
                        m_fetched[i] = 1
                        m_errors[i] = 1
                        m_msg[i] = str(err)
                        continue
                    if isinstance(html, (bytes, bytearray)):
                        html = bytes(html).decode("utf-8", errors="replace")
                doc = build_document(html, urls[i], referer=refs[i],
                                     status=int(stats[i]),
                                     content_type=ctypes[i] or "text/html")
                if doc.root is None:
                    m_fetched[i] = 1
                    m_errors[i] = 1
                    m_msg[i] = "Document has no root"
                    continue
                # response.size parity with the chain path
                # (reference lib/Request.js:110-117)
                doc.response["size"] = {"body": len(html)}
                errors = 0
                pg_noindex = pg_nofollow = False
                if robots_sel is not None:
                    pg_noindex, pg_nofollow = _page_robots(doc)
                if pg_noindex:
                    pass  # visited, links expand, no record rows
                elif spec_chain is None:
                    # no extraction spec: the visit itself is the record
                    r_url.append(urls[i])
                    r_hash.append(hashes[i])
                    r_depth.append(depth)
                    r_val.append(None)
                else:
                    runner = Runner(page_scope=True)
                    got: list = []
                    orig_end = runner._end

                    def _end(ch, ctx, d, _got=got, _o=orig_end):
                        if d.parent is None and d.object is not _UNSET:
                            _got.append(d.object)
                        else:
                            _o(ch, ctx, d)

                    runner._end = _end
                    try:
                        runner.resume(spec_chain, 0, doc, Record())
                        errors = len(runner.errors)
                        for obj in got:
                            r_url.append(urls[i])
                            r_hash.append(hashes[i])
                            r_depth.append(depth)
                            r_val.append(_dump(obj))
                    except Exception as exc:
                        errors += 1
                        m_msg[i] = repr(exc)
                if follow_compiled is not None and not pg_nofollow:
                    idx = 0
                    # splits the page URL once; per-link fast path equals
                    # canonicalize(resolve(...)) / url_host exactly
                    resolve_link = link_resolver(urls[i])
                    for node in follow_compiled.find(doc, relative=True):
                        if isinstance(node, Attribute):
                            href = node.value()
                        elif isinstance(node, Element):
                            a = node.attr("href")
                            href = (a.value() if a is not None
                                    else node.text())
                        else:
                            href = None
                        if not href:
                            continue
                        if robots_sel is not None:
                            owner = (node.owner
                                     if isinstance(node, Attribute)
                                     else node)
                            rel = (owner.get_attribute("rel")
                                   if isinstance(owner, Element) else None)
                            # rel is a space-separated token list
                            if rel and "nofollow" in rel.lower().split():
                                continue
                        target, t_host = resolve_link(href)
                        c_url.append(target)
                        if hash_conts:
                            c_hash.append(xxhash64_py(target.encode()))
                        c_host.append(t_host)
                        c_depth.append(depth + 1)
                        c_ref.append(urls[i])
                        c_sort.append(idx)
                        idx += 1
                m_fetched[i] = 1
                m_parsed[i] = 1
                m_errors[i] = errors

            frames = [_kind_frame("metric", n, {
                "host": m_host, "url_hash": m_hash, "depth": m_depth,
                "fetched": m_fetched, "parsed": m_parsed,
                "errors": m_errors, "error_msg": m_msg})]
            if r_url:
                frames.append(_kind_frame("root", len(r_url), {
                    "url": r_url, "url_hash": r_hash, "depth": r_depth,
                    "value_json": r_val}))
            if c_url:
                nc = len(c_url)
                cont_data = {
                    "url": c_url, "host": c_host, "depth": c_depth,
                    "referer": c_ref, "sort_index": c_sort,
                    "method": ["get"] * nc, "kind": ["crawl"] * nc,
                    "is_array": [False] * nc,
                }
                if hash_conts:
                    cont_data["url_hash"] = c_hash
                frames.append(_kind_frame("cont", nc, cont_data))
            yield pd.concat(frames, ignore_index=True) if len(frames) > 1 \
                else frames[0]

    return crawl


def initial_continuations(chain: Chain) -> list[dict]:
    """Run the chain with no context: the leading get/post commands register
    the seed continuations (the analogue of the auto-start at reference
    lib/Command.js:32-47 + index.js:158-165)."""
    from .spec import collect_chains

    chains = collect_chains(chain)
    chain_index_of = {id(c): i for i, c in enumerate(chains)}
    runner = Runner(page_scope=True)
    runner.run(chain, context=None, data=Record())
    rows = []
    for i, cont in enumerate(runner.continuations):
        fetch_key = (post_fetch_key(cont.url, cont.params)
                     if cont.method == "post" else cont.url)
        rows.append({
            "url": cont.url,
            "url_hash": xxhash64_py(fetch_key.encode("utf-8")),
            "host": url_host(cont.url),
            "method": cont.method,
            "params_json": json.dumps(cont.params) if cont.params else None,
            "resume_index": cont.resume_index,
            "chain_idx": chain_index_of.get(id(cont.chain), 0),
            "kind": cont.kind,
            "count": cont.count,
            "depth": 0,
            "referer": None,
            "parent_record_id": None,
            "index_key": None,
            "is_array": False,
            "sort_index": cont.sort_index,
            "partial_json": None,
            "origin_id": f"seed:{i}",
            "origin_sort_index": None,
        })
    return rows
