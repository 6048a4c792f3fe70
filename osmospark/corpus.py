"""Deterministic synthetic Common-Crawl-style page corpus.

Two parts:

1. The reference test-server fixture pages, byte-for-byte (the strings the
   reference test servers write — cited per page below). These anchor the
   byte-identity invariant.
2. A seeded scale-out generator (``synth_corpus``) emitting ``n_urls`` pages
   across ``n_hosts`` hosts with Zipf-skewed host sizes and deterministic
   link graphs, for frontier/politeness/skew/bench tests.

Pages table schema (per BASELINE.json input_hint):
``url:string, warc_ts:timestamp, html:binary, text:string, lang:string``.
"""

from __future__ import annotations

import datetime as _dt
import re

from .html import parse_html
from .urlnorm import canonicalize, xxhash64_py

FIXTURE_HOST = "http://fixture.local"

# reference test/find.js:95-111 (JS backslash-continuation: newline removed,
# next line's indentation retained — reproduced exactly)
FIND_HTML = (
    '<body>                <div class="content">                    '
    '<ul name="test">                        <li><b>first</b></li>       '
    '             </ul>                    <ul>                        '
    '<li><b>one</b></li>                        <li>                    '
    '        <b>two</b><b>three <img src="1" />, <img src="2" />, '
    '<img src="3" /></b>                        </li>                    '
    '</ul>                </div>               </body>'
)

# reference test/set.js:218-247
SET_HTML = (
    '<head><title>TITLE</title></head><body>'
    '<div id="content">CONTENT</div>'
    '<a href="/1">1</a><a href="/2">2</a></body>'
)
PAGE1_HTML = (
    '<head><title>1</title></head>'
    '<body><a href="/2"></a><a href="/3"></a></body>'
)
PAGE2_HTML = '<head><title>2</title></head><body></body>'
PAGE3_HTML = '<head><title>3</title></head><body></body>'

# reference test/follow.js:136-153
def follow_index_html() -> str:
    parts = ["<ul>"]
    for i in range(1, 6):
        parts.append(f'<li><a href="?page={i}"></a></li>')
    parts.append('<li><a href="https://www.google.com/"></a></li>')
    parts.append("</ul>")
    return "".join(parts)


def follow_page_html(page) -> str:
    return f"<div>{page}</div>"


# reference test/follow.js:124-134 (unicode + raw-encoding preservation)
FOLLOW_UTF8_HTML = '<a href="/समाज-विश्व/test/test%20test test">समाज-विश्व</a>'
FOLLOW_UTF8_TARGET_HREF = "/समाज-विश्व/test/test%20test test"
FOLLOW_UTF8_TARGET_HTML = "<div>true</div>"

# reference test/paginate.js:109-120 (backslash-continuation reproduced)
def paginate_html(page: int) -> str:
    return (
        f'<div>{page}</div><a href="?page={page + 1}" rel="next">Next</a>'
        "                "
        f'<form method="POST"><input type="hidden" name="page" value="{page + 1}"></form>'
    )


# reference test/submit.js:133-178 (inputs1) and :180-198 (inputs2) —
# the form-parameter collection matrix, html strings reproduced exactly
SUBMIT_INPUTS1 = (
    '<select name="s1"><option value="1">one</option>'
    '<option value="2" selected>two</option></select>'
    '<select name="s2"><option value="1">one</option>'
    '<option selected>two</option></select>'
    '<input type="checkbox" name="cb1" value="one" />'
    '<input type="checkbox" name="cb1" value="two" />'
    '<input type="checkbox" name="cb2" value="one" />'
    '<input type="checkbox" name="cb2" value="two" checked />'
    '<input type="checkbox" name="cb3" value="one" checked />'
    '<input type="checkbox" name="cb3" checked />'
    '<input type="checkbox" name="cb3[]" checked />'
    '<input type="text" name="disabled" disabled />'
    '<textarea name="ta">text area test</textarea>'
    '<input type="submit" name="sub1" value="submit" />'
    '<input type="submit" name="sub2" value="Submit 2" />'
)
SUBMIT_INPUTS2 = (
    '<input type="text" name="it1" value="test" />'
    '<input type="submit" form="form1" name="sub2" />'
    '<button type="submit" name="sub1" value="button" />'
    '<button type="submit" name="sub3" form="form2" formmethod="POST" '
    'formaction="/form-multipart" formenctype="multipart/form-data" '
    'value="3" />'
)

# reference test/submit.js:199-216 server page shape
SUBMIT_FORM_HTML = (
    f'<form id="form1" method="POST">{SUBMIT_INPUTS1}</form>'
    f'<form id="form2" method="GET">{SUBMIT_INPUTS2}</form>'
    '<div id="dynamic-data">success</div>'
)

# collected-params goldens (reference test/submit.js getInputs():107-131;
# list values carry the [] dup-promotion of lib/Form.js:157-170)
SUBMIT_EXPECTED1_SUB1 = {
    "s1": "2", "s2": "two", "cb2": "two", "cb3": ["one", "on", "on"],
    "ta": "text area test", "sub1": "submit",
}
SUBMIT_EXPECTED1_SUB2 = {
    "s1": "2", "s2": "two", "cb2": "two", "cb3": ["one", "on", "on"],
    "ta": "text area test", "sub2": "Submit 2",
}
SUBMIT_EXPECTED1_FORMATTR = {
    "s1": "2", "s2": "two", "cb2": "two", "cb3": ["one", "on", "on"],
    "ta": "text area test", "sub2": "Submit Query",
}
SUBMIT_EXPECTED2_SUB1 = {"it1": "test", "sub1": "button"}

# login fixture (reference test/login.js shape: password form + echo)
LOGIN_HTML = (
    '<form method="POST" action="/login-check">'
    '<input type="text" name="user" />'
    '<input type="password" name="pass" />'
    '<input type="submit" name="go" value="Login" /></form>'
)


def qs_indexed(params: dict) -> dict:
    """The observable wire shape: needle/qs encodes array params as
    name[0], name[1], ... (what the reference server echoes back)."""
    out = {}
    for k, v in params.items():
        if isinstance(v, list):
            for j, item in enumerate(v):
                out[f"{k}[{j}]"] = str(item)
        else:
            out[k] = str(v)
    return out


# inline fixtures (no network) — reference test/filters.js:2-6, test/then.js:2,
# test/do.js:1-12, test/parse.js:2
FILTERS_HTML = "<head><title>test</title></head><body><b>1</b><b>2</b><b>3</b></body>"
THEN_HTML = "<body><b>1</b><b>2</b><b>3</b></body>"
DO_HTML = '<head><title>test</title></head><body><a href="/rel"></a></body>'
PARSE_HTML = '<body><a href="/rel"></a></body>'


class Page:
    __slots__ = ("url", "html", "status", "delay_ms", "lang",
                 "content_type", "redirect_to")

    def __init__(self, url, html, status=200, delay_ms=0, lang="en",
                 content_type="text/html", redirect_to=None):
        self.url = url
        self.html = html
        self.status = status
        self.delay_ms = delay_ms
        self.lang = lang
        self.content_type = content_type
        self.redirect_to = redirect_to  # 3xx Location (test/get.js:181-185)


def fixture_pages() -> list[Page]:
    """All fixture pages keyed by canonical URL under fixture.local."""
    h = FIXTURE_HOST
    pages = [
        Page(f"{h}/find", FIND_HTML),
        Page(f"{h}/set", SET_HTML),
        Page(f"{h}/1", PAGE1_HTML, delay_ms=500),   # delays: test/set.js:230-246
        Page(f"{h}/2", PAGE2_HTML, delay_ms=250),
        Page(f"{h}/3", PAGE3_HTML),
        Page(f"{h}/follow", follow_index_html()),
        Page(f"{h}/follow-utf8", FOLLOW_UTF8_HTML, lang="hi"),
        Page(f"{h}{FOLLOW_UTF8_TARGET_HREF.replace('%20', ' ')}",
             FOLLOW_UTF8_TARGET_HTML, lang="hi"),
    ]
    # reference test/process_response_option.js:61-72 server fixtures
    pages.append(Page(f"{h}/response-code-200", "hi"))
    pages.append(Page(f"{h}/response-bold-hi", "<body><b>hi</b></body>"))
    pages.append(Page(f"{h}/response-code-no-body-end",
                      "<body>but no end body"))
    # fetch error taxonomy fixtures (reference lib/Request.js:30-68) +
    # content-type → response.type (Request.js:128-142)
    pages.append(Page(f"{h}/error-500", "<body>oops</body>", status=500))
    pages.append(Page(f"{h}/empty", ""))
    pages.append(Page(f"{h}/feed", "<root><item>1</item></root>",
                      content_type="application/xml"))
    # pause/resume/stop fixtures (reference test/resume.js:37-50 page shape:
    # one index of N same-host links; test/stop.js:31-34 self-link page)
    pages.append(Page(
        f"{h}/pause",
        "".join(f'<a href="/pause-page/{k}"></a>' for k in range(1, 6))))
    for k in range(1, 6):
        pages.append(Page(f"{h}/pause-page/{k}", f"<div>{k}</div>"))
    pages.append(Page(f"{h}/delay-response",
                      '<a href="/delay-response"></a>'))
    # reference test/run.js:88-93 (.run() lifecycle tests)
    pages.append(Page(f"{h}/run", "<div>loaded</div>"))
    # reference test/get.js:178-224 server fixtures: query echo, redirect,
    # redirect loop, empty-200, function-url targets
    import json as _json
    pages.append(Page(f"{h}/get", '<p>test</p><div>{}</div>'))
    pages.append(Page(f"{h}/get?redirect=true", "", status=301,
                      redirect_to="/redirect"))
    pages.append(Page(f"{h}/redirect", "<div>/redirect</div>"))
    pages.append(Page(f"{h}/error-redirect", "", status=301,
                      redirect_to="/error-redirect"))
    pages.append(Page(f"{h}/error-parse", ""))
    pages.append(Page(f"{h}/test-test", "<p>success</p>"))
    pages.append(Page(f"{h}/test-query-string", "<div><p>test</p></div>"))
    pages.append(Page(
        f"{h}/get?test=success",
        '<p>test</p><div>'
        + _json.dumps({"test": "success"}, separators=(",", ":"))
        + "</div>"))
    for k in range(15):  # test/get.js:124-159 `multiple`
        pages.append(Page(
            f"{h}/get?count={k}",
            '<p>test</p><div>'
            + _json.dumps({"count": str(k)}, separators=(",", ":"))
            + "</div>"))
    for k in range(1, 6):
        pages.append(Page(f"{h}/follow?page={k}", follow_page_html(k)))
    for k in range(1, 7):
        pages.append(Page(f"{h}/paginate?page={k}", paginate_html(k)))
    pages.append(Page(f"{h}/paginate", paginate_html(1)))

    # submit/login fixtures: the form page plus GET echo targets (the
    # reference server echoes method + received params as JSON,
    # test/submit.js:199-216)
    from urllib.parse import urlencode as _urlencode
    base = f"{h}/submit-form"
    pages.append(Page(base, SUBMIT_FORM_HTML))
    pages.append(Page(f"{h}/login", LOGIN_HTML))
    for exp in (SUBMIT_EXPECTED1_SUB2, SUBMIT_EXPECTED1_FORMATTR,
                SUBMIT_EXPECTED2_SUB1,
                {"it1": "success", "sub1": "button"}):
        q = qs_indexed(exp)
        pages.append(Page(base + "?" + _urlencode(q),
                          _submit_echo("GET", q)))
    return pages


def _submit_echo(method: str, data: dict) -> str:
    import json as _json
    return (f'<div id="method">{method}</div>'
            f'<div id="data">{_json.dumps(data, separators=(",", ":"))}'
            '</div>')


class PageStore:
    """In-memory corpus lookup keyed by canonical URL (+ optional POST params).

    This is the test-scale stand-in for the distributed pages table; the
    Spark engine does the same lookup as a join on ``xxhash64(canonical)``.
    """

    def __init__(self, pages=None):
        self.by_key: dict[str, Page] = {}
        self.post_by_key: dict[tuple, Page] = {}
        for p in pages or []:
            self.add(p)

    def add(self, page: Page, method: str = "get", params=None) -> None:
        key = canonicalize(page.url)
        if method == "post":
            self.post_by_key[(key, _freeze(params))] = page
        else:
            self.by_key[key] = page

    def fetch(self, url: str, method: str = "get", params=None):
        """Returns (status, Page|None). GET params are already merged into
        the url by the request layer (reference lib/Command.js:343-351)."""
        key = canonicalize(url)
        if method == "post":
            page = self.post_by_key.get((key, _freeze(params)))
        else:
            page = self.by_key.get(key)
        if page is None:
            return 404, None
        return page.status, page


def _freeze(params):
    if not params:
        return ()
    return tuple(sorted((str(k), str(v)) for k, v in dict(params).items()))


def fixture_store() -> PageStore:
    store = PageStore(fixture_pages())
    # POST targets for form pagination (server reads data.page,
    # reference test/paginate.js:109-114)
    for k in range(2, 7):
        store.add(Page(f"{FIXTURE_HOST}/paginate", paginate_html(k)),
                  method="post", params={"page": k})
    # POST submit targets (form1 is method=POST; multipart button posts to
    # /form-multipart — reference test/submit.js:199-230)
    store.add(
        Page(f"{FIXTURE_HOST}/submit-form",
             _submit_echo("POST", qs_indexed(SUBMIT_EXPECTED1_SUB1))),
        method="post", params=SUBMIT_EXPECTED1_SUB1)
    store.add(Page(f"{FIXTURE_HOST}/form-multipart", "<div>success</div>"),
              method="post", params={"it1": "test", "sub3": "3"})
    store.add(
        Page(f"{FIXTURE_HOST}/login-check",
             '<div id="status">welcome</div>'),
        method="post", params={"user": "u1", "pass": "p1", "go": "Login"})
    return store


# --------------------------------------------------------------------------
# pages-table rows (for Spark / parquet)
# --------------------------------------------------------------------------

_WS_RE = re.compile(r"\s+")
_TAG_TEXT_EPOCH = _dt.datetime(2026, 1, 1, tzinfo=_dt.timezone.utc)


def visible_text(html: str) -> str:
    doc = parse_html(html)
    root = doc.root
    return _WS_RE.sub(" ", root.text()).strip() if root is not None else ""


def post_pages_rows(store: "PageStore", with_text: bool = False):
    """POST-target pages exported as pages-table rows, keyed by
    ``urlnorm.post_fetch_key`` (canonical url + '#post:' + sorted params) —
    SURVEY §2.8: POST pages live in the corpus keyed by (url, params_hash),
    so distributed form-submit / form-paginate fetches join exactly like
    GETs."""
    rows = []
    for i, ((url, frozen), page) in enumerate(
            sorted(store.post_by_key.items())):
        key = url + "#post" + (
            ":" + "&".join(f"{k}={v}" for k, v in frozen) if frozen else "")
        rows.append({
            "url": key,
            "warc_ts": _TAG_TEXT_EPOCH + _dt.timedelta(seconds=100_000 + i),
            "html": page.html.encode("utf-8"),
            "text": visible_text(page.html) if with_text else "",
            "lang": page.lang,
        })
    return rows


def pages_rows(pages: list[Page], with_text: bool = True):
    """Rows matching the input_hint schema (url, warc_ts, html, text, lang).
    ``with_text=False`` skips the visible-text pass (the crawl engine reads
    only url+html; generation of big bench corpora stays cheap)."""
    rows = []
    for i, p in enumerate(pages):
        rows.append(
            {
                "url": canonicalize(p.url),
                "warc_ts": _TAG_TEXT_EPOCH + _dt.timedelta(seconds=i),
                "html": p.html.encode("utf-8"),
                "text": visible_text(p.html) if with_text else "",
                "lang": p.lang,
            }
        )
    return rows


# --------------------------------------------------------------------------
# scale-out synthetic corpus (FIXTURES.md §8)
# --------------------------------------------------------------------------

def _host_sizes(n_urls: int, n_hosts: int, zipf_s: float = 1.2) -> list[int]:
    weights = [1.0 / (k ** zipf_s) for k in range(1, n_hosts + 1)]
    total = sum(weights)
    sizes = [max(1, int(round(n_urls * w / total))) for w in weights]
    # adjust to hit n_urls exactly on the largest host
    sizes[0] += n_urls - sum(sizes)
    return sizes


def synth_corpus(
    n_urls: int,
    n_hosts: int = 16,
    intra_links: int = 3,
    cross_links: int = 1,
    zipf_s: float = 1.2,
):
    """Deterministic link-graph corpus: ``n_urls`` pages over ``n_hosts``
    hosts with Zipf-skewed host sizes; per-page link targets derived from
    ``xxhash64(url)`` (no RNG state — reproducible at any scale).

    Page html mirrors the /follow fixture shape: a <div> payload plus a
    <ul> of intra-host and cross-host links.
    """
    sizes = _host_sizes(n_urls, n_hosts, zipf_s)
    hosts = [f"host{h:04d}.test" for h in range(n_hosts)]
    pages: list[Page] = []
    for h, host in enumerate(hosts):
        for i in range(sizes[h]):
            url, html = _synth_page(h, i, hosts, sizes,
                                    intra_links, cross_links)
            pages.append(Page(url, html))
    return pages


def _synth_page(h: int, i: int, hosts: list[str], sizes: list[int],
                intra_links: int, cross_links: int,
                weight: int = 0) -> tuple[str, str]:
    """One deterministic page of the synthetic corpus: link graph derived
    from xxhash64(url) (no RNG state). ``weight`` appends that many filler
    paragraphs so parse cost per page is tunable for benchmarks (weight=0
    keeps the historical byte-exact shape)."""
    host = hosts[h]
    size = sizes[h]
    n_hosts = len(hosts)
    url = f"http://{host}/p/{i}"
    seed = xxhash64_py(url.encode("utf-8"))
    links = []
    for j in range(intra_links):
        t = (seed + 0x9E3779B97F4A7C15 * (j + 1)) % (1 << 64)
        links.append(f"/p/{t % size}")
    for j in range(cross_links):
        t = (seed ^ (0xC2B2AE3D27D4EB4F * (j + 1))) % (1 << 64)
        th = t % n_hosts
        links.append(f"http://{hosts[th]}/p/{t % sizes[th]}")
    body = "".join(f'<li><a href="{l}"></a></li>' for l in links)
    fill = ""
    if weight:
        words = []
        for w in range(weight):
            t = (seed + 0xA24BAED4963EE407 * (w + 1)) % (1 << 64)
            words.append(
                f'<p class="fill" data-k="{t & 0xffff}">'
                f'tok{t % 9973} tok{(t >> 16) % 9973} tok{(t >> 32) % 9973} '
                f'tok{(t >> 48) % 9973} <span>s{t % 251}</span></p>')
        fill = "".join(words)
    html = f"<div>{host}/p/{i}</div><ul>{body}</ul>{fill}"
    return url, html


def synth_corpus_df(spark, n_urls: int, n_hosts: int = 16,
                    intra_links: int = 3, cross_links: int = 1,
                    zipf_s: float = 1.2, weight: int = 0,
                    partitions: int | None = None):
    """Distributed corpus generation: identical pages to ``synth_corpus``
    (plus optional ``weight`` filler) but synthesized executor-side from
    ``spark.range`` — the generator never materializes the corpus on the
    driver, so bench corpora scale to millions of pages (the 100 TB-minded
    path; driver holds only the ``n_hosts`` size table)."""
    from pyspark.sql import functions as F  # noqa: F401

    sizes = _host_sizes(n_urls, n_hosts, zipf_s)
    hosts = [f"host{h:04d}.test" for h in range(n_hosts)]
    # prefix[h] = first global index of host h
    prefix = [0] * n_hosts
    for h in range(1, n_hosts):
        prefix[h] = prefix[h - 1] + sizes[h - 1]
    total = prefix[-1] + sizes[-1]
    parts = partitions or spark.sparkContext.defaultParallelism
    ts = _dt.datetime(2024, 1, 1)

    def gen(batches):
        import bisect
        import pandas as pd
        for pdf in batches:
            urls, htmls = [], []
            for gid in pdf["id"]:
                h = bisect.bisect_right(prefix, int(gid)) - 1
                i = int(gid) - prefix[h]
                url, html = _synth_page(h, i, hosts, sizes,
                                        intra_links, cross_links, weight)
                urls.append(url)
                htmls.append(html.encode("utf-8"))
            yield pd.DataFrame({
                "url": urls,
                "warc_ts": [ts] * len(urls),
                "html": htmls,
                "text": [None] * len(urls),
                "lang": ["en"] * len(urls),
            })

    return spark.range(0, total, 1, parts).mapInPandas(
        gen,
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string")


def synth_seed_urls(n_hosts: int, per_host: int = 1) -> list[str]:
    """Seed list of the synthetic corpus without materializing it."""
    return [f"http://host{h:04d}.test/p/{i}"
            for h in range(n_hosts) for i in range(per_host)]


def seed_urls(pages: list[Page], per_host: int = 1) -> list[str]:
    """One root URL per host (FIXTURES.md §8 seed list convention)."""
    seen: dict[str, int] = {}
    seeds = []
    for p in pages:
        host = p.url.split("/")[2]
        if seen.get(host, 0) < per_host:
            seen[host] = seen.get(host, 0) + 1
            seeds.append(p.url)
    return seeds
