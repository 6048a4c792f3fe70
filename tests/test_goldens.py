"""Golden tests ported from the reference test suite (/root/reference/test).

Every expected value below is copied from the reference tests verbatim;
file:line citations inline. These anchor the byte-identity invariant
(BASELINE.json input_hint)."""

import pytest

from osmospark.corpus import (
    DO_HTML,
    FILTERS_HTML,
    FIXTURE_HOST,
    THEN_HTML,
    fixture_store,
)
from osmospark.interpreter import Runner
from osmospark.record import Record
from osmospark.spec import O


def run(chain):
    r = Runner(store=fixture_store())
    results = r.run(chain)
    return r, results


# -- test/internals.js:1-62 -------------------------------------------------

def test_record_algebra_golden():
    parent = Record().is_array(True)
    child = parent.child().set("key", "value")
    parent.merge(child)
    assert parent.get_object() == [{"key": "value"}]

    parent = Record().is_array(True)
    parent.merge(parent.child().set("key", "value"))
    parent.merge(parent.child().is_array(True).push("val1").push("val2"))
    parent.merge(parent.child().is_array(True).set("key", {"nested": "value"}))
    parent.merge(child.child().is_array(True).set_index("noIndexForArrays").push("testIndex"))
    parent.merge(child.child().is_array(True))
    parent.merge(child.child())
    parent.merge(child.child().set("key", "value").push("convertedToArray"))
    assert parent.get_object() == [
        {"key": "value"},
        ["val1", "val2"],
        [{"nested": "value"}],
        ["testIndex"],
        [{"key": "value"}, "convertedToArray"],
    ]


# -- test/find.js -----------------------------------------------------------

def test_find_selector_array():  # :6-18 → 7 matches
    count = [0]
    run(O.get(f"{FIXTURE_HOST}/find").find(["img", "b"])
        .then(lambda ctx: count.__setitem__(0, count[0] + 1)))
    assert count[0] == 7


def test_find_selector_css():  # :20-32 → img src 1,2,3
    seen = []
    run(O.get(f"{FIXTURE_HOST}/find")
        .find(".content ul:not([name]) li[2] b:last img")
        .then(lambda ctx: seen.append(ctx.get_attribute("src"))))
    assert seen == ["1", "2", "3"]


def test_find_nested():  # :34-50 → data.b has 3 items
    seen = []
    run(O.get(f"{FIXTURE_HOST}/find").find("ul:last")
        .set({"b": O.find("b")})
        .then(lambda ctx, data: seen.append(len(data["b"]))))
    assert seen == [3]


def test_find_select():  # :52-65 → 2
    count = [0]
    run(O.get(f"{FIXTURE_HOST}/find").find("ul:last > li:last").select("b")
        .then(lambda ctx: count.__setitem__(0, count[0] + 1)))
    assert count[0] == 2


def test_find_xpath():  # :67-79 → 2
    count = [0]
    run(O.get(f"{FIXTURE_HOST}/find").find("//div[@class]/ul[2]/li")
        .then(lambda ctx: count.__setitem__(0, count[0] + 1)))
    assert count[0] == 2


def test_find_hybrid():  # :81-93 → 1
    count = [0]
    run(O.get(f"{FIXTURE_HOST}/find").find(".content//preceding::[@name]")
        .then(lambda ctx: count.__setitem__(0, count[0] + 1)))
    assert count[0] == 1


# -- test/set.js ------------------------------------------------------------

EXPECTED_NESTED = {  # test/set.js:5-54
    "title": "TITLE",
    "content": "CONTENT",
    "innerHTML": '<meta http-equiv="Content-Type" '
                 'content="text/html; charset=UTF-8"><title>TITLE</title>',
    "source": "<title>TITLE</title>",
    "object": {"id": "content"},
    "array": [
        "TITLE",
        {"first_link": "/1"},
        "TITLE",
        "TITLE",
        {"all_links": ["/1", "/2"]},
        {"title": "TITLE"},
    ],
    "find": "CONTENT",
    "find_arr": ["/1", "/2"],
    "get": {"title": "1"},
    "follow": [{"title": "1"}, {"title": "2"}],
    "follow_array": ["/1", "/2", {"title": "1"}, {"title": "2"}],
    "get_follow": [{"page": "2", "title": "1"}, {"page": "3", "title": "1"}],
    "get_nested_follow": {"pages": [{"page": "2"}, {"page": "3"}], "title": "1"},
    "then": {"called": True},
    "then_multiple": [1, 2, 3],
    "then_none": {},
    "then_new_context": "TITLE",
    "then_new_data": [1, 2, 3],
}


def nested_set_chain():
    def then_new_context(context, data, next):
        next(context.doc() and _get(context, "title"), data)

    def then_cb(context, data, next):
        data["called"] = True
        next(context, data)

    def then_multiple(context, data, next, done):
        data["called"] = True
        for i in range(1, 4):
            next(context, i)
        done()

    def then_new_data(context, data, next):
        next(context, [1, 2, 3])

    return O.get(f"{FIXTURE_HOST}/set").set({
        "title": "title",
        "content": "#content",
        "fake": "fake-selector",
        "innerHTML": "head:html",
        "source": "title:source",
        "object": {"id": "div@id", "fake": "fake-selector"},
        "array": [
            "title",
            {"first_link": "a:first@href"},
            O.find("title"),
            O.then(lambda context, data, next: next(_get(context, "title"), data)),
            {"all_links": ["a@href"]},
            O.find("title").set("title"),
        ],
        "find": O.find("div"),
        "find_arr": O.find("a@href"),
        "get": O.get("/1").set({"title": "title"}),
        "get_fail": O.get("/notfound").set({"title": "title"}),
        "follow": O.follow("a").set({"title": "title"}),
        "follow_fail": O.follow("fake-selector").set({"title": "title"}),
        "follow_array": [
            "a@href",
            "fake-selector",
            O.follow("a").set({"title": "title"}),
        ],
        "get_follow": O("/1").set({"title": "title"}).follow("a").set({"page": "title"}),
        "get_nested_follow": O.get("/1").set({
            "title": "title",
            "pages": O.follow("a").set({"page": "title"}),
        }),
        "then": O.then(then_cb),
        "then_multiple": O.then(then_multiple),
        "then_new_data": O.then(then_new_data),
        "then_new_context": O.then(
            lambda context, data, next: next(_get(context, "title"), data)),
        "then_none": O.then(lambda: None),
    })


def _get(context, selector):
    from osmospark.html import get
    return get(context, selector, relative=True)


def test_set_nested_golden():
    chain = nested_set_chain()
    collected = []
    chain.data(collected.append)
    run(chain)
    assert collected == [EXPECTED_NESTED]


def test_set_array_root():  # test/set.js:55-61, :71-95
    expected = ["/1", "/2",
                {"href": "/1", "name": "1"},
                {"href": "/2", "name": "2"},
                [[["/1"]]]]
    collected = []
    chain = (O.get(f"{FIXTURE_HOST}/set")
             .set(["a@href",
                   O.find("a").set("name").set("href", "@href"),
                   [[["a:first@href"]]]])
             .data(collected.append))
    run(chain)
    assert collected == [expected]


def test_set_callbacks():  # test/set.js:62-67, :97-127
    expected = {
        "links": [{"url": "/1", "link": 1}, {"url": "/2", "link": 2}],
        "page2": {"title": "2"},
    }
    collected = []
    chain = (O.get(f"{FIXTURE_HOST}/set")
             .set({
                 "links": O.find("a")
                     .set("link", lambda link: int(link.inner_html))
                     .set("url", lambda link: link.get_attribute("href")),
                 "page2": O.get(lambda doc: _get(doc, "a:last"))
                     .set("title", "title"),
             })
             .data(collected.append))
    run(chain)
    assert collected == [expected]


# -- test/get.js --------------------------------------------------------------

def test_get_function_url():  # :8-23 — url = fn(context, data)
    seen = []

    def set_name(ctx, data, next):
        data["name"] = "test"
        next(ctx, data)

    run(O.get(f"{FIXTURE_HOST}/get")
        .then(set_name)
        .get(lambda ctx, data: data["name"] + "-" + _get(ctx, "p").text())
        .then(lambda ctx: seen.append(_get(ctx, "p").text())))
    assert seen == ["success"]


def test_get_function_params():  # :25-43 — params = fn(context, data)
    seen = []

    def set_name(ctx, data, next):
        data["name"] = "test"
        next(ctx, data)

    run(O.get(f"{FIXTURE_HOST}/test-test")
        .then(set_name)
        .get(f"{FIXTURE_HOST}/get",
             lambda ctx, data: {data["name"]: _get(ctx, "p").text()})
        .then(lambda ctx: seen.append(_get(ctx, "div").text())))
    assert len(seen) == 1 and "success" in seen[0]


def test_get_redirect():  # :44-66 — follow 301, referer set, hop logged
    seen, logs = [], []
    chain = (O.get(f"{FIXTURE_HOST}/get?redirect=true")
             .then(lambda ctx: seen.append(
                 (ctx.request["headers"].get("referer"),
                  ctx.get("div").text(), ctx.location))))
    chain.log(logs.append)
    run(chain)
    referer, div, loc = seen[0]
    assert referer and len(referer) > 0
    assert div == "/redirect" and loc.endswith("/redirect")
    assert any("[redirect]" in m for m in logs)


def test_get_error_404_retries():  # :68-83 — one '404' error per try
    errs = []
    chain = (O.get(f"{FIXTURE_HOST}/get-404")
             .config("ignore_http_errors", False)
             .config("tries", 5))
    chain.error(errs.append)
    run(chain)
    assert len([e for e in errs if "404" in e]) == 5


def test_get_error_redirect_loop():  # :85-106 — follow limit then error
    logs, errs = [], []
    chain = (O.get(f"{FIXTURE_HOST}/error-redirect")
             .config("follow", 4).config("tries", 1))
    chain.log(logs.append)
    chain.error(errs.append)
    run(chain)
    assert len([m for m in logs if "redirect" in m]) == 4
    assert len([e for e in errs if "Max redirects" in e]) == 1


def test_get_error_parse_empty_retries():  # :108-122
    errs = []
    chain = O.get(f"{FIXTURE_HOST}/error-parse").config("tries", 4)
    chain.error(errs.append)
    run(chain)
    assert len([e for e in errs if "empty" in e]) == 4


def test_get_multiple_instances():  # :124-159 — 15 instances, distinct echoes
    import json as _json
    results = []
    for k in range(15):
        chain = (O.get(f"{FIXTURE_HOST}/get", {"count": str(k)})
                 .set("div", "div")
                 .data(lambda d: results.append(
                     _json.loads(d["div"])["count"])))
        run(chain)
    assert sorted(set(results), key=int) == [str(k) for k in range(15)]


def test_get_absent_query_string():  # :162-177 — no trailing '?'
    locs, found = [], []
    chain = (O.get(f"{FIXTURE_HOST}/test-query-string")
             .then(lambda ctx: locs.append(ctx.location))
             .find("div").set({"content": "p"})
             .data(found.append))
    run(chain)
    assert locs == [f"{FIXTURE_HOST}/test-query-string"]
    assert found == [{"content": "test"}]


# -- test/follow.js ---------------------------------------------------------

def test_follow_href():  # :7-21 → 5 pages, param echo, referer
    seen = []
    run(O.get(f"{FIXTURE_HOST}/follow").follow("li:skip-last > a")
        .then(lambda ctx: seen.append(
            (ctx.request["headers"].get("referer"),
             ctx.request["params"].get("page"),
             _get(ctx, "div").text()))))
    assert len(seen) == 5
    for referer, page, div in seen:
        assert referer == f"{FIXTURE_HOST}/follow"
        assert page == div


def test_follow_find_then_attr():  # :24-40 (delay variant, sans delay)
    seen = []
    run(O.get(f"{FIXTURE_HOST}/follow").find("li:skip-last > a").delay(0.2)
        .follow("@href")
        .then(lambda ctx: seen.append(ctx.request["params"].get("page"))))
    assert sorted(seen) == ["1", "2", "3", "4", "5"]


def test_follow_internal():  # :59-73 → 5
    seen = []
    run(O.get(f"{FIXTURE_HOST}/follow").follow("li > a:internal")
        .then(lambda ctx: seen.append(ctx.request["params"].get("page"))))
    assert len(seen) == 5


def test_follow_unicode():  # :75-88 — raw-encoding URL resolution
    seen = []
    run(O.get(f"{FIXTURE_HOST}/follow-utf8").follow("a")
        .then(lambda ctx: seen.append(_get(ctx, "div").text())))
    assert seen == ["true"]


# -- test/paginate.js -------------------------------------------------------

def _paginate_case(selector, params=None):
    pages = []
    chain = O.get(f"{FIXTURE_HOST}/paginate", params)
    chain = chain.paginate(selector, 3).set("page", "div")
    chain.data(lambda d: pages.append(d["page"]))
    run(chain)
    return pages


def test_paginate_link():  # :7-24
    assert _paginate_case('a[rel="next"]') == ["1", "2", "3", "4"]


def test_paginate_param():  # :26-43
    assert _paginate_case({"page": +1}, {"page": 1}) == ["1", "2", "3", "4"]


def test_paginate_form():  # :45-61
    assert _paginate_case("form") == ["1", "2", "3", "4"]


def test_paginate_func_url():  # :63-81
    def nxt(document, data):
        return (document.request["pathname"] + "?page="
                + str(int(document.request["query"]["page"]) + 1))
    assert _paginate_case(nxt, {"page": 1}) == ["1", "2", "3", "4"]


def test_paginate_func_obj():  # :83-101
    def nxt(document, data):
        return {"page": int(document.request["query"]["page"]) + 1}
    assert _paginate_case(nxt, {"page": 1}) == ["1", "2", "3", "4"]


# -- test/filters.js ---------------------------------------------------------

def test_filters_contains():
    count = [0]
    run(O.parse(FILTERS_HTML).find("b").contains("1")
        .then(lambda ctx: count.__setitem__(0, count[0] + 1)))
    assert count[0] == 1


def test_filters_fail():
    count = [0]
    r, _ = run(O.parse(FILTERS_HTML).find("b").fail("node():contains('1')")
               .then(lambda ctx: count.__setitem__(0, count[0] + 1)))
    assert count[0] == 2
    assert any("node():contains" in e for e in r.errors)


def test_filters_filter():
    count = [0]
    run(O.parse(FILTERS_HTML).find("b").filter("node():not(:contains('1'))")
        .then(lambda ctx: count.__setitem__(0, count[0] + 1)))
    assert count[0] == 2


def test_filters_match():
    count = [0]
    run(O.parse(FILTERS_HTML).find("b").match(r"[1-2]")
        .then(lambda ctx: count.__setitem__(0, count[0] + 1)))
    assert count[0] == 2


# -- test/then.js -------------------------------------------------------------

def test_then_two_args():
    seen = []
    run(O.parse(THEN_HTML).find("b")
        .then(lambda ctx: seen.append(ctx.text())))
    assert seen == ["1", "2", "3"]


def test_then_multi_next_fanout():
    seen = []

    def fan(context, data, next):
        for _ in range(3):
            next(context, data)

    run(O.parse(THEN_HTML).find("b")
        .then(lambda context, data, next: next(context, data))
        .then(fan)
        .then(lambda ctx: seen.append(ctx.text())))
    assert len(seen) == 9


def test_then_document_arg():
    seen = []
    run(O.parse(THEN_HTML).then(lambda document: seen.append(document)))
    assert len(seen) == 1
    from osmospark.html import Document
    assert isinstance(seen[0], Document)


# -- test/do.js ---------------------------------------------------------------

def test_do_multiple():
    expected = {"title": "test", "links": ["/rel"]}
    collected = []
    chain = (O.parse(DO_HTML)
             .do(
                 O.set({"title": "title"}),
                 O.find("body").set("name", "true").find("none"),  # fails
                 O.set({"links": ["a@href"]}),
             )
             .data(collected.append))
    run(chain)
    assert collected == [expected]


# -- test/submit.js ---------------------------------------------------------
# The reference server echoes method + received params as JSON in #data
# (test/submit.js:199-216); expected objects from getInputs():107-131 with
# needle/qs indexed-array keys (cb3[0], cb3[1], ...).

import json as _json

from osmospark.html import find as _find
from osmospark.corpus import (
    SUBMIT_EXPECTED1_SUB1,
    SUBMIT_EXPECTED1_SUB2,
    SUBMIT_EXPECTED1_FORMATTR,
    SUBMIT_EXPECTED2_SUB1,
    qs_indexed,
)


def _submit_case(selector, params=None):
    got = []
    chain = (O.get(f"{FIXTURE_HOST}/submit-form")
             .submit(selector, params)
             .then(lambda ctx: got.append(
                 _json.loads(_find(ctx, "#data")[0].text()))))
    r, _ = run(chain)
    assert not r.errors, r.errors
    assert len(got) == 1
    return got[0]


def test_submit_form1():  # submit.js:13-26 (form1)
    assert _submit_case("form") == qs_indexed(SUBMIT_EXPECTED1_SUB1)


def test_submit_form2():  # submit.js:28-40 (form2: GET, button sub1 picked,
    # sub2 skipped because form="form1" != form2 — lib/Form.js:30-42)
    assert _submit_case("form[2]") == qs_indexed(SUBMIT_EXPECTED2_SUB1)


def test_submit_button():  # submit.js:42-55: submit via a specific button
    assert (_submit_case('form:first [name="sub2"]')
            == qs_indexed(SUBMIT_EXPECTED1_SUB2))


def test_submit_form_attr():  # submit.js:57-72: button with form="form1"
    # resolves to form1's inputs; valueless submit -> 'Submit Query'
    assert (_submit_case('form[2] [name="sub2"]')
            == qs_indexed(SUBMIT_EXPECTED1_FORMATTR))


def test_submit_context_params():  # submit.js:74-91: callback params
    # merged over collected inputs (it1: '#dynamic-data' text)
    def params(ctx):
        return {"it1": _find(ctx, "#dynamic-data")[0].text()}
    assert (_submit_case("form[2]", params)
            == qs_indexed({"it1": "success", "sub1": "button"}))


def test_submit_multipart_attrs():  # submit.js:93-105: formmethod/
    # formaction/formenctype on the button drive a POST elsewhere
    got = []
    chain = (O.get(f"{FIXTURE_HOST}/submit-form")
             .submit('form[2] [name="sub3"]')
             .then(lambda ctx: got.append(_find(ctx, "div")[0].text())))
    r, _ = run(chain)
    assert not r.errors, r.errors
    assert got == ["success"]


def test_login_fills_and_posts():  # lib/commands/login.js:17-72 semantics
    got = []
    chain = (O.get(f"{FIXTURE_HOST}/login")
             .login("u1", "p1")
             .then(lambda ctx: got.append(_find(ctx, "#status")[0].text())))
    r, _ = run(chain)
    assert not r.errors, r.errors
    assert got == ["welcome"]
    # the fetch log records the filled POST
    post = [f for f in r.fetch_log if f["method"] == "post"][-1]
    assert post["params"] == {"user": "u1", "pass": "p1", "go": "Login"}


# -- test/config.js:10-42 ---------------------------------------------------
# opts scoping: instance opts inherit everywhere; a config delta applies to
# the PRECEDING command on down the chain (reference lib/commands/config.js
# doc + lib/Command.js:229-251: config-type commands mutate the previous
# real command's prototype-linked opts at build time)

def test_config_scoped_opts():
    seen = []
    chain = (O.parse(THEN_HTML)
             .config("proxy", "localhost")
             .then(lambda ctx: seen.append(dict(ctx.doc().opts)))
             .config("test", True)
             .then(lambda ctx: seen.append(dict(ctx.doc().opts))))
    runner = Runner(store=fixture_store(), opts={"ext": True, "one": 1})
    runner.run(chain)
    assert len(seen) == 2
    # reference test/config.js:19-25: first then sees instance opts + proxy
    assert seen[0]["one"] == 1 and seen[0]["ext"] is True
    assert seen[0]["proxy"] == "localhost"
    # :27-34: second then sees proxy AND test
    assert seen[1]["test"] is True and seen[1]["proxy"] == "localhost"
    # :35-43: instance-level opts never gain the chain-scoped deltas
    assert "proxy" not in runner.base_opts and "test" not in runner.base_opts


def test_config_applies_to_preceding_get():
    # the common reference idiom .get(url).config(opts) configures the GET
    # request itself (lib/commands/config.js: "the preceding command")
    r = Runner(store=fixture_store())
    r.run(O.get(f"{FIXTURE_HOST}/set")
           .config({"headers": {"x-on-get": "1"}})
           .set("title"))
    assert r.fetch_log[0]["headers"]["x-on-get"] == "1"


def test_headers_cookies_on_request():
    # reference test/config.js cookie/header echo semantics: scoped
    # headers/cookies ride every later request
    r = Runner(store=fixture_store(),
               opts={"headers": {"x-test": "1"},
                     "cookies": {"session": "abc"},
                     "user_agent": "osmospark/1.0"})
    r.run(O.get(f"{FIXTURE_HOST}/set").set("title"))
    f = r.fetch_log[0]
    assert f["headers"]["x-test"] == "1"
    assert f["headers"]["cookie"] == "session=abc"
    assert f["headers"]["user-agent"] == "osmospark/1.0"


def test_chain_cookie_header_ops_scope_from_preceding_request():
    # .get(u).header(...) mutates the get's opts (reference
    # lib/commands/header.js getOpts on `this` = the get command), so the
    # FIRST request already carries the header; later requests inherit it
    r = Runner(store=fixture_store())
    r.run(O.get(f"{FIXTURE_HOST}/1")
           .header("x-later", "yes").cookie("c", "v")
           .follow("a"))
    assert r.fetch_log and all(
        f["headers"]["x-later"] == "yes" for f in r.fetch_log)
    assert all(f["headers"]["cookie"] == "c=v" for f in r.fetch_log)


def test_cookie_scopes_to_its_own_request_not_earlier_ones():
    # reference test/config.js:46-70 global_cookies shape: the cookie set
    # on the SECOND request does not ride the first
    r = Runner(store=fixture_store())
    r.run(O.get(f"{FIXTURE_HOST}/2")
           .get(f"{FIXTURE_HOST}/3").cookie("c1", "yes"))
    assert "cookie" not in r.fetch_log[0]["headers"]
    assert r.fetch_log[1]["headers"]["cookie"] == "c1=yes"


# -- test/process_response_option.js ----------------------------------------
# the process_response hook transforms/validates raw response data before
# parsing (reference lib/Request.js:88-100); with parse:false the raw data
# flows to later commands as their context

def _run_process_response(path, hook):
    got, errs = [], []
    opts = {"parse": False}
    if hook is not None:
        opts["process_response"] = hook
    chain = (O.get(f"{FIXTURE_HOST}{path}")
             .config(opts)
             .then(lambda data: got.append(data))
             .error(errs.append))
    run(chain)
    return got, errs


def test_process_response_default_none():  # :6-11
    got, errs = _run_process_response("/response-code-200", None)
    assert got == ["hi"] and not errs


def test_process_response_fail_on_200():  # :13-18
    got, errs = _run_process_response(
        "/response-code-200",
        lambda d, r, n, c: c("200-die") if r.statusCode == 200 else n(d))
    assert got == [] and any("200-die" in e for e in errs)


def test_process_response_fail_on_incomplete_html():  # :19-24
    got, errs = _run_process_response(
        "/response-code-no-body-end",
        lambda d, r, n, c: c("no-body-end") if "</body>" not in d else n(d))
    assert got == [] and any("no-body-end" in e for e in errs)


def test_process_response_bold_to_italic():  # :25-30 (async 3-arg form)
    got, errs = _run_process_response(
        "/response-bold-hi",
        lambda d, r, n: n(d.replace("b>", "i>")))
    assert got == ["<body><i>hi</i></body>"] and not errs


def test_process_response_bold_to_italic_sync():  # :31-36 (return form)
    got, errs = _run_process_response(
        "/response-bold-hi",
        lambda d: d.replace("b>", "i>"))
    assert got == ["<body><i>hi</i></body>"] and not errs


def test_process_response_feeds_parser():
    # the transformed data is what gets PARSED when parse is on
    got = []
    chain = (O.get(f"{FIXTURE_HOST}/response-bold-hi")
             .config({"process_response": lambda d: d.replace("b>", "i>")})
             .find("i")
             .then(lambda ctx: got.append(ctx.text())))
    r, _ = run(chain)
    assert got == ["hi"] and not r.errors


# -- fetch error taxonomy (reference lib/Request.js:30-68) ------------------

def test_http_error_status_fails_branch():
    got, errs = [], []
    run(O.get(f"{FIXTURE_HOST}/error-500")
        .then(lambda ctx: got.append(1)).error(errs.append))
    assert got == [] and any("500 Internal Server Error" in e for e in errs)


def test_ignore_http_errors_opt():
    got = []
    chain = (O.get(f"{FIXTURE_HOST}/error-500")
             .config("ignore_http_errors", True)
             .find("body")
             .then(lambda ctx: got.append(ctx.text())))
    r, _ = run(chain)
    assert got == ["oops"] and not r.errors


def test_empty_body_is_data_is_empty():
    errs = []
    run(O.get(f"{FIXTURE_HOST}/empty").then(lambda c: None)
        .error(errs.append))
    assert any("Data is empty" in e for e in errs)


def test_content_type_sets_response_type():
    # reference lib/Request.js:128-142 getResponseType
    seen = []
    run(O.get(f"{FIXTURE_HOST}/feed")
        .then(lambda ctx: seen.append(ctx.doc().response["type"])))
    run(O.get(f"{FIXTURE_HOST}/set")
        .then(lambda ctx: seen.append(ctx.doc().response["type"])))
    assert seen == ["xml", "html"]


# -- test/resume.js + test/stop.js ------------------------------------------
# chain-level pause/resume/stop are immediate instance controls
# (reference lib/commands/{pause,resume,stop}.js + index.js:364-382)

def test_chain_pause_defers_then_resume_completes():  # test/resume.js:7-36
    count, done = [], []
    chain = O.get(f"{FIXTURE_HOST}/pause").follow("a")
    chain.then(lambda ctx: (
        count.append(1),
        chain.pause() if len(count) == 2 else None))
    chain.done(lambda: done.append(1))
    r = Runner(store=fixture_store())
    r.run(chain)
    # paused mid-follow: work deferred, done not fired
    assert len(count) == 2 and not done and r._deferred
    chain.resume()
    assert len(count) == 5          # all pages processed after resume
    assert done == [1] and not r._deferred


def test_chain_stop_discards_pending_work():  # test/stop.js:6-27
    logs, then_ran, done = [], [], []
    chain = (O.get(f"{FIXTURE_HOST}/delay-response")
             .follow("a").follow("a").follow("a"))
    chain.log(lambda msg: (
        logs.append(msg),
        chain.stop() if len([m for m in logs if "url:" in m]) == 2 else None))
    chain.then(lambda ctx: then_ran.append(1))
    chain.done(lambda: done.append(1))
    Runner(store=fixture_store()).run(chain)
    assert len([m for m in logs if "url:" in m]) == 2
    assert then_ran == []           # stop dropped everything downstream
    assert done == [1]              # reference fires done after stop


def test_run_immediate_then_and_done():  # test/run.js:9-23
    seen, done = [], []
    chain = (O.get(f"{FIXTURE_HOST}/run")
             .then(lambda ctx: seen.append(ctx.get("div").text()))
             .done(lambda: done.append(1)))
    Runner(store=fixture_store()).run(chain)
    assert seen == ["loaded"] and done == [1]


def test_run_same_instance_twice():  # test/run.js:25-39
    count = []
    chain = (O.get(f"{FIXTURE_HOST}/run")
             .then(lambda ctx: count.append(1)))
    r = Runner(store=fixture_store())
    r.run(chain)
    r.run(chain)                      # same instance, run again
    assert len(count) == 2


def test_run_fresh_runner_same_chain():  # test/run.js:41-63 analogue:
    # the chain object outlives a runner; a NEW runner re-executes it with
    # correctly re-folded opts (the opts-cache is keyed by weakref, not id)
    seen = []
    chain = (O.get(f"{FIXTURE_HOST}/run")
             .config({"tries": 2})
             .then(lambda ctx: seen.append(ctx.get("div").text())))
    Runner(store=fixture_store()).run(chain)
    Runner(store=fixture_store()).run(chain)
    assert seen == ["loaded", "loaded"]


def test_prerun_stop_is_noop_run():
    got, done = [], []
    chain = (O.get(f"{FIXTURE_HOST}/set").set("title")
             .then(lambda ctx: got.append(1)))
    chain.done(lambda: done.append(1))
    chain.stop()
    Runner(store=fixture_store()).run(chain)
    assert got == [] and done == [1]


# -- :domain / :path selector pseudos (reference Changes.md:92-95) ----------

def test_domain_path_pseudos():
    from osmospark.html import compile_selector, parse_html
    doc = parse_html(
        '<a href="/local/a"></a>'
        '<a href="http://other.com/x"></a>'
        '<a href="http://sub.other.com/y"></a>'
        '<a href="http://fixture.local/local/b"></a>',
        base_url="http://fixture.local/dir/")
    by_domain = compile_selector("a:domain(other.com)").find(doc)
    assert [a.get_attribute("href") for a in by_domain] == \
        ["http://other.com/x", "http://sub.other.com/y"]
    by_path = compile_selector("a:path(/local)").find(doc)
    assert [a.get_attribute("href") for a in by_path] == \
        ["/local/a", "http://fixture.local/local/b"]


# -- proxy rotation + cookie deletion ---------------------------------------

def test_proxy_round_robin_rotation():
    # reference lib/Command.js:353-365: a list proxy option rotates per
    # request; the chosen proxy rides the fetch log
    r = Runner(store=fixture_store(),
               opts={"proxy": ["p1", "p2"]})
    r.run(O.get(f"{FIXTURE_HOST}/1").follow("a"))  # 1 + 2 fetches
    assert [f["proxy"] for f in r.fetch_log] == ["p1", "p2", "p1"]


def test_failing_proxy_dropped_from_rotation():
    # reference index.js:197-208: a connection-level failure (not a 404)
    # reports 'proxy i/n failed' and removes the proxy from rotation
    from osmospark.corpus import PageStore, fixture_pages

    class FlakyStore(PageStore):
        def fetch(self, url, method="get", params=None):
            if url.endswith("/down"):
                return 0, None          # connection error, not a 404
            return super().fetch(url, method, params)

    store = FlakyStore(fixture_pages())
    r = Runner(store=store, opts={"proxy": ["bad", "good"]}, tries=1)
    r.run(O.get(f"{FIXTURE_HOST}/down"))   # fails through proxy 'bad'
    assert any("proxy 1/2 failed (bad)" in e for e in r.errors)
    # 'bad' was dropped: every subsequent request uses 'good'
    r.run(O.get(f"{FIXTURE_HOST}/2"))
    r.run(O.get(f"{FIXTURE_HOST}/3"))
    assert [f["proxy"] for f in r.fetch_log[1:]] == ["good", "good"]


def test_cookie_null_deletes():
    # reference lib/commands/cookie.js:24-27: setting a cookie to None
    # deletes it from the jar for this scope onward
    r = Runner(store=fixture_store(), opts={"cookies": {"keep": "1",
                                                        "drop": "2"}})
    r.run(O.get(f"{FIXTURE_HOST}/2")
           .get(f"{FIXTURE_HOST}/3").cookie("drop", None))
    assert r.fetch_log[0]["headers"]["cookie"] == "drop=2; keep=1"
    assert r.fetch_log[1]["headers"]["cookie"] == "keep=1"


def test_keep_data_and_response_size():
    # reference lib/Request.js:81-83 (keep_data) + :110-117 (size.body)
    seen = []
    chain = (O.get(f"{FIXTURE_HOST}/2")
             .config("keep_data", True)
             .then(lambda ctx: seen.append(ctx.doc().response)))
    run(chain)
    assert seen[0]["data"] == "<head><title>2</title></head><body></body>"
    assert seen[0]["size"]["body"] == len(seen[0]["data"])
    # without keep_data the raw body is not retained
    seen2 = []
    run(O.get(f"{FIXTURE_HOST}/2")
        .then(lambda ctx: seen2.append(ctx.doc().response)))
    assert "data" not in seen2[0] and seen2[0]["size"]["body"] > 0
