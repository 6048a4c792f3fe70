"""Differential test: the fast regex tokenizer must build the EXACT same
DOM as the stdlib html.parser path (same handle_* callback stream → same
tree, same node granularity, same attribute parsing)."""

import pytest

from osmospark.html import parser as P


def _build(html: str, fast: bool) -> P.Document:
    b = P._TreeBuilder()
    if fast:
        P._fast_feed(b, html)
    else:
        b.feed(html)
        b.close()
    P._assign_order(b.doc)
    return b.doc


def _dump(doc: P.Document):
    out = []
    for n in doc.descendants():
        if isinstance(n, P.Element):
            out.append(("el", n.tag, tuple(n.attrs)))
        elif isinstance(n, P.TextNode):
            out.append(("text", n.data))
        else:  # pragma: no cover
            out.append(("other", repr(n)))
    return out


def _assert_same(html: str):
    fast, std = _build(html, True), _build(html, False)
    assert _dump(fast) == _dump(std), html
    assert fast.serialize() == std.serialize(), html


def test_fixture_pages_identical():
    from osmospark.corpus import fixture_pages
    for page in fixture_pages():
        _assert_same(page.html)


def test_synth_pages_identical():
    from osmospark.corpus import _host_sizes, _synth_page
    sizes = _host_sizes(60, 4, 1.2)
    hosts = [f"host{h:04d}.test" for h in range(4)]
    for h in range(4):
        for i in range(sizes[h]):
            _, html = _synth_page(h, i, hosts, sizes, 4, 2, 60)
            _assert_same(html)


EDGE_CASES = [
    "",
    "   ",
    "plain text only",
    "a < b and c > d",
    "x &amp; y &lt;z&gt; &#65; &unknown;",
    "<b>bold</b> tail",
    '<a href="/x?a=1&amp;b=2">link</a>',
    "<a href='/single'>s</a>",
    "<input disabled>",
    "<input disabled />",
    "<img src=bare>",
    "<div  class = 'spaced' >x</div>",
    "<UL><LI>upper</LI></UL>",
    "<p>unclosed<p>another",
    "<div><span>deep</div>stray</span>",
    "<!-- comment --><div>after</div>",
    "<!-- unterminated comment <div>x</div>",
    "<!DOCTYPE html><html><body>doc</body></html>",
    "<?pi instruction?><div>x</div>",
    "<script>if (a < b && c) { x = '</div>'; }</script><div>after</div>",
    "<style>a > b { color: red; }</style><p>styled</p>",
    "<head><title>T</title></head><body>b</body>",
    "<br><hr><meta charset='x'>",
    "<a href=\"/समाज-विश्व/test/test%20test test\">unicode</a>",
    "< notatag>",
    "text with <3 emoticon",
    "<div attr='a\"b'>quotes</div>",
    '<div attr="a\'b">quotes</div>',
    "<em>nested <strong>bold <i>italic</i></strong> tail</em>",
    "<td rowspan=2 colspan='3'>cell</td>",
    "<x-custom data-v='1'>custom</x-custom>",
    "trailing <",
    "trailing </",
    "trailing <div",
    "<script\n<div></div>",          # unterminated CDATA: content dropped
    "<div a='",                      # EOF inside attribute value
    "<div a='x",
    '<div a="y',
    "<div a='x>more</div>",          # unterminated quote with a later '>'
    "<style>p{}",                    # unterminated style
    # finditer-sweep structure: several rejected constructs inside ONE
    # gap between simple-tag matches (each forces a complex_step +
    # sweep restart), rejected constructs butting against text/tails
    "<div>a<!-- c1 -->b<!-- c2 -->c<?pi?>d</div>",
    "<div>t1< t2<!x>t3<a href='s'>y</a>t4</div>",
    "pre <1 mid <2 post<b>z</b>",
    "<div>x</div>tail with < stray and &amp; entity",
    # CDATA entered from the sweep, then sweep resumes after the end tag
    "<p>a</p><script>1<2</script><p>b</p><style>c>d</style><p>e</p>",
    "<script>s1</script><script>s2</script>done",
    "<script>never ends",
    # simple tag as the very last bytes / text as the very first
    "lead text<br>",
    "<img src=\"x\">",
    "&amp;",
    # '<' + non-ASCII letter: stdlib starttagopen is ASCII-only, so the
    # '<' is plain data (r5 review: complex_step's isalpha() gate crashed
    # on the None from _locatestart here)
    "a<éb",
    "x<é>y",
    "<p>français <éléphant</p>",
    "<Ω>",
    "a<é",
    "<é",
    # CDATA leaves ONLY at a full strict end tag of the owning element
    # (stdlib 3.11 set_cdata_mode pattern '</\\s*tag\\s*>'); tolerant or
    # mismatched end-tag shapes stay inside as raw content, and at EOF
    # the unterminated remainder is discarded (r5 review: the fast path
    # exited CDATA at any '</script' prefix)
    "<script>a<b</script foo>after",
    "<script>a</scriptx>b</script>c",
    "<script>a</script\nmore",
    "<style>p{}</style foo>q</style>r",
    "<script>a</SCRIPT >b</script>c",
    "<script>a</ script>b</script>c",
    "<script>a</script x",
    "<script>a</script\t\n >b",
    "<script>é<b</script>x",
    "<style></ style >done</style>z",
]


def test_group4_is_endtag_re():
    """_SIMPLE_TAG's end-tag alternation (group 4) must stay byte-for-byte
    the stdlib strict endtagfind (_ENDTAG_RE) with the leading '<'
    factored out — the CDATA exit relies on the resumed sweep treating a
    _CDATA_END match as a strict end tag."""
    assert P._SIMPLE_TAG.pattern.endswith("|" + P._ENDTAG_RE.pattern[1:] + ")")
    for t in P._CDATA_TAGS:
        # _CDATA_END is the same strict shape specialized to the element
        assert P._CDATA_END[t].pattern == rf"</\s*{t}\s*>"


def test_cdata_nonascii_fuzz_identical():
    """Seeded fuzz of CDATA boundaries and '<'+non-ASCII shapes — the two
    r5 review findings — against the stdlib engine."""
    import random

    rng = random.Random(20260820)
    frag = ["<script>", "</script>", "</script", "</script foo>",
            "</scriptx>", "<style>", "</style>", "</ScRiPt >", "text",
            "é", "<é", "a<b", "&amp;", "<p>", "</p>",
            '<div class="x">', "<!--c-->", "<", ">", "\n", " ",
            "</style x", "<ω>", "χ<ψ"]
    for _ in range(800):
        _assert_same("".join(rng.choice(frag)
                             for _ in range(rng.randint(1, 12))))


def test_tag_soup_fuzz_identical():
    """Seeded tag-soup fuzz (deterministic): random interleavings of
    simple tags, rejected constructs, CDATA and entity-bearing text —
    the shapes that exercise the finditer sweep's restart logic."""
    import random

    rng = random.Random(20260820)
    tags = ["div", "p", "span", "a", "li", "ul", "script", "style",
            "br", "img", "b", "html", "head", "body", "title"]
    rejects = ["<!-- c -->", "<!DOCTYPE html>", "<?pi x?>", "<!", "<",
               "< x", "</ >", "</div foo>", "<a href='s q'>",
               "<a name=unq>", "<a name=unq", "<![CDATA[x]]>"]
    texts = ["text & more", "  ", "&lt;tag&gt;", "caf\xe9 &#233;",
             "plain <notatag", "a&b;c", "\n\t"]
    for _ in range(400):
        bits = []
        for _ in range(rng.randint(1, 50)):
            r = rng.random()
            t = rng.choice(tags)
            if r < 0.30:
                attrs = "".join(
                    ' {}="{}"'.format(
                        rng.choice(["href", "id", "class", "HREF",
                                    "data-x", "x:y"]),
                        rng.choice(["a&amp;b", "pl ain", "", "\xe9"]))
                    for _ in range(rng.randint(0, 2)))
                bits.append(f"<{t}{attrs}>")
            elif r < 0.45:
                bits.append(f"</{t}>")
            elif r < 0.52:
                bits.append(f"<{t}/>")
            elif r < 0.62:
                bits.append(rng.choice(rejects))
            else:
                bits.append(rng.choice(texts))
        _assert_same("".join(bits))


@pytest.mark.parametrize("case", EDGE_CASES)
def test_edge_cases_identical(case):
    _assert_same(case)


def test_attr_span_fuzz_identical():
    """Seeded fuzz of the simple start-tag ATTRIBUTE span specifically:
    _fast_feed decomposes group 2 of _SIMPLE_TAG with split('\"') instead
    of a second regex pass, relying on the group's (\\s+name=\"value\")*
    pre-validation. Random spans across that full grammar — every
    whitespace kind the class admits, name chars {:-._ digits upper},
    values with '=', quotes of the OTHER kind, spaces — must parse
    attr-for-attr identically to the stdlib engine."""
    import random

    rng = random.Random(20260821)
    name_first = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ_:"
    name_rest = name_first + "-.0123456789"
    val_chars = "abcXYZ 0123456789='`( )\t\n;/\\,éß"
    for _ in range(600):
        n_attrs = rng.randint(0, 5)
        span = []
        for _ in range(n_attrs):
            ws = "".join(rng.choice(" \t\n\r") for _ in
                         range(rng.randint(1, 3)))
            name = (rng.choice(name_first)
                    + "".join(rng.choice(name_rest)
                              for _ in range(rng.randint(0, 6))))
            val = "".join(rng.choice(val_chars)
                          for _ in range(rng.randint(0, 12)))
            span.append(f'{ws}{name}="{val}"')
        close = rng.choice([">", "/>", " >", " />", "\n>"])
        _assert_same(f"<div{''.join(span)}{close}text</div>")


def test_hypothesis_fuzz_identical():
    try:
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st
    except ImportError:  # pragma: no cover
        pytest.skip("hypothesis unavailable")

    tags = st.sampled_from(["div", "p", "a", "b", "ul", "li", "img",
                            "span", "input"])
    text = st.lists(
        st.sampled_from(
            list("abc <>&;='\"/!-?\n\t") + ["&amp;", "&lt;", "&#65;"]),
        max_size=24).map("".join)

    @st.composite
    def html_doc(draw):
        parts = []
        for _ in range(draw(st.integers(0, 8))):
            kind = draw(st.integers(0, 3))
            if kind == 0:
                parts.append(draw(text))
            elif kind == 1:
                t = draw(tags)
                attr = draw(st.sampled_from(
                    ["", " class='c'", ' href="/x"', " disabled",
                     " a=b", " a = 'x y'"]))
                parts.append(f"<{t}{attr}>{draw(text)}</{t}>")
            elif kind == 2:
                parts.append(f"<{draw(tags)}/>")
            else:
                parts.append(f"<!-- {draw(text)} -->")
        return "".join(parts)

    # derandomize: the committed suite must be deterministic (the driver
    # gate reruns it); an 8000-example randomized sweep with a nastier
    # grammar (unterminated quotes/CDATA, truncated tags, bogus end tags)
    # was run clean during development
    @settings(max_examples=300, deadline=None, derandomize=True,
              suppress_health_check=list(HealthCheck))
    @given(html_doc())
    def check(doc):
        _assert_same(doc)

    check()

    # completely arbitrary character soup (no grammar at all)
    @settings(max_examples=300, deadline=None, derandomize=True,
              suppress_health_check=list(HealthCheck))
    @given(st.text(alphabet=list("<>/&;=!-?' \"abXY01\n"), max_size=40))
    def check_soup(s):
        _assert_same(s)

    check_soup()


@pytest.mark.parametrize("html,expect", [
    ("<head><title>t</title></head>", True),
    ("<p>no head here</p>", False),
    # '<head' inside script/style CDATA or comments is never a start-tag
    # token — the lxml engine's source re-detection must agree with the
    # tokenizer engines (r5 review finding)
    ('<script>var x="<head>";</script><p>hi</p>', False),
    ("<!-- <head> --><p>hi</p>", False),
    ("<style>/* <head> */</style><p>hi</p>", False),
    ("<!-- c --><head></head><p>hi</p>", True),
    ("<script>a</script><head></head>", True),
    ("<HEAD><title>t</title></HEAD>", True),
])
def test_detect_explicit_head_matches_tokenizer(html, expect):
    """lxml_backend.detect_explicit_head (pure regex, importable without
    lxml) must agree with the fast tokenizer's had_explicit_head flag on
    well-formed markup, including head-shaped text hidden in comments
    and script/style bodies."""
    from osmospark.html.lxml_backend import detect_explicit_head

    b = P._TreeBuilder()
    P._fast_feed(b, html)
    assert b.had_explicit_head is expect, html
    assert detect_explicit_head(html) is expect, html


def test_xmldecl_strip_regex():
    """The lxml engine strips a leading XML declaration before handing
    the (already-decoded) string to libxml2 — lxml raises ValueError on
    unicode input carrying an encoding declaration. Pure-regex check
    here; the end-to-end parse is covered in test_parser_lxml.py where
    lxml exists."""
    from osmospark.html.lxml_backend import _XMLDECL_RX

    page = ('<?xml version="1.0" encoding="UTF-8"?>\n'
            "<html><head></head><body><p>hi</p></body></html>")
    stripped = _XMLDECL_RX.sub("", page, count=1)
    assert stripped.lstrip().startswith("<html>")
    # no declaration → untouched; '<?xml' later in the page → untouched
    assert _XMLDECL_RX.sub("", "<p>a</p>", count=1) == "<p>a</p>"
    mid = "<p><?xml version='1.0'?></p>"
    assert _XMLDECL_RX.sub("", mid, count=1) == mid


def test_deep_nesting_serialize_no_recursion():
    """A hostile page nesting 50k unclosed <div>s must parse AND
    re-serialize (the :html capture path) without RecursionError —
    serialization walks an explicit stack (r5 edge-probe finding).
    Byte-identity with the recursive form is pinned by every golden in
    this suite; here only depth-safety and well-formedness."""
    deep = "<div>" * 50_000 + "x"
    d = P.parse_html(deep)
    s = d.serialize()
    assert s.startswith("<html><body><div><div>")
    assert s.endswith("x" + "</div>" * 50_000 + "</body></html>")
    # inner_html on the root takes the same iterative path
    assert d.root.inner_html.startswith("<body><div>")


class TestLinkResolverDifferential:
    """link_resolver(base)(href) must equal the slow path
    (canonicalize(resolve(base, href)), url_host(...)) on EVERY input —
    the fast branches are regex-gated claims of already-canonical form,
    and this suite is the proof obligation."""

    @staticmethod
    def _slow(base, href):
        from osmospark.urlnorm import canonicalize, resolve, url_host
        t = canonicalize(resolve(base, href))
        return t, url_host(t)

    def _check(self, base, href):
        from osmospark.urlnorm import link_resolver
        assert link_resolver(base)(href) == self._slow(base, href), (
            base, href)

    def test_corpus_links(self):
        # every href the synthetic bench corpus actually emits
        from osmospark.corpus import _synth_page, _host_sizes
        import re as _re
        sizes = _host_sizes(5000, 8, 1.2)
        hosts = [f"host{h:04d}.test" for h in range(8)]
        for h in range(8):
            for i in range(0, min(sizes[h], 40)):
                url, html = _synth_page(h, i, hosts, sizes, 4, 2, weight=0)
                for href in _re.findall(r'href="([^"]*)"', html):
                    self._check(url, href)

    def test_edge_shapes(self):
        bases = [
            "http://example.com/a/b?x=1",
            "https://Example.COM:443/a",
            "http://example.com:8080/",
            "http://u:p@example.com/x",
            "http://[::1]/x",
            "http://[::1/x",           # unmatched bracket (hostile)
            "http://h:bad/x",          # unparseable port (hostile)
            "HTTP://UPPER.example/x",
            "example.com/no-scheme",
            "", None,
        ]
        hrefs = [
            "/p/1", "/", "/a/b/c", "/a//b", "/trailing/",
            "/with~tilde", "/With/Case.html", "/a/../b", "/./a", "/a/.",
            "//proto.relative/x", "rel/path", "../up", "?q=2", "#frag",
            "http://other.test/x", "http://other.test", "https://o.t/p",
            "HTTP://case.test/x", "http://h:80/x", "http://h:443/x",
            "https://h:443/x", "http://u@h/x", "http://h/x?b=2&a=1",
            "http://h/x#f", "http://h/%41", "http://[::2]/x",
            "http://h:bad2/y", "javascript:void(0)", "mailto:a@b",
            "/sp ace", "/percent%20enc", "/q?inside", "/ümlaut",
        ]
        for b in bases:
            for h in hrefs:
                self._check(b, h)

    def test_hypothesis_fuzz(self):
        from hypothesis import given, settings, strategies as st

        alphabet = st.sampled_from(list(
            "abcXYZ019./-_~:@?#&=%[]! +"))
        href_s = st.text(alphabet=alphabet, min_size=1, max_size=24)
        base_s = st.one_of(
            st.none(),
            st.just("http://base.test/dir/page"),
            st.just("http://base.test:8080/dir/"),
            href_s.map(lambda s: "http://base.test/" + s),
        )

        @settings(max_examples=400, deadline=None)
        @given(base=base_s, href=href_s)
        def run(base, href):
            self._check(base, href)

        run()
