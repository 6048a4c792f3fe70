"""Sitemap ingestion (osmospark/sitemap.py): urlset/index parsing,
bounded index resolution, and the frontier tie-ins (priority_df units,
lastmod vs recrawl)."""

from pyspark.sql import functions as F

from osmospark.sitemap import (resolve_sitemaps, sitemap_entries,
                               sitemap_index_entries)

URLSET = ('<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
          '<url><loc>http://a.test/1</loc><lastmod>2026-03-04</lastmod>'
          '<changefreq>daily</changefreq><priority>0.8</priority></url>'
          '<url><loc>http://a.test/2</loc></url>'
          '<url><priority>0.5</priority></url>'  # no loc -> dropped
          '</urlset>')
INDEX = ('<sitemapindex><sitemap><loc>http://s.test/child1.xml</loc>'
         '</sitemap><sitemap><loc>http://s.test/child2.xml</loc>'
         '</sitemap></sitemapindex>')


def _df(spark, rows):
    return spark.createDataFrame(rows, "url string, xml string")


def test_urlset_fields_and_optionals(spark):
    got = sitemap_entries(_df(spark, [("http://s.test/m.xml", URLSET)])) \
        .orderBy("loc").collect()
    assert len(got) == 2  # loc-less entry dropped
    e1, e2 = got
    assert e1.loc == "http://a.test/1"
    assert str(e1.lastmod) == "2026-03-04"
    assert e1.changefreq == "daily" and e1.priority_milli == 800
    assert e2.loc == "http://a.test/2"
    assert e2.lastmod is None and e2.changefreq is None \
        and e2.priority_milli is None


def test_index_entries(spark):
    got = sitemap_index_entries(
        _df(spark, [("http://s.test/i.xml", INDEX)])).collect()
    assert sorted(r.child_loc for r in got) == [
        "http://s.test/child1.xml", "http://s.test/child2.xml"]
    # urlset docs yield no index rows and vice versa
    assert sitemap_index_entries(
        _df(spark, [("u", URLSET)])).count() == 0
    assert sitemap_entries(_df(spark, [("i", INDEX)])).count() == 0


def test_resolve_index_hop_with_lineage(spark):
    corpus = _df(spark, [
        ("http://s.test/i.xml", INDEX),
        ("http://s.test/child1.xml", URLSET.replace("a.test", "c1.test")),
        ("http://s.test/child2.xml", URLSET.replace("a.test", "c2.test")),
        ("http://other.test/m.xml", URLSET.replace("a.test", "o.test")),
    ])
    got = resolve_sitemaps(corpus,
                           ["http://s.test/i.xml",
                            "http://other.test/m.xml"],
                           max_depth=1).collect()
    by_root = {}
    for r in got:
        by_root.setdefault(r.root, set()).add(r.loc)
    assert by_root["http://s.test/i.xml"] == {
        "http://c1.test/1", "http://c1.test/2",
        "http://c2.test/1", "http://c2.test/2"}
    assert by_root["http://other.test/m.xml"] == {
        "http://o.test/1", "http://o.test/2"}


def test_resolve_depth_cap_stops_nested_indexes(spark):
    # index -> index -> urlset needs depth 2; depth 1 must NOT reach it
    deep = ('<sitemapindex><sitemap><loc>http://s.test/i2.xml</loc>'
            '</sitemap></sitemapindex>')
    corpus = _df(spark, [
        ("http://s.test/i1.xml", deep),
        ("http://s.test/i2.xml", INDEX.replace("child", "leaf")),
        ("http://s.test/leaf1.xml", URLSET),
        ("http://s.test/leaf2.xml", URLSET.replace("a.test", "b.test")),
    ])
    shallow = resolve_sitemaps(corpus, ["http://s.test/i1.xml"],
                               max_depth=1).count()
    full = resolve_sitemaps(corpus, ["http://s.test/i1.xml"],
                            max_depth=2).count()
    assert shallow == 0 and full == 4


def test_robots_sitemap_directives(spark):
    from osmospark.frontier.politeness import robots_sitemaps

    txt = ("User-agent: googlebot\nDisallow: /x\n"
           "SITEMAP: http://a.test/one.xml\n"
           "User-agent: *\nAllow: /\n"
           "\tsitemap:\thttp://a.test/two.xml\n"
           "NotASitemap: http://a.test/no.xml\n")
    got = robots_sitemaps(spark.createDataFrame(
        [("a.test", txt), ("b.test", "User-agent: *\nAllow: /\n")],
        "host string, robots_txt string")).collect()
    # agent-group-independent, case-insensitive, order-preserving;
    # hostless b.test absent
    assert [(r.host, r.ordinal, r.sitemap) for r in got] == [
        ("a.test", 0, "http://a.test/one.xml"),
        ("a.test", 1, "http://a.test/two.xml")]


def test_robots_to_sitemap_to_frontier_pipeline(spark):
    """The full discovery chain: robots -> Sitemap: directive ->
    resolve -> urlset entries become frontier seed candidates."""
    from osmospark.frontier.politeness import robots_sitemaps

    robots = spark.createDataFrame(
        [("a.test", "User-agent: *\nSitemap: http://a.test/m.xml\n")],
        "host string, robots_txt string")
    corpus = spark.createDataFrame(
        [("http://a.test/m.xml", URLSET)], "url string, xml string")
    seeds = [r.sitemap for r in robots_sitemaps(robots).collect()]
    entries = resolve_sitemaps(corpus, seeds, max_depth=1)
    assert sorted(r.loc for r in entries.collect()) == [
        "http://a.test/1", "http://a.test/2"]


def test_pretty_printed_and_malformed_sitemaps(spark):
    """Real-world sitemaps pretty-print: <loc> values padded with
    newline+indent must be trimmed (untrimmed they would become
    distinct bogus frontier URLs); truncated XML, non-XML, NULL bodies
    and empty <loc>s yield zero rows instead of errors (r5 edge
    probe)."""
    pretty = ("<urlset>\n  <url>\n    <loc>\n      http://a.test/p1\n"
              "    </loc>\n    <changefreq>\n daily </changefreq>\n"
              "    <lastmod>2026-03-01T12:30:00+00:00</lastmod>\n"
              "    <priority>0.8</priority>\n"
              "  </url>\n  <url>\n    <loc>http://a.test/p2</loc>\n"
              "    <lastmod>bogus</lastmod>\n"
              "    <priority>high</priority>\n  </url>\n</urlset>")
    raw = spark.createDataFrame(
        [("http://a.test/m.xml", pretty),
         ("http://b.test/m.xml", "<urlset><url><loc>http://b/a</loc>"),
         ("http://c.test/m.xml", "not xml at all"),
         ("http://d.test/m.xml", None),
         ("http://e.test/m.xml",
          "<urlset><url><loc>  </loc></url></urlset>")],
        "url string, xml string")
    got = [(r.sitemap_url, r.loc, r.changefreq, str(r.lastmod),
            r.priority_milli)
           for r in sitemap_entries(raw).orderBy("loc").collect()]
    # W3C datetime lastmod parses its date part; malformed lastmod /
    # non-numeric priority yield NULL, never an ANSI abort
    assert got == [
        ("http://a.test/m.xml", "http://a.test/p1", "daily",
         "2026-03-01", 800),
        ("http://a.test/m.xml", "http://a.test/p2", None, "None", None)]
