"""RSS/Atom feed ingestion: typed entry parsing and page-level
autodiscovery (osmospark/feed.py) — all JVM expressions, map-only."""

import datetime

from osmospark.feed import discover_feeds, feed_entries

RSS = """<?xml version="1.0"?><rss version="2.0"><channel>
<title>chan</title>
<item><title>post one</title><link>http://h1.test/f/1</link>
<guid>g-1</guid><pubDate>Mon, 02 Feb 2026 15:04:05 GMT</pubDate></item>
<item><title>post two</title><link>http://h1.test/f/2</link>
<guid>g-2</guid><pubDate>Tue, 03 Feb 2026 08:00:00 +0000</pubDate></item>
<item><title>linkless — dropped</title></item>
</channel></rss>"""

ATOM = """<?xml version="1.0"?><feed xmlns="http://www.w3.org/2005/Atom">
<title>afeed</title>
<entry><title>a one</title>
<link rel="alternate" href="http://h2.test/a/1"/>
<id>tag:1</id><updated>2026-02-02T15:04:05Z</updated></entry>
</feed>"""


def test_feed_entries_rss_and_atom(spark):
    df = spark.createDataFrame(
        [("http://h1.test/rss.xml", RSS), ("http://h2.test/atom.xml", ATOM)],
        "url string, xml string")
    rows = {(r.feed_url, r.loc): r for r in feed_entries(df).collect()}
    assert len(rows) == 3  # linkless item dropped

    r1 = rows[("http://h1.test/rss.xml", "http://h1.test/f/1")]
    assert (r1.kind, r1.title, r1.entry_id) == ("rss", "post one", "g-1")
    assert r1.published == datetime.datetime(2026, 2, 2, 15, 4, 5)
    # numeric-offset tz designator stripped the same way as GMT
    r2 = rows[("http://h1.test/rss.xml", "http://h1.test/f/2")]
    assert r2.published == datetime.datetime(2026, 2, 3, 8, 0, 0)

    a1 = rows[("http://h2.test/atom.xml", "http://h2.test/a/1")]
    assert (a1.kind, a1.title, a1.entry_id) == ("atom", "a one", "tag:1")
    assert a1.published == datetime.datetime(2026, 2, 2, 15, 4, 5)


def test_discover_feeds_attribute_order_and_decoys(spark):
    html = ('<html><head>'
            '<link rel="stylesheet" href="/s.css">'
            '<link rel="alternate" type="application/rss+xml"'
            ' href="/rss.xml">'
            '<link type="application/atom+xml" rel="alternate"'
            ' href="/atom.xml" title="x">'
            '<link rel="alternate" type="text/html" href="/mobile">'
            '</head><body><a href="/x">not a link tag</a></body></html>')
    pages = spark.createDataFrame([("http://h1.test/", html)],
                                  "url string, html string")
    got = sorted((r.feed_href, r.feed_type)
                 for r in discover_feeds(pages).collect())
    assert got == [("/atom.xml", "application/atom+xml"),
                   ("/rss.xml", "application/rss+xml")]


def test_feed_ops_are_map_only(spark):
    df = spark.createDataFrame([("u", RSS)], "url string, xml string")
    for out in (feed_entries(df),
                discover_feeds(df.withColumnRenamed("xml", "html"))):
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "FlatMapInPandas" not in plan  # pure JVM expressions


def test_pretty_printed_and_malformed_feeds(spark):
    """Pretty-printed RSS pads <link>/<title> with newline+indent —
    values must be trimmed (an untrimmed link is a bogus frontier
    URL); truncated/non-XML/NULL feed bodies yield zero rows (r5 edge
    probe)."""
    pretty = ("<rss><channel><item>\n  <link>\n    http://h/x\n"
              "  </link>\n  <title>\n    T1  </title>\n"
              "</item></channel></rss>")
    raw = spark.createDataFrame(
        [("http://h/f.xml", pretty),
         ("http://h/g.xml", "<rss><channel><item><link>http://h/y"),
         ("http://h/h.xml", "junk"),
         ("http://h/i.xml", None)],
        "url string, xml string")
    got = [(r.feed_url, r.kind, r.loc, r.title)
           for r in feed_entries(raw).collect()]
    assert got == [("http://h/f.xml", "rss", "http://h/x", "T1")]
