"""WARC ingestion (osmospark/warc.py): record parse, distributed file
read via lineSep splitting, and engine-feeding (status/content_type
columns thread into process_response like any pages table)."""

import os

from pyspark.sql import functions as F

from osmospark.warc import (RECORD_SEP, make_warc_record, read_warc,
                            warc_records)


def _stream_df(spark, n=10):
    return spark.range(n).select(make_warc_record(
        F.concat(F.lit("http://w.test/p/"), F.col("id").cast("string")),
        F.lit("2026-02-03T04:05:06Z"),
        F.when(F.col("id") % 3 == 0, "404").otherwise("200"),
        F.lit("text/html"),
        F.concat(F.lit("<body><p>page "), F.col("id").cast("string"),
                 F.lit("</p>\r\n<p>two</p></body>"))).alias("value"))


def test_warc_record_fields(spark):
    r = warc_records(_stream_df(spark, 1)).collect()[0]
    assert r.url == "http://w.test/p/0"
    assert str(r.warc_ts) == "2026-02-03 04:05:06"
    assert r.status == 404 and r.content_type == "text/html"
    assert bytes(r.html).decode() == \
        "<body><p>page 0</p>\r\n<p>two</p></body>"
    assert r.text == "page 0 two"


def test_warc_body_keeps_inner_crlf_not_trailing(spark):
    # inner \r\n survives (position-based split); trailing record
    # padding is stripped
    df = spark.createDataFrame(
        [("WARC-Target-URI: http://a/\r\nWARC-Date: 2026-01-01T00:00:00Z"
          "\r\n\r\nHTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
          "line1\r\n\r\nline2\r\n\r\n",)], "value string")
    r = warc_records(df).collect()[0]
    assert bytes(r.html).decode() == "line1\r\n\r\nline2"


def test_warc_drops_preamble_and_non_response(spark):
    df = spark.createDataFrame(
        [("",), ("WARC-Type: warcinfo\r\n\r\nsoftware: x\r\n\r\n",)],
        "value string")
    assert warc_records(df.filter(F.length("value") > 0)).count() == 0


def test_read_warc_distributed_file_split(spark, tmp_path):
    """A multi-record .warc FILE (records joined by the WARC/1.0 marker)
    reads back record-exact through the text source's lineSep split —
    including when written as several files (the 100-TB layout)."""
    rows = _stream_df(spark, 20).collect()
    d = str(tmp_path / "warcs")
    os.makedirs(d)
    # two files, 10 records each, leading marker per record
    for f_i in range(2):
        with open(f"{d}/part-{f_i}.warc", "w", newline="") as fh:
            for r in rows[f_i * 10:(f_i + 1) * 10]:
                fh.write(RECORD_SEP + r.value + "\r\n\r\n")
    got = read_warc(spark, d).orderBy("url").collect()
    assert len(got) == 20
    assert [g.url for g in got] == sorted(
        f"http://w.test/p/{i}" for i in range(20))
    g0 = got[0]
    assert g0.status == 404 and "page 0" in g0.text


def test_warc_pages_feed_engine_crawl(spark):
    """read/parse output IS a pages table: url+html drive a link-chasing
    crawl end to end (the status/content_type columns are picked up by
    the engine's optional-column threading, covered by engine tests)."""
    from osmospark.frontier import FrontierEngine

    pages = warc_records(spark.range(4).select(make_warc_record(
        F.concat(F.lit("http://w.test/p/"), F.col("id").cast("string")),
        F.lit("2026-02-03T04:05:06Z"), F.lit("200"), F.lit("text/html"),
        F.concat(F.lit('<body><a href="/p/'),
                 ((F.col("id") + 1) % 4).cast("string"),
                 F.lit('">n</a></body>'))).alias("value")))
    eng = FrontierEngine(spark, pages, dedup=True)
    assert eng._has_src_status  # WARC status column was picked up
    rec, _ = eng.run_crawl(
        ["http://w.test/p/0"], "a", extract_spec={"next": "a@href"},
        max_depth=4, max_rounds=5)
    urls = sorted(r.url for r in rec.select("url").collect())
    assert urls == [f"http://w.test/p/{i}" for i in range(4)]


def test_url_predicate_filters_discovered_links(spark):
    """Asset/session links never enter the frontier: a page linking to
    a .jpg, a PHPSESSID URL and a normal page must only crawl the
    page; without the predicate all three fetch-join (the jpg/session
    urls simply miss the corpus)."""
    from osmospark.frontier import FrontierEngine
    from osmospark.urlnorm import default_url_predicate

    html = ('<body><a href="/img/x.jpg">i</a>'
            '<a href="/p?PHPSESSID=abc">s</a>'
            '<a href="/next">n</a></body>')
    pages = spark.createDataFrame(
        [("http://u.test/", html.encode(), "x"),
         ("http://u.test/next", b"<body>end</body>", "y"),
         ("http://u.test/img/x.jpg", b"binary-ish", "z")],
        "url string, html binary, text string")

    def crawl(pred):
        eng = FrontierEngine(spark, pages, dedup=True,
                             url_predicate=pred)
        rec, _ = eng.run_crawl(["http://u.test/"], "a",
                               extract_spec={"t": "body"},
                               max_depth=2, max_rounds=3)
        return sorted(r.url for r in rec.select("url").collect())

    assert crawl(default_url_predicate()) == [
        "http://u.test/", "http://u.test/next"]
    # without the filter the jpg IS fetched (it exists in the corpus)
    assert "http://u.test/img/x.jpg" in crawl(None)


def test_url_predicate_filters_seeds(spark):
    from osmospark.frontier import FrontierEngine
    from osmospark.urlnorm import default_url_predicate

    pages = spark.createDataFrame(
        [("http://u.test/a.pdf", b"<body>x</body>", "x"),
         ("http://u.test/ok", b"<body>y</body>", "y")],
        "url string, html binary, text string")
    eng = FrontierEngine(spark, pages, dedup=True,
                         url_predicate=default_url_predicate())
    rec, _ = eng.run_crawl(
        ["http://u.test/a.pdf", "http://u.test/ok"], "a",
        extract_spec={"t": "body"}, max_depth=0, max_rounds=1)
    assert [r.url for r in rec.select("url").collect()] == \
        ["http://u.test/ok"]
