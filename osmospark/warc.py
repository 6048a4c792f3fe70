"""WARC ingestion — raw Common-Crawl-style WARC streams → the engine's
pages table (BASELINE.json input_hint shape: url, warc_ts, html, text,
lang plus the optional status/content_type columns FrontierEngine
threads into process_response).

Spark-first design: the record SPLIT is the text datasource's own
``lineSep`` (``"WARC/1.0\\r\\n"`` — Hadoop's line reader handles
delimiters spanning file-split boundaries, so a 1-TB WARC file fans out
over every executor with no driver parsing), and the record PARSE is
pure JVM expressions (locate/substring/regexp_extract — whole-stage
codegen, no Python). The reference consumes live HTTP (index.js
needle layer); a 100-TB batch crawl consumes its archived equivalent.

Body-safety: header/body splits are position-based on the FIRST
``\\r\\n\\r\\n`` (locate, not split-and-reassemble), so bodies containing
blank lines survive intact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

RECORD_SEP = "WARC/1.0\r\n"
_HDR_END = "\r\n\r\n"


def warc_records(raw: DataFrame, col: str = "value") -> DataFrame:
    """Parse WARC response records (one per row, WARC/1.0 marker already
    stripped) into (url, warc_ts, status, content_type, html, text).

    All built-in expressions: WARC headers end at the first blank line,
    HTTP headers at the next; ``WARC-Target-URI`` / ``WARC-Date`` come
    from the WARC block, status / Content-Type from the HTTP status
    line and headers. ``html`` is the raw body re-encoded UTF-8 binary;
    ``text`` is the tag-stripped whitespace-normalized convenience
    column (real extraction stays the selector UDF's job). Rows
    without a target URI (warcinfo/request records, stream preamble)
    are dropped.
    """
    c = F.col(col)
    p1 = F.locate(_HDR_END, c)
    warc_hdr = F.substring(c, 1, p1 - 1)
    rest = c.substr(p1 + 4, F.length(c))
    p2 = F.locate(_HDR_END, rest)
    http_hdr = F.substring(rest, 1, p2 - 1)
    # trailing \r\n\r\n separates records in a stream; strip one if present
    body = F.regexp_replace(rest.substr(p2 + 4, F.length(rest)),
                            r"(\r\n)+$", "")
    out = raw.select(
        F.regexp_extract(warc_hdr, r"WARC-Target-URI: (\S+)", 1)
        .alias("url"),
        F.to_timestamp(
            F.regexp_extract(warc_hdr, r"WARC-Date: (\S+)", 1),
            "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("warc_ts"),
        F.regexp_extract(http_hdr, r"^HTTP/1\.[01] ([0-9]{3})", 1)
        .cast("int").alias("status"),
        F.regexp_extract(http_hdr, r"Content-Type: ([^\r\n;]+)", 1)
        .alias("content_type"),
        F.encode(body, "UTF-8").alias("html"),
        F.trim(F.regexp_replace(
            F.regexp_replace(body, r"<[^>]*>", " "), r"\s+", " "))
        .alias("text"))
    return out.filter(F.col("url") != "")


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WARC file reader: text source with the record marker
    as ``lineSep`` (records never cross rows; file splits are handled
    by Hadoop's reader), preamble/empty rows filtered, then
    ``warc_records``."""
    raw = (spark.read.option("lineSep", RECORD_SEP).text(path)
           .filter(F.length("value") > 0))
    return warc_records(raw)


def make_warc_record(url_col, ts_col, status_col, ctype_col,
                     body_col):
    """Expression building one WARC response record string (inverse of
    ``warc_records`` — used by tests/oracles to synthesize streams)."""
    return F.concat(
        F.lit("WARC-Type: response\r\nWARC-Target-URI: "), url_col,
        F.lit("\r\nWARC-Date: "), ts_col,
        F.lit("\r\n\r\nHTTP/1.1 "), status_col,
        F.lit(" X\r\nContent-Type: "), ctype_col,
        F.lit("\r\n\r\n"), body_col)


def cdx_index(pages: DataFrame, url_col: str = "url",
              ts_col: str = "warc_ts", html_col: str = "html") -> DataFrame:
    """CDX(J)-style capture index over a page table: one row per capture
    with a SURT key, so the index of a 100-TB crawl range-partitions by
    domain and URL lookups / per-domain scans become partition-pruned
    range reads (the Common-Crawl index layout; reference crawls consume
    the live-HTTP equivalent via its needle layer, index.js).

    Columns:

    - ``surt``   — Sort-friendly URI Reordering Transform of the
      canonical URL: reversed host labels comma-joined, then ``)`` and
      the path?query (fragment stripped, scheme/port/userinfo dropped,
      host lowercased via the same ``host_expr`` the frontier joins on).
      ``http://News.Example.com:80/a/b?q=1#x`` →
      ``com,example,news)/a/b?q=1``.
    - ``ts``     — 14-digit CDX timestamp string of ``ts_col``.
    - ``url``    — the original capture URL (SURT is lossy).
    - ``digest`` — md5 hex of the UTF-8 body (content-identity column;
      two captures with equal digests are byte-dupes — the exact tier
      of the dedup chain).
    - ``nbytes`` — body octet length.

    Pure JVM expressions end-to-end (regexp/split/reverse/md5 — one
    map-only whole-stage-codegen pass, no Python, no shuffle); writing
    sorted-by-(surt, ts) is the caller's ``sortWithinPartitions`` after
    a range ``repartitionByRange("surt")``.
    """
    from .urlnorm import host_expr

    u = F.col(url_col)
    host = host_expr(u)
    # path?query after the authority, fragment stripped; bare-authority
    # URLs index as '/'
    no_frag = F.substring_index(u, "#", 1)
    pathq = F.regexp_extract(no_frag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+(.*)$", 1)
    # bare authority → '/', query-only ('http://h?q=1') → '/?q=1'
    pathq = (F.when(pathq == "", F.lit("/"))
             .when(pathq.startswith("?"), F.concat(F.lit("/"), pathq))
             .otherwise(pathq))
    surt = F.concat(F.array_join(F.reverse(F.split(host, r"\.")), ","),
                    F.lit(")"), pathq)
    body = F.col(html_col)
    body_bin = body.cast("binary")
    return pages.select(
        surt.alias("surt"),
        F.date_format(F.col(ts_col), "yyyyMMddHHmmss").alias("ts"),
        u.alias(url_col),
        F.md5(body_bin).alias("digest"),
        F.length(body_bin).cast("bigint").alias("nbytes"),
    )
