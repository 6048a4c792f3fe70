"""Sitemap ingestion — the crawler's URL-discovery side channel
(sitemaps.org protocol; robots.txt advertises them via ``Sitemap:``
lines, which frontier/politeness.compile_robots consumes as rules and
this module mines for discovery).

All parsing is JVM expressions (regexp over the XML — the sitemap
protocol's elements are regular enough that a conformant urlset needs
no DOM), so a 10^6-sitemap corpus parses as a map-only stage:

``sitemap_entries``
    urlset documents → one row per ``<url>`` entry: loc, lastmod
    (DATE), changefreq, priority in exact milli-units (the protocol's
    0.0-1.0 decimal — parsed via DECIMAL(4,3), never float).

``sitemap_index_entries``
    sitemapindex documents → their child sitemap locs.

``resolve_sitemaps``
    bounded-depth index resolution: per hop, one equi-join of the
    current index frontier against the sitemap corpus on url (the
    corpus side is the big one and shuffles on its natural key; hop
    frontiers are index-sized). Emits every urlset entry reachable
    from the seed sitemaps with its ROOT sitemap for lineage.

Feeding the engine: ``<lastmod>`` vs the fetch log's last-fetch
timestamp is exactly the signal ``frontier.recrawl`` scores, and
``priority`` maps onto ``priority_df`` milli-units.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# (?s): entry blocks span lines — virtually every real sitemap is
# pretty-printed, and without DOTALL a multi-line <url> block never
# matches (the whole document parses to ZERO entries, silently)
_URL_BLOCK = "(?s)<url>(.*?)</url>"
_SM_BLOCK = "(?s)<sitemap>(.*?)</sitemap>"


def _field(block, tag: str):
    # whitespace-trim (regexp — F.trim strips SPACES only, not the
    # newline+indent pretty-printed sitemaps put around values like
    # "<loc>\n  http://… \n</loc>"); untrimmed locs would become
    # distinct bogus frontier URLs (consumers trim per sitemaps.org)
    return F.regexp_replace(
        F.regexp_extract(block, f"<{tag}>([^<]*)</{tag}>", 1),
        r"^\s+|\s+$", "")


def sitemap_entries(raw: DataFrame, col: str = "xml",
                    url_col: str = "url") -> DataFrame:
    """Parse urlset sitemaps: (sitemap_url, loc, lastmod, changefreq,
    priority_milli), dropping entries without a ``<loc>``."""
    b = F.explode(
        F.regexp_extract_all(F.col(col), F.lit(_URL_BLOCK), F.lit(1))
    ).alias("b")
    ex = raw.select(F.col(url_col).alias("sitemap_url"), b)
    blk = F.col("b")
    return (ex.select(
        "sitemap_url",
        _field(blk, "loc").alias("loc"),
        # lastmod may be a date OR a full W3C datetime (both allowed
        # by the protocol): parse the 10-char date prefix, and a
        # malformed value yields NULL instead of an ANSI parse abort
        F.try_to_date(F.nullif(
            F.substring(_field(blk, "lastmod"), 1, 10), F.lit("")),
            "yyyy-MM-dd").alias("lastmod"),
        F.nullif(_field(blk, "changefreq"), F.lit("")).alias("changefreq"),
        # try_cast: a non-numeric priority yields NULL, not an abort
        (F.nullif(_field(blk, "priority"), F.lit(""))
         .try_cast("decimal(4,3)") * 1000).try_cast("bigint")
        .alias("priority_milli"))
        .filter(F.col("loc") != ""))


def sitemap_index_entries(raw: DataFrame, col: str = "xml",
                          url_col: str = "url") -> DataFrame:
    """Parse sitemapindex documents: (sitemap_url, child_loc) rows."""
    b = F.explode(
        F.regexp_extract_all(F.col(col), F.lit(_SM_BLOCK), F.lit(1))
    ).alias("b")
    return (raw.select(F.col(url_col).alias("sitemap_url"), b)
            .select("sitemap_url",
                    _field(F.col("b"), "loc").alias("child_loc"))
            .filter(F.col("child_loc") != ""))


def resolve_sitemaps(sitemaps: DataFrame, seeds: list[str],
                     max_depth: int = 2) -> DataFrame:
    """Resolve seed sitemap URLs through index hops into urlset entries.

    ``sitemaps``: the fetched sitemap corpus (url, xml). Per hop the
    frontier of (root, url) pairs equi-joins the corpus; urlset entries
    emit, index children become the next hop (depth-capped — the
    protocol allows one level of nesting, the cap guards loops).
    Output: sitemap_entries columns plus ``root`` (the seed sitemap the
    entry was reached from), ordered by (root, loc).
    """
    spark = sitemaps.sparkSession
    frontier = spark.createDataFrame(
        [(s, s) for s in seeds], "root string, url string")
    out = None
    for _ in range(max_depth + 1):
        hop = frontier.join(sitemaps, "url")
        entries = sitemap_entries(hop, col="xml", url_col="url") \
            .join(hop.select(F.col("url").alias("sitemap_url"), "root"),
                  "sitemap_url")
        out = entries if out is None else out.unionByName(entries)
        nxt = (sitemap_index_entries(hop, col="xml", url_col="url")
               .join(hop.select(F.col("url").alias("sitemap_url"),
                                "root"), "sitemap_url")
               .select("root", F.col("child_loc").alias("url"))
               .distinct())
        frontier = nxt
    return (out.select("root", "sitemap_url", "loc", "lastmod",
                       "changefreq", "priority_milli")
            .distinct()
            .orderBy("root", "loc"))
