"""RSS/Atom feed ingestion — the third URL-discovery side channel
(robots.txt ``Sitemap:`` lines → frontier/politeness, sitemap XML →
osmospark/sitemap.py, and syndication feeds → this module; pages
advertise their feeds via ``<link rel="alternate">`` autodiscovery).

Like the sitemap module, ALL parsing is JVM expressions (regexp over
the XML — RSS 2.0 ``<item>`` and Atom ``<entry>`` blocks are regular
enough that conformant feeds need no DOM), so a 10^6-feed corpus
parses as a map-only stage with no Python in the path.

``feed_entries``
    feed documents → one row per item/entry: kind ('rss'|'atom'),
    loc (the item link), title, entry_id (guid / id), published
    (RFC 822 pubDate or ISO 8601 updated, parsed to a naive
    timestamp).

``discover_feeds``
    HTML pages → advertised feed URLs: every ``<link>`` tag whose
    rel is ``alternate`` and whose type mentions rss/atom, with
    attribute order free (the tag array is filtered JVM-side).

Feeding the engine: feed locs are seed/frontier candidates exactly
like sitemap locs; ``published`` vs the fetch log's last-fetch time is
the same freshness signal ``frontier.recrawl`` scores.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# (?s): item/entry bodies span lines
_ITEM_BLOCK = "(?s)<item>(.*?)</item>"
_ENTRY_BLOCK = "(?s)<entry>(.*?)</entry>"
_LINK_TAG = "(?i)<link\\b[^>]*>"


def _field(block, tag: str):
    # whitespace-trim (regexp — F.trim strips SPACES only): pretty-
    # printed feeds pad values with newline+indent, and an untrimmed
    # <link> would become a distinct bogus frontier URL
    return F.regexp_replace(
        F.regexp_extract(block, f"(?s)<{tag}>([^<]*)</{tag}>", 1),
        r"^\s+|\s+$", "")


def feed_entries(raw: DataFrame, col: str = "xml",
                 url_col: str = "url") -> DataFrame:
    """Parse a feed corpus into one row per item/entry.

    RSS items carry ``<link>text</link>`` + RFC 822 ``<pubDate>`` +
    ``<guid>``; Atom entries carry ``<link href="..."/>`` + ISO 8601
    ``<updated>`` + ``<id>``. Entries without a link are dropped
    (mirrors sitemap_entries' loc filter). Timezone designators are
    stripped before parsing — feed timestamps become naive, matching
    the engine's integer-second fetch-log convention.
    """
    kind = F.when(F.col(col).rlike("(?s)<feed[\\s>]"), F.lit("atom")) \
        .otherwise(F.lit("rss"))
    is_atom = F.col("kind") == "atom"
    blocks = F.when(
        kind == "atom",
        F.regexp_extract_all(F.col(col), F.lit(_ENTRY_BLOCK), F.lit(1))
    ).otherwise(
        F.regexp_extract_all(F.col(col), F.lit(_ITEM_BLOCK), F.lit(1)))
    ex = (raw.select(F.col(url_col).alias("feed_url"), kind.alias("kind"),
                     F.explode(blocks).alias("b")))
    blk = F.col("b")
    loc = F.when(is_atom, F.regexp_extract(
        blk, '(?s)<link[^>]*href="([^"]*)"', 1)) \
        .otherwise(_field(blk, "link"))
    raw_ts = F.when(is_atom, _field(blk, "updated")) \
        .otherwise(_field(blk, "pubDate"))
    # try_to_timestamp: an item with a MISSING or malformed date must
    # yield published=NULL, not abort the whole query (ANSI
    # to_timestamp throws on ''— any feed omitting pubDate killed the
    # ingestion job)
    published = F.when(
        is_atom,
        F.try_to_timestamp(F.regexp_replace(raw_ts, "Z$", ""),
                           F.lit("yyyy-MM-dd'T'HH:mm:ss"))
    ).otherwise(
        # weekday name + tz designator stripped first: Spark 3+'s
        # parser refuses day-of-week text fields, and the weekday is
        # redundant in RFC 822 dates anyway
        F.try_to_timestamp(
            F.regexp_replace(
                F.regexp_replace(raw_ts, "^[A-Za-z]{3}, ", ""),
                " (GMT|UT|[+-]\\d{4})$", ""),
            F.lit("dd MMM yyyy HH:mm:ss")))
    entry_id = F.when(is_atom, _field(blk, "id")) \
        .otherwise(_field(blk, "guid"))
    return (ex.select(
        "feed_url", "kind", loc.alias("loc"),
        F.nullif(_field(blk, "title"), F.lit("")).alias("title"),
        F.nullif(entry_id, F.lit("")).alias("entry_id"),
        published.alias("published"))
        .filter(F.col("loc") != ""))


def discover_feeds(pages: DataFrame, html_col: str = "html",
                   url_col: str = "url") -> DataFrame:
    """Feed autodiscovery over an HTML page corpus: (page_url,
    feed_href, feed_type) for every ``<link rel="alternate">`` whose
    type mentions rss or atom — attribute order free, map-only."""
    tags = F.regexp_extract_all(F.col(html_col), F.lit(_LINK_TAG),
                                F.lit(0))
    wanted = F.filter(tags, lambda t: t.rlike(
        '(?i)rel="alternate"') & t.rlike('(?i)type="[^"]*(rss|atom)'))
    ex = (pages.select(F.col(url_col).alias("page_url"),
                       F.explode(wanted).alias("t")))
    return (ex.select(
        "page_url",
        F.regexp_extract("t", '(?i)href="([^"]*)"', 1).alias("feed_href"),
        F.lower(F.regexp_extract("t", '(?i)type="([^"]*)"', 1))
        .alias("feed_type"))
        .filter(F.col("feed_href") != ""))
