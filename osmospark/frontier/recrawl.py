"""Adaptive recrawl scheduling — when to fetch a URL AGAIN.

The reference crawls once per run (index.js:118-210 keeps an in-memory
per-run seen set); a continuous web-scale crawler must instead decide,
per URL, how soon content is likely to have changed. This module turns
fetch history (the engine's lineage/metrics output, or a Common-Crawl
index with its ``warc_ts`` column) into an integer change-rate estimate
and a recrawl priority the frontier's ``priority_df`` consumes.

``recrawl_priority``
    per URL over its fetch history: count REAL content transitions
    (hash != previous hash in fetch order — not distinct-hash counting,
    which misses A→B→A flips and undercounts), the observed span, and
    the staleness score ``expected changes since last fetch`` =
    change_rate_ppm · age_s // 1e6. The linear rate estimator
    (changes / span) is the integer-exact form of the Cho &
    Garcia-Molina (2003) Poisson-rate estimator's numerator; the
    log-form correction needs floats and changes no ordering at small
    change counts.

Scale shape: ONE shuffle on the url key — a per-url window (lag in
fetch order) whose HashPartitioning(url) the following groupBy(url)
reuses, so Catalyst plans exactly one Exchange; per-url history is
small (tens of fetches), so no skew. Everything downstream is
projections.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def recrawl_priority(history: DataFrame, now_s: int,
                     rate_scale: int = 1_000_000) -> DataFrame:
    """Fetch history (url, fetch_ts_s:bigint, content_hash:string) →
    per-url recrawl scores.

    Output (url, n_fetches, n_changes, span_s, age_s, change_rate_ppm,
    recrawl_score), score desc / url asc. ``now_s`` must be ≥ every
    fetch_ts_s (all operands stay non-negative so Spark ``div`` and
    DuckDB ``//`` agree). Single-fetch URLs get span 1 s (max rate if
    they changed — they can't have, so rate 0) — the cold-start rule.
    """
    w = Window.partitionBy("url").orderBy("fetch_ts_s", "content_hash")
    marked = history.select(
        "url", F.col("fetch_ts_s").cast("bigint").alias("fetch_ts_s"),
        F.when(F.lag("content_hash").over(w).isNull(), 0)
        .when(F.col("content_hash") == F.lag("content_hash").over(w), 0)
        .otherwise(1).alias("changed"))
    agg = marked.groupBy("url").agg(
        F.count("*").cast("bigint").alias("n_fetches"),
        F.sum("changed").cast("bigint").alias("n_changes"),
        F.min("fetch_ts_s").alias("first_s"),
        F.max("fetch_ts_s").alias("last_s"))
    span = F.greatest(F.col("last_s") - F.col("first_s"), F.lit(1))
    rate = F.expr(
        f"(n_changes * {rate_scale}) div greatest(last_s - first_s, 1)")
    age = (F.lit(now_s) - F.col("last_s")).cast("bigint")
    return (agg.select(
        "url", "n_fetches", "n_changes",
        span.cast("bigint").alias("span_s"),
        age.alias("age_s"),
        rate.cast("bigint").alias("change_rate_ppm"),
        F.expr(f"((n_changes * {rate_scale}) div "
               f"greatest(last_s - first_s, 1) * ({now_s} - last_s)) "
               f"div {rate_scale}")
        .cast("bigint").alias("recrawl_score"))
        .orderBy(F.col("recrawl_score").desc(), F.col("url").asc()))
