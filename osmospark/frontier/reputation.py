"""Per-host reputation from fetch outcomes — the feedback half of the
frontier's priority queue (reference index.js:118-210 logs per-request
status/size outcomes; here those outcomes are AGGREGATED and fed back
into admission, the scheduler input the north rule's "priority queue"
consumes alongside ``linkgraph.link_rank``).

Two stages, both integer-exact so a SQL oracle reproduces them bit-for-bit:

``host_reputation``
    one ``groupBy(host)`` over the fetch log → per-host counts by status
    class, average body size, and a per-mille reputation score. The log
    is the big side and shuffles ONCE on the host key with map-side
    partial aggregation (counts/sums); output is hosts-sized (tiny).

``reputation_priority``
    joins host scores back onto candidate URLs as the engine's
    ``priority_df`` (url_hash, priority). The host table is broadcast
    (hosts ≪ URLs by 3-6 orders of magnitude at crawl scale), so the
    candidate side never shuffles.

``trap_detect``
    crawler-trap detection: a host whose URLs collapse onto very few
    path *templates* (digit runs → ``N``) is a calendar/session-id trap
    spider-trapping the frontier. One ``groupBy(host)`` over distinct
    (host, url, template) triples; flags hosts where
    ``templates·1000 // urls`` falls below a threshold at sufficient
    URL volume. The template projection is a JVM regexp (map-only);
    the distinct and the group-by shuffle only (host, template) pairs.

Hot-domain skew: both aggregations key on ``host`` — the same key the
engine salts for politeness; counts/sums partial-aggregate map-side, so
even a 10^8-URL host contributes one partial row per input partition,
not a hot reduce task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# score weights (per-mille space): reward success, punish server errors
# harder than client errors — a 5xx host is wasting fetch slots *now*,
# a 4xx host mostly has dead links.
OK_WEIGHT = 2
ERR4_WEIGHT = 1
ERR5_WEIGHT = 3


def host_reputation(fetch_log: DataFrame) -> DataFrame:
    """Aggregate a fetch log (host, status, nbytes) into per-host stats.

    Output (host, fetched, ok, err4, err5, bytes_avg, score) where
    score = OK_WEIGHT·ok‰ − ERR4_WEIGHT·err4‰ − ERR5_WEIGHT·err5‰,
    all bigint (per-mille rates use truncating div, every operand
    non-negative, so Spark ``div`` and DuckDB ``//`` agree bit-exactly).
    Ordered by score desc, host asc for stable cross-engine comparison.
    """
    cls = lambda lo, hi: F.sum(  # noqa: E731
        F.when(F.col("status").between(lo, hi), 1).otherwise(0))
    agg = fetch_log.groupBy("host").agg(
        F.count("*").alias("fetched"),
        cls(200, 299).alias("ok"),
        cls(400, 499).alias("err4"),
        cls(500, 599).alias("err5"),
        F.sum(F.col("nbytes").cast("bigint")).alias("nbytes_sum"))
    permille = lambda c: F.expr(f"({c} * 1000) div fetched")  # noqa: E731
    return (agg.select(
        "host",
        F.col("fetched").cast("bigint").alias("fetched"),
        F.col("ok").cast("bigint").alias("ok"),
        F.col("err4").cast("bigint").alias("err4"),
        F.col("err5").cast("bigint").alias("err5"),
        F.expr("nbytes_sum div fetched").cast("bigint").alias("bytes_avg"),
        (F.lit(OK_WEIGHT) * permille("ok")
         - F.lit(ERR4_WEIGHT) * permille("err4")
         - F.lit(ERR5_WEIGHT) * permille("err5"))
        .cast("bigint").alias("score"))
        .orderBy(F.col("score").desc(), F.col("host").asc()))


def reputation_priority(candidates: DataFrame,
                        host_scores: DataFrame) -> DataFrame:
    """(url, host) candidates × host scores → engine ``priority_df``.

    Broadcast-joins the hosts-sized score table onto the candidate URLs
    (the big side never moves) and keys by the engine's url_hash
    convention (xxhash64 of the already-canonical url string,
    engine.py:151). Hosts with no history get NULL priority — the
    engine sorts those last, preserving DFS order among them
    (engine.py:536 desc_nulls_last).
    """
    return candidates.join(
        F.broadcast(host_scores.select("host", "score")), "host", "left"
    ).select(F.xxhash64("url").alias("url_hash"),
             F.col("score").cast("bigint").alias("priority"))


def trap_detect(urls: DataFrame, min_urls: int = 20,
                max_template_permille: int = 200) -> DataFrame:
    """Flag crawler-trap hosts by path-template collapse.

    Input (host, url). A template is the URL with every digit run
    replaced by ``N`` — calendar pages, session ids, offset paginators
    all collapse. Output per host: distinct url count, distinct
    template count, ``ratio_permille = templates·1000 // urls``, and
    ``is_trap`` = (urls ≥ min_urls AND ratio below threshold). Ordered
    by host. The regexp is shared Java-regex/RE2 syntax (``[0-9]+``)
    so the DuckDB oracle applies the identical projection.
    """
    t = urls.select(
        "host", "url",
        F.regexp_replace(F.col("url"), "[0-9]+", "N").alias("template")
    ).distinct()
    agg = t.groupBy("host").agg(
        F.count_distinct("url").alias("urls"),
        F.count_distinct("template").alias("templates"))
    return (agg.select(
        "host", F.col("urls").cast("bigint").alias("urls"),
        F.col("templates").cast("bigint").alias("templates"),
        F.expr("(templates * 1000) div urls").cast("bigint")
        .alias("ratio_permille"),
        ((F.col("urls") >= min_urls)
         & (F.expr("(templates * 1000) div urls")
            < max_template_permille)).alias("is_trap"))
        .orderBy("host"))


def mirror_hosts(pages: DataFrame, min_shared: int = 2,
                 max_fp_hosts: int = 256) -> DataFrame:
    """Detect mirrored hosts by shared content fingerprints — the
    crawl-budget signal that stops a scheduler fetching the same site
    N times under N domains (CDN vanity domains, scraper mirrors,
    www/apex splits that survived URL canonicalization).

    Input (host, fp): one row per page, ``fp`` a content fingerprint
    (e.g. ``textstats.fingerprints``' doc hash — content-based, so
    mirrors match even when markup templates differ). Output: host
    pairs (host_a < host_b) sharing ≥ ``min_shared`` distinct
    fingerprints, with each host's distinct-fp count and
    ``overlap_permille = n_shared·1000 div least(n_a, n_b)`` —
    containment of the smaller host, so a full mirror scores 1000 even
    when one side carries extra pages.

    Skew cap, same discipline as the dedup band joins: a fingerprint
    present on more than ``max_fp_hosts`` hosts (empty pages, soft-404
    boilerplate) would contribute O(hosts²) pair rows; those fps are
    dropped from PAIRING via a broadcast LEFT ANTI whose build side is
    the keys-only sizing aggregate (they still count toward per-host
    sizes), and the drop is WARNed, never silent. Scale shape: one
    distinct over (host, fp), a fp-keyed self-join bounded by the cap,
    and hosts-sized aggregates broadcast back — the page corpus itself
    never moves (fingerprints are computed upstream, map-only).
    """
    import logging
    log = logging.getLogger("osmospark.reputation")

    hf = pages.select("host", "fp").distinct().persist()
    hot = (hf.groupBy("fp").count()
           .filter(F.col("count") > max_fp_hosts)
           .select("fp").persist())
    joinable = hf.join(F.broadcast(hot), "fp", "left_anti")
    a, b = joinable.alias("a"), joinable.alias("b")
    pairs = (a.join(b, (F.col("a.fp") == F.col("b.fp"))
                    & (F.col("a.host") < F.col("b.host")))
             .groupBy(F.col("a.host").alias("host_a"),
                      F.col("b.host").alias("host_b"))
             .agg(F.count("*").cast("bigint").alias("n_shared"))
             .filter(F.col("n_shared") >= min_shared))
    hc = hf.groupBy("host").agg(F.count("*").cast("bigint").alias("n"))
    out = (pairs
           .join(F.broadcast(hc.select(F.col("host").alias("host_a"),
                                       F.col("n").alias("n_a"))), "host_a")
           .join(F.broadcast(hc.select(F.col("host").alias("host_b"),
                                       F.col("n").alias("n_b"))), "host_b")
           .select("host_a", "host_b", "n_shared", "n_a", "n_b",
                   F.expr("(n_shared * 1000) div least(n_a, n_b)")
                   .cast("bigint").alias("overlap_permille"))
           .orderBy("host_a", "host_b"))
    # materialize so the persisted frames can be released immediately
    # (same convention as dedup._banded_pairs); output is pairs-sized
    out = out.localCheckpoint(eager=True)
    n_hot = hot.count()
    if n_hot:
        log.warning(
            "mirror_hosts: %d fingerprints on more than %d hosts excluded "
            "from pairing (boilerplate; still counted in host sizes)",
            n_hot, max_fp_hosts)
    hot.unpersist()
    hf.unpersist()
    return out


def allocate_budget(host_weights: DataFrame, total_slots: int) -> DataFrame:
    """Apportion a fixed per-round fetch budget across hosts by integer
    weight — Hamilton's largest-remainder method, so the allocation is
    all-integer, sums EXACTLY to ``total_slots``, and a SQL oracle
    reproduces it bit-for-bit.

    Input (host, weight:bigint >= 0), e.g. ``host_reputation`` scores
    shifted non-negative. base_i = (total*w_i) div W; the leftover
    slots (= sum of remainders / W, always < n_hosts) go to the largest
    remainders, ties -> host asc. An all-zero weight table falls back
    to uniform weight 1 (round-robin), keeping the exact-sum guarantee.

    Scale note: the ranking window is a single global sort over the
    HOSTS table — which is tiny by definition (10^6-ish hosts vs
    10^10 URLs); the per-URL side never enters this job. W is a
    broadcast scalar.
    """
    from pyspark.sql import Window

    tot = host_weights.agg(
        F.sum("weight").cast("bigint").alias("w_raw"),
        F.count("*").cast("bigint").alias("n_hosts"))
    scored = host_weights.crossJoin(F.broadcast(tot)).select(
        "host", F.col("weight").cast("bigint").alias("weight"),
        F.expr("CASE WHEN w_raw = 0 THEN 1 ELSE weight END").alias("w"),
        F.expr("CASE WHEN w_raw = 0 THEN n_hosts ELSE w_raw END")
        .alias("w_sum")
    ).select(
        "host", "weight",
        F.expr(f"({total_slots} * w) div w_sum").alias("base"),
        F.expr(f"({total_slots} * w) % w_sum").alias("rem"))
    leftover = F.lit(total_slots) - F.sum("base").over(Window.partitionBy())
    rank = F.row_number().over(
        Window.partitionBy().orderBy(F.col("rem").desc(),
                                     F.col("host").asc()))
    return (scored
            .withColumn("extra", (rank <= leftover).cast("bigint"))
            .select("host", "weight",
                    (F.col("base") + F.col("extra")).cast("bigint")
                    .alias("slots"))
            .orderBy("host"))
