"""Distributed redirect resolution for the crawl engine.

Reference semantics (reference index.js:226-231 "[redirect] from -> to",
lib/Request.js follow option, test/get.js:85-106 redirect + loop fixtures):
a fetch follows 3xx Location hops up to the ``follow`` limit (default 5),
the referer of the final hop is the redirecting URL, and when the limit is
exhausted while the response still redirects the fetch fails with needle's
"Max redirects reached. Possible loop in: <url>" — loops included. The
chain interpreter reproduces this per-fetch (osmospark/interpreter.py
``_fetch_with_redirects``); this module is the 10^10-URL-frontier analogue:

- the redirect EDGE set (3xx rows carrying a target) is a tiny fraction of
  a Common-Crawl-style corpus, so the hop closure is computed ONCE by
  ``max_hops`` bounded self-joins over that small edge table — the html
  corpus is never scanned or shuffled;
- frontier rows then resolve with ONE join per round against the closure
  (broadcast while it is small); URL-seen dedup keys the FINAL url, so two
  sources redirecting to the same target fetch it exactly once — the
  distributed strengthening of the reference's per-fetch loop.

Each closure iteration is one small join + localCheckpoint (flat lineage);
for follow=5 that is at most 4 extra joins once per crawl, independent of
corpus size. Pointer-doubling (final := final∘final) would cut the
iteration count to O(log h) — unnecessary at the reference's hop budgets,
noted here as the upgrade if a corpus ever carries deep redirect chains.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_MAX_HOPS = 5  # needle's default follow limit (reference lib/Request.js)

# closure row: one per redirect-source url
CLOSURE_COLS = ("url", "url_hash", "final_url", "final_hash", "final_host",
                "hops", "ok")


@F.pandas_udf("string")
def _resolve_canon(base: pd.Series, href: pd.Series) -> pd.Series:
    """Location-header resolution against the redirecting page (relative
    targets, scheme defaults) + canonicalization — Arrow-batched, and only
    ever applied to the small edge set, never the corpus."""
    from ..urlnorm import canonicalize, resolve
    return pd.Series(
        [canonicalize(resolve(b, h)) if h is not None else None
         for b, h in zip(base, href)])


@F.pandas_udf("string")
def _host_of(url: pd.Series) -> pd.Series:
    from ..urlnorm import url_host
    return pd.Series([url_host(u) if u is not None else None for u in url])


def redirect_edges(pages_df: DataFrame) -> DataFrame:
    """(src, src_hash, dst, dst_hash) for every redirect row: a page with a
    non-null ``redirect_to`` and — when the table carries a status column —
    a 3xx status (the reference follows Location only on 3xx). Column
    pruning reaches the scan: only url/redirect_to/status are read."""
    cond = F.col("redirect_to").isNotNull()
    scol = next((c for c in ("page_status", "status")
                 if c in pages_df.columns), None)
    if scol is not None:
        cond = cond & F.col(scol).cast("int").between(300, 399)
    return (pages_df.filter(cond)
            .select(F.col("url").alias("src"),
                    _resolve_canon("url", "redirect_to").alias("dst"))
            .withColumn("src_hash", F.xxhash64("src"))
            .withColumn("dst_hash", F.xxhash64("dst")))


def redirect_closure(pages_df: DataFrame,
                     max_hops: int = DEFAULT_MAX_HOPS) -> DataFrame:
    """Hop-closure over the redirect edges: for every redirect-source url,
    the url reached after following at most ``max_hops`` hops, the hop
    count, and ``ok`` = False when the terminal url is itself still a
    redirect source (the chain is longer than the limit, or a loop) —
    exactly the reference's max-redirects failure. Returns an eagerly
    checkpointed DataFrame with :data:`CLOSURE_COLS`."""
    edges = redirect_edges(pages_df).localCheckpoint(eager=True)
    hop = edges.select(F.col("src_hash").alias("_e_src"),
                       F.col("dst").alias("_e_dst"),
                       F.col("dst_hash").alias("_e_dst_hash"))
    cur = edges.select(
        F.col("src").alias("url"),
        F.col("src_hash").alias("url_hash"),
        F.col("dst").alias("final_url"),
        F.col("dst_hash").alias("final_hash"),
        F.lit(1).alias("hops"))
    deepest = 1
    for _ in range(max_hops - 1):
        cur = (cur.join(hop, cur["final_hash"] == hop["_e_src"], "left")
               .select("url", "url_hash",
                       F.coalesce("_e_dst", "final_url").alias("final_url"),
                       F.coalesce("_e_dst_hash", "final_hash")
                        .alias("final_hash"),
                       (F.col("hops")
                        + F.col("_e_dst").isNotNull().cast("int"))
                       .alias("hops"))
               .localCheckpoint(eager=True))
        # early exit when no chain advanced this hop (the common all-
        # single-hop corpus pays one extra tiny scan, not 3 more joins)
        new_deepest = cur.agg(F.max("hops")).first()[0]
        if new_deepest == deepest:
            break
        deepest = new_deepest
    srcs = edges.select(F.col("src_hash").alias("_r_src")).distinct()
    return (cur.join(srcs, cur["final_hash"] == srcs["_r_src"], "left")
            .select("url", "url_hash", "final_url", "final_hash",
                    F.col("hops").cast("int").alias("hops"),
                    F.col("_r_src").isNull().alias("ok"))
            .withColumn("final_host", _host_of("final_url"))
            .select(*CLOSURE_COLS)
            .localCheckpoint(eager=True))
