"""Per-host politeness: robots rules + crawl-delay fetch budgets.

The reference throttles with a concurrency window of 5 in-flight requests
(reference index.js:93, :245-270) and an optional per-item ``delay``
(reference lib/commands/delay.js:13-38). In a batch-iterative engine those
become per-round admission control (north rule: "per-host politeness window
(robots.txt rules + crawl-delay budget)"):

- ``robots`` table: (host, allow/disallow path prefixes, crawl_delay_s);
- per round of nominal duration T, a host gets
  ``slots = max(1, min(concurrency, T / crawl_delay))`` fetch slots;
- admission = ``row_number() OVER (PARTITION BY host ORDER BY priority) <=
  slots`` — a ranking window as the concurrency gate (SURVEY §2.6);
- disallowed URLs are dropped with a metrics row, never fetched.

Robots parsing follows RFC 9309 (Robots Exclusion Protocol): user-agent
group selection (most-specific product token, else ``*``; same-agent
groups merge), ``Allow``/``Disallow`` patterns with ``*`` wildcards and a
``$`` end anchor, longest-PATTERN-wins precedence with Allow winning
length ties, and ``Crawl-delay`` (a de-facto extension the north rule
names). Rules compile to Java-compatible regexes so the frontier filter
evaluates them JVM-side (engine ``_apply_robots``); parsing/compiling for
millions of hosts runs distributed via ``compile_robots``.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_CONCURRENCY = 5      # reference index.js:93
DEFAULT_ROUND_SECONDS = 60.0

# engine._apply_robots expects this rules shape on the robots table
RULES_TYPE = "array<struct<rx: string, allow: boolean, len: int>>"


def parse_robots(text: str, agent: str = "*") -> dict:
    """Parse a robots.txt body → {'disallow': [...], 'allow': [...],
    'crawl_delay': float|None} for the RFC 9309 group matching ``agent``:
    the group whose user-agent token is the longest case-insensitive
    substring-prefix of ``agent`` wins; absent any match, the ``*`` group
    applies; multiple groups for the same token merge."""
    groups: dict[str, dict] = {}
    cur: list[str] = []
    in_agents = False  # consecutive User-agent lines share one group
    for line in (text or "").splitlines():
        line = line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            tok = val.lower()
            if not in_agents:
                cur = []
            in_agents = True
            cur.append(tok)
            for t in (tok,):
                groups.setdefault(
                    t, {"disallow": [], "allow": [], "crawl_delay": None})
        else:
            in_agents = False
            for t in cur:
                g = groups.get(t)
                if g is None:
                    continue
                if key == "disallow" and val:
                    g["disallow"].append(val)
                elif key == "allow" and val:
                    g["allow"].append(val)
                elif key == "crawl-delay":
                    try:
                        g["crawl_delay"] = float(val)
                    except ValueError:
                        pass
    agent = agent.lower()
    best = None
    if agent != "*":
        for tok in groups:
            if tok != "*" and tok in agent and (
                    best is None or len(tok) > len(best)):
                best = tok
    if best is None and "*" in groups:
        best = "*"
    if best is None:
        return {"disallow": [], "allow": [], "crawl_delay": None}
    return groups[best]


def pattern_rx(p: str) -> str:
    """RFC 9309 path pattern → anchored regex: ``*`` matches any
    sequence, a trailing ``$`` anchors the end, everything else is
    literal. Emits only constructs shared by java.util.regex and Python
    ``re`` so the same string runs JVM-side and in the simulator."""
    anchored = p.endswith("$")
    if anchored:
        p = p[:-1]
    rx = "^" + ".*".join(re.escape(seg) for seg in p.split("*"))
    return rx + "$" if anchored else rx


def compile_rules(rules: dict) -> list[tuple[str, bool, int]]:
    """Parsed group → [(regex, is_allow, specificity)]; specificity is
    the raw pattern length (RFC 9309 'most specific = longest')."""
    out = []
    for allow, key in ((False, "disallow"), (True, "allow")):
        for p in rules.get(key, ()):
            out.append((pattern_rx(p), allow, len(p)))
    return out


def is_allowed(path: str, rules: dict | list) -> bool:
    """RFC 9309 verdict for one path: among matching rules the longest
    pattern wins, Allow winning exact length ties; no match → allowed.
    ``rules`` is a parsed group dict or a precompiled rule list."""
    compiled = rules if isinstance(rules, list) else compile_rules(rules)
    best = (-1, True)
    for rx, allow, ln in compiled:
        if re.match(rx, path or "") and (ln, allow) > best:
            best = (ln, allow)
    return best[1]


def compile_robots(robots_texts: DataFrame, agent: str = "*") -> DataFrame:
    """(host, robots_txt) → (host, rules, crawl_delay): the robots table
    the engine broadcasts. Parsing + regex compilation run in an
    Arrow-batched UDF, so a million-host robots corpus never funnels
    through the driver."""

    @F.pandas_udf(f"struct<rules: {RULES_TYPE}, crawl_delay: double>")
    def _compile(texts: pd.Series) -> pd.DataFrame:
        rows = []
        for t in texts:
            g = parse_robots(t, agent=agent)
            rows.append({
                "rules": [{"rx": rx, "allow": a, "len": ln}
                          for rx, a, ln in compile_rules(g)],
                "crawl_delay": g["crawl_delay"],
            })
        return pd.DataFrame(rows)

    return (robots_texts
            .withColumn("_c", _compile(F.col("robots_txt")))
            .select("host", F.col("_c.rules").alias("rules"),
                    F.col("_c.crawl_delay").alias("crawl_delay")))


def host_slots(crawl_delay: float | None,
               concurrency: int = DEFAULT_CONCURRENCY,
               round_seconds: float = DEFAULT_ROUND_SECONDS) -> int:
    """Fetch slots a host gets this round."""
    if not crawl_delay or crawl_delay <= 0:
        return concurrency
    return max(1, min(concurrency * 100, int(round_seconds / crawl_delay)))


def robots_sitemaps(robots_texts: DataFrame) -> DataFrame:
    """Mine ``Sitemap:`` directives from a robots corpus — the discovery
    hand-off into ``osmospark.sitemap.resolve_sitemaps``. RFC 9309 §2.3:
    the directive is agent-group-INDEPENDENT (valid anywhere in the
    file, any number of times) and case-insensitive in the field name.

    Map-only JVM regexp over (host, robots_txt): one row per directive,
    order preserved per host via the match ordinal. No Python.
    """
    ms = F.regexp_extract_all(
        F.col("robots_txt"),
        F.lit(r"(?im)^[ \t]*sitemap:[ \t]*(\S+)"), F.lit(1))
    return (robots_texts
            .select("host", F.posexplode(ms).alias("ordinal", "sitemap"))
            .select("host", F.col("ordinal").cast("bigint").alias("ordinal"),
                    "sitemap")
            .orderBy("host", "ordinal"))


def adaptive_delay(fetch_log: DataFrame, base_delay_ms: int = 100,
                   mult_permille: int = 1500,
                   max_delay_ms: int = 10_000,
                   pctl: int = 95) -> DataFrame:
    """Latency-adaptive per-host crawl delay — the politeness feedback
    loop production crawlers run on top of robots' static Crawl-delay
    (e.g. Heritrix's delay-factor: wait k × recent response time, so a
    struggling server automatically sheds crawler load): per host,
    take the ``pctl``-th latency percentile from the fetch log and set
    ``delay_ms = clamp(base, p·mult‰, max)``. Input: (host,
    latency_ms) observations. Output: (host, n_fetches, p_ms,
    delay_ms), all bigint, ordered.

    Scale shape: the exact-percentile discipline of score_deciles
    applied per host — ONE (host, latency) histogram aggregation
    (map-side partials; cardinality ≤ hosts × distinct-latencies, and
    latencies are ms integers so that's bounded), CDF windows over
    the histogram only, then a host-keyed min-conditional aggregate.
    A mega-host's million fetches collapse to its distinct latency
    values before any window sees them; the log itself never sorts.
    """
    from pyspark.sql import Window

    lat = F.col("latency_ms").cast("bigint")
    hist = (fetch_log.select("host", lat.alias("latency_ms"))
            .groupBy("host", "latency_ms")
            .agg(F.count("*").alias("_n")))
    w = (Window.partitionBy("host").orderBy("latency_ms")
         .rowsBetween(Window.unboundedPreceding, 0))
    cdf = hist.select(
        "host", "latency_ms",
        F.sum("_n").over(w).alias("_cum"),
        F.sum("_n").over(Window.partitionBy("host")).alias("_tot"))
    agg = (cdf.groupBy("host")
           .agg(F.max("_tot").alias("n_fetches"),
                F.min(F.when(F.col("_cum") * 100 >= F.col("_tot") * pctl,
                             F.col("latency_ms"))).alias("p_ms")))
    return (agg.select(
        "host", F.col("n_fetches").cast("bigint").alias("n_fetches"),
        F.col("p_ms").cast("bigint").alias("p_ms"),
        F.greatest(F.lit(base_delay_ms).cast("bigint"),
                   F.least(F.lit(max_delay_ms).cast("bigint"),
                           F.expr(f"(p_ms * {mult_permille}) div 1000")))
        .cast("bigint").alias("delay_ms"))
        .orderBy("host"))
