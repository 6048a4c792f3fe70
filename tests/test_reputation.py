"""Per-host reputation + crawler-trap detection (frontier/reputation.py).

Unit tests on planted data (hand-computed scores / templates) plus the
engine-integration test: reputation_priority's output drives FrontierEngine
admission exactly like link_rank's priority_df (the reference's per-request
status/size log, index.js:118-210, fed back into scheduling).
"""

from pyspark.sql import functions as F

from osmospark.frontier.reputation import (
    host_reputation, reputation_priority, trap_detect)


def _log(spark, rows):
    return spark.createDataFrame(rows, "host string, status int, nbytes long")


def test_host_reputation_hand_computed(spark):
    # hostA: 3 ok, 1 err4  -> ok 750‰, err4 250‰: 2*750 - 1*250 = 1250
    # hostB: 1 ok, 1 err5  -> 2*500 - 3*500 = -500
    rows = [("hostA", 200, 100), ("hostA", 201, 200), ("hostA", 299, 300),
            ("hostA", 404, 50), ("hostB", 200, 10), ("hostB", 500, 30)]
    out = host_reputation(_log(spark, rows)).collect()
    assert [r.host for r in out] == ["hostA", "hostB"]  # score desc
    a, b = out
    assert (a.fetched, a.ok, a.err4, a.err5) == (4, 3, 1, 0)
    assert a.bytes_avg == 650 // 4 and a.score == 1250
    assert (b.fetched, b.ok, b.err5) == (2, 1, 1)
    assert b.bytes_avg == 20 and b.score == -500


def test_host_reputation_ignores_unclassified_statuses(spark):
    # 3xx counts toward fetched + bytes but none of the rate classes
    rows = [("h", 301, 100), ("h", 200, 300)]
    r = host_reputation(_log(spark, rows)).collect()[0]
    assert (r.fetched, r.ok, r.err4, r.err5) == (2, 1, 0, 0)
    assert r.bytes_avg == 200 and r.score == 2 * 500


def test_reputation_priority_broadcast_join_and_nulls(spark):
    from osmospark.urlnorm import xxhash64_py

    scores = host_reputation(_log(spark, [
        ("good.test", 200, 10), ("bad.test", 500, 10)]))
    cands = spark.createDataFrame(
        [("good.test", "http://good.test/a"),
         ("bad.test", "http://bad.test/a"),
         ("new.test", "http://new.test/a")], "host string, url string")
    out = {r.url_hash: r.priority
           for r in reputation_priority(cands, scores).collect()}
    assert out[xxhash64_py(b"http://good.test/a")] == 2000
    assert out[xxhash64_py(b"http://bad.test/a")] == -3000
    assert out[xxhash64_py(b"http://new.test/a")] is None  # no history


def test_reputation_priority_plan_broadcasts_host_side(spark):
    scores = host_reputation(_log(spark, [("h.test", 200, 1)]))
    cands = spark.createDataFrame([("h.test", "http://h.test/")],
                                  "host string, url string")
    plan = reputation_priority(cands, scores)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan


def test_trap_detect_planted(spark):
    # trap.test: 10 urls, one digit-collapsed template -> ratio 100
    # ok.test: 10 urls, 10 word templates -> ratio 1000
    # tiny.test: 2 urls, 1 template -> ratio 500 but under min_urls
    rows = ([("trap.test", f"http://trap.test/cal/2024/{i}")
             for i in range(10)]
            + [("ok.test", f"http://ok.test/page-{'abcdefghij'[i]}")
               for i in range(10)]
            + [("tiny.test", f"http://tiny.test/x/{i}") for i in range(2)])
    out = {r.host: r for r in trap_detect(
        spark.createDataFrame(rows, "host string, url string"),
        min_urls=8, max_template_permille=200).collect()}
    t, ok, tiny = out["trap.test"], out["ok.test"], out["tiny.test"]
    assert (t.urls, t.templates, t.ratio_permille, t.is_trap) == \
        (10, 1, 100, True)
    assert (ok.urls, ok.templates, ok.ratio_permille, ok.is_trap) == \
        (10, 10, 1000, False)
    assert (tiny.urls, tiny.templates, tiny.is_trap) == (2, 1, False)


def test_trap_detect_dedups_repeated_urls(spark):
    # the same URL seen 100 times is ONE url (frontier re-offers)
    rows = [("h.test", "http://h.test/a/1")] * 100 + \
        [("h.test", f"http://h.test/b/{i}") for i in range(3)]
    r = trap_detect(spark.createDataFrame(
        rows, "host string, url string"), min_urls=2).collect()[0]
    assert r.urls == 4 and r.templates == 2


def test_reputation_feeds_engine_admission(spark):
    """End-to-end feedback loop: a fetch log scores one host's seed above
    the DFS winner; with one politeness slot the engine must fetch the
    reputation-ranked URL first (same contract as the link_rank test)."""
    from osmospark.corpus import synth_corpus_df
    from osmospark.frontier import FrontierEngine

    pages = synth_corpus_df(spark, 60, n_hosts=1, weight=1).cache()
    pages.count()
    seeds = [f"http://host0000.test/p/{i}" for i in (3, 5, 7)]

    # seed 7's host is the only scored one... all seeds share one host,
    # so score the URL level instead: give only seed 7 a host match by
    # synthesizing per-URL pseudo-hosts for the priority join.
    cands = spark.createDataFrame([(u, u) for u in seeds],
                                  "host string, url string")
    log = _log(spark, [(seeds[2], 200, 10)])  # only /p/7 has history
    prio = reputation_priority(cands, host_reputation(log))

    eng = FrontierEngine(spark, pages, dedup=True, politeness=True,
                         concurrency=1, priority_df=prio)
    rec, _ = eng.run_crawl(seeds, "a", extract_spec=None,
                           max_depth=1, max_rounds=1)
    assert {r.url for r in rec.select("url").collect()} == {seeds[2]}


# ---- recrawl scheduling ---------------------------------------------------

def _hist(spark, rows):
    return spark.createDataFrame(
        rows, "url string, fetch_ts_s long, content_hash string")


def test_recrawl_priority_counts_real_transitions(spark):
    from osmospark.frontier.recrawl import recrawl_priority

    # A -> B -> A: 2 transitions (distinct-hash counting would say 1)
    rows = [("u", 100, "A"), ("u", 200, "B"), ("u", 300, "A")]
    r = recrawl_priority(_hist(spark, rows), now_s=500).collect()[0]
    assert (r.n_fetches, r.n_changes, r.span_s, r.age_s) == (3, 2, 200, 200)
    assert r.change_rate_ppm == (2 * 1_000_000) // 200  # 10000
    assert r.recrawl_score == (10000 * 200) // 1_000_000  # 2


def test_recrawl_priority_stable_and_cold_urls(spark):
    from osmospark.frontier.recrawl import recrawl_priority

    rows = [("stable", 100, "X"), ("stable", 400, "X"),   # never changed
            ("cold", 300, "Y"),                           # single fetch
            ("hot", 100, "a"), ("hot", 200, "b"), ("hot", 300, "c")]
    got = {r.url: r for r in recrawl_priority(
        _hist(spark, rows), now_s=1000).collect()}
    assert got["stable"].n_changes == 0 and got["stable"].recrawl_score == 0
    assert got["cold"].n_fetches == 1 and got["cold"].span_s == 1
    assert got["cold"].change_rate_ppm == 0  # can't have changed
    assert got["hot"].n_changes == 2
    assert got["hot"].recrawl_score > got["stable"].recrawl_score
    # ordering: hot first (score desc), then ties url asc
    ordered = [r.url for r in recrawl_priority(
        _hist(spark, rows), now_s=1000).collect()]
    assert ordered == ["hot", "cold", "stable"]


def test_recrawl_priority_single_exchange(spark):
    from osmospark.frontier.recrawl import recrawl_priority

    out = recrawl_priority(_hist(spark, [("u", 1, "A")]), now_s=10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # window + groupBy share HashPartitioning(url): ONE url-keyed
    # exchange; the only other allowed exchange is the final sort's range
    import re
    hashx = len(re.findall(r"Exchange hashpartitioning", plan))
    assert hashx == 1, plan[:800]


# ---- budget apportionment -------------------------------------------------

def _weights(spark, rows):
    return spark.createDataFrame(rows, "host string, weight long")


def test_allocate_budget_hand_computed(spark):
    from osmospark.frontier.reputation import allocate_budget

    # W=6, total=10: bases 3,1,0 + remainders 2,4,0 -> leftover 6? no:
    # base: a=(10*2)//6=3 rem 2; b=(10*1)//6=1 rem 4; c=(10*3)//6=5 rem 0
    # sum base 9, leftover 1 -> largest rem is b
    out = {r.host: r.slots for r in allocate_budget(
        _weights(spark, [("a", 2), ("b", 1), ("c", 3)]), 10).collect()}
    assert out == {"a": 3, "b": 2, "c": 5}
    assert sum(out.values()) == 10


def test_allocate_budget_exact_sum_property(spark):
    from osmospark.frontier.reputation import allocate_budget

    rows = [(f"h{i}", (i * 37) % 11) for i in range(23)]
    for total in (7, 100, 1001):
        got = allocate_budget(_weights(spark, rows), total).collect()
        assert sum(r.slots for r in got) == total
        assert all(r.slots >= 0 for r in got)


def test_allocate_budget_zero_weights_round_robin(spark):
    from osmospark.frontier.reputation import allocate_budget

    rows = [("a", 0), ("b", 0), ("c", 0)]
    out = {r.host: r.slots for r in allocate_budget(
        _weights(spark, rows), 7).collect()}
    # uniform fallback: 7 = 2+2+2 plus 1 extra to lowest host
    assert out == {"a": 3, "b": 2, "c": 2}


def test_host_budget_caps_per_round_admission(spark):
    """allocate_budget -> engine: with budgets (h0: 1 slot, h1: 2 slots)
    and 3 seeds per host, round 1 fetches exactly the budgeted counts in
    DFS order; a starved (slots=0) host fetches nothing but keeps its
    frontier rows deferred, not dropped."""
    from osmospark.corpus import synth_corpus_df
    from osmospark.frontier import FrontierEngine

    pages = synth_corpus_df(spark, 120, n_hosts=4, weight=1).cache()
    pages.count()
    hosts = [f"host{i:04d}.test" for i in range(3)]
    seeds = [f"http://{h}/p/{i}" for h in hosts for i in (3, 5, 7)]
    budget = spark.createDataFrame(
        [(hosts[0], 1), (hosts[1], 2), (hosts[2], 0)],
        "host string, slots int")

    eng = FrontierEngine(spark, pages, dedup=True, politeness=True,
                         concurrency=5, host_budget_df=budget)
    rec, _ = eng.run_crawl(seeds, "a", extract_spec=None,
                           max_depth=1, max_rounds=1)
    got = sorted(r.url for r in rec.select("url").collect())
    assert got == sorted([f"http://{hosts[0]}/p/3",
                          f"http://{hosts[1]}/p/3",
                          f"http://{hosts[1]}/p/5"])


def test_host_budget_at_or_above_concurrency_is_identity(spark):
    """Budgets >= the politeness concurrency must not change the crawl
    at all (least() semantics: budget only CAPS)."""
    from osmospark.corpus import synth_corpus_df
    from osmospark.frontier import FrontierEngine

    pages = synth_corpus_df(spark, 60, n_hosts=2, weight=1).cache()
    pages.count()
    seeds = [f"http://host{i:04d}.test/p/3" for i in range(2)]

    def urls(budget):
        eng = FrontierEngine(spark, pages, dedup=True, politeness=True,
                             concurrency=2, host_budget_df=budget)
        rec, _ = eng.run_crawl(seeds, "li > a", extract_spec=None,
                               max_depth=2, max_rounds=3)
        return sorted(r.url for r in rec.select("url").collect())

    big = spark.createDataFrame(
        [(f"host{i:04d}.test", 99) for i in range(2)],
        "host string, slots int")
    assert urls(big) == urls(None)


def test_url_features_hand_computed(spark):
    from osmospark.urlnorm import url_features

    urls = spark.createDataFrame(
        [("http://a.test/img/x.JPG",),
         ("https://b.test/p?a=1&b=2&c=3",),
         ("http://c.test/page?JSESSIONID=deadbeef",),
         ("http://d.test/",),
         ("http://123.test/v2/7/9",)], "url string")
    got = {r.url: r for r in url_features(urls).collect()}
    j = got["http://a.test/img/x.JPG"]
    assert (j.ext, j.is_asset, j.path_depth, j.n_params) == \
        ("jpg", True, 2, 0)
    q = got["https://b.test/p?a=1&b=2&c=3"]
    assert (q.n_params, q.is_asset, q.has_session) == (3, False, False)
    s = got["http://c.test/page?JSESSIONID=deadbeef"]
    assert s.has_session is True
    root = got["http://d.test/"]
    assert (root.path_depth, root.ext) == (1, "")
    d = got["http://123.test/v2/7/9"]
    # digits: 1,2,3,2,7,9 = 6 of 22 chars -> 272 permille
    assert d.url_len == 22 and d.digit_permille == (6 * 1000) // 22


def test_mirror_hosts_hand_planted(spark):
    """m1 and m2 share fps {1,2,3}; m1 has one extra page (fp 4), host
    x shares nothing pairable. fp 7 sits on ALL three hosts and the
    cap (max_fp_hosts=2) excludes it from pairing while it still
    counts toward host sizes: n_a(m1)=5, n_b(m2)=4, shared=3, overlap
    = 3000//4 = 750. Host x shares only the capped fp 7, so no pair
    with x survives min_shared=2. Exact integers."""
    from osmospark.frontier.reputation import mirror_hosts

    rows = ([("m1", f) for f in (1, 2, 3, 4, 7)]
            + [("m2", f) for f in (1, 2, 3, 7)]
            + [("x", 9), ("x", 7)])  # x∩m1 = {7} → capped away
    pages = spark.createDataFrame(rows, "host string, fp long")
    got = [tuple(r) for r in
           mirror_hosts(pages, min_shared=2, max_fp_hosts=2).collect()]
    assert got == [("m1", "m2", 3, 5, 4, 750)]
    # duplicate page rows must not inflate shared counts (distinct)
    got2 = [tuple(r) for r in
            mirror_hosts(pages.union(pages), min_shared=2,
                         max_fp_hosts=2).collect()]
    assert got2 == got


def test_host_delay_caps_per_round_admission(spark):
    """adaptive_delay-shaped (host, delay_ms) feedback → engine: with
    round_seconds=60, a 30 s delay yields 2 slots and a 60 s delay 1
    slot; an un-listed host keeps the default concurrency. The cap is
    least() with the existing slots, so a fast host (1 ms) is identity."""
    from osmospark.corpus import synth_corpus_df
    from osmospark.frontier import FrontierEngine

    pages = synth_corpus_df(spark, 120, n_hosts=4, weight=1).cache()
    pages.count()
    hosts = [f"host{i:04d}.test" for i in range(3)]
    seeds = [f"http://{h}/p/{i}" for h in hosts for i in (3, 5, 7)]
    delays = spark.createDataFrame(
        [(hosts[0], 60_000), (hosts[1], 30_000), (hosts[2], 1)],
        "host string, delay_ms long")

    eng = FrontierEngine(spark, pages, dedup=True, politeness=True,
                         concurrency=5, round_seconds=60.0,
                         host_delay_df=delays)
    rec, _ = eng.run_crawl(seeds, "a", extract_spec=None,
                           max_depth=1, max_rounds=1)
    got = sorted(r.url for r in rec.select("url").collect())
    assert got == sorted([f"http://{hosts[0]}/p/3",
                          f"http://{hosts[1]}/p/3",
                          f"http://{hosts[1]}/p/5",
                          f"http://{hosts[2]}/p/3",
                          f"http://{hosts[2]}/p/5",
                          f"http://{hosts[2]}/p/7"])


def test_host_delay_feedback_loop_end_to_end(spark):
    """The full loop: a fetch-latency log → adaptive_delay → engine.
    Slow host (p95 60 s → delay clamps to max 10 s → 6 slots at
    round_seconds=60) vs fast host (delay clamps to base 100 ms →
    600 slots ≥ concurrency → identity). Deferral, not dropping: a
    second round fetches the slow host's remainder."""
    from osmospark.corpus import synth_corpus_df
    from osmospark.frontier import FrontierEngine
    from osmospark.frontier.politeness import adaptive_delay

    pages = synth_corpus_df(spark, 240, n_hosts=4, weight=1).cache()
    pages.count()
    slow, fast = "host0000.test", "host0001.test"
    seeds = [f"http://{h}/p/{i}" for h in (slow, fast)
             for i in range(3, 11)]                      # 8 seeds/host
    log = spark.createDataFrame(
        [(slow, 60_000)] * 5 + [(fast, 3)] * 5,
        "host string, latency_ms long")
    delays = adaptive_delay(log)

    eng = FrontierEngine(spark, pages, dedup=True, politeness=True,
                         concurrency=8, round_seconds=60.0,
                         host_delay_df=delays)
    rec, _ = eng.run_crawl(seeds, "a", extract_spec=None,
                           max_depth=0, max_rounds=1)
    per_host = {h: sum(1 for r in rec.collect()
                       if f"//{h}/" in r.url) for h in (slow, fast)}
    assert per_host == {slow: 6, fast: 8}

    eng2 = FrontierEngine(spark, pages, dedup=True, politeness=True,
                          concurrency=8, round_seconds=60.0,
                          host_delay_df=delays)
    rec2, _ = eng2.run_crawl(seeds, "a", extract_spec=None,
                             max_depth=0, max_rounds=2)
    per_host2 = {h: sum(1 for r in rec2.collect()
                        if f"//{h}/" in r.url) for h in (slow, fast)}
    assert per_host2 == {slow: 8, fast: 8}


def test_url_rewrites_raw_dust_output_filters_is_rule(spark):
    """Regression (r4 advisor): passing dust_rules output DIRECTLY
    (the natural call) used to strip params with violations>0 too —
    params proven to change content. The engine must filter is_rule
    itself: sid (rule) strips, page (violated) survives, so the
    rewritten seed hits the canonical corpus URL /p/3."""
    from osmospark.corpus import synth_corpus_df
    from osmospark.frontier import FrontierEngine

    pages = synth_corpus_df(spark, 60, n_hosts=2, weight=1).cache()
    pages.count()
    h0 = "host0000.test"
    raw_rules = spark.createDataFrame(
        [(h0, "sid", 5, 0, True), (h0, "page", 0, 4, False)],
        "host string, param string, support long, violations long, "
        "is_rule boolean")
    eng = FrontierEngine(spark, pages, dedup=True,
                         url_rewrites_df=raw_rules)
    rec, _ = eng.run_crawl([f"http://{h0}/p/3?sid=a"], "a",
                           extract_spec=None, max_depth=0, max_rounds=1)
    assert [r.url for r in rec.select("url").collect()] == \
        [f"http://{h0}/p/3"]
    # the violated param must NOT strip: ?page=1 misses the corpus key
    # (had page been stripped, /p/5 WOULD match and fetch — count 1)
    rec2, _ = eng.run_crawl([f"http://{h0}/p/5?page=1"], "a",
                            extract_spec=None, max_depth=0, max_rounds=1)
    assert rec2.count() == 0


def test_url_rewrites_collapse_aliases_to_canonical(spark):
    """DUST rules → engine: session/tracking-aliased seeds rewrite to
    the canonical corpus URL before hashing, so (a) the aliased page
    IS fetched (without rewrites the alias key misses the corpus) and
    (b) two aliases of one page dedup to a single fetch. A kept param
    (not in the rules) must survive the strip."""
    from osmospark.corpus import synth_corpus_df
    from osmospark.frontier import FrontierEngine

    pages = synth_corpus_df(spark, 60, n_hosts=2, weight=1).cache()
    pages.count()
    h0, h1 = "host0000.test", "host0001.test"
    rules = spark.createDataFrame(
        [(h0, "sid"), (h0, "utm"), (h1, "sid")], "host string, param string")
    seeds = [f"http://{h0}/p/3?sid=a&utm=x",      # alias 1 of /p/3
             f"http://{h0}/p/3?utm=y&sid=b",      # alias 2 of /p/3
             f"http://{h1}/p/5?sid=z",            # alias of h1 /p/5
             f"http://{h1}/p/7"]                  # already canonical

    eng = FrontierEngine(spark, pages, dedup=True,
                         url_rewrites_df=rules)
    rec, _ = eng.run_crawl(seeds, "a", extract_spec=None,
                           max_depth=0, max_rounds=1)
    got = sorted(r.url for r in rec.select("url").collect())
    assert got == sorted([f"http://{h0}/p/3",     # ONE fetch for 2 aliases
                          f"http://{h1}/p/5",
                          f"http://{h1}/p/7"])

    # control: without rewrites the aliased keys miss the corpus
    eng0 = FrontierEngine(spark, pages, dedup=True)
    rec0, _ = eng0.run_crawl(seeds, "a", extract_spec=None,
                             max_depth=0, max_rounds=1)
    assert sorted(r.url for r in rec0.select("url").collect()) == \
        [f"http://{h1}/p/7"]

    # a param outside the rules survives: no corpus page matches, but
    # the frontier row must carry the partially-stripped url
    eng2 = FrontierEngine(spark, pages, dedup=True,
                          url_rewrites_df=rules)
    rec2, frontier2 = eng2.run_crawl(
        [f"http://{h0}/p/3?sid=a&page=2"], "a", extract_spec=None,
        max_depth=0, max_rounds=1)
    assert rec2.count() == 0
    # re-running on the SAME engine with the other alias (sid differs,
    # page same) is a URL-seen hit — zero new admissions proves both
    # aliases hashed to the same partially-stripped canonical key
    rec3, _ = eng2.run_crawl([f"http://{h0}/p/3?sid=zz&page=2"], "a",
                             extract_spec=None, max_depth=0, max_rounds=1)
    assert rec3.count() == 0


def test_trap_detect_feeds_budget_starvation(spark):
    """The trap loop closed: trap_detect over a crawl's URL log →
    slots=0 budgets for flagged hosts → the engine defers every
    frontier row of the trap host (fetches nothing from it) while
    healthy hosts crawl normally."""
    from pyspark.sql import functions as F
    from osmospark.corpus import synth_corpus_df
    from osmospark.frontier import FrontierEngine

    pages = synth_corpus_df(spark, 60, n_hosts=2, weight=1).cache()
    pages.count()
    trap, ok = "host0000.test", "host0001.test"
    log_rows = [(trap, f"http://{trap}/cal/2024/{i}") for i in range(12)]
    log_rows += [(ok, f"http://{ok}/page-{'abcdefghijkl'[i]}")
                 for i in range(12)]
    verdicts = trap_detect(
        spark.createDataFrame(log_rows, "host string, url string"),
        min_urls=8, max_template_permille=200)
    budget = verdicts.filter(F.col("is_trap")).select(
        "host", F.lit(0).alias("slots"))

    eng = FrontierEngine(spark, pages, dedup=True, politeness=True,
                         concurrency=4, host_budget_df=budget)
    seeds = [f"http://{h}/p/{i}" for h in (trap, ok) for i in (3, 5)]
    rec, _ = eng.run_crawl(seeds, "a", extract_spec=None,
                           max_depth=0, max_rounds=2)
    got = sorted(r.url for r in rec.select("url").collect())
    assert got == sorted([f"http://{ok}/p/3", f"http://{ok}/p/5"])


def test_all_feedback_loops_compose_in_one_crawl(spark):
    """priority_df + host_budget_df + host_delay_df + url_rewrites_df
    active simultaneously: rewrites collapse an aliased seed onto its
    canonical page, the budget (1 slot) and delay (2 slots) caps
    least-combine to 1 admission for host 0, and within that one slot
    the priority score — not DFS order — picks the winner. Host 1 is
    uncapped and fetches all its seeds. Round 2 drains host 0's
    deferrals under the same caps."""
    from osmospark.corpus import synth_corpus_df
    from osmospark.frontier import FrontierEngine
    from osmospark.urlnorm import xxhash64_py

    pages = synth_corpus_df(spark, 120, n_hosts=2, weight=1).cache()
    pages.count()
    h0, h1 = "host0000.test", "host0001.test"
    seeds = [f"http://{h0}/p/3",
             f"http://{h0}/p/5?sid=x",            # alias → /p/5
             f"http://{h0}/p/7",
             f"http://{h1}/p/3", f"http://{h1}/p/5"]
    rewrites = spark.createDataFrame([(h0, "sid")], "host string, param string")
    budget = spark.createDataFrame([(h0, 1)], "host string, slots int")
    delays = spark.createDataFrame([(h0, 30_000)], "host string, delay_ms long")
    # priority: the CANONICAL form of the aliased seed outranks DFS
    prio = spark.createDataFrame(
        [(xxhash64_py(f"http://{h0}/p/5".encode()), 10_000)],
        "url_hash long, priority long")

    def crawl(rounds):
        eng = FrontierEngine(spark, pages, dedup=True, politeness=True,
                             concurrency=5, round_seconds=60.0,
                             priority_df=prio, host_budget_df=budget,
                             host_delay_df=delays, url_rewrites_df=rewrites)
        rec, _ = eng.run_crawl(seeds, "a", extract_spec=None,
                               max_depth=0, max_rounds=rounds)
        return sorted(r.url for r in rec.select("url").collect())

    # round 1: host0 admits exactly ONE url — the priority-scored
    # canonical /p/5 (reached only via the rewrite); host1 admits both
    assert crawl(1) == sorted([f"http://{h0}/p/5",
                               f"http://{h1}/p/3", f"http://{h1}/p/5"])
    # three rounds drain host0's deferred seeds one per round
    assert crawl(3) == sorted([f"http://{h0}/p/3", f"http://{h0}/p/5",
                               f"http://{h0}/p/7",
                               f"http://{h1}/p/3", f"http://{h1}/p/5"])
