"""North-rule ordering invariant: the engine's crawl visit set must equal
the reference scheduler's (LIFO + concurrency window, simulated), and
engine admission must be depth-first (the batch linearization of LIFO)."""

from osmospark.corpus import PageStore, pages_rows, seed_urls, synth_corpus
from osmospark.frontier import FrontierEngine
from osmospark.frontier.simulator import crawl_order


def _corpus(n_urls=50, n_hosts=3):
    pages = synth_corpus(n_urls=n_urls, n_hosts=n_hosts)
    return pages, PageStore(pages)


def test_simulator_dedup_visits_whole_component():
    pages, store = _corpus()
    seeds = seed_urls(pages)
    order, seen = crawl_order(store, seeds, "li > a", max_depth=50)
    assert order[0] == seeds[0]  # first seed fetched first
    assert len(order) == len(seen)
    # deterministic
    order2, _ = crawl_order(store, seeds, "li > a", max_depth=50)
    assert order == order2


def test_simulator_is_depth_first():
    pages, store = _corpus()
    seeds = seed_urls(pages)[:1]
    order, _ = crawl_order(store, seeds, "li > a", max_depth=6)
    # LIFO: the second visit must be a child of the first (depth 1), not
    # another frontier sibling
    first_children, _ = crawl_order(store, seeds, "li > a", max_depth=1)
    assert order[1] in first_children[1:]


def test_engine_visit_set_matches_simulator(spark):
    """Visit-set equality vs the reference scheduler. Compared without a
    depth cap: under a cap, visit sets are traversal-dependent (a DFS that
    first reaches a node at its deepest path won't expand it; the engine
    visits every node at its minimal depth), so the invariant the north
    rule can actually promise is equality of the reachable seen-set."""
    pages, store = _corpus(n_urls=40, n_hosts=3)
    seeds = seed_urls(pages)
    sim_order, sim_seen = crawl_order(store, seeds, "li > a", max_depth=99)

    pages_df = spark.createDataFrame(
        pages_rows(pages),
        "url string, warc_ts timestamp, html binary, text string, lang string")
    engine = FrontierEngine(spark, pages_df, dedup=True, politeness=False)
    records, _ = engine.run_crawl(seeds, "li > a",
                                  extract_spec={"payload": "div"},
                                  max_depth=99, max_rounds=100)
    engine_urls = {r.url for r in records.collect()}

    corpus_urls = {p.url for p in store.by_key.values()}
    assert engine_urls == (sim_seen & corpus_urls)


def test_engine_admission_is_depth_first_under_politeness(spark):
    pages, store = _corpus(n_urls=40, n_hosts=2)
    seeds = seed_urls(pages)
    pages_df = spark.createDataFrame(
        pages_rows(pages),
        "url string, warc_ts timestamp, html binary, text string, lang string")
    engine = FrontierEngine(spark, pages_df, dedup=True, politeness=True,
                            concurrency=3)
    records, visits = engine.run_crawl(seeds, "li > a",
                                       extract_spec={"payload": "div"},
                                       max_depth=2, max_rounds=10)
    rows = records.collect()
    # deferred shallow rows must not starve: every depth present eventually
    depths = {r.depth for r in rows}
    assert 0 in depths and 2 in depths
    # politeness cap respected every round
    assert all(v["admitted"] <= 3 * 2 for v in visits)


def test_salted_two_phase_admission_identical(spark):
    """SURVEY §7.3: salted two-phase slot admission must produce the SAME
    per-round visit log and record set as the single-window plan — the
    salt only changes the physical shuffle, never the admitted set."""
    pages, store = _corpus(n_urls=60, n_hosts=2)  # skewed: few hot hosts
    seeds = seed_urls(pages)
    pages_df = spark.createDataFrame(
        pages_rows(pages),
        "url string, warc_ts timestamp, html binary, text string, lang string")

    def run(salt):
        eng = FrontierEngine(spark, pages_df, dedup=True, politeness=True,
                             concurrency=3, politeness_salt_buckets=salt)
        records, visits = eng.run_crawl(
            seeds, "li > a", extract_spec={"payload": "div"},
            max_depth=3, max_rounds=12)
        return ([v["admitted"] for v in visits],
                sorted((r.url, r.depth) for r in records.collect()))

    plain_admitted, plain_records = run(0)
    salted_admitted, salted_records = run(7)
    assert salted_admitted == plain_admitted
    assert salted_records == plain_records
