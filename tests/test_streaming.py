"""Structured Streaming equivalents (SURVEY §2.10): replaying a static
pages/events directory through the streaming plans must equal the batch
plans (same UDF / same expressions; availableNow trigger)."""

import pytest

from osmospark.corpus import fixture_pages, pages_rows

pyspark = pytest.importorskip("pyspark")


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession
    s = (SparkSession.builder.master("local[4]")
         .appName("osmospark-streaming-tests")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
    yield s


@pytest.fixture(scope="module")
def pages_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pages_stream"))
    df = spark.createDataFrame(
        pages_rows(fixture_pages(), with_text=False),
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string")
    # several files => several stream inputs
    df.repartition(3).write.mode("overwrite").parquet(d)
    return d


def test_stream_extract_matches_batch(spark, pages_dir):
    from osmospark.frontier import FrontierEngine
    from osmospark.streaming import (
        read_pages_stream, run_to_memory, stream_extract, stream_records,
    )

    spec = {"payload": "div", "links": ["a@href"]}
    out = stream_extract(
        read_pages_stream(spark, pages_dir, max_files_per_trigger=1),
        spec, "a")
    run_to_memory(stream_records(out), "stream_records")
    got = {(r.url, r.value_json)
           for r in spark.table("stream_records").collect()}

    batch = FrontierEngine(
        spark, spark.read.parquet(pages_dir)).extract_corpus(spec)
    want = {(r.url, r.value_json) for r in batch.collect()}
    assert got == want and len(got) > 0


def test_stream_outlinks_dedup_is_streaming_url_seen(spark, pages_dir):
    from osmospark.streaming import (
        read_pages_stream, run_to_memory, stream_extract, stream_outlinks,
    )

    out = stream_extract(
        read_pages_stream(spark, pages_dir, max_files_per_trigger=1),
        None, "a")
    run_to_memory(stream_outlinks(out, dedup=True), "stream_frontier")
    rows = spark.table("stream_frontier").collect()
    hashes = [r.url_hash for r in rows]
    assert len(hashes) == len(set(hashes)) > 0  # each URL fed exactly once


def test_stream_windowed_metrics_matches_batch(spark, tmp_path_factory):
    from pyspark.sql import functions as F

    from osmospark.streaming import run_to_memory, stream_windowed_metrics

    ev_batch = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    d = str(tmp_path_factory.mktemp("events_stream"))
    ev_batch.repartition(3).write.mode("overwrite").parquet(d)

    stream = (spark.readStream.schema(ev_batch.schema).parquet(d))
    # complete mode: append would hold back windows the final watermark
    # hasn't passed on a bounded replay
    run_to_memory(stream_windowed_metrics(stream), "stream_metrics",
                  output_mode="complete")
    got = {tuple(r) for r in spark.table("stream_metrics").collect()}
    want = {tuple(r) for r in stream_windowed_metrics(ev_batch).collect()}
    assert got == want and len(got) > 0


@pytest.fixture(scope="module")
def synth_pages_df(spark):
    from osmospark.corpus import pages_rows, synth_corpus
    return spark.createDataFrame(
        pages_rows(synth_corpus(n_urls=60, n_hosts=4)),
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string").cache()


def test_streaming_crawl_matches_batch(spark, synth_pages_df,
                                       tmp_path_factory):
    """The self-feeding micro-batch crawl (frontier landing dir → stateful
    dedup → stream-static fetch join → crawl UDF → conts back to the dir)
    must reproduce the batch engine's exact visit set + records on the
    same seeds/corpus."""
    from osmospark.corpus import seed_urls, synth_corpus
    from osmospark.frontier import FrontierEngine
    from osmospark.streaming import streaming_crawl

    seeds = seed_urls(synth_corpus(n_urls=60, n_hosts=4))
    spec = {"payload": "div"}

    batch, _ = FrontierEngine(spark, synth_pages_df, dedup=True).run_crawl(
        seeds, "li > a", extract_spec=spec, max_depth=2)
    want = sorted((r.url, r.depth, r.value_json) for r in batch.collect())

    wd = str(tmp_path_factory.mktemp("stream_crawl"))
    got_df = streaming_crawl(spark, synth_pages_df, seeds, "li > a", spec,
                             workdir=wd, max_depth=2)
    got = sorted((r.url, r.depth, r.value_json) for r in got_df.collect())
    assert got == want and len(got) > 10


def test_streaming_crawl_bloom_mode_visits_once(spark, synth_pages_df,
                                                tmp_path_factory):
    """Bloom admission: bounded per-bucket state, each URL visited at most
    once; at this corpus size FPR≈0 so the visit set equals exact mode."""
    from osmospark.corpus import seed_urls, synth_corpus
    from osmospark.streaming import streaming_crawl

    seeds = seed_urls(synth_corpus(n_urls=60, n_hosts=4))
    wd = str(tmp_path_factory.mktemp("stream_crawl_bloom"))
    got_df = streaming_crawl(spark, synth_pages_df, seeds, "li > a",
                             {"payload": "div"}, workdir=wd, max_depth=2,
                             dedup_mode="bloom", bloom_buckets=4)
    rows = got_df.collect()
    urls = [r.url for r in rows]
    assert len(urls) == len(set(urls)) > 10


def test_streaming_crawl_resume_from_checkpoint(spark, synth_pages_df,
                                                tmp_path_factory):
    """Kill-and-resume: a crawl stopped after one round continues from the
    same workdir — the checkpoint's file-source log + dedup state ensure
    the resumed run (even re-seeded) never re-visits, and the final record
    set equals a one-shot crawl's."""
    from osmospark.corpus import seed_urls, synth_corpus
    from osmospark.streaming import streaming_crawl

    seeds = seed_urls(synth_corpus(n_urls=60, n_hosts=4))
    spec = {"payload": "div"}
    one_wd = str(tmp_path_factory.mktemp("stream_one_shot"))
    want = sorted(
        (r.url, r.depth, r.value_json)
        for r in streaming_crawl(spark, synth_pages_df, seeds, "li > a",
                                 spec, workdir=one_wd,
                                 max_depth=2).collect())

    wd = str(tmp_path_factory.mktemp("stream_resume"))
    partial = streaming_crawl(spark, synth_pages_df, seeds, "li > a", spec,
                              workdir=wd, max_depth=2, max_rounds=1)
    assert 0 < partial.count() < len(want)
    resumed = streaming_crawl(spark, synth_pages_df, seeds, "li > a", spec,
                              workdir=wd, max_depth=2)
    got = sorted((r.url, r.depth, r.value_json) for r in resumed.collect())
    assert got == want  # no re-visits, nothing lost


def test_stateful_bloom_dedup_matches_exact_across_batches(spark, pages_dir):
    """applyInPandasWithState custom operator: Bloom URL-seen state in the
    state store must emit exactly the distinct link set (FPR ~0 at this
    size), deduplicating ACROSS micro-batches, with bounded per-bucket
    state."""
    from osmospark.streaming import (
        read_pages_stream, run_to_memory, stream_extract,
        stream_unseen_links_stateful,
    )

    out = stream_extract(
        read_pages_stream(spark, pages_dir, max_files_per_trigger=1),
        None, "a")
    run_to_memory(
        stream_unseen_links_stateful(out), "stateful_unseen",
        output_mode="append")
    got = [r.url for r in spark.table("stateful_unseen").collect()]
    assert len(got) == len(set(got))       # cross-batch dedup held

    # exact expected set: batch extraction's distinct outlinks
    from osmospark.extract import OUT_SCHEMA, make_crawl_udf
    from pyspark.sql import functions as F
    batch = spark.read.parquet(pages_dir).select(
        "url", F.xxhash64("url").alias("url_hash"),
        F.lit(None).cast("string").alias("host"), F.lit(0).alias("depth"),
        F.lit(None).cast("string").alias("referer"), "html")
    bout = batch.mapInPandas(make_crawl_udf(None, "a", hash_conts=False),
                             OUT_SCHEMA)
    want = {r.url for r in bout.filter(F.col("row_kind") == "cont")
            .select("url").distinct().collect()}
    assert set(got) == want and len(want) > 5


def test_streaming_incremental_dedup_resumes_exactly_once(
        spark, tmp_path_factory):
    """Land batch A, drain; land batch B, rerun with the SAME checkpoint:
    the appended output must equal the one-shot batch answer over A∪B —
    batch A is not re-emitted (file-source progress log) and batch B is
    fully processed."""
    from pyspark.sql import functions as F

    from osmospark.functions.dedup import incremental_near_duplicates
    from osmospark.streaming import streaming_incremental_dedup

    wd = tmp_path_factory.mktemp("stream_dedup")
    landing, out, ckpt = (str(wd / d) for d in ("landing", "out", "ckpt"))

    base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    ws = F.split(norm, " ")
    delta = (base.filter(F.pmod(F.col("doc_id"), F.lit(5)) == 0)
             .select((F.col("doc_id") + 1000000).alias("doc_id"),
                     F.array_join(F.slice(ws, F.lit(1), F.size(ws) - 1),
                                  " ").alias("text")))
    d_a = delta.filter("doc_id % 2 = 0")
    d_b = delta.filter("doc_id % 2 = 1")

    d_a.coalesce(1).write.parquet(landing)
    streaming_incremental_dedup(spark, base, landing, out, ckpt, 0.5)
    n_after_a = spark.read.parquet(out).count()

    d_b.coalesce(1).write.mode("append").parquet(landing)
    streaming_incremental_dedup(spark, base, landing, out, ckpt, 0.5)

    got = sorted((r.delta_id, r.base_id, r.jaccard)
                 for r in spark.read.parquet(out).collect())
    want = sorted((r.delta_id, r.base_id, r.jaccard)
                  for r in incremental_near_duplicates(
                      base, delta, 0.5).collect())
    assert got == want
    assert 0 < n_after_a < len(got)
