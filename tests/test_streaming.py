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
