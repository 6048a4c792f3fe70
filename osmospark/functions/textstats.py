"""Text analysis for large-scale training-data pipelines — all built-in
``pyspark.sql.functions`` (JVM-side, whole-stage codegen; no Python in the
hot path). Each function returns a DataFrame and has a matching DuckDB
oracle in __spark_entry__.py.

Ops: token counting (whitespace + BPE-ish word/punct split), quality
scoring (length / punctuation ratio / stopword ratio), language-ID
heuristic (stopword-profile + non-ASCII ratio), document fingerprinting
(normalized md5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]

# BPE-ish pre-tokenization: word pieces OR single punctuation marks
BPE_SPLIT_RE = r"[a-z0-9]+|[^a-z0-9\s]"
_PUNCT_RE = r"[\.,;:!\?]"


def _words(col):
    return F.split(F.trim(F.lower(col)), r"\s+")


def token_counts(documents: DataFrame) -> DataFrame:
    """Whitespace tokens + BPE-ish regex tokens per document."""
    return documents.select(
        "doc_id",
        F.size(_words(F.col("text"))).alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.lower(F.col("text")),
                                    F.lit(BPE_SPLIT_RE), 0)).alias("bpe_tokens"),
    )


def quality_scores(documents: DataFrame) -> DataFrame:
    """Length / punctuation-ratio / stopword-ratio quality heuristics with a
    combined keep/drop flag (the kind of gate a pretraining pipeline runs
    over every document)."""
    words = _words(F.col("text"))
    n_words = F.size(words)
    n_stop = F.size(F.filter(words, lambda w: w.isin(STOPWORDS)))
    n_punct = (F.length(F.col("text"))
               - F.length(F.regexp_replace(F.col("text"), _PUNCT_RE, "")))
    stop_ratio = F.round(n_stop.cast("double") / n_words, 6)
    punct_ratio = F.round(n_punct.cast("double") / F.length(F.col("text")), 6)
    return documents.select(
        "doc_id",
        F.col("n_chars").alias("n_chars"),
        n_words.alias("n_words"),
        stop_ratio.alias("stop_ratio"),
        punct_ratio.alias("punct_ratio"),
        ((F.col("n_chars") >= 50) & (n_words >= 10)
         & (punct_ratio <= 0.2)).alias("keep"),
    )


def lang_id(documents: DataFrame) -> DataFrame:
    """Heuristic language ID: non-ASCII char ratio + English stopword hits.
    Deterministic and SQL-expressible (the operator pattern, not a model)."""
    non_ascii = (F.length(F.col("text"))
                 - F.length(F.regexp_replace(F.col("text"), r"[^\x00-\x7F]", "")))
    words = _words(F.col("text"))
    stop_hits = F.size(F.filter(words, lambda w: w.isin(STOPWORDS)))
    pred = (
        F.when(non_ascii * 5 > F.length(F.col("text")), F.lit("non-latin"))
        .when(stop_hits >= 3, F.lit("en"))
        .otherwise(F.lit("other"))
    )
    return documents.select("doc_id", "lang", pred.alias("pred_lang"))


def fingerprints(documents: DataFrame) -> DataFrame:
    """Normalized content fingerprint: md5 over lowercase,
    whitespace-collapsed text (the exact-dedup key)."""
    norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    return documents.select(
        "doc_id", F.md5(norm).alias("fingerprint"),
    )


WINNOW_K = 3   # k-gram width (words)
WINNOW_W = 4   # winnowing window over the k-gram hash sequence


def winnow_hashes_expr(text_col, k: int = WINNOW_K):
    """The k-gram md5 hash array as a column expression (stage 1 of
    winnowing). MUST be bound to a NAMED column before the window-min
    stage consumes it: higher-order-function lambdas are interpreted,
    so an inline subtree here would be RE-EVALUATED once per window —
    O(W²) md5 calls per document (measured 15.7 s → 0.56 s at sf0.1
    for the 5000-doc corpus when named; a ~28× cliff). Referencing the
    named column ≥2 times in the consumer blocks CollapseProject from
    inlining it back."""
    norm = F.regexp_replace(F.trim(F.lower(text_col)), r"\s+", " ")
    words = F.split(norm, " ")
    n = F.size(words)
    # zip_with chain, not slice-in-lambda: the slice form re-splits the
    # text once per gram — O(W²) (see curation._word_grams)
    g = words
    for j in range(1, k):
        g = F.zip_with(g, F.slice(words, j + 1, n),
                       lambda x, y: F.concat(x, F.lit(" "), y))
    g = F.filter(g, lambda x: x.isNotNull())
    grams = F.when(n >= k, g).otherwise(F.array(norm))
    return F.transform(
        grams,
        lambda g: F.conv(F.substring(F.md5(g), 1, 15), 16, 10)
        .cast("bigint"))


def winnow_mins_expr(hs_col, w: int = WINNOW_W):
    """Stage 2 of winnowing: sorted distinct window minima over a
    NAMED hash-array column (see ``winnow_hashes_expr`` for why it
    must be named, not inlined)."""
    m = F.size(hs_col)
    mins = F.when(m >= w, F.transform(
        F.sequence(F.lit(1), m - w + 1),
        lambda i: F.array_min(F.slice(hs_col, i, w)),
    )).otherwise(F.array(F.array_min(hs_col)))
    return F.array_sort(F.array_distinct(mins))


def winnow_fp_expr(text_col, k: int = WINNOW_K, w: int = WINNOW_W):
    """The winnow fingerprint set as a single inline ``array<bigint>``
    expression (sorted distinct window minima). ONLY for tiny inputs /
    oracle parity checks: the inline form re-evaluates the hash array
    per window (see ``winnow_hashes_expr``); hot paths go through the
    two-stage named-column form (``winnow_fingerprints``,
    ``dedup.partial_duplicates``)."""
    return winnow_mins_expr(winnow_hashes_expr(text_col, k), w)


def winnow_fingerprints(documents: DataFrame, k: int = WINNOW_K,
                        w: int = WINNOW_W) -> DataFrame:
    """Rolling-hash document fingerprinting by winnowing (Schleimer et al.,
    SIGMOD'03 — the MOSS scheme): hash every word k-gram, slide a window of
    w hashes, keep each window's minimum; the deduplicated sorted minima
    are the document fingerprint. Guarantees any shared run of
    w + k - 1 words between two documents shares at least one fingerprint.

    All built-in expressions (transform/slice/array_min) — the same
    portable md5→bigint hash as the minhash pipeline so the DuckDB
    oracle agrees exactly. Two-stage named-column evaluation (hash
    array materialized once per row; see ``winnow_hashes_expr``)."""
    fp = winnow_mins_expr(F.col("_hs"), w)
    return (documents
            .withColumn("_hs", winnow_hashes_expr(F.col("text"), k))
            .select(
                "doc_id",
                F.size(fp).alias("n_fp"),
                F.concat_ws(",", F.transform(
                    fp, lambda x: x.cast("string"))).alias("fingerprint"),
            ))


def tfidf_topterms(documents: DataFrame, k: int = 5,
                   idf_scale: int = 1000) -> DataFrame:
    """Per-document top-``k`` terms by integer tf-idf — the keyword /
    topic-tag extractor of a curation pipeline (route documents by
    salient terms, build per-domain term profiles).

    All-integer so a SQL oracle is bit-exact: idf is the per-mille
    inverse document frequency ``(n_docs·idf_scale) div df`` (the
    standard log-idf is float; truncating-div inverse frequency
    preserves the same ordering on any fixed corpus) and
    ``score_milli = tf · idf_milli``. Ties break on the word
    ascending, so top-k is deterministic.

    Scale shape: explode → ONE (doc_id, word) aggregation for tf
    (map-side partials); df is a vocab-sized word aggregation joined
    back BROADCAST (the tf side never shuffles for it); n_docs is a
    broadcast scalar. The only other shuffle is the per-doc top-k
    window keyed on doc_id — partitions by document, no hot keys.
    """
    from pyspark.sql import Window

    ex = documents.select(
        "doc_id", F.explode(_words(F.col("text"))).alias("w"))
    tf = ex.groupBy("doc_id", "w").agg(F.count("*").alias("tf"))
    dfreq = ex.groupBy("w").agg(F.count_distinct("doc_id").alias("df"))
    n = documents.agg(F.count("*").alias("n_docs"))
    scored = (tf.join(F.broadcast(dfreq), "w")
              .crossJoin(F.broadcast(n))
              .withColumn("idf_milli",
                          F.expr(f"(n_docs * {idf_scale}) div df"))
              .withColumn("score_milli", F.expr("tf * idf_milli")))
    win = Window.partitionBy("doc_id").orderBy(
        F.col("score_milli").desc(), F.col("w").asc())
    return (scored.withColumn("rank", F.row_number().over(win))
            .filter(F.col("rank") <= k)
            .select("doc_id", F.col("w").alias("word"),
                    F.col("tf").cast("bigint").alias("tf"),
                    F.col("df").cast("bigint").alias("df"),
                    F.col("score_milli").cast("bigint").alias("score_milli"),
                    F.col("rank").cast("bigint").alias("rank"))
            .orderBy("doc_id", "rank"))


def lm_score(documents: DataFrame, scale: int = 1024) -> DataFrame:
    """Self-trained unigram-LM fluency score (the CCNet-style
    perplexity gate in integer space): a token's surprisal is
    approximated by the BIT LENGTH of its inverse corpus frequency,
    ``length(bin((total_tokens·scale) div cnt(w)))`` ≈
    log2(total/cnt) + log2(scale) — monotone in true unigram
    surprisal and bit-exact across engines (Spark ``bin`` and DuckDB
    ``bin`` both print minimal binary). A document full of rare
    tokens scores high bits (gibberish / boilerplate-soup candidates),
    common fluent text scores low.

    Output per doc: n_tokens, total_bits, and
    ``avg_bits_milli = (total_bits·1000) div n_tokens``.

    Scale shape: the unigram table is vocab-sized → built with one
    word-keyed aggregation (map-side partials) and joined back
    BROADCAST; the token stream never shuffles for the model. One
    final groupBy(doc_id) with partial sums. Total tokens is a
    broadcast scalar.

    Docs with ZERO tokens (empty or NULL text) produce no output row —
    there is nothing to score and the average would be 0/0. Downstream
    ``ccnet_buckets`` left-joins scores and routes score-less docs to
    its explicit 'unknown' bucket, so the composed pipeline never
    silently loses them.
    """
    ex = documents.select(
        "doc_id", F.explode(_words(F.col("text"))).alias("w"))
    cnt = ex.groupBy("w").agg(F.count("*").alias("cnt"))
    tot = ex.agg(F.count("*").alias("total"))
    bits = (cnt.crossJoin(F.broadcast(tot))
            .select("w", F.length(
                F.bin(F.expr(f"(total * {scale}) div cnt")))
                .cast("bigint").alias("bits")))
    return (ex.join(F.broadcast(bits), "w")
            .groupBy("doc_id")
            .agg(F.count("*").cast("bigint").alias("n_tokens"),
                 F.sum("bits").cast("bigint").alias("total_bits"))
            .select("doc_id", "n_tokens", "total_bits",
                    F.expr("(total_bits * 1000) div n_tokens")
                    .cast("bigint").alias("avg_bits_milli"))
            .orderBy("doc_id"))


def inverted_index(documents: DataFrame, min_df: int = 2) -> DataFrame:
    """Positional inverted index over the corpus — the retrieval-side
    artifact a training pipeline builds for decontamination lookups,
    attribution queries, and corpus search (same normalization as
    every textstats op: lowercase, whitespace split). Output one row
    per posting: (word, doc_id, tf, positions, df, cf) with positions
    the sorted 0-based token offsets, df = documents containing the
    word, cf = total occurrences; words below ``min_df`` are dropped
    (hapax legomena are index bloat — at web scale most of the
    vocabulary).

    Scale shape: ONE (word, doc_id)-keyed aggregation builds the
    postings (map-side partial lists — positions for one doc live in
    one group, never a corpus-wide sort), then the vocab-sized
    (df, cf) table aggregates FROM THE POSTINGS (posting-count rows,
    not the token stream) and broadcasts back. The token stream
    shuffles once, on (word, doc_id) — skew-safe because the hottest
    word is subdivided by doc_id; no window functions anywhere.
    """
    tok = documents.select(
        "doc_id",
        F.posexplode(_words(F.col("text"))).alias("pos", "w"))
    postings = (tok.groupBy("w", "doc_id")
                .agg(F.count("*").cast("bigint").alias("tf"),
                     F.sort_array(F.collect_list(
                         F.col("pos").cast("bigint")))
                     .alias("positions")))
    stats = (postings.groupBy("w")
             .agg(F.count("*").cast("bigint").alias("df"),
                  F.sum("tf").cast("bigint").alias("cf"))
             .filter(F.col("df") >= min_df))
    return (postings.join(F.broadcast(stats), "w")
            .select(F.col("w").alias("word"), "doc_id", "tf",
                    "positions", "df", "cf")
            .orderBy("word", "doc_id"))
