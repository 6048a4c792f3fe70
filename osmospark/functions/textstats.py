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


def winnow_fingerprints(documents: DataFrame, k: int = WINNOW_K,
                        w: int = WINNOW_W) -> DataFrame:
    """Rolling-hash document fingerprinting by winnowing (Schleimer et al.,
    SIGMOD'03 — the MOSS scheme): hash every word k-gram, slide a window of
    w hashes, keep each window's minimum; the deduplicated sorted minima
    are the document fingerprint. Guarantees any shared run of
    w + k - 1 words between two documents shares at least one fingerprint.

    All built-in expressions (transform/slice/array_min) inside
    whole-stage codegen — the same portable md5→bigint hash as the minhash
    pipeline so the DuckDB oracle agrees exactly."""
    norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    words = F.split(norm, " ")
    n = F.size(words)
    grams = F.when(n >= k, F.transform(
        F.sequence(F.lit(1), n - k + 1),
        lambda i: F.concat_ws(" ", F.slice(words, i, k)),
    )).otherwise(F.array(norm))
    hs = F.transform(
        grams,
        lambda g: F.conv(F.substring(F.md5(g), 1, 15), 16, 10)
        .cast("bigint"))
    m = F.size(hs)
    mins = F.when(m >= w, F.transform(
        F.sequence(F.lit(1), m - w + 1),
        lambda i: F.array_min(F.slice(hs, i, w)),
    )).otherwise(F.array(F.array_min(hs)))
    fp = F.array_sort(F.array_distinct(mins))
    return documents.select(
        "doc_id",
        F.size(fp).alias("n_fp"),
        F.concat_ws(",", F.transform(fp, lambda x: x.cast("string")))
        .alias("fingerprint"),
    )
