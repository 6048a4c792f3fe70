"""Model-based language identification — Cavnar & Trenkle 1994
("N-Gram-Based Text Categorization"), the classic ranked n-gram-profile
classifier, as pure built-in DataFrame ops.

Why this model: it is ALL-INTEGER (rank positions and out-of-place
distances — no log-probabilities, no floats), so training and scoring
are bit-identical across engines and the DuckDB oracle can RE-TRAIN the
profiles and re-score every document independently, end to end. It
replaces the stopword heuristic in ``textstats.lang_id`` with a real
trainable model (reference parity target: the reference has no lang-id;
this is part of the LLM-training-data operator set layered on top).

Plan shape at 100 TB:
- training: one explode → groupBy(lang, gram) count with map-side
  partials (shuffle carries vocabulary-sized rows, not text), then a
  per-language top-``profile_size`` window over ≤ langs × vocab rows;
- doc profiles: groupBy(doc_id, gram) + a doc-keyed window — both hash
  on doc_id, text itself never shuffles (only grams with counts);
- scoring: the trained profile table is langs × profile_size rows —
  broadcast; the distance is one partial-aggregated groupBy(doc_id,
  lang) and the argmin one doc-keyed window.

On the synthetic test corpus every language shares one vocabulary, so
predictions are deterministic but uninformative — the contract checks
the distributed training+scoring machinery, not model quality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

PROFILE_SIZE = 120    # grams kept per language profile (C&T use 300)
DOC_PROFILE_SIZE = 40  # grams kept per document profile
NGRAM_N = 3            # char n-gram width


def _char_grams(col, n: int = NGRAM_N):
    """Char n-grams over ' '-padded, whitespace-collapsed, lowercased
    text (C&T pad tokens; one pad around the whole string keeps the
    expression cheap and the oracle identical)."""
    norm = F.concat(F.lit(" "),
                    F.regexp_replace(F.trim(F.lower(col)), r"\s+", " "),
                    F.lit(" "))
    m = F.length(norm)
    return F.when(m >= n, F.transform(
        F.sequence(F.lit(1), m - n + 1),
        lambda i: F.substring(norm, i, n),
    )).otherwise(F.array(norm))


def train_lang_profiles(documents: DataFrame, n: int = NGRAM_N,
                        profile_size: int = PROFILE_SIZE) -> DataFrame:
    """Per-language ranked n-gram profile: (lang, gram, rank) with
    rank 1 = most frequent; ties broken by gram ascending so the
    ranking is a pure function of the corpus."""
    ex = documents.select("lang", F.explode(_char_grams(F.col("text"), n))
                          .alias("gram"))
    counts = ex.groupBy("lang", "gram").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("lang").orderBy(F.col("cnt").desc(),
                                           F.col("gram").asc())
    return (counts.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= profile_size)
            .select("lang", "gram", "rank"))


def lang_id_model(documents: DataFrame, n: int = NGRAM_N,
                  profile_size: int = PROFILE_SIZE,
                  doc_profile_size: int = DOC_PROFILE_SIZE) -> DataFrame:
    """Classify every document against the trained profiles by C&T's
    out-of-place measure: dist(doc, lang) = Σ over the doc's top
    ``doc_profile_size`` grams of |rank_doc − rank_lang|, with grams
    absent from the language profile costing ``profile_size``.
    Prediction = argmin distance, ties to the lexicographically first
    language. Output: (doc_id, lang, pred_lang, dist) — all integers.
    """
    profiles = train_lang_profiles(documents, n, profile_size) \
        .withColumnRenamed("lang", "cand")

    # True lang rides the doc-keyed branch (functionally dependent on
    # doc_id) so no corpus-sized join-back is needed at the end.
    ex = documents.select("doc_id", "lang",
                          F.explode(_char_grams(F.col("text"), n))
                          .alias("gram"))
    dcounts = (ex.groupBy("doc_id", "lang", "gram")
               .agg(F.count("*").alias("cnt")))
    dw = Window.partitionBy("doc_id").orderBy(F.col("cnt").desc(),
                                              F.col("gram").asc())
    doc_prof = (dcounts.withColumn("drank", F.row_number().over(dw))
                .filter(F.col("drank") <= doc_profile_size)
                .select("doc_id", "lang", "gram", "drank"))

    # Candidate languages from a pruned one-column scan (NOT a second
    # pass over the profile aggregation).
    langs = documents.select(F.col("lang").alias("cand")).distinct()
    # doc grams × candidate languages, left-joined against the broadcast
    # profile table; misses pay the max out-of-place penalty.
    scored = (doc_prof.crossJoin(F.broadcast(langs))
              .join(F.broadcast(profiles), ["cand", "gram"], "left")
              .select("doc_id", "lang", "cand",
                      F.coalesce(F.abs(F.col("drank") - F.col("rank")),
                                 F.lit(profile_size)).alias("oop")))
    dists = (scored.groupBy("doc_id", "lang", "cand")
             .agg(F.sum("oop").alias("dist")))
    best = Window.partitionBy("doc_id").orderBy(F.col("dist").asc(),
                                                F.col("cand").asc())
    return (dists.withColumn("rn", F.row_number().over(best))
            .filter(F.col("rn") == 1)
            .select("doc_id", "lang", F.col("cand").alias("pred_lang"),
                    F.col("dist").cast("bigint").alias("dist"))
            .orderBy("doc_id"))
