"""Deduplication over the documents table — the operations a 100 TB
training-data pipeline runs before anything else.

- exact:          hash-groupBy on a normalized fingerprint;
- minhash + LSH:  shingle → minhash signature → banded bucket keys →
                  bucket join (candidate pairs without O(n²));
- simhash:        64-bit bitwise-majority signature over token hashes;
- n-gram Jaccard: exact similarity on LSH candidates (verify stage).

Everything below is built-in expressions (transform/aggregate/filter over
arrays) — no Python UDFs — so Catalyst pipelines it inside whole-stage
codegen and the only shuffles are the groupBys/joins on dedup keys.

Portability note: shingle hashes use lexicographic MIN over
``substr(md5(seed || shingle), 1, 16)`` — minhash over a uniform hex-string
space — because that exact expression also runs on the DuckDB oracle side.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, functions as F

N_MINHASH = 12          # signature length
LSH_BANDS = 4           # bands of 3 rows each
SHINGLE_W = 3           # 3-word shingles
MAX_BAND_BUCKET = 2000  # band-bucket size cap (anti-skew, see below)

log = logging.getLogger("osmospark.dedup")


def _norm_text(col):
    return F.regexp_replace(F.trim(F.lower(col)), r"\s+", " ")


def _shingles(col):
    # zip_with chain, not transform-over-indices: a slice(words, i, W)
    # inside an interpreted HOF lambda re-splits the text per shingle —
    # O(W²) (see curation._word_grams; same measured cliff)
    words = F.split(_norm_text(col), " ")
    n = F.size(words)
    g = words
    for j in range(1, SHINGLE_W):
        g = F.zip_with(g, F.slice(words, j + 1, n),
                       lambda x, y: F.concat(x, F.lit(" "), y))
    g = F.filter(g, lambda x: x.isNotNull())
    return F.when(n >= SHINGLE_W, g).otherwise(F.array(_norm_text(col)))


def exact_duplicates(documents: DataFrame) -> DataFrame:
    """Exact dedup: groups of identical normalized content; keeps the min
    doc_id as canonical. One shuffle on the fingerprint."""
    norm = _norm_text(F.col("text"))
    return (
        documents.select("doc_id", F.md5(norm).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("canonical_id"),
             F.count("*").alias("n_copies"))
        .filter(F.col("n_copies") > 1)
    )


MINHASH_P2 = 1_000_000_007
MINHASH_M = 2_147_483_647


def minhash_signatures(documents: DataFrame,
                       n_hashes: int = N_MINHASH) -> DataFrame:
    """Per-document minhash signature columns mh_0..mh_{n-1} (bigint).

    Scale shape: each shingle is hashed ONCE (md5 → 60-bit int) on exploded
    rows, and the n signature values derive arithmetically
    (h + k·(h mod P2)) mod M — Kirsch–Mitzenmacher double hashing — as n
    codegen'd MIN aggregates with map-side partial aggregation. One shuffle
    on doc_id; no higher-order-function re-evaluation per hash (the naive
    n×transform(md5) formulation re-ran the whole shingle+md5 pipeline per
    signature column: ~30× slower at sf0.1)."""
    sh = _shingles(F.col("text"))
    ex = documents.select("doc_id", F.explode(sh).alias("s"))
    h = F.conv(F.substring(F.md5("s"), 1, 15), 16, 10).cast("bigint")
    ex = ex.select("doc_id", h.alias("h"),
                   (h % F.lit(MINHASH_P2)).alias("h2"))
    aggs = [
        F.min((F.col("h") + F.lit(k) * F.col("h2")) % F.lit(MINHASH_M))
        .alias(f"mh_{k}")
        for k in range(n_hashes)
    ]
    return ex.groupBy("doc_id").agg(*aggs)


def lsh_candidate_pairs(documents: DataFrame,
                        n_hashes: int = N_MINHASH,
                        bands: int = LSH_BANDS,
                        max_bucket_size: int | None = MAX_BAND_BUCKET,
                        ) -> DataFrame:
    """Banded LSH: documents sharing any band key become candidate pairs.
    Shuffles: one per band groupBy — all on short string keys.

    Skew guard: a band bucket larger than ``max_bucket_size`` (identical
    boilerplate across a big corpus) would make the self-join quadratic in
    that bucket — standard MinHash-LSH practice is to DROP such buckets
    (its members are near-identical to thousands of others; exact dedup
    catches them far cheaper than pairwise LSH). The drop is never silent:
    the count of dropped buckets is logged at WARNING. Output is identical
    whenever no bucket exceeds the cap; pass ``max_bucket_size=None`` to
    disable."""
    sigs = minhash_signatures(documents, n_hashes)
    exploded = _band_entries(sigs, n_hashes, bands)
    return _banded_pairs(exploded, max_bucket_size, what="LSH")


def _band_entries(sigs: DataFrame, n_hashes: int, bands: int) -> DataFrame:
    """(doc_id, band, band_key) rows from a signature frame. ONE
    projection computes every band key (a per-band union would make
    Catalyst re-evaluate the whole minhash MD5 pipeline once per band and
    once per self-join side — ~2×bands recomputations), then explode."""
    rows = n_hashes // bands
    entries = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws("|", *[F.col(f"mh_{b * rows + r}")
                               for r in range(rows)]).alias("band_key"))
        for b in range(bands)
    ])
    return (sigs.select("doc_id", F.explode(entries).alias("e"))
            .select("doc_id", "e.band", "e.band_key"))


def _banded_pairs(exploded: DataFrame,
                  max_bucket_size: int | None,
                  what: str) -> DataFrame:
    """Skew-capped banded self-join: (doc_id, band, band_key) rows →
    distinct candidate (doc_a, doc_b) pairs sharing any band bucket.
    Shared by MinHash-LSH and SimHash banding.

    exploded is materialized once so the self-join reads both sides from
    storage instead of re-running the signature computation per side.
    The cap is ONE keys-only aggregation: groupBy on the same
    (band, band_key) the self-join uses, map-side partial combine,
    shuffling only short key pairs. The r2 formulation (count-over-window
    + a separate distinct().count() job just to log the drop count)
    sorted the FULL exploded frame per join side and re-scanned it
    unconditionally — +48% on the sf0.1 dedup_minhash bench. Here the
    over-cap list is the lazily PERSISTED broadcast side of a LEFT ANTI,
    so the sizing runs inside the pairs job's own broadcast build (no
    extra orchestrated job, never collected to the driver) and the
    WARNING count afterwards is a cache hit."""
    exploded = exploded.persist()
    joinable = exploded
    hot = None
    if max_bucket_size is not None:
        hot = (exploded.groupBy("band", "band_key").count()
               .filter(F.col("count") > max_bucket_size)
               .select("band", "band_key")
               .persist())
        joinable = exploded.join(F.broadcast(hot),
                                 ["band", "band_key"], "left_anti")
    a = joinable.alias("a")
    b_ = joinable.alias("b")
    pairs = (
        a.join(b_, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.band_key") == F.col("b.band_key"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    # materialize the (small) pair list so the persisted exploded frame can
    # be released immediately — a bare unpersist would otherwise silently
    # invalidate downstream plans still reading it
    pairs = pairs.localCheckpoint(eager=True)
    if hot is not None:
        # the pairs job's broadcast build already populated hot's cache;
        # this count is a cached-scan, and the drop is never silent
        n_dropped = hot.count()
        if n_dropped:
            log.warning(
                "%s: dropped %d band buckets over the %d-member cap "
                "(near-identical boilerplate; exact dedup handles these)",
                what, n_dropped, max_bucket_size)
        hot.unpersist()
    exploded.unpersist()
    return pairs


def ngram_jaccard(documents: DataFrame, pairs: DataFrame) -> DataFrame:
    """Exact shingle-Jaccard on candidate pairs (the verify stage after
    LSH). Broadcast-joins the shingle sets onto the pair list."""
    sh = documents.select(F.col("doc_id"),
                          F.array_distinct(_shingles(F.col("text")))
                          .alias("sh"))
    out = (
        pairs
        .join(sh.withColumnRenamed("doc_id", "doc_a")
                .withColumnRenamed("sh", "sh_a"), "doc_a")
        .join(sh.withColumnRenamed("doc_id", "doc_b")
                .withColumnRenamed("sh", "sh_b"), "doc_b")
        .select(
            "doc_a", "doc_b",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
                / F.size(F.array_union("sh_a", "sh_b")), 6,
            ).alias("jaccard"),
        )
    )
    return out


def near_duplicates(documents: DataFrame, threshold: float = 0.7) -> DataFrame:
    """MinHash-LSH → exact Jaccard ≥ threshold: the full near-dup pipeline."""
    pairs = lsh_candidate_pairs(documents)
    return (ngram_jaccard(documents, pairs)
            .filter(F.col("jaccard") >= threshold)
            .orderBy("doc_a", "doc_b"))


def containment(documents: DataFrame, pairs: DataFrame) -> DataFrame:
    """Exact Broder containment (Broder, SEQUENCES'97) on candidate
    pairs, over the distinct 3-word shingle sets: asymmetric overlap
    ``c_ab = |A∩B|·1000 div |A|`` (how much of A lies inside B) and
    the mirror ``c_ba`` — integer permille, so both engines agree
    bit-exactly. Jaccard misses inclusion with a size mismatch (a
    quote wholly inside a 100× larger page scores ~1% Jaccard but
    1000‰ containment); this is the verify stage that catches it.
    Broadcast-joins the shingle arrays onto the (small) pair list —
    same plan shape as ``ngram_jaccard``."""
    sh = documents.select(F.col("doc_id"),
                          F.array_distinct(_shingles(F.col("text")))
                          .alias("sh"))
    return (
        pairs
        .join(sh.withColumnRenamed("doc_id", "doc_a")
                .withColumnRenamed("sh", "sh_a"), "doc_a")
        .join(sh.withColumnRenamed("doc_id", "doc_b")
                .withColumnRenamed("sh", "sh_b"), "doc_b")
        .select(
            "doc_a", "doc_b",
            F.size(F.array_intersect("sh_a", "sh_b")).cast("bigint")
            .alias("inter"),
            F.size("sh_a").cast("bigint").alias("n_a"),
            F.size("sh_b").cast("bigint").alias("n_b"))
        .select("doc_a", "doc_b", "inter", "n_a", "n_b",
                F.expr("(inter * 1000) div n_a").cast("bigint")
                .alias("c_ab_permille"),
                F.expr("(inter * 1000) div n_b").cast("bigint")
                .alias("c_ba_permille")))


def partial_duplicates(documents: DataFrame,
                       threshold_permille: int = 700,
                       max_bucket_size: int | None = MAX_BAND_BUCKET
                       ) -> DataFrame:
    """Partial-duplicate detection: winnow-fingerprint candidates →
    exact containment ≥ ``threshold_permille`` in EITHER direction.
    Catches what the Jaccard pipeline structurally cannot: a document
    duplicated INSIDE a larger one (syndicated articles with added
    boilerplate, quote farms, aggregator pages).

    Candidate generation uses MOSS winnowing (Schleimer et al.,
    SIGMOD'03) instead of MinHash banding because winnowing's guarantee
    is about shared RUNS, not whole-set similarity: any common word run
    of w+k−1 (= 6) words shares a fingerprint, regardless of how large
    the containing document is — exactly the asymmetric case MinHash
    bands miss (band collision probability decays with Jaccard, and
    Jaccard decays with the size ratio). The fingerprint self-join
    rides the same skew-capped ``_banded_pairs`` core as the LSH/
    SimHash pipelines (keys-only sizing aggregate as a broadcast LEFT
    ANTI; hot fingerprints = corpus-wide boilerplate runs, dropped
    loudly). At 100 TB the shuffle carries (fingerprint, doc_id) longs
    — a few winnow minima per doc, cheaper than the shingle stream —
    and the exact verify touches only the candidate pairs."""
    from .textstats import winnow_hashes_expr, winnow_mins_expr

    exploded = (documents
                .withColumn("_hs", winnow_hashes_expr(F.col("text")))
                .select("doc_id", F.lit(0).alias("band"),
                        F.explode(winnow_mins_expr(F.col("_hs")))
                        .alias("band_key")))
    pairs = _banded_pairs(exploded, max_bucket_size, "partial-dup winnow")
    return (containment(documents, pairs)
            .filter(F.greatest("c_ab_permille", "c_ba_permille")
                    >= threshold_permille)
            .orderBy("doc_a", "doc_b"))


def incremental_near_duplicates(base: DataFrame, delta: DataFrame,
                                threshold: float = 0.5,
                                n_hashes: int = N_MINHASH,
                                bands: int = LSH_BANDS,
                                max_bucket_size: int | None =
                                MAX_BAND_BUCKET) -> DataFrame:
    """Near-dup detection of a NEW batch against an EXISTING corpus —
    the daily-delta shape at 100 TB. The base corpus is NEVER
    self-joined or re-paired: candidate generation is ONE streaming pass
    over the base's banded signature entries (exactly the table a
    production pipeline keeps persisted between ingests) against the
    BROADCAST delta bands (delta ≪ base), and the exact-Jaccard verify
    streams base shingles once against the broadcast candidates + delta
    shingles. Re-running the full ``near_duplicates`` self-join over
    base+delta would cost O((B+D)²/buckets); this costs O(B) scans with
    no base shuffle.

    Same anti-skew cap as ``_banded_pairs``, applied to BASE buckets (a
    boilerplate bucket of b docs would emit b candidates per matching
    delta doc): over-cap buckets are dropped via a broadcast LEFT ANTI
    whose sizing aggregate is keys-only, and the drop is logged.

    Output: (delta_id, base_id, jaccard) with jaccard ≥ threshold."""
    base_ex = _band_entries(minhash_signatures(base, n_hashes),
                            n_hashes, bands).persist()
    delta_ex = _band_entries(minhash_signatures(delta, n_hashes),
                             n_hashes, bands)
    joinable = base_ex
    hot = None
    if max_bucket_size is not None:
        hot = (base_ex.groupBy("band", "band_key").count()
               .filter(F.col("count") > max_bucket_size)
               .select("band", "band_key")
               .persist())
        joinable = base_ex.join(F.broadcast(hot),
                                ["band", "band_key"], "left_anti")
    cand = (joinable.join(
        F.broadcast(delta_ex.withColumnRenamed("doc_id", "delta_id")),
        ["band", "band_key"])
        .select("delta_id", F.col("doc_id").alias("base_id"))
        .distinct()
        .localCheckpoint(eager=True))
    if hot is not None:
        n_dropped = hot.count()     # cache hit — populated by cand's job
        if n_dropped:
            log.warning(
                "incremental LSH: dropped %d base band buckets over the "
                "%d-member cap", n_dropped, max_bucket_size)
        hot.unpersist()
    base_ex.unpersist()

    bsh = base.select(F.col("doc_id").alias("base_id"),
                      F.array_distinct(_shingles(F.col("text")))
                      .alias("sh_b"))
    dsh = delta.select(F.col("doc_id").alias("delta_id"),
                       F.array_distinct(_shingles(F.col("text")))
                       .alias("sh_d"))
    return (bsh.join(F.broadcast(cand), "base_id")
            .join(F.broadcast(dsh), "delta_id")
            .select("delta_id", "base_id",
                    F.round(
                        F.size(F.array_intersect("sh_b", "sh_d"))
                        .cast("double")
                        / F.size(F.array_union("sh_b", "sh_d")), 6)
                    .alias("jaccard"))
            .filter(F.col("jaccard") >= threshold)
            .orderBy("delta_id", "base_id"))


def simhash_near_duplicates(documents: DataFrame,
                            max_hamming: int = 3,
                            bits: int = 64,
                            max_bucket_size: int | None = MAX_BAND_BUCKET,
                            ) -> DataFrame:
    """SimHash near-dup join — the Google web-dedup algorithm (Manku,
    Jain & Das Sarma, WWW'07): pairs whose ``bits``-bit signatures differ
    in at most ``max_hamming`` bits. Complements MinHash near-dup: one
    64-bit signature per doc instead of a shingle set, so the candidate
    stage shuffles ~8 bytes/doc/band.

    Pigeonhole banding: the signature splits into ``max_hamming + 1``
    near-equal bands — any pair within the distance budget agrees EXACTLY
    on at least one band — so candidates come from per-band bucket joins
    (the same skew-capped ``_banded_pairs`` core as MinHash-LSH, never an
    all-pairs product). Verify: exact Hamming distance on the candidate
    pairs, JVM-side (filter over a sequence of per-position char
    comparisons). Output (doc_a, doc_b, hamming), ordered."""
    bands = max_hamming + 1
    if bands > bits:
        raise ValueError("max_hamming + 1 bands need at least that many bits")
    # materialize the signatures ONCE: the frame is consumed three times
    # (banding explode, sig_a join, sig_b join) and the md5-per-token
    # aggregate is the expensive part of the whole query — unmaterialized,
    # every consumer recomputes it, and under AQE each broadcast-build
    # stage materializes separately so the recomputation multiplies
    # (measured at sf0.1/local[32]: 5.6 s AQE-off / 11.8 s AQE-on before;
    # ~4.4 s under BOTH after). At corpus scale the signature table is
    # ~80 bytes/doc — checkpointing it beats re-hashing the full text 3×.
    sigs = simhash(documents, bits=bits).localCheckpoint(eager=True)
    width = bits // bands
    starts = [b * width for b in range(bands)]
    widths = [width] * (bands - 1) + [bits - starts[-1]]  # last takes slack
    entries = F.array(*[
        F.struct(F.lit(b).alias("band"),
                 F.substring("simhash", starts[b] + 1, widths[b])
                 .alias("band_key"))
        for b in range(bands)
    ])
    exploded = (sigs.select("doc_id", F.explode(entries).alias("e"))
                .select("doc_id", "e.band", "e.band_key"))
    pairs = _banded_pairs(exploded, max_bucket_size, what="SimHash")
    sa = sigs.select(F.col("doc_id").alias("doc_a"),
                     F.col("simhash").alias("sig_a"))
    sb = sigs.select(F.col("doc_id").alias("doc_b"),
                     F.col("simhash").alias("sig_b"))
    ham = F.size(F.filter(
        F.sequence(F.lit(1), F.lit(bits)),
        lambda i: F.col("sig_a").substr(i, F.lit(1))
        != F.col("sig_b").substr(i, F.lit(1))))
    return (pairs.join(sa, "doc_a").join(sb, "doc_b")
            .select("doc_a", "doc_b", ham.alias("hamming"))
            .filter(F.col("hamming") <= max_hamming)
            .orderBy("doc_a", "doc_b"))


def simhash(documents: DataFrame, bits: int = 64) -> DataFrame:
    """SimHash signature: per bit, the sign of the sum over tokens of
    (+1 / -1) by that bit of the token hash. 64-bit default — 16-bit
    signatures collide heavily at corpus scale.

    Portable hash shared bit-exactly with the DuckDB oracle: each token
    hashes ONCE to two 60-bit bigints (md5 hex chars 1-15 and 16-30);
    bit b is ``(h1 >> b) & 1`` for b < 60, else ``(h2 >> (b-60)) & 1``
    (up to 120 bits). ONE array-accumulator aggregate sums all per-bit
    signs in a single pass over the token list — the r2 formulation ran
    one full md5-per-token aggregate PER BIT (16× then, 64× now)."""
    if bits > 120:
        raise ValueError("simhash supports at most 120 bits")
    words = F.split(_norm_text(F.col("text")), " ")

    def _h(w, lo):
        # 15 hex chars = 60 bits, safely inside a signed bigint
        return F.conv(F.substring(F.md5(w), lo, 15), 16, 10).cast("bigint")

    hs = F.transform(words, lambda w: F.struct(
        _h(w, 1).alias("h1"), _h(w, 16).alias("h2")))

    def _signs(s):
        # literal shift amounts: the bits loop unrolls driver-side
        return F.array(*[
            F.when(F.shiftright(s["h1"] if b < 60 else s["h2"],
                                b if b < 60 else b - 60)
                   % 2 == 1, F.lit(1)).otherwise(F.lit(-1))
            for b in range(bits)])

    sums = F.aggregate(
        hs, F.array_repeat(F.lit(0), bits),
        lambda acc, s: F.zip_with(acc, _signs(s), lambda a, x: a + x))
    # materialize the sums array as its own projection so the per-bit
    # sign readout reuses ONE aggregate instead of inlining `bits` copies
    with_sums = documents.select("doc_id", sums.alias("_sums"))
    sig = F.concat(*[
        F.when(F.element_at("_sums", b + 1) >= 0,
               F.lit("1")).otherwise(F.lit("0"))
        for b in range(bits)
    ])
    return with_sums.select("doc_id", sig.alias("simhash"))
