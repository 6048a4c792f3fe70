"""End-to-end training-data curation pipeline — the composite query a
pretraining-data team actually runs over a crawled corpus:

    quality gate → exact dedup (canonical per fingerprint)
                 → near-dup removal (MinHash-LSH pairs)
                 → token accounting for the surviving documents

Every stage is an existing oracle-checked operator; the composition adds
no new Python — it is one declarative plan Catalyst fuses:

- quality / fingerprint / token-count projections are MAP-ONLY over the
  same documents scan (column-pruned, whole-stage codegen);
- exact-dedup canonicalization is ONE shuffle on the fingerprint;
- near-dup pairs come from the banded, size-capped LSH self-join
  (never all-pairs);
- survivor selection is key joins on doc_id that AQE can plan as
  broadcast when the gated side is small.

Near-dup removal rule (deterministic, non-iterative): a document is
dropped if it appears as the HIGHER id of any near-duplicate pair
(keep-lowest-id greedy). Transitive clusters collapse toward their
minimum without requiring an iterative connected-components pass — the
standard production shortcut; the full CC variant is `dup_clusters`.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, functions as F

from .dedup import near_duplicates
from .textstats import fingerprints, quality_scores, token_counts


def dup_clusters(documents: DataFrame,
                 jaccard_threshold: float = 0.5,
                 max_iters: int = 20,
                 algorithm: str = "propagate") -> DataFrame:
    """Connected components over the near-duplicate pair graph:
    (doc_id, cluster_id) for every document that appears in at least one
    near-dup pair, where cluster_id = min doc_id reachable through pairs.

    ``algorithm``:

    - ``'propagate'`` (default): iterative min-label propagation — one
      shuffle per iteration, rounds proportional to component DIAMETER.
      The right choice for near-dup graphs, whose components are shallow.
    - ``'star'``: Kiveris et al.'s alternating large-star/small-star
      (MapReduce CC) — O(log² n) rounds on ANY graph shape, two shuffles
      per iteration. The web-scale choice when components can be long
      chains (e.g. template drift across a crawl); proven equal to
      propagate on every input, and convergent where propagate's
      iteration cap trips (see tests).

    Both paths checkpoint per iteration (flat lineage) and log a WARNING
    if the cap is hit before convergence."""
    pairs = (near_duplicates(documents, jaccard_threshold)
             .select("doc_a", "doc_b").localCheckpoint(eager=True))
    return cluster_pairs(pairs, max_iters=max_iters, algorithm=algorithm)


def cluster_pairs(pairs: DataFrame, max_iters: int = 20,
                  algorithm: str = "propagate") -> DataFrame:
    """Connected components over an arbitrary (doc_a, doc_b) pair frame —
    the graph core of ``dup_clusters``, exposed so any candidate-pair
    producer (MinHash, SimHash, embedding near-dup) can be clustered."""
    if algorithm == "propagate":
        return _cc_propagate(pairs, max_iters)
    if algorithm == "star":
        return _cc_star(pairs, max_iters)
    raise ValueError(f"unknown algorithm {algorithm!r}")


def _cc_propagate(pairs: DataFrame, max_iters: int) -> DataFrame:
    """Min-label propagation: each iteration joins labels across the
    undirected edge list and keeps the per-node minimum; stops when no
    label changed. Each iteration is one shuffle on doc_id; the edge
    list is reused from a single eager checkpoint."""
    edges = (pairs.select(F.col("doc_a").alias("src"),
                          F.col("doc_b").alias("dst"))
             .unionByName(pairs.select(F.col("doc_b").alias("src"),
                                       F.col("doc_a").alias("dst"))))
    labels = (edges.groupBy(F.col("src").alias("doc_id"))
              .agg(F.min("dst").alias("cluster_id"))
              .select("doc_id",
                      F.least("doc_id", "cluster_id").alias("cluster_id"))
              .localCheckpoint(eager=True))
    for _ in range(max_iters):
        # propagate: a node adopts the smallest label among itself and
        # its neighbours' labels
        nbr = (edges.join(labels.withColumnRenamed("doc_id", "src"), "src")
               .groupBy(F.col("dst").alias("doc_id"))
               .agg(F.min("cluster_id").alias("nbr_min")))
        new_labels = (labels.join(nbr, "doc_id", "left")
                      .select("doc_id",
                              F.least("cluster_id",
                                      F.coalesce("nbr_min", "cluster_id"))
                              .alias("cluster_id"))
                      .localCheckpoint(eager=True))
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), "doc_id")
                   .filter(F.col("n.cluster_id") != F.col("o.cluster_id"))
                   .count())
        labels = new_labels
        if changed == 0:
            break
    else:
        if max_iters > 0 and changed > 0:
            logging.getLogger("osmospark.pipeline").warning(
                "dup_clusters: hit max_iters=%d with %d labels still "
                "changing — returned cluster ids are NOT converged (a "
                "component's diameter exceeds the cap; raise max_iters "
                "or use algorithm='star' for chain-shaped graphs)",
                max_iters, changed)
    return labels.orderBy("doc_id")


def _cc_star(pairs: DataFrame, max_iters: int) -> DataFrame:
    """Alternating large-star/small-star (Kiveris et al., 'Connected
    Components in MapReduce and Beyond', SoCC'14): converges in O(log²
    n) rounds regardless of component diameter — each round HALVES long
    chains instead of walking them one hop at a time.

    - large-star: around each node u, every strictly-larger neighbour
      re-attaches to the minimum of u's closed neighbourhood;
    - small-star: edges point larger→smaller; each node and its
      smaller-or-equal neighbours attach to the neighbourhood minimum.

    Both phases are one groupBy-min plus one join per phase — shuffles
    keyed on node ids, map-side combinable, nothing driver-side. The
    fixpoint is a star forest: every node points at its component's
    minimum, which is exactly the (doc_id, cluster_id) contract."""
    edges = (pairs.select(F.col("doc_a").alias("u"),
                          F.col("doc_b").alias("v"))
             .filter(F.col("u") != F.col("v"))
             .distinct().localCheckpoint(eager=True))
    if not edges.head(1):
        return edges.select(F.col("u").alias("doc_id"),
                            F.col("v").alias("cluster_id"))
    log_ = logging.getLogger("osmospark.pipeline")
    converged = False
    n_edges = edges.count()
    for _ in range(max_iters):
        # large-star over the undirected neighbourhood
        und = edges.unionByName(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        m = (und.groupBy("u").agg(F.min("v").alias("_mn"))
             .select("u", F.least("u", "_mn").alias("m")))
        large = (und.join(m, "u")
                 .filter(F.col("v") > F.col("u"))
                 .select(F.col("v").alias("u"), F.col("m").alias("v"))
                 .filter(F.col("u") != F.col("v"))
                 .distinct())
        # small-star over larger→smaller edges
        directed = large.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        m2 = (directed.groupBy("u").agg(F.min("v").alias("_mn"))
              .select("u", F.least("u", "_mn").alias("m")))
        with_m = directed.join(m2, "u")
        small = (with_m.select(F.col("v").alias("u"), F.col("m").alias("v"))
                 .unionByName(with_m.select("u", F.col("m").alias("v")))
                 .filter(F.col("u") != F.col("v"))
                 .distinct().localCheckpoint(eager=True))
        # fixpoint = identical edge SET. Both frames are distinct, so
        # |small| == |edges| AND small ⊆ edges ⇒ equality: one cheap
        # count over the fresh checkpoint's blocks, then ONE bounded
        # left-anti probe — and only when the counts already agree.
        # (The previous two full exceptAll scans per round cost ~2×
        # the edge set in shuffle purely to detect the fixpoint.)
        n_small = small.count()
        same = n_small == n_edges and not (
            small.join(edges, ["u", "v"], "left_anti").head(1))
        edges, n_edges = small, n_small
        if same:
            converged = True
            break
    if not converged:
        log_.warning(
            "dup_clusters(star): hit max_iters=%d before the star-forest "
            "fixpoint — returned cluster ids may not be fully merged",
            max_iters)
    roots = edges.select(F.col("v").alias("doc_id")).distinct()
    return (edges.select(F.col("u").alias("doc_id"),
                         F.col("v").alias("cluster_id"))
            .unionByName(roots.select(
                "doc_id", F.col("doc_id").alias("cluster_id")))
            .orderBy("doc_id"))


def corpus_pipeline(documents: DataFrame,
                    jaccard_threshold: float = 0.5) -> DataFrame:
    """Returns (doc_id, ws_tokens, bpe_tokens) for documents that survive
    the quality gate, exact dedup, and near-dup removal."""
    gated = (quality_scores(documents)
             .filter(F.col("keep"))
             .select("doc_id"))
    canonical = (fingerprints(documents)
                 .groupBy("fingerprint")
                 .agg(F.min("doc_id").alias("doc_id"))
                 .select("doc_id"))
    dup_high = (near_duplicates(documents, jaccard_threshold)
                .select(F.col("doc_b").alias("doc_id"))
                .distinct())
    survivors = (gated.join(canonical, "doc_id")
                 .join(dup_high, "doc_id", "left_anti"))
    return (token_counts(documents)
            .join(survivors, "doc_id")
            .orderBy("doc_id"))


def canonical_docs(documents: DataFrame,
                   jaccard_threshold: float = 0.5,
                   score_col: str = "n_chars",
                   max_iters: int = 20,
                   algorithm: str = "propagate") -> DataFrame:
    """Representative selection over near-duplicate clusters — the
    step after dedup clustering in every corpus pipeline: instead of
    dropping all-but-lowest-id (what ``corpus_pipeline`` does), keep
    the HIGHEST-QUALITY member of each cluster (C4/RefinedWeb keep the
    longest / best-scored variant, not an arbitrary one). Singleton
    docs are their own cluster and always canonical.

    Output: (doc_id, cluster_id, score, is_canonical) for EVERY input
    document; exactly one canonical row per cluster — max score, ties
    to the lowest doc_id.

    Scale shape: rides ``dup_clusters`` (banded LSH + min-label CC),
    then ONE cluster-keyed aggregation picks representatives via a
    (score, −doc_id, doc_id) struct max — map-side partial max, no
    window over the corpus; the join back is cluster-keyed on frames
    that carry only ids and one integer score.
    """
    clusters = dup_clusters(documents, jaccard_threshold,
                            max_iters=max_iters, algorithm=algorithm)
    m = (documents.select("doc_id",
                          F.col(score_col).cast("bigint").alias("score"))
         .join(clusters, "doc_id", "left")
         .select("doc_id",
                 F.coalesce("cluster_id", "doc_id").alias("cluster_id"),
                 "score"))
    rep = (m.groupBy("cluster_id")
           .agg(F.max(F.struct(F.col("score"),
                               (-F.col("doc_id")).alias("_neg"),
                               F.col("doc_id").alias("_d")))
                .alias("_best"))
           .select("cluster_id", F.col("_best._d").alias("_rep")))
    return (m.join(rep, "cluster_id")
            .select("doc_id", "cluster_id", "score",
                    (F.col("doc_id") == F.col("_rep"))
                    .alias("is_canonical"))
            .orderBy("doc_id"))
