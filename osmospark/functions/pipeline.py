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
                 max_iters: int = 20) -> DataFrame:
    """Connected components over the near-duplicate pair graph:
    (doc_id, cluster_id) for every document that appears in at least one
    near-dup pair, where cluster_id = min doc_id reachable through pairs.

    Distributed iterative min-label propagation (the simple half of
    Kiveris et al.'s large-star/small-star — adequate because near-dup
    components are shallow): each iteration joins labels across the
    undirected edge list and keeps the per-node minimum, checkpointing
    the label frame so lineage stays flat; stops when no label changed.
    Components whose diameter exceeds ``max_iters`` would be pathological
    for near-dup data; if the loop exits via the cap with labels still
    changing, a WARNING is logged and the (non-converged) labels are
    returned. Each iteration is one shuffle on doc_id; the edge list is
    reused from a single eager checkpoint."""
    pairs = (near_duplicates(documents, jaccard_threshold)
             .select("doc_a", "doc_b").localCheckpoint(eager=True))
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
                "or use large-star/small-star for chain-shaped graphs)",
                max_iters, changed)
    return labels.orderBy("doc_id")


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
