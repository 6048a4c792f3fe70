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

from pyspark.sql import DataFrame, functions as F

from .dedup import near_duplicates
from .textstats import fingerprints, quality_scores, token_counts


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
