"""Training-data pipeline operators: dedup, similarity search, text
analysis, multimodal plumbing. All hot paths are built-in Spark expressions
or Arrow-batched pandas UDFs — no row-at-a-time Python."""

from .dedup import (
    exact_duplicates,
    incremental_near_duplicates,
    lsh_candidate_pairs,
    minhash_signatures,
    near_duplicates,
    ngram_jaccard,
    simhash,
    simhash_near_duplicates,
)
from .similarity import (
    brute_force_topk,
    embedding_near_duplicates,
    ivf_build,
    ivf_kmeans_assign,
    ivf_topk,
    ivf_topk_pruned,
    kmeans_codebook,
    lsh_topk,
    recall_at_k,
)
from .curation import (
    c4_quality_filter,
    ccnet_buckets,
    holdout_split,
    paragraph_dedup,
    span_dedup_remove,
    span_dedup_stats,
)
from .linkgraph import seed_distance
from .maintext import classify_blocks, main_text
from .pipeline import (
    canonical_docs,
    cluster_pairs,
    corpus_pipeline,
    dup_clusters,
)
from .tokenizer import (
    bpe_token_counts,
    bpe_tokens,
    train_bpe,
    train_bpe_df,
)
from .textstats import (
    fingerprints,
    inverted_index,
    lang_id,
    quality_scores,
    token_counts,
    winnow_fingerprints,
)
from .langid import lang_id_model, train_lang_profiles

__all__ = [
    "exact_duplicates", "incremental_near_duplicates",
    "lsh_candidate_pairs", "minhash_signatures",
    "near_duplicates", "ngram_jaccard", "simhash",
    "simhash_near_duplicates",
    "brute_force_topk", "embedding_near_duplicates", "ivf_build",
    "ivf_kmeans_assign", "ivf_topk", "ivf_topk_pruned", "kmeans_codebook",
    "lsh_topk", "recall_at_k",
    "c4_quality_filter", "ccnet_buckets", "holdout_split",
    "paragraph_dedup", "span_dedup_remove", "span_dedup_stats",
    "seed_distance",
    "classify_blocks", "main_text",
    "canonical_docs", "cluster_pairs", "corpus_pipeline", "dup_clusters",
    "bpe_token_counts", "bpe_tokens", "train_bpe", "train_bpe_df",
    "fingerprints", "inverted_index", "lang_id", "quality_scores",
    "token_counts", "winnow_fingerprints",
    "lang_id_model", "train_lang_profiles",
]
