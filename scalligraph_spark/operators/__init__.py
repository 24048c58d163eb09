"""Scale operators beyond the reference surface: dedup, similarity,
text analysis, multimodal plumbing (BASELINE.json north star).

These are the operations a 100 TB training-data pipeline needs; each is
designed as a composition of built-in DataFrame ops (JVM-side, codegen'd)
with Pandas UDFs only where Spark lacks the primitive.
"""

from scalligraph_spark.operators.dedup import (
    contamination_check,
    exact_dedup,
    incremental_dedup,
    minhash_lsh_pairs,
    minhash_signature,
    near_dup_clusters,
    ngram_jaccard_pairs,
    pairs_to_clusters,
    simhash_pairs,
)
from scalligraph_spark.operators.graph_analytics import (
    connected_components,
    degrees,
    k_core,
    label_propagation,
    pagerank,
    triangle_count,
)
from scalligraph_spark.operators.multimodal import (
    extract_features,
    fake_media_from_documents,
    frame_sample,
)
from scalligraph_spark.operators.pipeline import (
    clean_corpus,
    corpus_profile,
    corpus_stats,
    pack_documents,
    sample_mixture,
    temperature_mixture,
    shuffle_shards,
    split_corpus,
    stratified_sample,
)
from scalligraph_spark.operators.similarity import (
    brute_force_cosine_topk,
    embedding_cosine_pairs,
    embedding_cosine_pairs_lsh,
    ivf_ann_topk,
    lsh_ann_topk,
    lsh_bucket_candidates,
    pq_encode,
    pq_topk,
    pq_train,
)
from scalligraph_spark.operators.temporal import (
    as_of_join,
    range_join,
)
from scalligraph_spark.operators.text import (
    document_fingerprint,
    duplicate_spans,
    hashed_bow_score,
    language_score,
    ngram_counts,
    pii_redact,
    quality_score,
    remove_duplicate_spans,
    repetition_scores,
    tfidf,
    token_count,
)

__all__ = [
    "as_of_join",
    "brute_force_cosine_topk",
    "clean_corpus",
    "contamination_check",
    "corpus_profile",
    "corpus_stats",
    "connected_components",
    "degrees",
    "document_fingerprint",
    "embedding_cosine_pairs",
    "embedding_cosine_pairs_lsh",
    "pagerank",
    "exact_dedup",
    "extract_features",
    "fake_media_from_documents",
    "incremental_dedup",
    "k_core",
    "label_propagation",
    "frame_sample",
    "ivf_ann_topk",
    "language_score",
    "lsh_ann_topk",
    "lsh_bucket_candidates",
    "minhash_lsh_pairs",
    "minhash_signature",
    "near_dup_clusters",
    "ngram_counts",
    "ngram_jaccard_pairs",
    "pii_redact",
    "pairs_to_clusters",
    "quality_score",
    "duplicate_spans",
    "hashed_bow_score",
    "remove_duplicate_spans",
    "repetition_scores",
    "range_join",
    "simhash_pairs",
    "pack_documents",
    "pq_encode",
    "pq_topk",
    "pq_train",
    "sample_mixture",
    "temperature_mixture",
    "shuffle_shards",
    "split_corpus",
    "stratified_sample",
    "tfidf",
    "token_count",
    "triangle_count",
]
