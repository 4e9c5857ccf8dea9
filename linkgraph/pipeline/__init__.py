"""Large-scale training-data pipeline operators over the `documents`
and `embeddings` tables: deduplication (exact, MinHash+LSH, SimHash,
n-gram Jaccard), similarity search (brute-force + LSH-bucketed + IVF ANN),
text analysis (token stats, quality scoring, language-ID heuristic),
document fingerprinting (winnowing rolling-hash), and multimodal
binary-column plumbing.

All hot paths are JVM-side built-in functions (explode / groupBy /
window) — no per-row Python; the only Python is the multimodal decode
stub (vectorized mapInPandas, the decode itself deliberately stubbed —
image/audio libs are not in this sandbox).
"""

from linkgraph.pipeline.dedup import (
    dedup_clusters,
    minhash_jaccard_pairs,
    exact_dup_groups,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    normalize_text,
    normalized_dup_groups,
    simhash,
    simhash_near_pairs,
)
from linkgraph.pipeline.fingerprint import copy_candidates, winnow_fingerprints
from linkgraph.pipeline.simsearch import (
    cosine_topk,
    embedding_near_dup_pairs,
    ivf_ann_topk,
    lsh_ann_topk,
)
from linkgraph.pipeline.textstats import (
    bpe_token_stats,
    c4_quality,
    gopher_quality,
    repetition_signals,
    lang_id,
    pmi_topk,
    tfidf_topk,
    token_stats,
    unigram_logprob,
    vocab_stats,
)
from linkgraph.pipeline.retrieval import bm25_topk, inverted_index
from linkgraph.pipeline.chunking import chunk_documents
from linkgraph.pipeline.sketches import cms_estimate, count_min_sketch, hll_distinct, hll_distinct_by, word_trigrams
from linkgraph.pipeline.embedpca import embedding_covariance, pca_project
from linkgraph.pipeline.bloom import bloom_build, bloom_probe
from linkgraph.pipeline.layout import zorder_expr, zorder_key
from linkgraph.pipeline.bpe import bpe_encode, bpe_learn
from linkgraph.pipeline.masking import mask_tokens, skipgram_pairs
from linkgraph.pipeline.covisit import covisitation
from linkgraph.pipeline.funnel import event_transitions, funnel_counts, retention_cohorts, session_paths
from linkgraph.pipeline.embedcluster import (
    cluster_balanced_sample,
    kmeans,
    pq_codes,
    semantic_dedup,
)
from linkgraph.pipeline.decontam import decontaminate, word_ngrams
from linkgraph.pipeline.pii import pii_redact
from linkgraph.pipeline.embedprop import feature_propagation
from linkgraph.pipeline.packing import pack_sequences
from linkgraph.pipeline.sampling import (
    fold_split,
    group_capped_sample,
    hash_sample,
    stratified_sample,
    weighted_sample,
)
from linkgraph.pipeline.urlnorm import canonicalize_urls, url_filter

__all__ = [
    "exact_dup_groups",
    "normalize_text",
    "normalized_dup_groups",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "minhash_jaccard_pairs",
    "simhash",
    "simhash_near_pairs",
    "ngram_jaccard_pairs",
    "dedup_clusters",
    "cosine_topk",
    "lsh_ann_topk",
    "ivf_ann_topk",
    "embedding_near_dup_pairs",
    "token_stats",
    "tfidf_topk",
    "vocab_stats",
    "unigram_logprob",
    "pmi_topk",
    "inverted_index",
    "bm25_topk",
    "covisitation",
    "funnel_counts",
    "retention_cohorts",
    "session_paths",
    "bpe_token_stats",
    "c4_quality",
    "chunk_documents",
    "cms_estimate",
    "bloom_build",
    "bpe_encode",
    "bpe_learn",
    "mask_tokens",
    "skipgram_pairs",
    "bloom_probe",
    "embedding_covariance",
    "event_transitions",
    "pca_project",
    "pq_codes",
    "repetition_signals",
    "count_min_sketch",
    "hll_distinct",
    "hll_distinct_by",
    "word_trigrams",
    "zorder_expr",
    "zorder_key",
    "lang_id",
    "gopher_quality",
    "winnow_fingerprints",
    "copy_candidates",
    "pack_sequences",
    "canonicalize_urls",
    "url_filter",
    "fold_split",
    "group_capped_sample",
    "kmeans",
    "semantic_dedup",
    "cluster_balanced_sample",
    "decontaminate",
    "word_ngrams",
    "pii_redact",
    "feature_propagation",
    "hash_sample",
    "stratified_sample",
    "weighted_sample",
]
