"""quokka_spark.functions — LLM-training-data operators.

Flat re-exports so pipelines read as a vocabulary:

    from quokka_spark.functions import (exact_dedup, minhash_dedup,
                                        gopher_quality_columns,
                                        hash_sample, pack_sequences)
"""

from ..operators.graph import dedup_components
from .dedup import (decontaminate, duplicated_spans, embedding_near_pairs,
                    embedding_near_pairs_lsh, exact_dedup,
                    exact_dedup_keep_best, hamming_near_pairs,
                    incremental_dedup, line_dedup,
                    ngram_containment_pairs,
                    pair_metrics,
                    minhash_dedup, ngram_jaccard_pairs, semantic_dedup,
                    simhash_near_pairs)
from .multimodal import (decode_image, extract_image_features, image_phash,
                         payload_metadata, phash_near_pairs,
                         repartition_by_payload_size, sample_frames)
from .packing import bpe_train, pack_sequences
from .sampling import (cap_per_key, hash_sample, split_by_hash,
                       split_leakage_safe, stratified_hash_sample,
                       weighted_hash_sample, weighted_sample_k)
from .similarity import (brute_force_topk, dequantize_embeddings, ivf_topk,
                         lsh_bucket_topk, nn_join, quantize_embeddings,
                         vector_range_join)
from .sketches import bloom_build, bloom_contains, cms_build, cms_estimate
from .text import (bigram_logprob, bpe_token_columns, char_entropy,
                   chunk_documents,
                   fingerprint, flag_blocked_domains, gopher_quality_columns,
                   gopher_repetition, hashed_tf_vectors, lang_id, pii_columns,
                   quality_score, readability_columns, redact_pii, strip_accents, tfidf_top_terms, token_count,
                   unigram_logprob, url_columns)

__all__ = [
    "decontaminate", "dedup_components", "duplicated_spans",
    "embedding_near_pairs", "embedding_near_pairs_lsh", "exact_dedup",
    "exact_dedup_keep_best", "hamming_near_pairs", "line_dedup",
    "incremental_dedup", "minhash_dedup", "ngram_containment_pairs",
    "ngram_jaccard_pairs",
    "semantic_dedup",
    "simhash_near_pairs",
    "decode_image", "extract_image_features", "image_phash",
    "payload_metadata", "phash_near_pairs", "repartition_by_payload_size",
    "sample_frames",
    "bpe_train", "pack_sequences",
    "cap_per_key", "hash_sample", "split_by_hash", "split_leakage_safe",
    "stratified_hash_sample", "weighted_hash_sample", "weighted_sample_k",
    "brute_force_topk", "dequantize_embeddings", "ivf_topk",
    "lsh_bucket_topk", "nn_join", "quantize_embeddings",
    "vector_range_join",
    "bloom_build", "bloom_contains", "cms_build", "cms_estimate",
    "pair_metrics", "char_entropy",
    "bigram_logprob", "bpe_token_columns", "chunk_documents", "fingerprint",
    "flag_blocked_domains", "gopher_quality_columns", "gopher_repetition",
    "hashed_tf_vectors", "lang_id", "pii_columns", "quality_score",
    "readability_columns", "redact_pii", "strip_accents", "tfidf_top_terms", "token_count",
    "unigram_logprob",
    "url_columns",
]
