"""Column-function library: text analysis, dedup signatures, similarity.

Everything here is built-in-expression based (whole-stage codegen); see
textops.py and similarity.py for the implementations."""

from ..similarity import cosine, cosine_topk, embedding_near_dup, lsh_buckets, lsh_topk
from ..textops import (
    exact_dedup,
    fingerprint,
    language_id,
    minhash_dedup,
    minhash_signature,
    ngram_jaccard_pairs,
    quality_score,
    simhash,
    token_count,
)

__all__ = [
    "cosine",
    "cosine_topk",
    "embedding_near_dup",
    "exact_dedup",
    "fingerprint",
    "language_id",
    "lsh_buckets",
    "lsh_topk",
    "minhash_dedup",
    "minhash_signature",
    "ngram_jaccard_pairs",
    "quality_score",
    "simhash",
    "token_count",
]
