from sopspark.text.dedup import (
    exact_dedup,
    minhash_signatures,
    minhash_lsh_pairs,
    minhash_dedup,
    simhash,
    simhash_dedup,
    simhash_hamming_pairs,
    simhash_near_dup_pairs,
    ngram_jaccard_pairs,
)
from sopspark.text.analysis import (
    detect_language,
    quality_score,
    token_counts,
    fingerprint,
)
from sopspark.text.similarity import (
    cosine_topk,
    lsh_cosine_topk,
    ivf_cosine_topk,
    embedding_near_dups,
    embedding_near_dups_exact,
)

__all__ = [
    "exact_dedup",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "minhash_dedup",
    "simhash",
    "simhash_dedup",
    "simhash_hamming_pairs",
    "simhash_near_dup_pairs",
    "ngram_jaccard_pairs",
    "detect_language",
    "quality_score",
    "token_counts",
    "fingerprint",
    "cosine_topk",
    "lsh_cosine_topk",
    "ivf_cosine_topk",
    "embedding_near_dups",
    "embedding_near_dups_exact",
]
