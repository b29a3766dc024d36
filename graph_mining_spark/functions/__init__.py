from graph_mining_spark.functions.text import language_id, text_fingerprint, text_stats, token_counts
from graph_mining_spark.functions.dedup import (
    dedup_exact,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
)
from graph_mining_spark.functions.ann import cosine_topk, lsh_cosine_topk
from graph_mining_spark.functions.fde import FdeConfig, chamfer_similarity, fde_encode, fde_encode_cloud

__all__ = [
    "language_id",
    "text_fingerprint",
    "text_stats",
    "token_counts",
    "dedup_exact",
    "lsh_candidate_pairs",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "simhash",
    "cosine_topk",
    "lsh_cosine_topk",
    "FdeConfig",
    "chamfer_similarity",
    "fde_encode",
    "fde_encode_cloud",
]
