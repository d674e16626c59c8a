"""LLM-training-data pipeline operators (SURVEY.md §2.B north-star set).

dedup.py       exact, MinHash+LSH banding, SimHash near-dup
similarity.py  cosine top-k (brute force) + IVF-style bucketed ANN
text.py        token stats, language-ID heuristic, quality score, fingerprint
multimodal.py  binary-column plumbing (decode stubs, mapInPandas shape)

All built on DataFrame ops + Arrow-batched pandas where unavoidable; no
driver-side loops, every fan-out keyed so the shuffles scale.
"""

from .dedup import cluster_near_dups, exact_dedup, minhash_near_dup, minhash_signatures, simhash, simhash_near_dup
from .similarity import brute_force_topk, cosine_sim, ivf_topk
from .text import fingerprint, lang_id, quality_score, token_stats

__all__ = [
    "cluster_near_dups",
    "exact_dedup",
    "minhash_near_dup",
    "minhash_signatures",
    "simhash",
    "simhash_near_dup",
    "brute_force_topk",
    "cosine_sim",
    "ivf_topk",
    "fingerprint",
    "lang_id",
    "quality_score",
    "token_stats",
]
