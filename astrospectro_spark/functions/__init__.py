from .text import (  # noqa: F401
    with_fingerprint,
    with_lang_id,
    with_quality,
    with_token_stats,
)
from .dedup import (  # noqa: F401
    exact_dup_groups,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash64,
)
from .similarity import cosine_topk, lsh_cosine_topk  # noqa: F401
