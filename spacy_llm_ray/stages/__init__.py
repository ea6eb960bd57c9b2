from .assemble import assemble_documents, SALT_BUCKET_TURNS  # noqa: F401
from .llm_stage import NerStage, RelStage, ElStage, LLMTaskStage, KGStage  # noqa: F401
from .triples import explode_triples  # noqa: F401
from .schemas import MENTION_TYPE, REL_TYPE, TRIPLE_SCHEMA  # noqa: F401
from .canonicalize import canonicalize_triples, build_canonical_mapping  # noqa: F401
from .dedup import (  # noqa: F401
    MinHashStage,
    SimHashStage,
    minhash_lsh_dedup,
    ngram_jaccard,
    embedding_neardup_pairs,
)
from .ann import brute_force_topk, ivf_topk  # noqa: F401
from .textstats import (  # noqa: F401
    LangIdStage,
    md5_fingerprint_batch,
    quality_counters_batch,
    rolling_hash_fingerprint_batch,
    token_count_batch,
)
from .multimodal import ImageDecodeStage, ImageFeatureStage  # noqa: F401
