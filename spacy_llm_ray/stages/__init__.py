from .assemble import assemble_documents, SALT_BUCKET_TURNS  # noqa: F401
from .llm_stage import NerStage, RelStage, ElStage, LLMTaskStage  # noqa: F401
from .triples import explode_triples, MENTION_TYPE, REL_TYPE  # noqa: F401
from .canonicalize import canonicalize_triples, build_canonical_mapping  # noqa: F401
