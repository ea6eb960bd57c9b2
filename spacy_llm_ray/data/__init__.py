from .transcripts import (  # noqa: F401
    GAZETTEER,
    PREDICATES,
    KB_ENTITIES,
    KB_ALIASES,
    canonical_map,
    build_kb,
    generate_transcripts,
    ensure_dataset,
    transcripts_path,
)
