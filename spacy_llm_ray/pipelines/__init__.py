from .kg import (  # noqa: F401
    transcripts_dataset,
    documents_dataset,
    kg_mentions_dataset,
    kg_relations_dataset,
    kg_linked_dataset,
    kg_triples_dataset,
    distinct_triples,
)
