"""In-memory entity-linking knowledge base.

Replaces spaCy's ``InMemoryLookupKB`` + YAML loader
(/root/reference/spacy_llm/tasks/entity_linker/util.py:160-199) and the
top-n-by-prior candidate selector
(/root/reference/spacy_llm/tasks/entity_linker/candidate_selector.py:13-75).

The KB is small side-data: it is built once on the driver, put in the Ray
object store (``ray.put``), and each EL actor fetches it once in ``__init__``
— a broadcast lookup, never a shuffle join.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

from .tasks.entity_linker import NIL, UNAVAILABLE_ENTITY_DESC


@dataclass(frozen=True)
class Entity:
    id: str
    description: str


@dataclass
class InMemoryKB:
    """alias -> [(qid, prior)] plus qid -> (name, desc)."""

    entities: Dict[str, Tuple[str, str]] = field(default_factory=dict)  # qid -> (name, desc)
    aliases: Dict[str, List[Tuple[str, float]]] = field(default_factory=dict)
    # Mutation counter consumed by the dispatch layer's per-object digest
    # memo (stages/dispatch.py): bumping it on every mutator means a KB
    # edited in place between pipeline invocations re-digests to a NEW
    # content key instead of silently reusing a warm stage built on the
    # old contents.
    _content_version: int = field(default=0, init=False, repr=False, compare=False)

    def add_entity(self, qid: str, name: str, desc: str) -> None:
        self.entities[qid] = (name, desc)
        self._content_version += 1

    def add_alias(self, alias: str, entities: Sequence[str], probabilities: Sequence[float]) -> None:
        for qid in entities:
            if qid not in self.entities:
                raise ValueError(
                    f"alias {alias!r} references entity {qid!r} not declared in `entities`"
                )
        self.aliases[alias] = list(zip(entities, probabilities))
        self._content_version += 1

    def get_entity_description(self, qid: str) -> str:
        ent = self.entities.get(qid)
        return ent[1] if ent is not None and ent[1] else UNAVAILABLE_ENTITY_DESC

    def get_entity_name(self, qid: str) -> Optional[str]:
        ent = self.entities.get(qid)
        return ent[0] if ent else None

    def get_candidates(self, mention: str, top_n: int = 5) -> List[Entity]:
        """Top-n candidates by prior prob (desc); NIL placeholder when the
        alias is unknown (candidate_selector.py:49-60)."""
        cands = self.aliases.get(mention)
        if not cands:
            return [Entity(NIL, UNAVAILABLE_ENTITY_DESC)]
        ranked = sorted(cands, key=lambda c: c[1], reverse=True)[:top_n]
        return [Entity(qid, self.get_entity_description(qid)) for qid, _ in ranked]

    def get_candidates_batch(
        self, mentions: Iterable[str], top_n: int = 5
    ) -> List[List[Entity]]:
        return [self.get_candidates(m, top_n) for m in mentions]


def kb_from_dicts(
    entities: Dict[str, Dict], aliases: Iterable[Dict]
) -> InMemoryKB:
    """Build a KB from the reference's YAML structure:
    ``entities: {qid: {name, desc}}``, ``aliases: [{alias, entities, probabilities}]``."""
    kb = InMemoryKB()
    for qid, info in entities.items():
        kb.add_entity(qid, info.get("name", qid), info.get("desc", ""))
    for alias_data in aliases:
        kb.add_alias(
            alias_data["alias"], alias_data["entities"], alias_data["probabilities"]
        )
    return kb


def kb_from_yaml(path: str) -> InMemoryKB:
    import yaml

    with open(path) as f:
        data = yaml.safe_load(f)
    return kb_from_dicts(data["entities"], data["aliases"])


def kb_from_spacy_dir(
    path: str,
    nlp_path: Optional[str] = None,
    desc_path: Optional[str] = None,
    ent_desc_reader=None,
) -> InMemoryKB:
    """Load a serialized spaCy ``InMemoryLookupKB`` directory into the
    engine's :class:`InMemoryKB` (the reference's ``KBObjectLoader``,
    /root/reference/spacy_llm/tasks/entity_linker/util.py:123-157).

    Import-gated: requires ``spacy`` (not installed in this sandbox — the
    conversion logic below is exercised only where spacy is importable,
    mirroring the HF real-weights path). Semantics mirror the reference:
    the pipeline at ``nlp_path`` (default: two levels above ``path``)
    provides the vocab; entity descriptions come from ``desc_path`` via
    ``ent_desc_reader`` (default: ``readers.ent_desc_reader_csv``) since a
    serialized spaCy KB stores no descriptions.
    """
    try:
        import spacy
        from spacy.kb import InMemoryLookupKB
    except ImportError as err:  # pragma: no cover - spacy absent here
        raise ImportError(
            "kb_from_spacy_dir requires spacy; install spacy or load the KB "
            "from YAML (kb_from_yaml) / Parquet (kb_from_parquet) instead"
        ) from err

    from pathlib import Path

    kb_path = Path(path)
    load_from = Path(nlp_path) if nlp_path else kb_path.parent.parent
    try:
        nlp = spacy.load(load_from)
    except IOError as err:
        raise ValueError(
            f"Pipeline at path {load_from} could not be loaded. Make sure to "
            "specify the correct path."
        ) from err
    lookup_kb = InMemoryLookupKB(nlp.vocab, entity_vector_length=1)
    lookup_kb.from_disk(kb_path)

    if desc_path:
        if ent_desc_reader is None:
            from .readers import ent_desc_reader_csv

            ent_desc_reader = ent_desc_reader_csv
        descs = ent_desc_reader(desc_path)
    else:
        descs = {}

    kb = InMemoryKB()
    for qid in lookup_kb.get_entity_strings():
        # spaCy KBs carry no entity names; canonicalization falls back to
        # the component-min surface when the name is empty.
        kb.add_entity(qid, "", descs.get(qid, ""))
    for alias in lookup_kb.get_alias_strings():
        cands = lookup_kb.get_alias_candidates(alias)
        kb.add_alias(
            alias,
            [c.entity_ for c in cands],
            [c.prior_prob for c in cands],
        )
    return kb


def kb_from_parquet(entities_path: str, aliases_path: str) -> InMemoryKB:
    """Tabular KB artifact: entities(qid, name, desc) + aliases(alias, qid, prior)."""
    import pyarrow.parquet as pq

    kb = InMemoryKB()
    ents = pq.read_table(entities_path)
    for qid, name, desc in zip(*(ents[c].to_pylist() for c in ("qid", "name", "desc"))):
        kb.add_entity(qid, name, desc)
    als = pq.read_table(aliases_path)
    grouped: Dict[str, List[Tuple[str, float]]] = {}
    for alias, qid, prior in zip(*(als[c].to_pylist() for c in ("alias", "qid", "prior"))):
        grouped.setdefault(alias, []).append((qid, prior))
    for alias, pairs in grouped.items():
        kb.add_alias(alias, [q for q, _ in pairs], [p for _, p in pairs])
    return kb
