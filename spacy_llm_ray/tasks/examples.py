"""Few-shot example types (plain dataclasses over the reference's pydantic
models; shapes from /root/reference/spacy_llm):

- SpanExample       {text, entities: {LABEL: [phrase, ...]}}       (span/examples.py:10-16)
- SpanCoTExample    {text, spans: [{text, is_entity, label, reason}]} (span/examples.py:73-100)
- RELExample        {text, ents: [{start_char, end_char, label}],
                     relations: [{dep, dest, relation}]}           (rel/util.py:15-35)
- ELExample         {text, mentions, entity_descriptions,
                     entity_ids, solutions, reasons?}              (entity_linker/util.py:25-72)
- TextCatExample    {text, answer}                                 (textcat fixtures)

Each has ``from_dict`` so files loaded via ``readers.fewshot_reader`` plug
straight into the prompt builders.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional

from .span import SpanReason


@dataclass
class SpanExample:
    text: str
    entities: Dict[str, List[str]]

    @classmethod
    def from_dict(cls, d: Dict) -> "SpanExample":
        return cls(text=d["text"], entities=dict(d["entities"]))


@dataclass
class SpanCoTExample:
    text: str
    spans: List[SpanReason]

    @classmethod
    def from_dict(cls, d: Dict) -> "SpanCoTExample":
        return cls(
            text=d["text"],
            spans=[
                SpanReason(
                    text=s["text"],
                    is_entity=bool(s["is_entity"]),
                    label=s["label"],
                    reason=s.get("reason", ""),
                )
                for s in d["spans"]
            ],
        )


@dataclass
class EntityItem:
    start_char: int
    end_char: int
    label: str


@dataclass
class RELExample:
    text: str
    ents: List[EntityItem]
    relations: List[Dict]

    @classmethod
    def from_dict(cls, d: Dict) -> "RELExample":
        return cls(
            text=d["text"],
            ents=[
                EntityItem(e["start_char"], e["end_char"], e["label"])
                for e in d["ents"]
            ],
            relations=[dict(r) for r in d["relations"]],
        )


@dataclass
class ELExample:
    text: str
    mentions: List[str]
    entity_descriptions: List[List[str]]
    entity_ids: List[List[str]]
    solutions: List[str]
    reasons: Optional[List[str]] = None

    @property
    def mentions_str(self) -> str:
        return ", ".join(f"*{m}*" for m in self.mentions)

    @classmethod
    def from_dict(cls, d: Dict) -> "ELExample":
        return cls(
            text=d["text"],
            mentions=list(d["mentions"]),
            entity_descriptions=[list(x) for x in d["entity_descriptions"]],
            entity_ids=[list(x) for x in d["entity_ids"]],
            solutions=list(d["solutions"]),
            reasons=list(d["reasons"]) if d.get("reasons") else None,
        )


@dataclass
class TextCatExample:
    text: str
    answer: str

    @classmethod
    def from_dict(cls, d: Dict) -> "TextCatExample":
        return cls(text=d["text"], answer=str(d["answer"]))


def coerce_examples(examples, ex_type):
    """Accept reader output (list of dicts) or already-built example objects;
    dicts are converted via ``ex_type.from_dict`` (the reference validates
    reader dicts into pydantic example models the same way,
    builtin_task.py:170-173)."""
    if not examples:
        return None
    return [ex_type.from_dict(e) if isinstance(e, dict) else e for e in examples]


def examples_to_dicts(examples):
    """Inverse of :func:`coerce_examples` for serialization (dataclasses ->
    plain dicts; dicts pass through)."""
    import dataclasses

    if not examples:
        return None
    return [
        dataclasses.asdict(e) if dataclasses.is_dataclass(e) else dict(e)
        for e in examples
    ]
