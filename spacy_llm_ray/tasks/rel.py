"""Relation-extraction (REL v1) codec.

- ``preannotate``: produce the prompt-side text with ``[ENT<i>:<LABEL>]``
  markers inserted directly after each entity mention, matching the rendered
  string of the reference's token-level rewrite
  (/root/reference/spacy_llm/tasks/rel/task.py:74-136; verified format
  ``"Well[ENT0:A] hello[ENT1:B] there[ENT2:C]"`` in
  tests/tasks/test_rel.py:287-290). We insert markers at prompt time only and
  keep canonical offsets immutable — no unhighlight dance needed.

- ``parse_rel_response``: one JSON object per line -> RelationItem with
  ``"ENT3" -> 3`` coercion and index-validity filtering
  (/root/reference/spacy_llm/tasks/rel/parser.py:11-40,
  /root/reference/spacy_llm/tasks/rel/items.py:4-14).
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass
from typing import List, Optional, Sequence, Set

from ..tokenizer import Span, Token

# Marker-aware tokenization for sharding preannotated text: an [ENTi:LABEL]
# marker is atomic so shard boundaries can never split it (the reference gets
# this for free by emitting the marker as one spaCy token, task.py:100-110).
_REL_TOKEN_RE = re.compile(r"\[ENT\d+:[^\]\s]+\]|\w+|[^\w\s]", re.UNICODE)
ENT_MARKER_RE = re.compile(r"\[ENT(\d+):[^\]\s]+\]")


def rel_tokenize(text: str) -> List[Token]:
    out = []
    for i, m in enumerate(_REL_TOKEN_RE.finditer(text)):
        s, e = m.span()  # one C call vs group()/start()/end()
        out.append(Token(text[s:e], s, e, i))
    return out


@dataclass(frozen=True)
class RelationItem:
    dep: int
    dest: int
    relation: str


def preannotate(text: str, mentions: Sequence[Span]) -> str:
    """Insert ``[ENT<i>:<LABEL>]`` right after each mention (char-offset based).

    ``mentions`` must be non-overlapping and sorted by start offset (the NER
    stage guarantees both via filter_spans).
    """
    parts: List[str] = []
    cursor = 0
    for i, ent in enumerate(mentions):
        parts.append(text[cursor:ent.end_char])
        parts.append(f"[ENT{i}:{ent.label}]")
        cursor = ent.end_char
    parts.append(text[cursor:])
    return "".join(parts)


def _coerce_ent_index(value) -> int:
    """``"ENT0"`` / ``"0"`` / 0 -> 0; raises on anything non-coercible
    (mirrors the pydantic before-validator + int coercion,
    items.py:9-14)."""
    if isinstance(value, str):
        value = value.strip("ENT")
    if isinstance(value, bool):
        raise ValueError("bool is not an entity index")
    return int(value)


def parse_rel_response(
    response: str, n_ents: int = 0, valid_ids: Optional[Set[int]] = None
) -> List[RelationItem]:
    """Parse JSON-per-line relations; keep only items with valid ent indices.

    Invalid JSON lines / validation failures are skipped (the reference only
    warns, parser.py:31-36). ``valid_ids`` replaces the ``0 <= i < n_ents``
    range check when entity indices are global across shards (our sharded REL
    stage keeps the preannotation's global numbering).
    """
    if valid_ids is None:
        valid_ids = set(range(n_ents))
    relations: List[RelationItem] = []
    for line in response.strip().split("\n"):
        try:
            obj = json.loads(line)
            if not isinstance(obj, dict):
                raise ValueError("not an object")
            dep = _coerce_ent_index(obj["dep"])
            dest = _coerce_ent_index(obj["dest"])
            relation = obj["relation"]
            if not isinstance(relation, str):
                raise ValueError("relation must be a string")
        except (ValueError, KeyError, TypeError, json.JSONDecodeError):
            continue
        if dep in valid_ids and dest in valid_ids:
            relations.append(RelationItem(dep=dep, dest=dest, relation=relation))
    return relations
