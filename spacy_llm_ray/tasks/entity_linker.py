"""Entity-linking (EntityLinker v1) codec.

- ``highlight_mentions``: wrap prompt-included mentions in ``*...*`` in the
  prompt text (string-level equivalent of the reference's token-level
  highlighting, /root/reference/spacy_llm/tasks/entity_linker/task.py:252-324).
  Highlighting happens at prompt-render time only; canonical text/offsets stay
  immutable so no unhighlight step exists.
- ``parse_el_solutions``: extract per-mention solutions via the reference's
  regex ``"::: <.*>"`` (/root/reference/spacy_llm/tasks/entity_linker/parser.py:27-30).
- ``resolve_el_response``: the all-entities-resolved guard — if parsed
  solutions + auto-NILed mentions don't line up with the mention count, every
  mention gets NIL (no safe assignment), mirroring
  /root/reference/spacy_llm/tasks/entity_linker/task.py:211-236.
"""

from __future__ import annotations

import re
from typing import List, Optional, Sequence

from ..tokenizer import Span

NIL = "NIL"  # spaCy EntityLinker.NIL
UNAVAILABLE_ENTITY_DESC = "This entity doesn't have a description."

_SOLUTION_RE = re.compile(r"::: <.*>")


def highlight_mentions(
    text: str, mentions: Sequence[Span], include: Optional[Sequence[bool]] = None
) -> str:
    """Wrap selected mentions in ``*``; offsets are prompt-local only."""
    if include is not None and len(include) != len(mentions):
        raise ValueError(
            f"`include` has {len(include)} entries, but {len(mentions)} are required."
        )
    parts: List[str] = []
    cursor = 0
    for i, ent in enumerate(mentions):
        if include is not None and not include[i]:
            continue
        parts.append(text[cursor:ent.start_char])
        parts.append(f"*{text[ent.start_char:ent.end_char]}*")
        cursor = ent.end_char
    parts.append(text[cursor:])
    return "".join(parts)


def parse_el_solutions(response: str) -> List[str]:
    """``"... ::: <Q60>"`` -> ["Q60"]; keeps the reference's greedy regex."""
    return [sol.replace("::: ", "")[1:-1] for sol in _SOLUTION_RE.findall(response)]


def resolve_el_response(
    mentions: Sequence[Span],
    has_candidates: Sequence[bool],
    solutions: Sequence[str],
) -> List[Span]:
    """Assign kb_ids: auto-NIL mentions without candidates, fill parsed
    solutions for the rest; on count mismatch, NIL everything."""
    n_no_cands = sum(1 for hc in has_candidates if not hc)
    all_resolved = len(solutions) + n_no_cands == len(mentions)
    out: List[Span] = []
    sol_iter = iter(solutions)
    for ent, hc in zip(mentions, has_candidates):
        if all_resolved and hc:
            sol = next(sol_iter)
            out.append(ent.with_kb_id(sol if sol != NIL else NIL))
        else:
            out.append(ent.with_kb_id(NIL))
    return out
