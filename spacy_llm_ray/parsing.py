"""Substring grounding helpers.

Semantics mirror /root/reference/spacy_llm/tasks/util/parsing.py:4-45
(`_unique` order-preserving dedup; `find_substrings` with case folding,
single/multi match and a search cursor) — the core primitive that grounds
LLM-returned phrases back to char offsets in the document text.
"""

from __future__ import annotations

from typing import Iterable, List, Tuple


def unique(items: Iterable[str]) -> List[str]:
    """Order-preserving dedup."""
    seen = set()
    out = []
    for item in items:
        if item not in seen:
            out.append(item)
            seen.add(item)
    return out


def find_substrings(
    text: str,
    substrings: Iterable[str],
    *,
    case_sensitive: bool = False,
    single_match: bool = False,
    find_after: int = 0,
) -> List[Tuple[int, int]]:
    """Find char (start, end) offsets of each substring in text.

    Empty strings are dropped, duplicates searched once; without
    ``case_sensitive`` both sides are lowercased (offsets remain valid since
    ``str.lower()`` is length-preserving for our inputs). Each substring is
    searched from ``find_after``; all non-overlapping occurrences are
    returned unless ``single_match``.
    """
    subs = [s for s in substrings if s]
    if not case_sensitive:
        text = text.lower()
        subs = [s.lower() for s in subs]
    subs = unique(subs)
    offsets: List[Tuple[int, int]] = []
    for sub in subs:
        search_from = find_after
        while True:
            start = text.find(sub, search_from)
            if start == -1:
                break
            end = start + len(sub)
            offsets.append((start, end))
            if single_match:
                break
            search_from = end
    return offsets
