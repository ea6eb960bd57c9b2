"""Deterministic whitespace/punctuation tokenizer with char-span alignment.

Replaces the reference's spaCy ``Doc``/``Span`` machinery (tokens + char
offsets + ``Doc.char_span`` alignment modes + ``spacy.util.filter_spans``)
with a cheap, self-contained tokenizer. Tokens are recomputed on demand from
the immutable document text, so no token arrays ever travel through the
Dataset — only text and char-offset span structs do.

Alignment-mode contract mirrors spaCy's ``Doc.char_span``:
- "strict":   both char boundaries must coincide exactly with token boundaries,
- "contract": snap inward to tokens fully covered by [start, end) (None if none),
- "expand":   snap outward to every token at least partially covered.

``filter_spans`` mirrors ``spacy.util.filter_spans`` (used by the reference's
NER span assignment, /root/reference/spacy_llm/tasks/ner/task.py:94-100):
longest-first then earliest-first greedy selection, endpoint-token conflict
check, result re-sorted by start.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

# One word (incl. digits/underscore) or one single non-space symbol per token.
_TOKEN_RE = re.compile(r"\w+|[^\w\s]", re.UNICODE)


@dataclass(frozen=True)
class Token:
    text: str
    start: int  # char offset, inclusive
    end: int    # char offset, exclusive
    i: int      # token index


@dataclass(frozen=True, order=True)
class Span:
    """A labeled token span over a tokenized text.

    Ordering/equality key is (start_tok, end_tok, label, kb_id) which mirrors
    spaCy Span rich comparison as relied on by the reference's
    ``sorted(set(spans))`` dedup (/root/reference/spacy_llm/tasks/span/parser.py:156).
    """

    start_tok: int
    end_tok: int  # exclusive
    label: str
    kb_id: str = ""
    # Non-comparing payload fields:
    start_char: int = field(default=-1, compare=False)
    end_char: int = field(default=-1, compare=False)
    text: str = field(default="", compare=False)

    def with_kb_id(self, kb_id: str) -> "Span":
        return Span(self.start_tok, self.end_tok, self.label, kb_id,
                    self.start_char, self.end_char, self.text)


def tokenize(text: str) -> List[Token]:
    return [Token(m.group(), m.start(), m.end(), i)
            for i, m in enumerate(_TOKEN_RE.finditer(text))]


def char_span(
    tokens: List[Token],
    start: int,
    end: int,
    alignment_mode: str = "strict",
) -> Optional[Tuple[int, int]]:
    """Map a char range onto a token range, or None if unalignable.

    Returns (start_token_index, end_token_index_exclusive).
    """
    if end < start:
        return None
    if alignment_mode not in ("strict", "contract", "expand"):
        raise ValueError(f"unknown alignment_mode: {alignment_mode}")

    if alignment_mode == "strict":
        first = last = None
        for t in tokens:
            if t.start == start:
                first = t.i
            if t.end == end:
                last = t.i
        if first is None or last is None or last < first:
            return None
        return (first, last + 1)

    if alignment_mode == "contract":
        inside = [t.i for t in tokens if t.start >= start and t.end <= end]
        if not inside:
            return None
        return (inside[0], inside[-1] + 1)

    # expand
    overlapping = [t.i for t in tokens if t.end > start and t.start < end]
    if not overlapping:
        return None
    return (overlapping[0], overlapping[-1] + 1)


def make_span(
    text: str,
    tokens: List[Token],
    start_char: int,
    end_char: int,
    label: str,
    alignment_mode: str = "strict",
    kb_id: str = "",
) -> Optional[Span]:
    """char_span + materialize the snapped Span (with snapped char offsets)."""
    rng = char_span(tokens, start_char, end_char, alignment_mode)
    if rng is None:
        return None
    s, e = rng
    sc, ec = tokens[s].start, tokens[e - 1].end
    return Span(s, e, label, kb_id, sc, ec, text[sc:ec])


def filter_spans(spans: List[Span]) -> List[Span]:
    """Greedy longest-first non-overlap filter (spaCy ``util.filter_spans``)."""
    get_sort_key = lambda s: (s.end_tok - s.start_tok, -s.start_tok)  # noqa: E731
    sorted_spans = sorted(spans, key=get_sort_key, reverse=True)
    result: List[Span] = []
    seen_tokens: set = set()
    for span in sorted_spans:
        # Endpoint check only, as in spaCy (longest-first makes it sufficient).
        if span.start_tok not in seen_tokens and span.end_tok - 1 not in seen_tokens:
            result.append(span)
            seen_tokens.update(range(span.start_tok, span.end_tok))
    result = sorted(result, key=lambda s: s.start_tok)
    return result
