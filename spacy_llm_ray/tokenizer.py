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
from bisect import bisect_left, bisect_right
from dataclasses import dataclass, field
from typing import List, NamedTuple, Optional, Sequence, Tuple, Union

# One word (incl. digits/underscore) or one single non-space symbol per token.
_TOKEN_RE = re.compile(r"\w+|[^\w\s]", re.UNICODE)


class Token(NamedTuple):
    # NamedTuple (C-speed construction): tokenization creates tens of
    # millions of these per run — a frozen dataclass here was a measurable
    # allocation hotspot in the extraction actors.
    text: str
    start: int  # char offset, inclusive
    end: int    # char offset, exclusive
    i: int      # token index


class Span(NamedTuple):
    """A labeled token span over a tokenized text.

    Ordering/equality key is led by (start_tok, end_tok, label, kb_id), which
    mirrors spaCy Span rich comparison as relied on by the reference's
    ``sorted(set(spans))`` dedup (/root/reference/spacy_llm/tasks/span/parser.py:156).
    The payload fields (start_char/end_char/text) participate only as
    tie-breakers — they are a deterministic function of the key fields over a
    given text, so ordering/equality semantics are unchanged while keeping
    C-speed NamedTuple construction (spans are built millions of times per
    block in the extraction actors).
    """

    start_tok: int
    end_tok: int  # exclusive
    label: str
    kb_id: str = ""
    start_char: int = -1
    end_char: int = -1
    text: str = ""

    def with_kb_id(self, kb_id: str) -> "Span":
        return self._replace(kb_id=kb_id)


# Bounded per-process memo: the fused KG stage tokenizes the same document
# in its NER and EL sub-stages (and shard probes re-tokenize shard text), so
# the second call is a dict hit instead of a full regex scan + ~600 Token
# constructions per doc. CPython caches str.__hash__, so repeat lookups on
# the same string object cost a pointer compare. The cached value is a TUPLE
# so sharing across callers is safe by construction (a caller that tried to
# append/replace tokens would raise, not silently corrupt other stages).
# Bounded by BYTES as well as entries: long-lived task workers must not pin
# hundreds of MB of document text + Token tuples (a Token tuple costs
# roughly 10x its text bytes). Eviction is oldest-first (insertion order),
# not clear-everything, so a working set slightly over the bound sheds only
# its coldest entries instead of thrashing the whole memo.
_TOKENIZE_CACHE: dict = {}
_TOKENIZE_CACHE_MAX = 2048
_TOKENIZE_CACHE_MAX_BYTES = 16 << 20  # of cached TEXT; tokens ~10x this
_tokenize_cache_bytes = 0


def tokenize(text: str) -> Sequence[Token]:
    global _tokenize_cache_bytes
    cached = _TOKENIZE_CACHE.get(text)
    if cached is not None:
        return cached
    out = tuple(
        Token(text[m.start(): m.end()], m.start(), m.end(), i)
        for i, m in enumerate(_TOKEN_RE.finditer(text))
    )
    while _TOKENIZE_CACHE and (
        len(_TOKENIZE_CACHE) >= _TOKENIZE_CACHE_MAX
        or _tokenize_cache_bytes >= _TOKENIZE_CACHE_MAX_BYTES
    ):
        old = next(iter(_TOKENIZE_CACHE))
        _TOKENIZE_CACHE.pop(old)
        _tokenize_cache_bytes -= len(old)
    _TOKENIZE_CACHE[text] = out
    _tokenize_cache_bytes += len(text)
    return out


def token_count(text: str) -> int:
    """Number of tokens WITHOUT building Token objects or touching the memo
    — for count-only consumers (e.g. the docs_token_count query), which
    would otherwise fill the cache with single-use texts."""
    n = 0
    for n, _ in enumerate(_TOKEN_RE.finditer(text), 1):
        pass
    return n


class Tokenization:
    """Tokens plus sorted offset arrays for O(log n) char_span lookups.

    Tokens are non-overlapping and ordered, so both start and end offsets are
    strictly increasing — alignment snaps reduce to bisects. Accepted anywhere
    a token list is; parsers build one per document/shard.
    """

    __slots__ = ("tokens", "starts", "ends")

    def __init__(self, tokens: List[Token]):
        self.tokens = tokens
        self.starts = [t.start for t in tokens]
        self.ends = [t.end for t in tokens]

    def __len__(self):
        return len(self.tokens)

    def __getitem__(self, i):
        return self.tokens[i]

    def __iter__(self):
        return iter(self.tokens)


def _as_tokenization(tokens: Union[Tokenization, Sequence[Token]]) -> Tokenization:
    return tokens if isinstance(tokens, Tokenization) else Tokenization(list(tokens))


def char_span(
    tokens: Union[Tokenization, List[Token]],
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
    tk = _as_tokenization(tokens)
    starts, ends = tk.starts, tk.ends
    n = len(starts)
    if n == 0:
        return None

    if alignment_mode == "strict":
        i = bisect_left(starts, start)
        j = bisect_left(ends, end)
        if i >= n or starts[i] != start or j >= n or ends[j] != end or j < i:
            return None
        return (i, j + 1)

    if alignment_mode == "contract":
        # tokens fully inside [start, end): first with t.start >= start,
        # last with t.end <= end (both arrays increasing).
        i = bisect_left(starts, start)
        j = bisect_right(ends, end) - 1
        if j < i:
            return None
        return (i, j + 1)

    # expand: tokens partially covered: t.end > start and t.start < end.
    i = bisect_right(ends, start)
    j = bisect_left(starts, end) - 1
    if j < i or i >= n:
        return None
    return (i, j + 1)


def make_span(
    text: str,
    tokens: Union[Tokenization, List[Token]],
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
