"""Tokenizer, char_span alignment modes, filter_spans."""

from spacy_llm_ray.tokenizer import (
    Span,
    char_span,
    filter_spans,
    make_span,
    tokenize,
)


def test_tokenize_offsets():
    text = "FooBar, Inc. is big."
    toks = tokenize(text)
    assert [t.text for t in toks] == ["FooBar", ",", "Inc", ".", "is", "big", "."]
    assert all(text[t.start:t.end] == t.text for t in toks)


def test_char_span_strict():
    text = "Jean Jacques and Jaime"
    toks = tokenize(text)
    assert char_span(toks, 0, 12, "strict") == (0, 2)   # "Jean Jacques"
    assert char_span(toks, 5, 9, "strict") is None      # "Jacq"
    assert char_span(toks, 0, 6, "strict") is None      # "Jean J"


def test_char_span_contract():
    text = "Jean Jacques and Jaime"
    toks = tokenize(text)
    assert char_span(toks, 5, 9, "contract") is None    # "Jacq": no full token inside
    assert char_span(toks, 0, 6, "contract") == (0, 1)  # "Jean J" -> "Jean"


def test_char_span_expand():
    text = "Jean Jacques and Jaime"
    toks = tokenize(text)
    assert char_span(toks, 5, 9, "expand") == (1, 2)    # "Jacq" -> "Jacques"
    s = make_span(text, toks, 5, 9, "PER", "expand")
    assert s.text == "Jacques" and (s.start_char, s.end_char) == (5, 12)


def test_filter_spans_longest_first():
    # Mirrors spaCy filter_spans: longest-first, then earliest; output by start.
    spans = [
        Span(0, 2, "A"),   # len 2
        Span(1, 4, "B"),   # len 3 wins over A
        Span(4, 5, "C"),
    ]
    kept = filter_spans(spans)
    assert [(s.start_tok, s.end_tok, s.label) for s in kept] == [(1, 4, "B"), (4, 5, "C")]


def test_filter_spans_tie_earliest():
    spans = [Span(2, 4, "B"), Span(0, 2, "A"), Span(1, 3, "C")]
    kept = filter_spans(spans)
    # All length 2: earliest-start wins ties greedily -> (0,2) then (2,4).
    assert [(s.start_tok, s.end_tok) for s in kept] == [(0, 2), (2, 4)]


def test_tokenize_memo_returns_immutable_and_evicts_incrementally():
    # r3 ADVICE: the memoized token sequence is shared across callers, so it
    # must be immutable (a tuple) — and eviction sheds oldest entries only,
    # not the whole memo.
    import pytest as _pytest

    from spacy_llm_ray import tokenizer as tk

    toks = tokenize("shared memo text.")
    assert isinstance(toks, tuple)
    with _pytest.raises((TypeError, AttributeError)):
        toks[0] = None  # type: ignore[index]
    assert tokenize("shared memo text.") is toks  # cache hit

    # Incremental eviction: overflow by entry count sheds the OLDEST entry
    # while keeping the rest (the old behavior cleared everything).
    old_max = tk._TOKENIZE_CACHE_MAX
    tk._TOKENIZE_CACHE.clear()
    tk._tokenize_cache_bytes = 0
    tk._TOKENIZE_CACHE_MAX = 3
    try:
        for t in ("first doc", "second doc", "third doc"):
            tokenize(t)
        tokenize("fourth doc")  # evicts exactly one (the oldest)
        assert "first doc" not in tk._TOKENIZE_CACHE
        assert {"second doc", "third doc", "fourth doc"} <= set(tk._TOKENIZE_CACHE)
        assert tk._tokenize_cache_bytes == sum(len(t) for t in tk._TOKENIZE_CACHE)
    finally:
        tk._TOKENIZE_CACHE_MAX = old_max
        tk._TOKENIZE_CACHE.clear()
        tk._tokenize_cache_bytes = 0
