"""Property-based robustness/invariant tests (hypothesis).

Parsers must never raise on arbitrary LLM responses (the reference warns and
skips malformed content); the shard mapper must exactly reassemble any text;
alignment snapping must stay within bounds."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from spacy_llm_ray.parsing import find_substrings
from spacy_llm_ray.tasks.lemma import parse_lemma_response
from spacy_llm_ray.tasks.rel import parse_rel_response, preannotate
from spacy_llm_ray.tasks.sentiment import parse_sentiment_response
from spacy_llm_ray.tasks.sharding import count_tokens_by_spaces, make_shard_mapper
from spacy_llm_ray.tasks.span import SpanTaskConfig, parse_span_response, parse_span_response_cot
from spacy_llm_ray.tasks.entity_linker import parse_el_solutions
from spacy_llm_ray.tasks.textcat import TextCatConfig, parse_textcat_response
from spacy_llm_ray.tokenizer import Tokenization, char_span, filter_spans, tokenize

text_strat = st.text(alphabet=string.printable, max_size=400)
response_strat = st.text(alphabet=string.printable, max_size=400)


@settings(max_examples=200, deadline=None)
@given(text=text_strat, response=response_strat)
def test_span_parsers_never_raise(text, response):
    cfg = SpanTaskConfig(labels=["PER", "LOC"])
    toks = tokenize(text)
    for parse in (parse_span_response, parse_span_response_cot):
        for span in parse(cfg, text, toks, response):
            assert 0 <= span.start_char < span.end_char <= len(text)
            assert span.label in ("PER", "LOC")
            # Snapped span text must be a slice of the original text.
            assert text[span.start_char:span.end_char] == span.text


@settings(max_examples=200, deadline=None)
@given(response=response_strat, n_ents=st.integers(0, 5))
def test_rel_parser_never_raises(response, n_ents):
    for item in parse_rel_response(response, n_ents):
        assert 0 <= item.dep < n_ents and 0 <= item.dest < n_ents


@settings(max_examples=100, deadline=None)
@given(response=response_strat)
def test_scalar_parsers_never_raise(response):
    parse_el_solutions(response)
    parse_lemma_response(response)
    parse_sentiment_response(response)
    parse_textcat_response(TextCatConfig(labels=["A", "B"]), response)
    parse_textcat_response(TextCatConfig(labels=["Only"]), response)


@settings(max_examples=100, deadline=None)
@given(text=st.text(alphabet=string.ascii_letters + " .,", min_size=0, max_size=500),
       context=st.integers(8, 64))
def test_shard_mapper_reassembles_exactly(text, context):
    toks = tokenize(text)
    mapper = make_shard_mapper()
    render = lambda st_, i, n: f"count: '{st_}'"  # noqa: E731
    try:
        shards = mapper(text, toks, context, render)
    except ValueError:
        return  # "shard of length 1 doesn't fit" is a legal outcome
    joined = "".join(s.text for s in shards)
    if toks:
        # A single shard is the original text verbatim; a sharded doc starts
        # at its first token (leading whitespace is not part of any token
        # range, matching spaCy doc-slice semantics).
        assert joined == (text if len(shards) == 1 else text[toks[0].start:])
        for s in shards:
            assert text[s.char_offset : s.char_offset + len(s.text)] == s.text
        assert [s.i_shard for s in shards] == list(range(len(shards)))


@settings(max_examples=200, deadline=None)
@given(text=text_strat, start=st.integers(0, 60), length=st.integers(0, 30),
       mode=st.sampled_from(["strict", "contract", "expand"]))
def test_char_span_bounds(text, start, length, mode):
    toks = Tokenization(tokenize(text))
    rng = char_span(toks, start, start + length, mode)
    if rng is not None:
        s, e = rng
        assert 0 <= s < e <= len(toks)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 20), st.integers(1, 6)), max_size=12))
def test_filter_spans_no_overlap(pairs):
    from spacy_llm_ray.tokenizer import Span

    spans = [Span(a, a + ln, "X") for a, ln in pairs]
    kept = filter_spans(spans)
    seen = set()
    for s in kept:
        toks = set(range(s.start_tok, s.end_tok))
        assert not (toks & seen)
        seen |= toks
    # Sorted by start.
    assert [s.start_tok for s in kept] == sorted(s.start_tok for s in kept)


@settings(max_examples=100, deadline=None)
@given(text=st.text(alphabet=string.ascii_letters + " ", max_size=200))
def test_preannotate_identity_without_mentions(text):
    assert preannotate(text, []) == text


@settings(max_examples=100, deadline=None)
@given(text=text_strat, subs=st.lists(st.text(max_size=5), max_size=4))
def test_find_substrings_offsets_valid(text, subs):
    for start, end in find_substrings(text, subs):
        assert 0 <= start < end <= len(text)
