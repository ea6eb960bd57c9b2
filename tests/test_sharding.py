"""Shard-mapper boundary conformance (ported from
/root/reference/spacy_llm/tests/sharding/test_sharding.py:14-65 with the
CountWithSharding template from tests/sharding/util.py:48-50)."""

import pytest

from spacy_llm_ray.tasks.sharding import count_tokens_by_spaces, make_shard_mapper
from spacy_llm_ray.tokenizer import tokenize

TEXT = (
    "Do one thing every day that scares you. "
    "The only thing we have to fear is fear itself."
)
COUNT_TEMPLATE = "Reply with the number of words in this string (and nothing else): '{}'"


def render_count(shard_text, i_shard, n_shards):
    return COUNT_TEMPLATE.format(shard_text)


def test_count_tokens_by_spaces():
    assert count_tokens_by_spaces("a b  c\nd") == 4
    assert count_tokens_by_spaces("") == 0


def test_sharding_count_boundaries():
    mapper = make_shard_mapper()
    shards = mapper(TEXT, tokenize(TEXT), 20, render_count)
    assert [s.text for s in shards] == [
        "Do one thing every day ",
        "that scares you",
        ". The only ",
        "thing we have to ",
        "fear is fear itself.",
    ]
    # Shards reassemble the document exactly, with correct char offsets.
    assert "".join(s.text for s in shards) == TEXT
    for s in shards:
        assert TEXT[s.char_offset : s.char_offset + len(s.text)] == s.text
    assert all(s.n_shards == len(shards) for s in shards)
    # Every rendered shard prompt fits the context envelope.
    for s in shards:
        assert count_tokens_by_spaces(render_count(s.text, 0, 1)) * 1.1 <= 20


def test_no_sharding_when_fits():
    mapper = make_shard_mapper()
    shards = mapper(TEXT, tokenize(TEXT), 1000, render_count)
    assert len(shards) == 1 and shards[0].text == TEXT
    assert shards[0].char_offset == 0


def test_no_context_length_means_single_shard():
    mapper = make_shard_mapper()
    shards = mapper(TEXT, tokenize(TEXT), None, render_count)
    assert len(shards) == 1 and shards[0].text == TEXT


def test_unshardable_raises():
    mapper = make_shard_mapper()
    with pytest.raises(ValueError, match="shard of length 1"):
        mapper(TEXT, tokenize(TEXT), 2, render_count)


def test_lazy_token_list_defers_construction():
    """len() counts without building Tokens; indexing materializes once and
    agrees with the eager tokenizer (the REL shard-mapper contract)."""
    from spacy_llm_ray.tasks.rel import _REL_TOKEN_RE, rel_tokenize
    from spacy_llm_ray.tasks.sharding import LazyTokenList

    calls = []

    def counting_build(text):
        calls.append(text)
        return rel_tokenize(text)

    text = "Alice [ENT0:PER] visited [ENT1:LOC] Berlin, twice."
    lazy = LazyTokenList(text, counting_build, _REL_TOKEN_RE)
    eager = rel_tokenize(text)
    assert len(lazy) == len(eager)
    assert calls == []  # len() did NOT materialize
    assert lazy[0] == eager[0] and list(lazy) == eager
    assert calls == [text]  # materialized exactly once
    assert len(lazy) == len(eager)  # post-materialization len still right
