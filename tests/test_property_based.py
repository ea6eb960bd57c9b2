"""Property-based invariants (hypothesis) for the pure codec layer: span
grounding, shard mapping, tokenization, normalizers, simhash. These encode
the contracts the reference's fixture tests spot-check, over arbitrary
inputs."""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from spacy_llm_ray.normalizers import lowercase_normalizer, split_labels
from spacy_llm_ray.parsing import find_substrings
from spacy_llm_ray.stages.dedup import SimHashStage, ngram_jaccard
from spacy_llm_ray.tasks.sharding import (
    count_tokens_by_spaces,
    make_shard_mapper,
)
from spacy_llm_ray.tokenizer import char_span, filter_spans, tokenize

words = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")),
    min_size=1, max_size=8,
)
texts = st.lists(words, min_size=0, max_size=60).map(" ".join)


@given(texts)
@settings(max_examples=200, deadline=None)
def test_tokenize_offsets_reconstruct_text(text):
    toks = tokenize(text)
    # Token substrings must match their recorded offsets exactly.
    for t in toks:
        assert text[t.start:t.end] == t.text
    # Tokens are non-overlapping and ordered.
    for a, b in zip(toks, toks[1:]):
        assert a.end <= b.start


@given(texts, st.data())
@settings(max_examples=200, deadline=None)
def test_find_substrings_offsets_are_occurrences(text, data):
    toks = tokenize(text)
    if not toks:
        return
    # Pick an actual token's text; every reported offset must reproduce it
    # case-insensitively (default case_sensitive=False). Characters whose
    # lowercase changes string LENGTH (e.g. 'İ' -> 'i̇') shift offsets —
    # the reference's find_substrings lowercases the whole text the same
    # way (tasks/util/parsing.py:15-45), so that skew is inherited
    # semantics, excluded here.
    if len(text.lower()) != len(text):
        return
    needle = data.draw(st.sampled_from([t.text for t in toks]))
    offsets = find_substrings(text, [needle])
    assert offsets, (text, needle)
    for start, end in offsets:
        assert text[start:end].lower() == needle.lower()
    # Offsets are non-overlapping and increasing.
    for (s1, e1), (s2, e2) in zip(offsets, offsets[1:]):
        assert e1 <= s2


@given(texts, st.integers(min_value=8, max_value=64))
@settings(max_examples=150, deadline=None)
def test_shard_mapper_partition_invariants(text, ctx):
    """Shards partition the token range, reconstruct the text exactly, and
    each rendered shard fits the context (identity render)."""
    toks = tokenize(text)
    mapper = make_shard_mapper()
    try:
        shards = mapper(text, toks, ctx, lambda st_, i, n: st_)
    except ValueError:
        return  # single token doesn't fit: legal refusal
    # Partition: tok ranges are consecutive and cover [0, len).
    assert shards[0].tok_start == 0
    assert shards[-1].tok_end == len(toks)
    for a, b in zip(shards, shards[1:]):
        assert a.tok_end == b.tok_start
    # Text reconstructs byte-exactly from shard texts.
    assert "".join(s.text for s in shards) == text
    # n_shards bookkeeping consistent.
    for i, s in enumerate(shards):
        assert s.i_shard == i and s.n_shards == len(shards)
    # Every shard fits (x1.1 buffer) unless it is a single token.
    for s in shards:
        if s.tok_end - s.tok_start > 1:
            assert count_tokens_by_spaces(s.text) * 1.1 <= ctx


@given(st.lists(st.tuples(st.integers(0, 50), st.integers(1, 10)),
                min_size=0, max_size=20))
@settings(max_examples=200, deadline=None)
def test_filter_spans_no_overlap_longest_first(raw):
    """filter_spans operates on TOKEN ranges (spaCy util.filter_spans)."""
    from spacy_llm_ray.tokenizer import Span

    spans = [
        Span(start, start + length, "X", "", start * 5, (start + length) * 5, "t")
        for start, length in raw
    ]
    kept = filter_spans(spans)
    # Result is token-wise non-overlapping and sorted.
    kept = sorted(kept, key=lambda s: s.start_tok)
    for a, b in zip(kept, kept[1:]):
        assert a.end_tok <= b.start_tok
    # Every dropped span overlaps something kept (maximality of the greedy
    # longest-first filter).
    for s in spans:
        if all(k != s for k in kept):
            assert any(
                not (s.end_tok <= k.start_tok or k.end_tok <= s.start_tok)
                for k in kept
            )


@given(st.text(max_size=40))
@settings(max_examples=200, deadline=None)
def test_normalizers_idempotent(s):
    assert lowercase_normalizer(lowercase_normalizer(s)) == lowercase_normalizer(s)
    labels = split_labels(s)
    assert all(x == x.strip() and x for x in labels)


@given(texts)
@settings(max_examples=100, deadline=None)
def test_jaccard_identity_and_bounds(text):
    assert ngram_jaccard(text, text) == 1.0
    other = text + " zzz qqq vvv"
    j = ngram_jaccard(text, other)
    assert 0.0 <= j <= 1.0


@given(st.lists(texts, min_size=1, max_size=8))
@settings(max_examples=50, deadline=None)
def test_simhash_batch_equals_single(batch):
    stage = SimHashStage()
    got = stage._simhash_many(batch)
    for t, h in zip(batch, got):
        assert SimHashStage.simhash64(t) == int(h)


@given(
    st.integers(1, 5), st.integers(1, 10), st.integers(1, 10),
    st.integers(1, 30), st.integers(0, 2**32 - 1),
)
@settings(max_examples=40, deadline=None)
def test_avi_roundtrip_property(n, h, w, fps, seed):
    import numpy as np

    from spacy_llm_ray.stages.multimodal import decode_avi_rgb, encode_avi_rgb

    frames = np.random.RandomState(seed % 2**31).randint(
        0, 256, size=(n, h, w, 3), dtype=np.uint8
    )
    out, got_fps = decode_avi_rgb(encode_avi_rgb(frames, fps=fps))
    assert got_fps == fps and out.shape == frames.shape
    assert (out == frames).all()


@given(st.lists(st.text(min_size=0, max_size=80), min_size=1, max_size=32),
       st.integers(2, 64))
@settings(max_examples=60, deadline=None)
def test_partition_array_unicode_and_batch_consistency(ids, n):
    import numpy as np

    from spacy_llm_ray.state.checkpoint import _partition_array, _partition_of

    parts = _partition_array(ids, n)
    assert parts.dtype == np.int32
    assert ((0 <= parts) & (parts < n)).all()
    # batch assignment == per-row assignment (resume depends on this)
    for cid, p in zip(ids, parts):
        assert _partition_of(cid, n) == int(p)


@given(st.lists(st.fixed_dictionaries({
    "text": st.text(min_size=1, max_size=40),
    "spans": st.lists(st.fixed_dictionaries({
        "text": st.text(min_size=1, max_size=10),
        "is_entity": st.booleans(),
        "label": st.sampled_from(["PER", "ORG", "==NONE=="]),
        "reason": st.text(max_size=20),
    }), max_size=3),
}), min_size=1, max_size=4))
@settings(max_examples=40, deadline=None)
def test_example_coercion_roundtrip(dicts):
    from spacy_llm_ray.tasks.examples import (
        SpanCoTExample,
        coerce_examples,
        examples_to_dicts,
    )

    objs = coerce_examples(dicts, SpanCoTExample)
    assert all(isinstance(o, SpanCoTExample) for o in objs)
    back = examples_to_dicts(objs)
    assert back == dicts
    # idempotent on already-coerced objects
    assert coerce_examples(objs, SpanCoTExample) == objs


# --------------------------------------------------------------------------
# Round-5 whole-batch kernels: the vectorized Arrow/numpy paths must emit
# EXACTLY what the scalar reference paths emit, over arbitrary ASCII text.
# (ASCII because the batch kernels tokenize with RE2 `\w`/whitespace classes
# while the scalar paths use Python `re` — identical on ASCII, the corpus
# contract documented in stages/dedup._flat_word_hashes.)

ascii_tokens = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    min_size=0,
    max_size=10,
)
ascii_texts = st.lists(ascii_tokens, min_size=0, max_size=25).map(" ".join)
ascii_batches = st.lists(ascii_texts, min_size=0, max_size=8)


@given(ascii_batches, st.integers(min_value=2, max_value=9))
@settings(max_examples=100, deadline=None)
def test_dupspan_batch_scalar_parity_property(texts, window):
    import pyarrow as pa

    from spacy_llm_ray.stages.dedup import DupSpanStage

    stage = DupSpanStage(window=window)
    out = stage(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                "text": pa.array(texts, type=pa.string()),
            }
        )
    )
    mask = (1 << 64) - 1
    got = {i: [] for i in range(len(texts))}
    for d, h in zip(out["doc_id"].to_pylist(), out["win_hash"].to_pylist()):
        got[d].append(h & mask)
    for i, t in enumerate(texts):
        assert sorted(got[i]) == sorted(h & mask for h in stage.window_hashes(t))


@given(ascii_batches)
@settings(max_examples=100, deadline=None)
def test_simhash_batch_scalar_parity_property(texts):
    import pyarrow as pa

    stage = SimHashStage()
    ref = stage._simhash_many(texts)
    got = stage._simhash_batch(pa.array(texts, type=pa.string()))
    assert list(got) == list(ref)


# LangId batches mix stopwords from every profile, noise words, and CJK
# runs so the scoring tie-break, the 0.05 threshold, and the CJK
# short-circuit all get exercised.
_langid_word = st.one_of(
    st.sampled_from(
        "the and of la le les el los und der die est es no value tabla".split()
    ),
    st.text(
        alphabet=st.characters(min_codepoint=97, max_codepoint=122),
        min_size=1,
        max_size=6,
    ),
    st.sampled_from(["一二三", "一二三四五六七八九十" * 3]),
)
_langid_texts = st.lists(_langid_word, min_size=0, max_size=30).map(" ".join)


@given(st.lists(_langid_texts, min_size=0, max_size=8))
@settings(max_examples=100, deadline=None)
def test_langid_batch_scalar_parity_property(texts):
    import pyarrow as pa

    from spacy_llm_ray.stages.textstats import LangIdStage

    stage = LangIdStage()
    ref = [stage._predict(t) for t in texts]
    got = stage._predict_batch(pa.array(texts, type=pa.string())).to_pylist()
    assert got == ref
