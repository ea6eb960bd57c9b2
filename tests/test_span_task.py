"""Span-task parser conformance corpus.

Golden cases ported from /root/reference/spacy_llm/tests/tasks/test_ner.py
(labels/normalization :331-400, alignment :403-456, case matching :465-507,
duplicate surface forms :908-946, commas in entities :949-974)."""

import pytest

from spacy_llm_ray.normalizers import lowercase_normalizer, strip_normalizer
from spacy_llm_ray.tasks.span import (
    SpanReason,
    SpanTaskConfig,
    parse_span_response,
    parse_span_response_cot,
)
from spacy_llm_ray.tokenizer import filter_spans, tokenize

LABELS = ["PER", "ORG", "LOC"]


def run_cot(text, response, **cfg_kwargs):
    cfg = SpanTaskConfig(labels=cfg_kwargs.pop("labels", LABELS), **cfg_kwargs)
    spans = parse_span_response_cot(cfg, text, tokenize(text), response)
    spans = filter_spans(spans)  # NER assignment path (ner/task.py:94-100)
    return [(s.text, s.label) for s in spans]


@pytest.mark.parametrize(
    "response,normalizer,gold_ents",
    [
        (
            "1. Jean Jacques | True | PER | is a person's name\n"
            "2. Jaime | True | PER | is a person's name\n",
            lowercase_normalizer,
            [("Jean Jacques", "PER"), ("Jaime", "PER")],
        ),
        (
            "1. Jean Jacques | True | PER | is a person's name\n"
            "2. Jaime | True | PER | is a person's name\n",
            strip_normalizer,
            [("Jean Jacques", "PER"), ("Jaime", "PER")],
        ),
        (
            "1. Jean Jacques | True | per | is a person's name\n"
            "2. Jaime | True | per | is a person's name\n",
            strip_normalizer,
            [],
        ),
        (
            "1. Jean Jacques | True | per | is a person's name\n"
            "2. Jaime | True | PER | is a person's name\n",
            lowercase_normalizer,
            [("Jean Jacques", "PER"), ("Jaime", "PER")],
        ),
        (
            "1. Jean Jacques | True | per | is a person's name\n"
            "2. Jaime | True | per | is a person's name\n"
            "3. library | True | Org | is a organization\n",
            lowercase_normalizer,
            [("Jean Jacques", "PER"), ("Jaime", "PER"), ("library", "ORG")],
        ),
        (
            "1. Jean Jacques | True | per | is a person's name\n"
            "2. Jaime | True | per | is a person's name\n"
            "3. Jaime | True | RANDOM | is an entity\n",
            lowercase_normalizer,
            [("Jean Jacques", "PER"), ("Jaime", "PER")],
        ),
    ],
)
def test_ner_labels(response, normalizer, gold_ents):
    text = "Jean Jacques and Jaime went to the library."
    assert run_cot(text, response, normalizer=normalizer) == gold_ents


@pytest.mark.parametrize(
    "response,alignment_mode,gold_ents",
    [
        ("1. Jacq | True | PER | is a person's name", "strict", []),
        ("1. Jacq | True | PER | is a person's name", "contract", []),
        ("1. Jacq | True | PER | is a person's name", "expand", [("Jacques", "PER")]),
        ("1. Jean J | True | PER | is a person's name", "contract", [("Jean", "PER")]),
        ("1. Jean Jacques | True | PER | is a person's name", "strict",
         [("Jean Jacques", "PER")]),
        ("1. random | True | PER | is a person's name", "expand", []),
    ],
)
def test_ner_alignment(response, alignment_mode, gold_ents):
    text = "Jean Jacques and Jaime went to the library."
    assert run_cot(text, response, alignment_mode=alignment_mode) == gold_ents


@pytest.mark.parametrize(
    "response,case_sensitive,gold_ents",
    [
        ("1. Jean | True | PER | is a person's name", False, [("jean", "PER")]),
        ("1. Jean | True | PER | is a person's name", True, [("Jean", "PER")]),
        (
            "1. jean | True | PER | is a person's name\n"
            "2. Jean | True | PER | is a person's name\n"
            "3. Jean Foundation | True | ORG | is the name of an Organization name",
            False,
            [("jean", "PER"), ("Jean", "PER"), ("Jean Foundation", "ORG")],
        ),
    ],
)
def test_ner_matching(response, case_sensitive, gold_ents):
    text = "This guy jean (or Jean) is the president of the Jean Foundation."
    assert run_cot(text, response, case_sensitive_matching=case_sensitive) == gold_ents


@pytest.mark.parametrize(
    "text,response,gold_ents",
    [
        (
            "The woman Paris was walking around in Paris, talking to her friend Paris",
            "1. Paris | True | PER | is the name of the woman\n"
            "2. Paris | True | LOC | is a city in France\n"
            "3. Paris | True | PER | is the name of the woman\n",
            [("Paris", "PER"), ("Paris", "LOC"), ("Paris", "PER")],
        ),
        (
            "Walking around Paris as a woman named Paris is quite a trip.",
            "1. Paris | True | LOC | is a city in France\n"
            "2. Paris | True | PER | is the name of the woman\n",
            [("Paris", "LOC"), ("Paris", "PER")],
        ),
    ],
)
def test_duplicate_surface_forms(text, response, gold_ents):
    assert run_cot(text, response, labels=["PER", "LOC"]) == gold_ents


def test_commas_in_entities():
    text = "FooBar, Inc. is a large organization in the U.S."
    response = (
        "1. FooBar, Inc. | True | ORG | is the name of an organization\n"
        "2. U.S. | True | LOC | is a country\n"
    )
    assert run_cot(text, response, labels=["ORG", "LOC"]) == [
        ("FooBar, Inc.", "ORG"),
        ("U.S.", "LOC"),
    ]


def test_span_reason_codec():
    sr = SpanReason.from_str(
        "1. Golden State Warriors | True | BASKETBALL_TEAM | is a basketball team"
    )
    assert sr.text == "Golden State Warriors"
    assert sr.is_entity is True
    assert sr.label == "BASKETBALL_TEAM"
    assert sr.to_str() == (
        "Golden State Warriors | True | BASKETBALL_TEAM | is a basketball team"
    )
    with pytest.raises(ValueError):
        SpanReason.from_str("not a valid line")
    # Negative span (==NONE== label) is filtered by is_entity, not label match.
    sr2 = SpanReason.from_str("3. went up | False | ==NONE== | is a verb")
    assert sr2.is_entity is False


def test_v1_response_format():
    """v1/v2 '<LABEL>: a, b' format; all occurrences grounded
    (span/parser.py:10-71)."""
    text = "Paris is big. paris is a person. Berlin is big."
    cfg = SpanTaskConfig(labels=["LOC"])
    spans = parse_span_response(cfg, text, tokenize(text), "LOC: Paris, Berlin\nBAD: x")
    got = [(s.text, s.label, s.start_char) for s in spans]
    assert got == [("Paris", "LOC", 0), ("paris", "LOC", 14), ("Berlin", "LOC", 33)]


def test_cot_overlap_rule():
    """allow_overlap keeps the cursor at span start so overlapping spans can
    be found (span/parser.py:152)."""
    text = "New York City is huge."
    response = (
        "1. New York City | True | LOC | place\n"
        "2. York | True | LOC | place\n"
    )
    cfg_no = SpanTaskConfig(labels=["LOC"], allow_overlap=False)
    cfg_yes = SpanTaskConfig(labels=["LOC"], allow_overlap=True)
    toks = tokenize(text)
    got_no = [(s.text,) for s in parse_span_response_cot(cfg_no, text, toks, response)]
    got_yes = [(s.text,) for s in parse_span_response_cot(cfg_yes, text, toks, response)]
    assert got_no == [("New York City",)]
    assert got_yes == [("New York City",), ("York",)]
