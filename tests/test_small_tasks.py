"""TextCat / Lemma / Sentiment / Summarization / Translation / Raw parsers
(reference semantics: tasks/{textcat,lemma,sentiment,summarization}/parser.py)."""

import pytest

from spacy_llm_ray.tasks.lemma import apply_lemmas, parse_lemma_response
from spacy_llm_ray.tasks.sentiment import parse_sentiment_response
from spacy_llm_ray.tasks.summarization import parse_summarization_response
from spacy_llm_ray.tasks.textcat import TextCatConfig, parse_textcat_response
from spacy_llm_ray.tasks.translation import parse_translation_response
from spacy_llm_ray.tasks.raw import parse_raw_response


def test_textcat_binary():
    cfg = TextCatConfig(labels=["Recipe"])
    assert parse_textcat_response(cfg, "POS") == {"Recipe": 1.0}
    assert parse_textcat_response(cfg, "pos") == {"Recipe": 1.0}  # .upper() == POS
    assert parse_textcat_response(cfg, "NEG") == {"Recipe": 0.0}
    assert parse_textcat_response(cfg, "garbage") == {"Recipe": 0.0}


def test_textcat_multilabel():
    cfg = TextCatConfig(labels=["A", "B", "C"], exclusive_classes=False)
    assert parse_textcat_response(cfg, "a, C") == {"A": 1.0, "B": 0.0, "C": 1.0}
    assert parse_textcat_response(cfg, "unknown") == {"A": 0.0, "B": 0.0, "C": 0.0}


def test_textcat_exclusive_multiple_answers_empty():
    cfg = TextCatConfig(labels=["A", "B"], exclusive_classes=True)
    # Exclusive + multiple predictions -> store empty (parser.py:36-44).
    assert parse_textcat_response(cfg, "A, B") == {"A": 0.0, "B": 0.0}
    assert parse_textcat_response(cfg, "B") == {"A": 0.0, "B": 1.0}


def test_lemma_parse_and_guard():
    response = "Lemmatized text:\n'''\nI: I\nsaw: see\nfoxes: fox\nbroken line\n'''"
    parsed = parse_lemma_response(response)
    assert parsed == [["I", "I"], ["saw", "see"], ["foxes", "fox"]]
    # Guard: token count mismatch -> whole shard skipped (lemma/task.py:56-61).
    assert apply_lemmas(4, parsed) is None
    assert apply_lemmas(3, parsed) == ["I", "see", "fox"]


@pytest.mark.parametrize(
    "response,expected",
    [
        ("Answer: 0.75", 0.75),
        ("0.5", 0.5),
        ("Answer:\n1.0", 1.0),
        ("garbage", None),
        ("", None),
    ],
)
def test_sentiment(response, expected):
    assert parse_sentiment_response(response) == expected


def test_summarization_strips_quotes():
    assert parse_summarization_response("'''A short summary.'''") == "A short summary."


def test_translation_raw_identity():
    assert parse_translation_response("  bonjour  ") == "bonjour"
    assert parse_raw_response("  reply  ") == "reply"
