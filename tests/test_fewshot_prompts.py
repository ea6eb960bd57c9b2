"""Few-shot example rendering in prompts (builtin_task.py:57-97 example
injection analog) and mock-model robustness against example blocks."""

from spacy_llm_ray.models.mock import MockELModel
from spacy_llm_ray.tasks.examples import ELExample, RELExample, SpanCoTExample
from spacy_llm_ray.templates import el_v1_prompt, ner_v3_prompt, rel_v1_prompt


def test_ner_prompt_with_cot_examples():
    ex = SpanCoTExample.from_dict(
        {
            "text": "Jack and Jill went up the hill.",
            "spans": [
                {"text": "Jack", "is_entity": True, "label": "PERSON", "reason": "name"},
                {"text": "went up", "is_entity": False, "label": "==NONE==", "reason": "verb"},
            ],
        }
    )
    prompt = ner_v3_prompt("Some text.", ["PERSON"], examples=[ex])
    assert "Jack and Jill went up the hill." in prompt
    assert "Jack | True | PERSON | name" in prompt
    assert "went up | False | ==NONE== | verb" in prompt


def test_rel_prompt_with_examples():
    ex = RELExample.from_dict(
        {
            "text": "Laura lives in Boston",
            "ents": [
                {"start_char": 0, "end_char": 5, "label": "PERSON"},
                {"start_char": 15, "end_char": 21, "label": "GPE"},
            ],
            "relations": [{"dep": 0, "dest": 1, "relation": "LivesIn"}],
        }
    )
    prompt = rel_v1_prompt("Some[ENT0:PERSON] text", ["LivesIn"], examples=[ex])
    assert "Laura[ENT0:PERSON] lives in Boston[ENT1:GPE]" in prompt
    assert '{"dep": 0, "dest": 1, "relation": "LivesIn"}' in prompt


def test_el_prompt_with_examples_does_not_confuse_mock():
    ex = ELExample.from_dict(
        {
            "text": "Alice goes to *New York*.",
            "mentions": ["New York"],
            "entity_descriptions": [["most populous US city", "US state"]],
            "entity_ids": [["Q60", "Q1384"]],
            "solutions": ["Q60"],
        }
    )
    prompt = el_v1_prompt(
        "*Boston* is nice.",
        ["Boston"],
        [["Q100", "Q204289"]],
        [["city in Massachusetts", "rock band"]],
        examples=[ex],
    )
    assert "*New York* ::: <Q60>" in prompt  # example solution block rendered
    # The mock answers ONLY the current doc's candidate block, not the
    # (indented) example block.
    (resp,) = MockELModel()([prompt])
    assert resp == "*Boston* ::: <Q100>"
