"""Reference-parity prompt templates: rendering snapshots + builder seam."""

from pathlib import Path

import pytest

from spacy_llm_ray import prompts
from spacy_llm_ray.prompts import PromptExample, builder, render, template_names
from spacy_llm_ray.tasks.span import SpanReason

REFERENCE_TEMPLATES = Path("/root/reference/spacy_llm/tasks/templates")


def _contexts():
    """One representative render context per template (few-shot included)."""
    ner_examples = [
        PromptExample(
            text="Jack and Jill went up the hill.",
            spans=[
                SpanReason("Jack", True, "PERSON", "is a person"),
                SpanReason("Jill", True, "PERSON", "is a person"),
                SpanReason("hill", False, "==NONE==", "is a landform"),
            ],
        )
    ]

    class _Rel:
        def model_dump_json(self):
            return '{"dep": 0, "dest": 1, "relation": "LivesIn"}'

    rel_example = PromptExample(
        text="Laura lives in Boston.", relations=[_Rel()]
    )
    return {
        "ner.v3": [
            dict(text="Alice visits Boston.", labels=["PERSON", "GPE"],
                 description=None, label_definitions=None,
                 prompt_examples=None),
            dict(text="Alice visits Boston.", labels=["PERSON", "GPE"],
                 description="Extract people and places.",
                 label_definitions={"PERSON": "a person",
                                    "GPE": "a geopolitical entity"},
                 prompt_examples=ner_examples),
        ],
        "spancat.v3": [
            dict(text="x y z", labels=["A"], description=None,
                 label_definitions=None, prompt_examples=ner_examples),
        ],
        "ner.v1": [
            dict(text="t", labels=["PERSON"],
                 prompt_examples=[PromptExample(
                     text="Jack went home.",
                     entities={"PERSON": ["Jack"]})]),
        ],
        "ner.v2": [
            dict(text="t", labels=["PERSON"],
                 label_definitions={"PERSON": "a person"},
                 prompt_examples=[PromptExample(
                     text="Jack went home.",
                     entities={"PERSON": ["Jack"]})]),
        ],
        "rel.v1": [
            dict(text="Laura[ENT0:PERSON] lives in Boston[ENT1:GPE].",
                 labels=["LivesIn"], label_definitions=None,
                 prompt_examples=[rel_example],
                 preannotate=lambda e: e.text),
        ],
        "textcat.v3": [
            dict(text="a doc", labels=["POS", "NEG"],
                 label_definitions={"POS": "positive"},
                 exclusive_classes=True, allow_none=False,
                 prompt_examples=[PromptExample(text="good", answer="POS")]),
        ],
        "lemma.v1": [
            dict(text="running fast",
                 prompt_examples=[PromptExample(
                     text="ran", lemmas=[{"ran": "run"}])]),
        ],
        "sentiment.v1": [
            dict(text="nice day",
                 prompt_examples=[PromptExample(text="great", score=1.0)]),
        ],
        "summarization.v1": [
            dict(text="long text here", max_n_words=10,
                 prompt_examples=[PromptExample(
                     text="a b c", summary="a")]),
        ],
        "translation.v1": [
            dict(text="hello", source_lang="English", target_lang="Spanish",
                 prompt_examples=[PromptExample(
                     text="hi", translation="hola")]),
        ],
        "raw.v1": [
            dict(text="2+2?",
                 prompt_examples=[PromptExample(text="1+1?", reply="2")]),
        ],
        "entity_linker.v1": [
            dict(text="*Alice* was here.", mentions_str="*Alice*",
                 mentions=["Alice"],
                 entity_descriptions=[["a person", "a city"]],
                 entity_ids=[["Q1", "Q2"]],
                 prompt_examples=None),
        ],
    }


@pytest.mark.skipif(
    not REFERENCE_TEMPLATES.exists(), reason="reference checkout not present"
)
def test_rendering_matches_reference_bytes():
    """Our rendering of each ported template must be byte-identical to
    rendering the reference's own .jinja with the same context."""
    import jinja2.sandbox

    env = jinja2.sandbox.SandboxedEnvironment()
    for name, contexts in _contexts().items():
        ref = env.from_string((REFERENCE_TEMPLATES / f"{name}.jinja").read_text())
        for ctx in contexts:
            assert render(name, **ctx) == ref.render(**ctx), name


def test_all_templates_render_smoke():
    ctxs = _contexts()
    for name in template_names():
        ctx = ctxs.get(name, [dict(text="sample")])[0]
        out = render(name, **ctx)
        assert isinstance(out, str) and len(out) > 20, name


def test_ner_v3_prompt_content():
    fn = builder("ner.v3", labels=["PERSON", "GPE"])
    p = fn("Alice visits Boston.")
    assert "expert Named Entity Recognition" in p
    assert "PERSON, GPE" in p
    assert p.rstrip().endswith("Paragraph: Alice visits Boston.\nAnswer:")
    # Default example block present when no few-shot examples are given.
    assert "Sriracha sauce" in p


def test_builder_seam_with_ner_stage():
    """Reference template drops into NerStage's prompt_builder seam; prompts
    sent to the model are the reference rendering."""
    import pyarrow as pa

    from spacy_llm_ray.stages.llm_stage import NerStage

    seen = []

    class Probe:
        context_length = None

        def __call__(self, prompts):
            seen.extend(prompts)
            return ["1. Alice | True | PERSON | is a person"] * len(prompts)

    fn = builder("ner.v3", labels=["PERSON"])

    def prompt_builder(text, labels=None, i_shard=0, n_shards=1, **_kw):
        return fn(text, i_shard=i_shard, n_shards=n_shards)

    stage = NerStage(labels=["PERSON"], model=Probe(),
                     prompt_builder=prompt_builder)
    out = stage(pa.table({"conv_id": ["c"], "text": ["Alice was here."]}))
    ments = out["mentions"].to_pylist()[0]
    assert [(m["text"], m["label"]) for m in ments] == [("Alice", "PERSON")]
    assert "Paragraph: Alice was here." in seen[0]


def test_builder_rejects_unknown():
    with pytest.raises(ValueError, match="unknown template"):
        prompts.builder("nope.v9")


NER_V3_ZEROSHOT_SNAPSHOT = 'You are an expert Named Entity Recognition (NER) system.\nYour task is to accept Text as input and extract named entities.\nEntities must have one of the following labels: PERSON, GPE.\nIf a span is not an entity label it: `==NONE==`.\n\n\nHere is an example of the output format for a paragraph using different labels than this task requires.\nOnly use this output format but use the labels provided\nabove instead of the ones defined in the example below.\nDo not output anything besides entities in this output format.\nOutput entities in the order they occur in the input paragraph regardless of label.\n\nQ: Given the paragraph below, identify a list of entities, and for each entry explain why it is or is not an entity:\n\nParagraph: Sriracha sauce goes really well with hoisin stir fry, but you should add it after you use the wok.\nAnswer:\n1. Sriracha sauce | True | INGREDIENT | is an ingredient to add to a stir fry\n2. really well | False | ==NONE== | is a description of how well sriracha sauce goes with hoisin stir fry\n3. hoisin stir fry | True | DISH | is a dish with stir fry vegetables and hoisin sauce\n4. wok | True | EQUIPMENT | is a piece of cooking equipment used to stir fry ingredients\n\nParagraph: Alice visits Boston.\nAnswer:'


def test_ner_v3_zeroshot_snapshot_offline():
    """Full-text snapshot of the zero-shot ner.v3 prompt (the reference's
    exact wording), independent of any reference checkout."""
    fn = builder("ner.v3", labels=["PERSON", "GPE"])
    assert fn("Alice visits Boston.") == NER_V3_ZEROSHOT_SNAPSHOT
