"""Task registry resolves the reference's registered names to engine stages."""

import pyarrow as pa
import pytest

from spacy_llm_ray.registry import (
    get_misc,
    get_normalizer,
    make_task,
    task_names,
)
from spacy_llm_ray.models.mock import MockNERModel, MockTextCatModel
from spacy_llm_ray.models.noop import NoOpModel


def test_reference_task_names_present():
    names = task_names()
    for expected in [
        "spacy.NER.v1", "spacy.NER.v2", "spacy.NER.v3",
        "spacy.SpanCat.v1", "spacy.SpanCat.v3",
        "spacy.TextCat.v1", "spacy.TextCat.v3",
        "spacy.REL.v1", "spacy.EntityLinker.v1",
        "spacy.Lemma.v1", "spacy.Sentiment.v1", "spacy.Summarization.v1",
        "spacy.Translation.v1", "spacy.Raw.v1",
        "spacy.NoOp.v1", "spacy.NoOpNoShards.v1",
    ]:
        assert expected in names, expected
    with pytest.raises(ValueError, match="unknown task"):
        make_task("spacy.Nope.v1")


def test_ner_task_resolution_runs():
    stage = make_task(
        "spacy.NER.v3",
        labels=["PERSON", "GPE"],
        model=MockNERModel({"Alice": "PERSON", "Boston": "GPE"}, context_length=None),
    )
    out = stage(pa.table({"text": ["Alice visits Boston."]}))
    ments = out["mentions"].to_pylist()[0]
    assert [(m["text"], m["label"]) for m in ments] == [("Alice", "PERSON"), ("Boston", "GPE")]


def test_spancat_task_defaults_overlap():
    stage = make_task(
        "spacy.SpanCat.v3",
        labels=["X"],
        model=NoOpModel(),
    )
    assert stage._assign == "spans" and stage._cfg.allow_overlap is True


def test_textcat_task_emits_cats_map():
    stage = make_task(
        "spacy.TextCat.v3",
        labels=["Database"],
        model=MockTextCatModel("hash"),
    )
    out = stage(pa.table({"text": ["a hash join", "nothing here"]}))
    cats = out["cats"].to_pylist()
    assert dict(cats[0]) == {"Database": 1.0}
    assert dict(cats[1]) == {"Database": 0.0}


def test_normalizer_and_misc_names():
    assert get_normalizer("spacy.LowercaseNormalizer.v1")(" A ") == "a"
    assert get_normalizer("spacy.StripNormalizer.v1")(" A ") == "A"
    assert get_misc("spacy.NTokenEstimator.v1")()("a b c") == 3
    mapper = get_misc("spacy.ShardMapper.v1")()
    assert callable(mapper)


def test_translation_task_binds_target_lang():
    # ADVICE fix: target_lang must bind into the prompt builder, making the
    # registered spacy.Translation.v1 actually runnable.
    from spacy_llm_ray.models.mock import MockUpperModel

    stage = make_task(
        "spacy.Translation.v1", model=MockUpperModel(), target_lang="Spanish"
    )
    out = stage(pa.table({"text": ["hola mundo"]}))
    assert out["translation"].to_pylist() == ["HOLA MUNDO"]
    prompt = stage._prompt_fn("x")
    assert "Spanish" in prompt


def test_summarization_task_binds_max_n_words():
    from spacy_llm_ray.models.mock import MockSummaryModel

    stage = make_task(
        "spacy.Summarization.v1", model=MockSummaryModel(2), max_n_words=2
    )
    out = stage(pa.table({"text": ["one two three four"]}))
    assert out["summary"].to_pylist() == ["one two"]
