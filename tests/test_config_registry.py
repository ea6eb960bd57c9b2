"""Model registry, config assembly/validation, save_io capture, CLI job."""

import json

import pytest

from spacy_llm_ray.config import build_models, load_config, run_job, validate_config
from spacy_llm_ray.models.registry import CONTEXT_LENGTHS, make_model, model_names
from spacy_llm_ray.models.rest import RESTModel


def test_registry_names_and_context_lengths():
    names = model_names()
    assert "spacy.GPT-3-5.v3" in names and "test.NoOpModel.v1" in names
    with pytest.warns(UserWarning, match="OPENAI_API_KEY"):
        m = make_model("spacy.GPT-3-5.v3")
    from spacy_llm_ray.models.providers import OpenAIProvider

    assert isinstance(m, OpenAIProvider)
    assert m.context_length == CONTEXT_LENGTHS["gpt-3.5-turbo"] == 4097
    with pytest.warns(UserWarning):
        assert make_model("spacy.GPT-4.v2").context_length == 8192
    # Legacy seam: call_fn= still builds the envelope-only RESTModel.
    legacy = make_model("spacy.GPT-4.v1", call_fn=lambda p, t: list(p))
    assert isinstance(legacy, RESTModel) and legacy.context_length == 8192
    with pytest.raises(ValueError, match="unknown model"):
        make_model("spacy.NotAModel.v9")


def test_registry_mock_models():
    ner = make_model("mock.NER.v1", context_length=None)
    assert ner(["Text:\n'''\nAlice Johnson lives in Boston.\n'''"])[0]


def test_config_validation():
    with pytest.raises(ValueError, match="'input'"):
        validate_config({})
    with pytest.raises(ValueError, match="unknown pipeline"):
        validate_config({"input": "x", "pipeline": "nope"})
    with pytest.raises(ValueError, match="unknown model"):
        validate_config({"input": "x", "models": {"ner": {"name": "bogus"}}})
    with pytest.raises(ValueError, match="'output'"):
        validate_config({"input": "x", "checkpoint": {"n_partitions": 2}})
    ok = validate_config({"input": "x"})
    assert ok["input"] == "x"


def test_load_config_formats(tmp_path):
    cfg = {"input": "/x", "pipeline": "kg"}
    pj = tmp_path / "job.json"
    pj.write_text(json.dumps(cfg))
    py = tmp_path / "job.yaml"
    py.write_text("input: /x\npipeline: kg\n")
    assert load_config(pj)["input"] == "/x"
    assert load_config(py)["pipeline"] == "kg"


def test_build_models_from_config():
    models = build_models(
        {"models": {"ner": {"name": "mock.NER.v1", "context_length": 123}}}
    )
    assert models["ner"].context_length == 123
    defaults = build_models({})
    assert set(defaults) == {"ner", "rel", "el"}


def test_run_job_end_to_end(ray_session, tmp_path):
    from spacy_llm_ray.data import ensure_dataset

    sf = ensure_dataset("sf0.001")
    summary = run_job({"input": sf, "pipeline": "kg"})
    assert summary["rows"] > 0 and summary["checkpointed"] is False
    out = str(tmp_path / "ckpt")
    summary = run_job(
        {"input": sf, "output": out, "pipeline": "kg", "checkpoint": {"n_partitions": 2}}
    )
    assert summary["checkpointed"] is True and summary["completed"] == [0, 1]


def test_save_io_capture(ray_session):
    import ray.data

    from spacy_llm_ray.models.mock import MockNERModel
    from spacy_llm_ray.stages.llm_stage import NerStage

    ds = ray.data.from_items(
        [{"conv_id": "c1", "text": "Alice Johnson lives in Boston."}]
    )
    out = ds.map_batches(
        NerStage,
        fn_constructor_kwargs=dict(
            labels=["PERSON", "GPE"],
            model=MockNERModel({"Alice Johnson": "PERSON", "Boston": "GPE"}),
            save_io=True,
        ),
        batch_format="pyarrow",
        concurrency=1,
    )
    row = out.take(1)[0]
    io = row["llm_io"]
    assert len(io["prompt"]) == 1 and "Alice Johnson lives in Boston." in io["prompt"][0]
    assert "Alice Johnson | True | PERSON" in io["response"][0]


def test_build_models_model_name_passthrough(monkeypatch):
    monkeypatch.setenv("OPENAI_API_KEY", "sk")
    models = build_models(
        {"models": {"raw": {"name": "spacy.GPT-4.v3",
                            "model_name": "gpt-4-32k"}}}
    )
    m = models["raw"]
    assert m._name == "gpt-4-32k" and m.context_length == 32768
