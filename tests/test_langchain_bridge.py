"""LangChain bridge with fake langchain class dict (langchain not installed)."""

import pytest

from spacy_llm_ray.models import langchain as lc


class FakeLLM:
    def __init__(self, **kwargs):
        if "model" in kwargs:
            raise lc.LangChainValidationError()  # wants model_name instead
        self.model_name = kwargs.pop("model_name", None)
        if self.model_name is None:
            raise lc.LangChainValidationError()
        self.kwargs = kwargs

    def invoke(self, prompt):
        return f"lc:{prompt}"


@pytest.fixture()
def fake_classes(monkeypatch):
    monkeypatch.setattr(lc.LangChainModel, "_type_to_cls_dict", {"fake": FakeLLM})
    yield


def test_requires_langchain_without_fakes():
    if lc.has_langchain():
        pytest.skip("langchain installed")
    with pytest.raises(ValueError, match="requires `langchain`"):
        lc.LangChainModel(name="m", api="fake")


def test_model_id_failthrough_and_invoke(fake_classes):
    m = lc.LangChainModel(name="my-model", api="fake", config={"temperature": 0},
                          context_length=123)
    assert m._langchain_model.model_name == "my-model"
    assert m._langchain_model.kwargs == {"temperature": 0}
    assert m.context_length == 123
    assert m(["a", "b"]) == ["lc:a", "lc:b"]


def test_register_langchain_models(fake_classes):
    registered = {}

    def register_fn(name):
        def deco(f):
            registered[name] = f
            return f
        return deco

    lc.register_langchain_models(register_fn)
    assert "langchain.FakeLLM.v1" in registered
    m = registered["langchain.FakeLLM.v1"](name="x")
    assert m(["p"]) == ["lc:p"]


def test_custom_query_callable(fake_classes):
    m = lc.LangChainModel(
        name="x", api="fake",
        query=lambda model, prompts: [p.upper() for p in prompts],
    )
    assert m(["ab"]) == ["AB"]
