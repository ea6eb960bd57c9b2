"""Model registry: name -> factory.

Mirrors the reference's registered model surface
(/root/reference/spacy_llm/models/rest/openai/registry.py,
anthropic/registry.py, noop; context lengths from
models/rest/openai/model.py:147-173). REST-backed entries build a
``RESTModel`` skeleton with the right context length and the standard retry
envelope; the transport is injectable because this sandbox has no network —
deployments pass ``call_fn`` performing the HTTP POST. Mock/test models are
registered alongside, exactly as the reference registers ``test.NoOpModel.v1``.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional

from .mock import (
    EchoModel,
    MockELModel,
    MockLemmaModel,
    MockNERModel,
    MockRELModel,
    MockSentimentModel,
    MockSummaryModel,
    MockTextCatModel,
    MockUpperModel,
)
from .noop import NoOpModel
from .rest import RESTModel, RetryConfig

# Context lengths (sharding divisor) — openai/model.py:147-173 lookup table.
CONTEXT_LENGTHS: Dict[str, int] = {
    "gpt-4": 8192,
    "gpt-4-32k": 32768,
    "gpt-4-turbo": 128000,
    "gpt-3.5-turbo": 4097,
    "gpt-3.5-turbo-16k": 16385,
    "text-davinci-003": 4097,
    "claude-2": 100000,
    "claude-instant-1": 100000,
}

_REGISTRY: Dict[str, Callable[..., object]] = {}


def register_model(name: str):
    def deco(factory):
        _REGISTRY[name] = factory
        return factory

    return deco


def model_names() -> List[str]:
    return sorted(_REGISTRY)


def make_model(name: str, **kwargs):
    if name not in _REGISTRY:
        raise ValueError(f"unknown model {name!r}; known: {model_names()}")
    return _REGISTRY[name](**kwargs)


def _unconfigured_transport(prompts, timeout):
    raise RuntimeError(
        "REST model has no transport configured in this environment; pass "
        "call_fn=<HTTP POST callable> when instantiating."
    )


def _rest_factory(model_key: str):
    def factory(call_fn=None, context_length: Optional[int] = None,
                retry: Optional[RetryConfig] = None, **_ignored):
        return RESTModel(
            call_fn=call_fn or _unconfigured_transport,
            retry=retry or RetryConfig(),
            context_length=context_length or CONTEXT_LENGTHS.get(model_key),
        )

    return factory


# REST families (spacy.GPT-4.v1-3 / spacy.GPT-3-5.v1-3 / spacy.Claude-2.v1 ...)
for _key, _names in {
    "gpt-4": ["spacy.GPT-4.v1", "spacy.GPT-4.v2", "spacy.GPT-4.v3"],
    "gpt-3.5-turbo": ["spacy.GPT-3-5.v1", "spacy.GPT-3-5.v2", "spacy.GPT-3-5.v3"],
    "text-davinci-003": ["spacy.Davinci.v1", "spacy.Text-Davinci.v2"],
    "claude-2": ["spacy.Claude-2.v1"],
    "claude-instant-1": ["spacy.Claude-1.v1"],
}.items():
    for _name in _names:
        _REGISTRY[_name] = _rest_factory(_key)


@register_model("test.NoOpModel.v1")
def _noop(**kwargs):
    return NoOpModel(**kwargs)


@register_model("test.Echo.v1")
def _echo(**kwargs):
    return EchoModel(**kwargs)


@register_model("mock.NER.v1")
def _mock_ner(gazetteer=None, **kwargs):
    from ..data import transcripts as tdata

    return MockNERModel(gazetteer or tdata.GAZETTEER, **kwargs)


@register_model("mock.REL.v1")
def _mock_rel(predicates=None, **kwargs):
    from ..data import transcripts as tdata

    return MockRELModel(predicates or tdata.PREDICATES, **kwargs)


@register_model("mock.EL.v1")
def _mock_el(**kwargs):
    return MockELModel(**kwargs)


@register_model("mock.TextCat.v1")
def _mock_textcat(keyword: str = "hash", **kwargs):
    return MockTextCatModel(keyword, **kwargs)


@register_model("mock.Sentiment.v1")
def _mock_sentiment(**kwargs):
    return MockSentimentModel(**kwargs)


@register_model("mock.Summary.v1")
def _mock_summary(n_words: int = 10, **kwargs):
    return MockSummaryModel(n_words, **kwargs)


@register_model("mock.Lemma.v1")
def _mock_lemma(**kwargs):
    return MockLemmaModel(**kwargs)


@register_model("mock.Upper.v1")
def _mock_upper(**kwargs):
    return MockUpperModel(**kwargs)
