"""Model registry: name -> factory.

Mirrors the reference's registered model surface
(/root/reference/spacy_llm/models/rest/openai/registry.py,
anthropic/registry.py:11-508, cohere/registry.py, palm/registry.py,
azure/registry.py, noop/registry.py). REST names build real provider codecs
(``models/providers.py``) with the reference's endpoints, default model names
and context lengths; the HTTP transport is injectable because this sandbox
has no network — production uses the default ``requests`` transport, tests
inject fakes. Passing ``call_fn=`` instead returns the legacy ``RESTModel``
envelope-only skeleton (kept for direct transport injection).

v1/v2/v3 differences follow the reference: v1 sends no default config, v2/v3
default ``temperature=0``; v3 (and v2 for Anthropic) accept an explicit
``context_length``; unknown names fall back to the per-provider context-length
table (rest/base.py:84-93).
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
from .providers import (
    AnthropicProvider,
    AzureOpenAIProvider,
    CohereProvider,
    OpenAIProvider,
    PaLMProvider,
)
from .rest import RESTModel, RetryConfig

# Context lengths (sharding divisor) — per-provider lookup tables from
# openai/model.py:147-173, anthropic/model.py:119-140, azure/model.py:164-181,
# cohere/model.py:123-129, palm/model.py:119-123.
OPENAI_CONTEXT_LENGTHS: Dict[str, int] = {
    "gpt-4": 8192,
    "gpt-4-0314": 8192,
    "gpt-4-32k": 32768,
    "gpt-4-32k-0314": 32768,
    "gpt-3.5-turbo": 4097,
    "gpt-3.5-turbo-16k": 16385,
    "gpt-3.5-turbo-0613": 4097,
    "gpt-3.5-turbo-0613-16k": 16385,
    "gpt-3.5-turbo-instruct": 4097,
    "text-davinci-002": 4097,
    "text-davinci-003": 4097,
    "code-davinci-002": 8001,
    "text-curie-001": 2049,
    "text-babbage-001": 2049,
    "text-ada-001": 2049,
    "davinci": 2049,
    "curie": 2049,
    "babbage": 2049,
    "ada": 2049,
}
ANTHROPIC_CONTEXT_LENGTHS: Dict[str, int] = {
    name: 100000
    for name in (
        "claude-2", "claude-2-100k", "claude-1", "claude-1-100k",
        "claude-instant-1", "claude-instant-1-100k", "claude-instant-1.1",
        "claude-instant-1.1-100k", "claude-1.3", "claude-1.3-100k",
        "claude-1.0", "claude-1.2",
    )
}
COHERE_CONTEXT_LENGTHS: Dict[str, int] = {
    "command": 4096,
    "command-light": 4096,
    "command-light-nightly": 4096,
    "command-nightly": 4096,
}
PALM_CONTEXT_LENGTHS: Dict[str, int] = {
    "text-bison-001": 8192,
    "chat-bison-001": 8192,
}

# Back-compat flat table (also used by tests / sharding defaults).
CONTEXT_LENGTHS: Dict[str, int] = {
    **OPENAI_CONTEXT_LENGTHS,
    **ANTHROPIC_CONTEXT_LENGTHS,
    **COHERE_CONTEXT_LENGTHS,
    **PALM_CONTEXT_LENGTHS,
}

_REGISTRY: Dict[str, Callable[..., object]] = {}


def register_model(name: str):
    def deco(factory):
        _REGISTRY[name] = factory
        return factory

    return deco


def model_names() -> List[str]:
    return sorted(_REGISTRY)


def make_model(registered_name: str, /, **kwargs):
    # Positional-only so the factory's own ``name=`` kwarg (the provider-side
    # model name, e.g. "gpt-3.5-turbo-instruct") can pass through untouched.
    if registered_name not in _REGISTRY:
        raise ValueError(
            f"unknown model {registered_name!r}; known: {model_names()}"
        )
    return _REGISTRY[registered_name](**kwargs)


def _legacy_rest(call_fn, context_length, retry):
    return RESTModel(
        call_fn=call_fn,
        retry=retry or RetryConfig(),
        context_length=context_length,
    )


def _provider_factory(cls, default_name: str, table: Dict[str, int],
                      endpoint: Optional[str] = None,
                      default_config: Optional[dict] = None,
                      endpoint_fn=None):
    """Registry factory for one (provider, default model) pair.

    ``endpoint_fn(name)`` computes the endpoint from the resolved model name
    (used by OpenAI's chat-vs-instruct split, registry.py:148-150 in the
    reference); otherwise ``endpoint`` is used directly.
    """

    default_endpoint = endpoint

    def factory(name: str = default_name, config: Optional[dict] = None,
                strict: bool = True, max_tries: int = 5, interval: float = 1.0,
                max_request_time: float = 30.0,
                context_length: Optional[int] = None,
                endpoint: Optional[str] = None,
                transport=None, call_fn=None,
                retry: Optional[RetryConfig] = None, **extra):
        ctx = context_length if context_length else table.get(name)
        if call_fn is not None:
            return _legacy_rest(call_fn, ctx, retry)
        resolved_endpoint = endpoint or (
            endpoint_fn(name) if endpoint_fn else default_endpoint
        )
        return cls(
            name=name,
            endpoint=resolved_endpoint,
            config={**(default_config or {}), **(config or {})},
            strict=strict,
            max_tries=max_tries,
            interval=interval,
            max_request_time=max_request_time,
            context_length=ctx,
            transport=transport,
            **extra,
        )

    return factory


def _openai_chat_endpoint(name: str) -> str:
    # gpt-3.5-turbo-instruct is the one chat-family model served on the
    # completions endpoint (reference openai/registry.py:148-150).
    if name == "gpt-3.5-turbo-instruct":
        return OpenAIProvider.NON_CHAT_ENDPOINT
    return OpenAIProvider.CHAT_ENDPOINT


_TEMP0 = {"temperature": 0.0}

# (registered names, default model, chat?) — openai/registry.py.
_OPENAI_FAMILIES = [
    (["spacy.GPT-4.v1", "spacy.GPT-4.v2", "spacy.GPT-4.v3"], "gpt-4", True),
    (["spacy.GPT-3-5.v1", "spacy.GPT-3-5.v2", "spacy.GPT-3-5.v3"],
     "gpt-3.5-turbo", True),
    (["spacy.Text-Davinci.v1", "spacy.Text-Davinci.v2",
      "spacy.Text-Davinci.v3"], "text-davinci-003", False),
    (["spacy.Code-Davinci.v1", "spacy.Code-Davinci.v2"],
     "code-davinci-002", False),
    (["spacy.Text-Curie.v1", "spacy.Text-Curie.v2"], "text-curie-001", False),
    (["spacy.Text-Babbage.v1", "spacy.Text-Babbage.v2"],
     "text-babbage-001", False),
    (["spacy.Text-Ada.v1", "spacy.Text-Ada.v2"], "text-ada-001", False),
    (["spacy.Davinci.v1", "spacy.Davinci.v2"], "davinci", False),
    (["spacy.Curie.v1", "spacy.Curie.v2"], "curie", False),
    (["spacy.Babbage.v1", "spacy.Babbage.v2"], "babbage", False),
    (["spacy.Ada.v1", "spacy.Ada.v2"], "ada", False),
]
for _names, _default, _chat in _OPENAI_FAMILIES:
    for _reg_name in _names:
        _v1 = _reg_name.endswith(".v1")
        _REGISTRY[_reg_name] = _provider_factory(
            OpenAIProvider, _default, OPENAI_CONTEXT_LENGTHS,
            endpoint_fn=_openai_chat_endpoint if _chat else (
                lambda _n: OpenAIProvider.NON_CHAT_ENDPOINT
            ),
            default_config=None if _v1 else dict(_TEMP0),
        )

# Anthropic (anthropic/registry.py:11-508).
_ANTHROPIC_FAMILIES = [
    (["spacy.Claude-2.v1", "spacy.Claude-2.v2"], "claude-2"),
    (["spacy.Claude-1.v1", "spacy.Claude-1.v2"], "claude-1"),
    (["spacy.Claude-instant-1.v1", "spacy.Claude-instant-1.v2"],
     "claude-instant-1"),
    (["spacy.Claude-instant-1-1.v1", "spacy.Claude-instant-1-1.v2"],
     "claude-instant-1.1"),
    (["spacy.Claude-1-0.v1", "spacy.Claude-1-0.v2"], "claude-1.0"),
    (["spacy.Claude-1-2.v1", "spacy.Claude-1-2.v2"], "claude-1.2"),
    (["spacy.Claude-1-3.v1", "spacy.Claude-1-3.v2"], "claude-1.3"),
]
for _names, _default in _ANTHROPIC_FAMILIES:
    for _reg_name in _names:
        _REGISTRY[_reg_name] = _provider_factory(
            AnthropicProvider, _default, ANTHROPIC_CONTEXT_LENGTHS,
            endpoint=AnthropicProvider.ENDPOINT,
        )

# Cohere / PaLM (cohere/registry.py, palm/registry.py).
for _reg_name in ("spacy.Command.v1", "spacy.Command.v2"):
    _REGISTRY[_reg_name] = _provider_factory(
        CohereProvider, "command", COHERE_CONTEXT_LENGTHS,
        endpoint=CohereProvider.ENDPOINT,
    )
for _reg_name in ("spacy.PaLM.v1", "spacy.PaLM.v2"):
    # PaLM defaults temperature=0 in both versions (palm/registry.py:12,51).
    _REGISTRY[_reg_name] = _provider_factory(
        PaLMProvider, "text-bison-001", PALM_CONTEXT_LENGTHS,
        default_config=dict(_TEMP0),
        endpoint_fn=lambda n: (
            PaLMProvider.MSG_ENDPOINT if "chat" in n
            else PaLMProvider.TEXT_ENDPOINT
        ),
    )


def _azure_factory():
    """spacy.Azure.v1/v2 (azure/registry.py): resource endpoint + deployment
    name are required; the model is inferred server-side from the deployment."""

    def factory(deployment_name: str = "", name: str = "", endpoint: str = "",
                model_type: str = "completions",
                api_version: str = "2023-05-15",
                config: Optional[dict] = None, strict: bool = True,
                max_tries: int = 5, interval: float = 1.0,
                max_request_time: float = 30.0,
                context_length: Optional[int] = None,
                transport=None, call_fn=None,
                retry: Optional[RetryConfig] = None):
        ctx = context_length if context_length else OPENAI_CONTEXT_LENGTHS.get(name)
        if call_fn is not None:
            return _legacy_rest(call_fn, ctx, retry)
        if not deployment_name or not endpoint:
            raise ValueError(
                "spacy.Azure.v* requires deployment_name= and endpoint= "
                "(your Azure OpenAI resource URL)."
            )
        return AzureOpenAIProvider(
            deployment_name=deployment_name,
            model_type=model_type,
            api_version=api_version,
            name=name,
            endpoint=endpoint,
            config=config or {},
            strict=strict,
            max_tries=max_tries,
            interval=interval,
            max_request_time=max_request_time,
            context_length=ctx,
            transport=transport,
        )

    return factory


_REGISTRY["spacy.Azure.v1"] = _azure_factory()
_REGISTRY["spacy.Azure.v2"] = _azure_factory()


@register_model("spacy.NoOp.v1")
def _rest_noop(**kwargs):
    # Reference rest/noop/model.py: responds with a fixed string, no network.
    return NoOpModel(**kwargs)


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


# HF local models (hf.py) — resolve the reference's six registered names.
from . import hf as _hf  # noqa: E402

_hf.register_hf_models(register_model)


# LangChain bridge — registers langchain.<Class>.v1 per available LLM class
# (no-op when langchain isn't installed; see models/langchain.py).
from . import langchain as _langchain  # noqa: E402

_langchain.register_langchain_models(register_model)
