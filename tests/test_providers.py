"""Provider REST codecs against fake transports replaying recorded JSON.

Response shapes follow the public provider APIs as exercised by the
reference's REST models (openai/model.py, anthropic/model.py, azure/model.py,
cohere/model.py, palm/model.py); no network involved.
"""

import json

import pytest

from spacy_llm_ray.models.providers import (
    AnthropicProvider,
    AzureOpenAIProvider,
    CohereProvider,
    OpenAIProvider,
    PaLMProvider,
    TransportTimeout,
)
from spacy_llm_ray.models.registry import make_model


class RecordingTransport:
    """Replays scripted (status, body) responses and records every request."""

    def __init__(self, responses):
        self.responses = list(responses)
        self.calls = []

    def __call__(self, method, url, headers, json_body, params, timeout):
        self.calls.append(
            dict(method=method, url=url, headers=headers, body=json_body,
                 params=params, timeout=timeout)
        )
        nxt = self.responses.pop(0)
        if nxt == "timeout":
            raise TransportTimeout("simulated")
        status, body = nxt
        return status, json.dumps(body).encode()


def chat_ok(text):
    return (200, {"choices": [{"message": {"role": "assistant", "content": text}}]})


# ---- OpenAI ----------------------------------------------------------------

def test_openai_chat_codec(monkeypatch):
    monkeypatch.setenv("OPENAI_API_KEY", "sk-test")
    monkeypatch.setenv("OPENAI_API_ORG", "org-1")
    t = RecordingTransport([chat_ok("A"), chat_ok("B")])
    m = OpenAIProvider(
        name="gpt-4", endpoint=OpenAIProvider.CHAT_ENDPOINT,
        config={"temperature": 0.0}, transport=t,
    )
    assert m(["p1", "p2"]) == ["A", "B"]
    assert len(t.calls) == 2  # chat endpoint: one request per prompt
    call = t.calls[0]
    assert call["url"] == "https://api.openai.com/v1/chat/completions"
    assert call["headers"]["Authorization"] == "Bearer sk-test"
    assert call["headers"]["OpenAI-Organization"] == "org-1"
    assert call["body"] == {
        "messages": [{"role": "user", "content": "p1"}],
        "temperature": 0.0,
        "model": "gpt-4",
    }


def test_openai_non_chat_batches_prompts(monkeypatch):
    monkeypatch.setenv("OPENAI_API_KEY", "sk-test")
    monkeypatch.delenv("OPENAI_API_ORG", raising=False)
    t = RecordingTransport(
        [(200, {"choices": [{"text": "r1"}, {"text": "r2"}, {"text": "r3"}]})]
    )
    m = OpenAIProvider(
        name="text-davinci-003", endpoint=OpenAIProvider.NON_CHAT_ENDPOINT,
        transport=t,
    )
    assert m(["a", "b", "c"]) == ["r1", "r2", "r3"]
    assert len(t.calls) == 1  # completions endpoint: whole batch, one request
    assert t.calls[0]["body"]["prompt"] == ["a", "b", "c"]
    assert t.calls[0]["body"]["model"] == "text-davinci-003"


def test_openai_http_error_includes_api_message(monkeypatch):
    monkeypatch.setenv("OPENAI_API_KEY", "sk-test")
    t = RecordingTransport(
        [(401, {"error": {"message": "Incorrect API key provided"}})]
    )
    m = OpenAIProvider(name="gpt-4", endpoint=OpenAIProvider.CHAT_ENDPOINT,
                       transport=t)
    with pytest.raises(ValueError, match="Incorrect API key provided"):
        m(["p"])


def test_openai_body_error_strict_vs_lenient(monkeypatch):
    monkeypatch.setenv("OPENAI_API_KEY", "sk-test")
    err_body = {"error": {"message": "overloaded"}}
    m = OpenAIProvider(name="gpt-4", endpoint=OpenAIProvider.CHAT_ENDPOINT,
                       transport=RecordingTransport([(200, err_body)]))
    with pytest.raises(ValueError, match="API call failed"):
        m(["p"])
    lenient = OpenAIProvider(
        name="gpt-4", endpoint=OpenAIProvider.CHAT_ENDPOINT, strict=False,
        transport=RecordingTransport([(200, err_body)]),
    )
    out = lenient(["p1", "p2"])
    assert len(out) == 2 and json.loads(out[0]) == err_body


def test_retry_envelope_backoff(monkeypatch):
    monkeypatch.setenv("OPENAI_API_KEY", "sk-test")
    sleeps = []
    t = RecordingTransport([(429, {}), (503, {}), chat_ok("ok")])
    m = OpenAIProvider(name="gpt-4", endpoint=OpenAIProvider.CHAT_ENDPOINT,
                       transport=t, _sleep=sleeps.append)
    assert m(["p"]) == ["ok"]
    assert sleeps == [1.0, 2.0]  # base 1 s, x2 exponential


def test_retry_exhaustion_and_timeouts(monkeypatch):
    monkeypatch.setenv("OPENAI_API_KEY", "sk-test")
    t = RecordingTransport([(429, {})] * 6)
    m = OpenAIProvider(name="gpt-4", endpoint=OpenAIProvider.CHAT_ENDPOINT,
                       transport=t, max_tries=5, _sleep=lambda s: None)
    with pytest.raises(ConnectionError, match="could not be reached"):
        m(["p"])
    t2 = RecordingTransport(["timeout"] * 6)
    m2 = OpenAIProvider(name="gpt-4", endpoint=OpenAIProvider.CHAT_ENDPOINT,
                        transport=t2, max_tries=5, _sleep=lambda s: None)
    with pytest.raises(TimeoutError, match="Request time out"):
        m2(["p"])
    # Non-retryable status is raised immediately, no retries.
    t3 = RecordingTransport([(400, {"error": {"message": "bad request"}})])
    m3 = OpenAIProvider(name="gpt-4", endpoint=OpenAIProvider.CHAT_ENDPOINT,
                        transport=t3, _sleep=lambda s: None)
    with pytest.raises(ValueError, match="bad request"):
        m3(["p"])
    assert len(t3.calls) == 1


# ---- Anthropic -------------------------------------------------------------

def test_anthropic_codec(monkeypatch):
    monkeypatch.setenv("ANTHROPIC_API_KEY", "sk-ant")
    t = RecordingTransport(
        [(200, {"completion": " Hello!", "stop_reason": "stop_sequence"})]
    )
    m = AnthropicProvider(
        name="claude-2", endpoint=AnthropicProvider.ENDPOINT,
        config={"max_tokens_to_sample": 300}, transport=t,
    )
    assert m(["Hi"]) == [" Hello!"]
    call = t.calls[0]
    assert call["url"] == "https://api.anthropic.com/v1/complete"
    assert call["headers"]["X-API-Key"] == "sk-ant"
    assert call["headers"]["anthropic-version"] == "2023-06-01"
    assert call["body"]["prompt"] == "\n\nHuman: Hi\n\nAssistant:"
    assert call["body"]["max_tokens_to_sample"] == 300
    assert call["body"]["model"] == "claude-2"


def test_anthropic_not_found_error(monkeypatch):
    monkeypatch.setenv("ANTHROPIC_API_KEY", "sk-ant")
    t = RecordingTransport(
        [(404, {"error": {"type": "not_found_error", "message": "no model"}})]
    )
    m = AnthropicProvider(name="claude-9", endpoint=AnthropicProvider.ENDPOINT,
                          transport=t)
    with pytest.raises(ValueError, match="supported by the API"):
        m(["p"])


# ---- Azure -----------------------------------------------------------------

def test_azure_url_assembly_and_params(monkeypatch):
    monkeypatch.setenv("AZURE_OPENAI_KEY", "az-key")
    t = RecordingTransport([(200, {"choices": [{"text": "done"}]})])
    m = AzureOpenAIProvider(
        deployment_name="mydeploy", model_type="completions",
        name="gpt-35-turbo", endpoint="https://myres.openai.azure.com",
        transport=t,
    )
    assert m(["p"]) == ["done"]
    call = t.calls[0]
    assert call["url"] == (
        "https://myres.openai.azure.com/openai/deployments/mydeploy/completions"
    )
    assert call["params"] == {"api-version": "2023-05-15"}
    assert call["headers"]["api-key"] == "az-key"
    assert "model" not in call["body"]  # model inferred from deployment


def test_azure_chat_url(monkeypatch):
    monkeypatch.setenv("AZURE_OPENAIKEY", "x")
    monkeypatch.setenv("AZURE_OPENAI_KEY", "az-key")
    t = RecordingTransport(
        [(200, {"choices": [{"message": {"content": "hi"}}]})]
    )
    m = AzureOpenAIProvider(
        deployment_name="d", model_type="chat", name="gpt-4",
        endpoint="https://r.openai.azure.com/", transport=t,
    )
    assert m(["p"]) == ["hi"]
    assert t.calls[0]["url"].endswith("/openai/deployments/d/chat/completions")
    assert t.calls[0]["body"]["messages"] == [{"role": "user", "content": "p"}]


# ---- Cohere ----------------------------------------------------------------

def test_cohere_codec(monkeypatch):
    monkeypatch.setenv("CO_API_KEY", "co-key")
    t = RecordingTransport(
        [(200, {"generations": [{"text": "gen1"}]}),
         (200, {"generations": [{"text": "gen2"}]})]
    )
    m = CohereProvider(name="command", endpoint=CohereProvider.ENDPOINT,
                       transport=t)
    assert m(["a", "b"]) == ["gen1", "gen2"]
    assert t.calls[0]["headers"]["Authorization"] == "Bearer co-key"
    assert t.calls[0]["body"] == {"prompt": "a", "model": "command"}


def test_cohere_blocked_and_message_errors(monkeypatch):
    monkeypatch.setenv("CO_API_KEY", "co-key")
    blocked = (400, {"message": "blocked output: usage guidelines"})
    m = CohereProvider(name="command", endpoint=CohereProvider.ENDPOINT,
                       transport=RecordingTransport([blocked]))
    with pytest.raises(ValueError, match="blocking error"):
        m(["p"])
    lenient = CohereProvider(name="command", endpoint=CohereProvider.ENDPOINT,
                             strict=False,
                             transport=RecordingTransport([blocked]))
    out = lenient(["p"])
    assert len(out) == 1 and "blocked" in out[0]
    # 2xx body carrying "message" is an API error object.
    m2 = CohereProvider(name="command", endpoint=CohereProvider.ENDPOINT,
                        transport=RecordingTransport(
                            [(200, {"message": "invalid api token"})]))
    with pytest.raises(ValueError, match="API call failed"):
        m2(["p"])


# ---- PaLM ------------------------------------------------------------------

def test_palm_text_codec(monkeypatch):
    monkeypatch.setenv("PALM_API_KEY", "palm-key")
    t = RecordingTransport([(200, {"candidates": [{"output": "4"}]})])
    m = PaLMProvider(name="text-bison-001",
                     endpoint=PaLMProvider.TEXT_ENDPOINT,
                     config={"temperature": 0}, transport=t)
    assert m(["What's 2+2?"]) == ["4"]
    call = t.calls[0]
    assert "models/text-bison-001:generateText" in call["url"]
    assert call["params"] == {"key": "palm-key"}
    assert call["body"]["prompt"] == {"text": "What's 2+2?"}


def test_palm_chat_codec_and_filters(monkeypatch):
    monkeypatch.setenv("PALM_API_KEY", "palm-key")
    t = RecordingTransport([(200, {"candidates": [{"content": "hey"}]})])
    m = PaLMProvider(name="chat-bison-001", endpoint=PaLMProvider.MSG_ENDPOINT,
                     transport=t)
    assert m(["hi"]) == ["hey"]
    assert t.calls[0]["body"]["prompt"] == {"messages": [{"content": "hi"}]}
    filtered = (200, {"filters": [{"reason": "SAFETY"}]})
    strict = PaLMProvider(name="text-bison-001",
                          endpoint=PaLMProvider.TEXT_ENDPOINT,
                          transport=RecordingTransport([filtered]))
    with pytest.raises(ValueError, match="API call failed"):
        strict(["p"])


# ---- registry wiring -------------------------------------------------------

def test_registry_builds_providers(monkeypatch):
    monkeypatch.setenv("OPENAI_API_KEY", "sk")
    monkeypatch.setenv("ANTHROPIC_API_KEY", "ant")
    monkeypatch.setenv("CO_API_KEY", "co")
    monkeypatch.setenv("PALM_API_KEY", "pm")
    t = RecordingTransport([chat_ok("x")])
    m = make_model("spacy.GPT-4.v3", transport=t)
    assert isinstance(m, OpenAIProvider) and m.context_length == 8192
    assert m(["p"]) == ["x"]
    assert t.calls[0]["body"]["temperature"] == 0.0  # v3 default config
    # v1 has no default config (reference registry.py:92-122).
    t1 = RecordingTransport([chat_ok("y")])
    m1 = make_model("spacy.GPT-4.v1", transport=t1)
    m1(["p"])
    assert "temperature" not in t1.calls[0]["body"]
    # instruct variant of the GPT-3.5 family hits the completions endpoint.
    t2 = RecordingTransport([(200, {"choices": [{"text": "z"}]})])
    m2 = make_model("spacy.GPT-3-5.v3", name="gpt-3.5-turbo-instruct",
                    transport=t2)
    assert m2(["p"]) == ["z"]
    assert t2.calls[0]["url"].endswith("/v1/completions")
    assert m2.context_length == 4097
    assert isinstance(make_model("spacy.Claude-1-3.v2", transport=t),
                      AnthropicProvider)
    assert make_model("spacy.Claude-2.v1", transport=t).context_length == 100000
    assert isinstance(make_model("spacy.Command.v2", transport=t),
                      CohereProvider)
    palm = make_model("spacy.PaLM.v1", transport=t)
    assert isinstance(palm, PaLMProvider) and palm.context_length == 8192
    monkeypatch.setenv("AZURE_OPENAI_KEY", "az")
    with pytest.raises(ValueError, match="deployment_name"):
        make_model("spacy.Azure.v1")
    az = make_model(
        "spacy.Azure.v2", deployment_name="d",
        endpoint="https://r.openai.azure.com", name="gpt-4", transport=t,
    )
    assert isinstance(az, AzureOpenAIProvider) and az.context_length == 8192


def test_registry_spacy_noop():
    m = make_model("spacy.NoOp.v1")
    out = m(["a", "b"])
    assert len(out) == 2


def test_openai_verify_auth(monkeypatch):
    monkeypatch.setenv("OPENAI_API_KEY", "sk-test")
    # Healthcheck lists models; configured name must be present.
    t = RecordingTransport(
        [(200, {"data": [{"id": "gpt-4"}, {"id": "gpt-3.5-turbo"}]})]
    )
    m = OpenAIProvider(name="gpt-4", endpoint=OpenAIProvider.CHAT_ENDPOINT,
                       transport=t, verify_auth=True)
    assert t.calls[0]["method"] == "GET"
    assert t.calls[0]["url"].endswith("/v1/models")
    # Unknown model raises with choices listed.
    t2 = RecordingTransport([(200, {"data": [{"id": "gpt-4"}]})])
    with pytest.raises(ValueError, match="not available"):
        OpenAIProvider(name="gpt-9", endpoint=OpenAIProvider.CHAT_ENDPOINT,
                       transport=t2, verify_auth=True)
    # Bad key warns (non-fatal), mirroring the reference.
    t3 = RecordingTransport([(401, {"error": {"message": "Incorrect API key"}})])
    with pytest.warns(UserWarning, match="Authentication"):
        OpenAIProvider(name="gpt-4", endpoint=OpenAIProvider.CHAT_ENDPOINT,
                       transport=t3, verify_auth=True)


def test_anthropic_verify_auth_dummy_prompt(monkeypatch):
    monkeypatch.setenv("ANTHROPIC_API_KEY", "sk-ant")
    t = RecordingTransport([(200, {"completion": "ok"})])
    AnthropicProvider(name="claude-2", endpoint=AnthropicProvider.ENDPOINT,
                      transport=t, verify_auth=True)
    assert t.calls[0]["body"]["prompt"].startswith("\n\nHuman: test")


def test_llm_task_aliases():
    from spacy_llm_ray.registry import task_names

    names = task_names()
    for alias in ("llm_ner", "llm_rel", "llm_entitylinker", "llm_textcat",
                  "llm_sentiment", "llm_summarization", "llm_translation",
                  "llm_raw", "llm_spancat", "llm_lemma", "llm_noop"):
        assert alias in names, alias
    from spacy_llm_ray.models.mock import MockNERModel
    from spacy_llm_ray.registry import make_task

    stage = make_task("llm_ner", labels=["PERSON"],
                      model=MockNERModel({"Ann": "PERSON"}, context_length=None))
    import pyarrow as pa

    out = stage(pa.table({"text": ["Ann is here."]}))
    assert out["mentions"].to_pylist()[0][0]["text"] == "Ann"
