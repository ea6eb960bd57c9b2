"""Mock / NoOp / REST-retry model tests."""

import pytest

from spacy_llm_ray.models.mock import EchoModel, MockELModel, MockNERModel, MockRELModel
from spacy_llm_ray.models.noop import NoOpModel
from spacy_llm_ray.models.rest import RESTError, RESTModel, RetryConfig
from spacy_llm_ray.templates import extract_fenced_text, fence, ner_v3_prompt


def test_fence_roundtrip():
    text = "line one\n'''embedded? no'''\nline two"
    assert extract_fenced_text(fence(text)) == text
    prompt = ner_v3_prompt("Alice lives in Boston.", ["PERSON", "GPE"])
    assert extract_fenced_text(prompt) == "Alice lives in Boston."


def test_mock_ner_orders_and_labels():
    model = MockNERModel({"Alice": "PERSON", "Boston": "GPE", "Acme Corp": "ORG"})
    prompt = ner_v3_prompt("Boston greeted Alice of Acme Corp.", ["PERSON", "GPE", "ORG"])
    (resp,) = model([prompt])
    assert resp.splitlines() == [
        "1. Boston | True | GPE | is a GPE",
        "2. Alice | True | PERSON | is a PERSON",
        "3. Acme Corp | True | ORG | is a ORG",
    ]


def test_mock_rel():
    model = MockRELModel({"lives in": "LivesIn", "visits": "Visits"})
    text = "Alice[ENT0:PERSON] lives in Boston[ENT1:GPE]. Bob[ENT2:PERSON] visits Paris[ENT3:GPE]."
    (resp,) = model([fence(text)])
    assert resp.splitlines() == [
        '{"dep": 0, "dest": 1, "relation": "LivesIn"}',
        '{"dep": 2, "dest": 3, "relation": "Visits"}',
    ]


def test_mock_el_picks_first_candidate():
    prompt = (
        "Text:\n'''\n*Boston* is nice\n'''\n"
        "Mentions: *Boston*\n"
        "- *Boston*: candidates: Q100 (city); Q204289 (band)\n"
    )
    (resp,) = MockELModel()([prompt])
    assert resp == "*Boston* ::: <Q100>"


def test_noop_and_echo():
    assert NoOpModel()(["a", "b"]) == ["", ""]
    assert EchoModel()([fence("hello")]) == ["hello"]


def test_rest_retry_envelope():
    calls = {"n": 0}
    sleeps = []

    def flaky(prompts, timeout):
        calls["n"] += 1
        if calls["n"] < 3:
            raise RESTError(429, "rate limited")
        return ["ok"] * len(prompts)

    model = RESTModel(call_fn=flaky, _sleep=sleeps.append)
    assert model(["p"]) == ["ok"]
    assert calls["n"] == 3
    assert sleeps == [1.0, 2.0]  # 1 s base, x2 backoff (rest/base.py:22-25)


def test_rest_non_retryable_raises():
    def denied(prompts, timeout):
        raise RESTError(401, "unauthorized")

    with pytest.raises(RESTError):
        RESTModel(call_fn=denied)(["p"])


def test_rest_gives_up_after_max_tries():
    def always_busy(prompts, timeout):
        raise RESTError(503)

    model = RESTModel(call_fn=always_busy, retry=RetryConfig(max_tries=3), _sleep=lambda s: None)
    with pytest.raises(TimeoutError):
        model(["p"])
