"""Provider REST codecs: OpenAI / Anthropic / Azure OpenAI / Cohere / PaLM.

Implements the request/response codecs, auth-env handling and error mapping of
the reference's REST backends —
/root/reference/spacy_llm/models/rest/openai/model.py:71-145,
anthropic/model.py:53-117, azure/model.py:85-160, cohere/model.py:42-120,
palm/model.py:44-117 — behind an injectable HTTP transport so codecs stay
unit-testable offline (this sandbox has no network).

Transport contract: ``transport(method, url, headers, json_body, params,
timeout) -> (status_code, body_bytes)``.  The default transport uses
``requests``; tests inject fakes replaying recorded JSON.

Semantics matched to the reference:
 - retry envelope (rest/base.py:106-160): max 5 tries, 1 s base interval,
   base-2 exponential backoff, 30 s timeout; retried codes 429/503 and
   connect/read timeouts; final retryable failure raises ConnectionError,
   timeouts raise TimeoutError.
 - OpenAI chat endpoint: one request per prompt, body
   ``{"messages": [{"role": "user", "content": p}], **config, "model": name}``;
   response text at ``choices[0].message.content``. Non-chat endpoint: ONE
   batched request ``{"prompt": [p...]}``; texts at ``choices[i].text``
   (openai/model.py:112-141).
 - Anthropic: per-prompt body with the "\\n\\nHuman: ... \\n\\nAssistant:"
   envelope; response at ``completion`` (anthropic/model.py:97-112).
 - Azure: endpoint assembled from resource base + deployment name + model
   type, ``api-version`` query param, ``api-key`` header (azure/model.py:46-75).
 - Cohere: per-prompt; response at ``generations[0].text``; body-level
   ``message`` key and HTTP-level "blocked" messages are strict-gated errors
   (cohere/model.py:86-112).
 - PaLM: key in URL query; text vs chat body by model name; response at
   ``candidates[0].output`` / ``.content``; ``filters`` key strict-gated
   (palm/model.py:44-112).
 - strict=False returns the JSON-dumped error object per prompt instead of
   raising, exactly like the reference's non-strict path.
"""

from __future__ import annotations

import json
import os
import time
import warnings
from typing import Any, Callable, Dict, List, Optional, Tuple

Transport = Callable[..., Tuple[int, bytes]]

RETRY_CODES = (429, 503)
DEFAULT_MAX_TRIES = 5
DEFAULT_INTERVAL = 1.0
DEFAULT_MAX_REQUEST_TIME = 30.0


class TransportTimeout(Exception):
    """Raised by transports on connect/read timeout (mapped to retry)."""


def requests_transport(method, url, headers, json_body, params, timeout):
    """Default transport: a real HTTP call via ``requests``."""
    import requests

    try:
        r = requests.request(
            method, url, headers=headers, json=json_body, params=params,
            timeout=timeout,
        )
    except (requests.ConnectTimeout, requests.ReadTimeout) as err:
        raise TransportTimeout(str(err)) from err
    return r.status_code, r.content


class RESTProvider:
    """Base REST provider: retry envelope + per-provider codec hooks.

    Subclasses implement ``_credentials`` (auth headers from env),
    ``_request_bodies`` (prompts -> list of JSON bodies, or a single batched
    body), and ``_extract`` (response JSON -> text).
    """

    requires_actor_pool = True  # rate-limited HTTP session: pool caps in-flight requests

    #: env var holding the API key, for error messages
    KEY_ENV = ""

    def __init__(
        self,
        name: str,
        endpoint: str,
        config: Optional[Dict[str, Any]] = None,
        strict: bool = True,
        max_tries: int = DEFAULT_MAX_TRIES,
        interval: float = DEFAULT_INTERVAL,
        max_request_time: float = DEFAULT_MAX_REQUEST_TIME,
        context_length: Optional[int] = None,
        transport: Optional[Transport] = None,
        verify_auth: bool = False,
        _sleep: Callable[[float], None] = time.sleep,
    ):
        assert max_tries >= 1
        assert interval > 0
        assert max_request_time > 0
        self._name = name
        self._endpoint = endpoint
        self._config = dict(config or {})
        self._strict = strict
        self._max_tries = max_tries
        self._interval = interval
        self._max_request_time = max_request_time
        self._context_length = context_length
        self._transport = transport or requests_transport
        self._sleep = _sleep
        self._creds = self._credentials()
        # The reference verifies credentials at construction
        # (rest/base.py:68). Opt-in here because actors are constructed in
        # bulk and this sandbox has no network; enable for fail-fast auth.
        if verify_auth:
            self._verify_auth()

    # ---- codec hooks -------------------------------------------------------

    def _credentials(self) -> Dict[str, str]:
        raise NotImplementedError

    def _headers(self) -> Dict[str, str]:
        return {**self._creds, "Content-Type": "application/json"}

    def _params(self) -> Optional[Dict[str, str]]:
        return None

    def _url(self) -> str:
        return self._endpoint

    def _request_bodies(self, prompts: List[str]) -> List[Dict[str, Any]]:
        """One JSON body per prompt (providers without batch support)."""
        raise NotImplementedError

    def _extract(self, response: Dict[str, Any]) -> str:
        """Pull the completion text out of one response JSON."""
        raise NotImplementedError

    def _error_message(self, body: Dict[str, Any]) -> str:
        return str(body.get("error", {}).get("message", str(body)))

    def _body_error(self, response: Dict[str, Any]) -> bool:
        """Whether a 2xx response body is actually an API error object."""
        return "error" in response

    def _verify_auth(self) -> None:
        """Default auth check: execute a dummy prompt, failing at init time
        on bad credentials (anthropic/model.py:40-51 pattern)."""
        self(["test"])

    # ---- engine ------------------------------------------------------------

    @property
    def context_length(self) -> Optional[int]:
        return self._context_length

    def _retry_request(self, body: Dict[str, Any]) -> Tuple[int, bytes]:
        """POST with the reference's retry envelope (rest/base.py:106-160)."""
        interval = self._interval
        start = time.time()
        status, content = None, b""
        for attempt in range(self._max_tries + 1):
            try:
                status, content = self._transport(
                    "POST", self._url(), self._headers(), body,
                    self._params(), self._max_request_time,
                )
            except TransportTimeout as err:
                if attempt >= self._max_tries:
                    raise TimeoutError(
                        "Request time out. Check your network connection and "
                        "the API's availability."
                    ) from err
                status = None
            if status is not None and status not in RETRY_CODES:
                return status, content
            if attempt < self._max_tries:
                self._sleep(interval)
                interval *= 2
        raise ConnectionError(
            f"API could not be reached after {time.time() - start:.3f} seconds "
            f"in total and attempting to connect {self._max_tries} times. "
            f"Check your network connection and the API's availability."
        )

    def _call_one(self, body: Dict[str, Any], n_prompts: int):
        """Run one request; returns (response_json, error_strings_or_None)."""
        status, content = self._retry_request(body)
        text = content.decode("utf-8", errors="replace")
        if not 200 <= status < 300:
            try:
                err_body = json.loads(text)
            except json.JSONDecodeError:
                err_body = {"error": {"message": text}}
            raise ValueError(
                f"Request to {type(self).__name__} API failed: "
                f"{self._error_message(err_body)}"
            )
        response = json.loads(text)
        if self._body_error(response):
            if self._strict:
                raise ValueError(f"API call failed: {response}.")
            return None, [json.dumps(response)] * n_prompts
        return response, None

    def __call__(self, prompts: List[str]) -> List[str]:
        bodies = self._request_bodies(list(prompts))
        out: List[str] = []
        for body in bodies:
            response, errors = self._call_one(body, len(prompts))
            if errors is not None:
                return errors
            out.append(self._extract(response))
        if len(out) != len(prompts):
            raise ValueError(
                f"{type(self).__name__} returned {len(out)} responses for "
                f"{len(prompts)} prompts."
            )
        return out


class OpenAIProvider(RESTProvider):
    """OpenAI chat/completions codec (openai/model.py:71-145)."""

    KEY_ENV = "OPENAI_API_KEY"
    CHAT_ENDPOINT = "https://api.openai.com/v1/chat/completions"
    NON_CHAT_ENDPOINT = "https://api.openai.com/v1/completions"

    def _credentials(self) -> Dict[str, str]:
        api_key = os.getenv(self.KEY_ENV)
        if api_key is None:
            warnings.warn(
                "Could not find the API key to access the OpenAI API. Make it "
                "available as an environment variable 'OPENAI_API_KEY'."
            )
        headers = {"Authorization": f"Bearer {api_key}"}
        api_org = os.getenv("OPENAI_API_ORG")
        if api_org:
            headers["OpenAI-Organization"] = api_org
        return headers

    @property
    def _is_chat(self) -> bool:
        return self._endpoint == self.CHAT_ENDPOINT or self._endpoint.endswith(
            "/chat/completions"
        )

    MODELS_ENDPOINT = "https://api.openai.com/v1/models"

    def _verify_auth(self) -> None:
        """GET /v1/models as healthcheck + model-name validation
        (openai/model.py:41-69)."""
        status, content = self._transport(
            "GET", self.MODELS_ENDPOINT, self._creds, None, None,
            self._max_request_time,
        )
        text = content.decode("utf-8", errors="replace")
        if status == 422:
            warnings.warn(
                "Could not access api.openai.com -- 422 permission denied."
            )
        elif status != 200:
            if "Incorrect API key" in text:
                warnings.warn(
                    "Authentication with provided API key failed. Please "
                    "double-check you provided the correct credentials."
                )
            else:
                warnings.warn(
                    f"Error accessing api.openai.com ({status}): {text}"
                )
            return
        data = json.loads(text).get("data", [])
        models = [m["id"] for m in data]
        if self._name not in models:
            raise ValueError(
                f"The specified model '{self._name}' is not available. "
                f"Choices are: {sorted(set(models))}"
            )

    def _request_bodies(self, prompts: List[str]) -> List[Dict[str, Any]]:
        base = {**self._config, "model": self._name}
        if self._is_chat:
            # Chat endpoint takes no prompt batch: one request per prompt.
            return [
                {"messages": [{"role": "user", "content": p}], **base}
                for p in prompts
            ]
        # Non-chat endpoint accepts the whole batch in one request.
        return [{"prompt": prompts, **base}]

    def _extract(self, response: Dict[str, Any]) -> str:
        choices = response["choices"]
        if self._is_chat:
            assert len(choices) == 1
            return choices[0].get("message", {}).get(
                "content", json.dumps(choices[0])
            )
        raise AssertionError("non-chat handled in __call__")

    def __call__(self, prompts: List[str]) -> List[str]:
        prompts = list(prompts)
        if self._is_chat:
            return super().__call__(prompts)
        bodies = self._request_bodies(prompts)
        response, errors = self._call_one(bodies[0], len(prompts))
        if errors is not None:
            return errors
        choices = response["choices"]
        if len(choices) != len(prompts):
            raise ValueError(
                f"OpenAI returned {len(choices)} choices for "
                f"{len(prompts)} prompts."
            )
        return [
            c["text"] if "text" in c else json.dumps(c) for c in choices
        ]


class AnthropicProvider(RESTProvider):
    """Anthropic /v1/complete codec (anthropic/model.py:53-117)."""

    KEY_ENV = "ANTHROPIC_API_KEY"
    ENDPOINT = "https://api.anthropic.com/v1/complete"
    HUMAN = "\n\nHuman:"
    ASST = "\n\nAssistant:"

    def _credentials(self) -> Dict[str, str]:
        api_key = os.getenv(self.KEY_ENV)
        if api_key is None:
            warnings.warn(
                "Could not find the API key to access the Anthropic Claude "
                "API. Make it available as an environment variable "
                "'ANTHROPIC_API_KEY'."
            )
        return {"X-API-Key": api_key if api_key else ""}

    def _headers(self) -> Dict[str, str]:
        return {
            **self._creds,
            "model": self._name,
            "anthropic-version": self._config.get(
                "anthropic-version", "2023-06-01"
            ),
            "Content-Type": "application/json",
        }

    def _request_bodies(self, prompts: List[str]) -> List[Dict[str, Any]]:
        # The full config dict rides in the body as well as the header,
        # matching the reference request shape exactly
        # (/root/reference/spacy_llm/models/rest/anthropic/model.py:66-72:
        # json={**json_data, **self._config, "model": self._name}).
        return [
            {
                "prompt": f"{self.HUMAN} {p}{self.ASST}",
                **self._config,
                "model": self._name,
            }
            for p in prompts
        ]

    def _extract(self, response: Dict[str, Any]) -> str:
        if "completion" in response:
            return response["completion"]
        return json.dumps(response)

    def _error_message(self, body: Dict[str, Any]) -> str:
        error = body.get("error", {})
        msg = f"{error}"
        if isinstance(error, dict) and error.get("type") == "not_found_error":
            msg += (
                f". Ensure that the selected model ({self._name}) is "
                f"supported by the API."
            )
        return msg


class AzureOpenAIProvider(RESTProvider):
    """Azure OpenAI codec (azure/model.py:18-160)."""

    KEY_ENV = "AZURE_OPENAI_KEY"

    def __init__(self, deployment_name: str, model_type: str = "completions",
                 api_version: str = "2023-05-15", **kwargs):
        assert model_type in ("completions", "chat")
        self._deployment_name = deployment_name
        self._model_type = model_type
        self._api_version = api_version
        super().__init__(**kwargs)

    def _credentials(self) -> Dict[str, str]:
        api_key = os.getenv(self.KEY_ENV)
        if api_key is None:
            warnings.warn(
                "Could not find the API key to access the Azure OpenAI API. "
                "Make it available as an environment variable "
                "'AZURE_OPENAI_KEY'."
            )
        return {"api-key": api_key or ""}

    def _url(self) -> str:
        base = self._endpoint + ("" if self._endpoint.endswith("/") else "/")
        chat = "" if self._model_type == "completions" else "chat/"
        return f"{base}openai/deployments/{self._deployment_name}/{chat}completions"

    def _params(self) -> Dict[str, str]:
        return {"api-version": self._api_version}

    def _request_bodies(self, prompts: List[str]) -> List[Dict[str, Any]]:
        # Azure infers the model from the deployment: no "model" in body.
        if self._model_type == "chat":
            return [
                {"messages": [{"role": "user", "content": p}], **self._config}
                for p in prompts
            ]
        return [{"prompt": p, **self._config} for p in prompts]

    def _extract(self, response: Dict[str, Any]) -> str:
        choices = response["choices"]
        assert len(choices) == 1
        c = choices[0]
        if self._model_type == "chat":
            return c.get("message", {}).get("content", json.dumps(c))
        return c.get("text", json.dumps(c))

    def _error_message(self, body: Dict[str, Any]) -> str:
        return str(body.get("error", {}).get("message", str(body)))


class CohereProvider(RESTProvider):
    """Cohere /v1/generate codec (cohere/model.py:17-120)."""

    KEY_ENV = "CO_API_KEY"
    ENDPOINT = "https://api.cohere.ai/v1/generate"

    def _credentials(self) -> Dict[str, str]:
        api_key = os.getenv(self.KEY_ENV)
        if api_key is None:
            warnings.warn(
                "Could not find the API key to access the Cohere API. Make it "
                "available as an environment variable 'CO_API_KEY'."
            )
        return {"Authorization": f"Bearer {api_key}"}

    def _headers(self) -> Dict[str, str]:
        return {
            **self._creds,
            "Content-Type": "application/json",
            "Accept": "application/json",
        }

    def _request_bodies(self, prompts: List[str]) -> List[Dict[str, Any]]:
        return [
            {"prompt": p, **self._config, "model": self._name}
            for p in prompts
        ]

    def _body_error(self, response: Dict[str, Any]) -> bool:
        # Cohere signals body-level errors with a "message" key.
        return "message" in response

    def _extract(self, response: Dict[str, Any]) -> str:
        for result in response.get("generations", ()):
            if "text" in result:
                return result["text"]
            return json.dumps(response)
        return json.dumps(response)

    def _call_one(self, body, n_prompts):
        try:
            return super()._call_one(body, n_prompts)
        except ValueError as err:
            # "blocked output/input" HTTP errors are strict-gated: non-strict
            # mode passes the error text through as the response.
            if "blocked" in str(err) and not self._strict:
                return None, [str(err)] * n_prompts
            if "blocked" in str(err):
                raise ValueError(
                    f"Cohere API returned a blocking error. {err}. If you "
                    "wish to ignore and continue, you can pass 'False' to "
                    "the 'strict' argument of this model."
                ) from err
            raise

    def _error_message(self, body: Dict[str, Any]) -> str:
        return str(body.get("message", str(body)))


class PaLMProvider(RESTProvider):
    """Google PaLM text/chat codec (palm/model.py:18-117)."""

    KEY_ENV = "PALM_API_KEY"
    TEXT_ENDPOINT = (
        "https://generativelanguage.googleapis.com/v1beta3/models/"
        "{model}:generateText"
    )
    MSG_ENDPOINT = (
        "https://generativelanguage.googleapis.com/v1beta3/models/"
        "{model}:generateMessage"
    )

    def _credentials(self) -> Dict[str, str]:
        api_key = os.getenv(self.KEY_ENV)
        if api_key is None:
            warnings.warn(
                "Could not find the API key to access the PaLM API. Make it "
                "available as an environment variable 'PALM_API_KEY'."
            )
        return {"api_key": api_key or ""}

    def _headers(self) -> Dict[str, str]:
        return {"Content-Type": "application/json", "Accept": "application/json"}

    def _url(self) -> str:
        return self._endpoint.format(model=self._name)

    def _params(self) -> Dict[str, str]:
        return {"key": self._creds["api_key"]}

    @property
    def _is_chat(self) -> bool:
        return "chat" in self._name

    def _request_bodies(self, prompts: List[str]) -> List[Dict[str, Any]]:
        if self._is_chat:
            return [
                {"prompt": {"messages": [{"content": p}]}, **self._config}
                for p in prompts
            ]
        return [{"prompt": {"text": p}, **self._config} for p in prompts]

    def _body_error(self, response: Dict[str, Any]) -> bool:
        # Safety-filtered responses carry a "filters" key.
        return "filters" in response

    def _extract(self, response: Dict[str, Any]) -> str:
        candidates = response.get("candidates")
        if candidates:
            key = "content" if self._is_chat else "output"
            return candidates[0].get(key, json.dumps(response))
        return json.dumps(response)

    def _error_message(self, body: Dict[str, Any]) -> str:
        return str(body.get("error", {}).get("message", str(body)))
