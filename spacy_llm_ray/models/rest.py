"""REST model client skeleton with the reference's retry envelope.

Mirrors /root/reference/spacy_llm/models/rest/base.py:10-16,22-25,106-160:
max 5 tries, 1 s base interval, x2 exponential backoff, 30 s request timeout,
retry only on HTTP 429/503. This sandbox has no network, so the transport is
injectable (``call_fn``); real deployments plug an HTTP POST here. Each LLM
actor owns one client instance (built in ``__init__``), matching the
reference's one-session-per-process residency.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable, List, Optional, Tuple


@dataclass(frozen=True)
class RetryConfig:
    max_tries: int = 5
    interval: float = 1.0
    backoff_factor: float = 2.0
    timeout: float = 30.0
    retry_codes: Tuple[int, ...] = (429, 503)


class RESTError(RuntimeError):
    def __init__(self, status: int, message: str = ""):
        super().__init__(f"HTTP {status}: {message}")
        self.status = status


@dataclass
class RESTModel:
    """``call_fn(prompts, timeout) -> responses`` raising RESTError on HTTP
    failure; retried per the envelope, non-retryable codes raise immediately."""

    call_fn: Callable[[List[str], float], List[str]]
    retry: RetryConfig = field(default_factory=RetryConfig)
    context_length: Optional[int] = None
    _sleep: Callable[[float], None] = time.sleep  # injectable for tests

    def __call__(self, prompts: List[str]) -> List[str]:
        interval = self.retry.interval
        for attempt in range(1, self.retry.max_tries + 1):
            try:
                return self.call_fn(prompts, self.retry.timeout)
            except RESTError as err:
                if err.status not in self.retry.retry_codes:
                    raise
                if attempt == self.retry.max_tries:
                    raise TimeoutError(
                        f"Request failed ({err.status}) after {attempt} tries."
                    ) from err
                self._sleep(interval)
                interval *= self.retry.backoff_factor
        raise AssertionError("unreachable")
