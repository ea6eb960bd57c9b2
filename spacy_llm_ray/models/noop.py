"""No-op model (after test.NoOpModel.v1,
/root/reference/spacy_llm/models/rest/noop/model.py:13-37): returns an empty
response per prompt, optionally sleeping to emulate the reference's 0.01 s
per-call latency floor."""

from __future__ import annotations

import time
from typing import List, Optional


class NoOpModel:
    def __init__(self, sleep: float = 0.0, context_length: Optional[int] = None):
        self._sleep = sleep
        self.context_length = context_length

    def __call__(self, prompts: List[str]) -> List[str]:
        if self._sleep:
            time.sleep(self._sleep)
        return ["" for _ in prompts]
