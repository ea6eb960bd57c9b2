"""Raw v1 response parser — identity passthrough of the LLM reply
(/root/reference/spacy_llm/tasks/raw/parser.py:8-19)."""

from __future__ import annotations


def parse_raw_response(response: str) -> str:
    return response.strip()
