"""Translation v1 response parser — identity
(/root/reference/spacy_llm/tasks/translation/parser.py:8-20)."""

from __future__ import annotations


def parse_translation_response(response: str) -> str:
    return response.strip()
