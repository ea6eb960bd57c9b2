"""Summarization v1 response parser
(/root/reference/spacy_llm/tasks/summarization/parser.py:8-24)."""

from __future__ import annotations


def parse_summarization_response(response: str) -> str:
    return response.replace("'''", "").strip()
