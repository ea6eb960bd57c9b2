"""Sentiment v1 response parser
(/root/reference/spacy_llm/tasks/sentiment/parser.py:8-29)."""

from __future__ import annotations

from typing import Optional


def parse_sentiment_response(response: str) -> Optional[float]:
    """Strip an ``"Answer:"`` prefix and parse a float; None on failure."""
    try:
        return float("".join(response.replace("Answer:", "").strip().split()))
    except ValueError:
        return None
