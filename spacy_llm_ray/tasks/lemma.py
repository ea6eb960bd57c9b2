"""Lemma v1 response parser
(/root/reference/spacy_llm/tasks/lemma/parser.py:8-37 and the
token-count guard in /root/reference/spacy_llm/tasks/lemma/task.py:56-61)."""

from __future__ import annotations

from typing import List, Optional


def parse_lemma_response(response: str) -> List[List[str]]:
    """``"token: lemma"`` lines -> [[token, lemma], ...]; malformed lines
    (split length != 2) are discarded."""
    rows = [
        [part.strip() for part in line.split(":")]
        for line in response.replace("Lemmatized text:", "")
        .replace("'''", "")
        .strip()
        .split("\n")
    ]
    return [row for row in rows if len(row) == 2]


def apply_lemmas(n_tokens: int, parsed: List[List[str]]) -> Optional[List[str]]:
    """Reference guard: if the number of returned lemma pairs differs from the
    doc's token count, the whole shard is skipped (returns None)."""
    if len(parsed) != n_tokens:
        return None
    return [lemma for _tok, lemma in parsed]
