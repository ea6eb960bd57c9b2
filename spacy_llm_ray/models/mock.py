"""Deterministic, answer-bearing mock models.

The reference tests wire pipelines with a NoOp model (returns "") plus
hand-written gold response strings fed straight into the parsers. For
end-to-end Ray runs we need a model that *derives* correct responses from the
prompt alone — a stand-in for a perfect LLM. These mocks:

- see only the prompt (they recover the fenced document text),
- hold small broadcastable state (gazetteer / nothing / nothing),
- are strictly deterministic, so pipeline output is oracle-checkable in SQL.

They produce responses in exactly the formats the reference parsers consume
(CoT lines / JSON-per-line / ``*mention* ::: <qid>``), so the *real* parsing
machinery is exercised end to end.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence, Tuple

from ..templates import extract_fenced_text

GAZETTEER_MODEL_KIND = "gazetteer"


class MockNERModel:
    """Emits one CoT line per gazetteer hit, in text order (leftmost-longest,
    non-overlapping) — the response format of spacy.NER.v3."""

    def __init__(self, gazetteer: Dict[str, str], context_length: Optional[int] = None):
        # Sort alternatives longest-first so the regex prefers the longest match.
        surfaces = sorted(gazetteer.keys(), key=len, reverse=True)
        self._pattern = re.compile(
            r"\b(" + "|".join(re.escape(s) for s in surfaces) + r")\b"
        ) if surfaces else None
        self._gazetteer = dict(gazetteer)
        self.context_length = context_length

    def __call__(self, prompts: List[str]) -> List[str]:
        out = []
        for prompt in prompts:
            text = extract_fenced_text(prompt)
            lines = []
            if self._pattern is not None:
                for i, m in enumerate(self._pattern.finditer(text)):
                    label = self._gazetteer[m.group(1)]
                    lines.append(f"{i + 1}. {m.group(1)} | True | {label} | is a {label}")
            out.append("\n".join(lines))
        return out


class MockRELModel:
    """Scans the preannotated ([ENTi:LABEL]-marked) text for
    ``<subj marker> <pred phrase> <obj>...<obj marker>`` patterns and emits one
    JSON line per relation — the response format of spacy.REL.v1."""

    def __init__(
        self,
        predicates: Dict[str, str],  # surface phrase -> relation label
        context_length: Optional[int] = None,
    ):
        self._predicates = dict(predicates)
        alt = "|".join(re.escape(p) for p in sorted(predicates, key=len, reverse=True))
        self._pattern = re.compile(
            r"\[ENT(\d+):\w+\] (" + alt + r") [^.\[\]]*?\[ENT(\d+):\w+\]"
        )
        self.context_length = context_length

    def __call__(self, prompts: List[str]) -> List[str]:
        out = []
        for prompt in prompts:
            text = extract_fenced_text(prompt)
            lines = []
            for m in self._pattern.finditer(text):
                rel = self._predicates[m.group(2)]
                lines.append(
                    '{"dep": %s, "dest": %s, "relation": "%s"}'
                    % (m.group(1), m.group(3), rel)
                )
            out.append("\n".join(lines))
        return out


_EL_CAND_RE = re.compile(r"^- \*(?P<mention>.+?)\*: candidates: (?P<first>[^\s(;]+)", re.M)


class MockELModel:
    """Answers each mention block with its first-listed candidate — i.e. the
    top-prior candidate, since the EL stage lists candidates sorted by prior
    (cf. candidate_selector.py:44-55). Response format of
    spacy.EntityLinker.v1: ``*<mention>* ::: <<qid>>``."""

    def __init__(self, context_length: Optional[int] = None):
        self.context_length = context_length

    def __call__(self, prompts: List[str]) -> List[str]:
        out = []
        for prompt in prompts:
            lines = []
            for m in _EL_CAND_RE.finditer(prompt):
                lines.append(f"*{m.group('mention')}* ::: <{m.group('first')}>")
            out.append("\n".join(lines))
        return out


class EchoModel:
    """Returns the fenced document text itself (useful for Raw/Translation
    smoke paths)."""

    def __init__(self, context_length: Optional[int] = None):
        self.context_length = context_length

    def __call__(self, prompts: List[str]) -> List[str]:
        return [extract_fenced_text(p) for p in prompts]
